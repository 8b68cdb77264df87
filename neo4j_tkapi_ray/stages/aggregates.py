"""Corpus-level rollups over the triple stream (reference A2/A3 analyzers,
voting_analyzer.py:62-172 and interruption_analyzer.py:100-189) as
exchange-based grouped aggregates with vectorized partial combining."""

from __future__ import annotations

import math

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..exchange import grouped_apply, reduce_blocks


def round2_away(x: float) -> float:
    """Half-AWAY 2-decimal rounding (floor(x*100+0.5)/100, valid for x>=0)
    — bit-identical to DuckDB ROUND(x, 2), so the rollup oracles can be
    derivational SQL. Python round() is half-even and diverges on exact
    .xx5 doubles (e.g. 3.125 -> 3.12 vs SQL 3.13)."""
    return math.floor(x * 100 + 0.5) / 100


def _count_reduce(keys):
    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        g = batch.group_by(keys).aggregate([(keys[0], "count")])
        return g.rename_columns(keys + ["n"])

    def final(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block
        g = block.group_by(keys).aggregate([("n", "sum")])
        return g.rename_columns(keys + ["n"])

    return partial, final


def _votes_only(triples: rd.Dataset) -> rd.Dataset:
    def fn(batch: pa.Table) -> pa.Table:
        mask = pc.starts_with(batch.column("pred"), "VOTED_")
        # one vote per (fractie, event): vote_on_zaak rows are the same vote
        # fanned out over zaken (emit.py) — count events only
        mask = pc.and_(mask, pc.equal(batch.column("provenance"), "vote"))
        sel = batch.filter(mask)
        vote = pc.utf8_lower(pc.replace_substring(sel.column("pred"), "VOTED_", ""))
        return pa.table({"fractie_id": sel.column("subj"), "vote": vote,
                         "event_id": sel.column("obj")})
    return triples.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def fractie_vote_rollup(triples: rd.Dataset) -> rd.Dataset:
    """fractie x vote-type counts + alignment percentages (A2)."""
    partial, final = _count_reduce(["fractie_id", "vote"])
    counts = reduce_blocks(_votes_only(triples).map_batches(partial, batch_format="pyarrow"),
                           ["fractie_id", "vote"], final)

    def alignment(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"fractie_id": pd.Series(dtype="object"),
                                 "total_votes": pd.Series(dtype="int64"),
                                 "voor_pct": pd.Series(dtype="float64"),
                                 "tegen_pct": pd.Series(dtype="float64"),
                                 "onthouding_pct": pd.Series(dtype="float64")})
        total = int(df["n"].sum())

        def pct(v):
            n = int(df.loc[df["vote"] == v, "n"].sum())
            return round2_away(n / total * 100) if total else 0.0

        return pd.DataFrame([{
            "fractie_id": df["fractie_id"].iloc[0], "total_votes": total,
            "voor_pct": pct("voor"), "tegen_pct": pct("tegen"),
            "onthouding_pct": pct("onthouding"),
        }])

    return grouped_apply(counts, ["fractie_id"], alignment)


def topic_consensus(triples: rd.Dataset) -> rd.Dataset:
    """Per voting event: consensus = max(voor, tegen) / total * 100;
    classify controversial (<80) / unanimous (>=95) — voting_analyzer.py:
    124-156 semantics."""
    partial, final = _count_reduce(["event_id", "vote"])
    votes = _votes_only(triples).map_batches(
        lambda b: b.select(["event_id", "vote"]), batch_format="pyarrow")
    counts = reduce_blocks(votes.map_batches(partial, batch_format="pyarrow"),
                           ["event_id", "vote"], final)

    def consensus(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="object"),
                                 "total_votes": pd.Series(dtype="int64"),
                                 "consensus_level": pd.Series(dtype="float64"),
                                 "controversial": pd.Series(dtype="bool"),
                                 "unanimous": pd.Series(dtype="bool")})
        total = int(df["n"].sum())
        voor = int(df.loc[df["vote"] == "voor", "n"].sum())
        tegen = int(df.loc[df["vote"] == "tegen", "n"].sum())
        level = round2_away(max(voor, tegen) / total * 100) if total else 0.0
        return pd.DataFrame([{
            "event_id": df["event_id"].iloc[0], "total_votes": total,
            "consensus_level": level,
            "controversial": bool(level < 80), "unanimous": bool(level >= 95),
        }])

    return grouped_apply(counts, ["event_id"], consensus)


# ---------------------------------------------------------------------------
# A2/A3 depth — rollups over the analysis-row stream (stages/triples.py
# to_analysis): the distributed re-expression of voting_analyzer.py:62-172
# and interruption_analyzer.py:100-189.
# ---------------------------------------------------------------------------

def _kind(analysis: rd.Dataset, kind: str) -> rd.Dataset:
    return analysis.map_batches(
        lambda b: b.filter(pc.equal(b.column("kind"), kind)),
        batch_format="pyarrow", zero_copy_batch=True)


def fractie_topic_vote_rollup(analysis: rd.Dataset) -> rd.Dataset:
    """fractie x topic x vote-type counts (voting_analyzer.py:108-111
    fractie_topic_votes)."""
    keys = ["fractie_naam", "topic", "vote"]
    rows = _kind(analysis, "vote_topic").map_batches(
        lambda b: b.select(keys), batch_format="pyarrow")
    partial, final = _count_reduce(keys)
    return reduce_blocks(rows.map_batches(partial, batch_format="pyarrow"),
                         keys, final)


def topic_vote_patterns(analysis: rd.Dataset) -> rd.Dataset:
    """Per-topic vote pattern: total votes, voor/tegen/onthouding counts,
    consensus level, controversial (<80) / unanimous (>=95) flags
    (voting_analyzer.py:113-128,144-156). Totals count EVERY vote row for
    the topic (any vote type), mirroring the reference's total_votes += 1."""
    keys = ["topic", "vote"]
    rows = _kind(analysis, "vote_topic").map_batches(
        lambda b: b.select(keys), batch_format="pyarrow")
    partial, final = _count_reduce(keys)
    counts = reduce_blocks(rows.map_batches(partial, batch_format="pyarrow"),
                           keys, final)

    def pattern(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"topic": pd.Series(dtype="object"),
                                 "total_votes": pd.Series(dtype="int64"),
                                 "voor_n": pd.Series(dtype="int64"),
                                 "tegen_n": pd.Series(dtype="int64"),
                                 "onthouding_n": pd.Series(dtype="int64"),
                                 "consensus_level": pd.Series(dtype="float64"),
                                 "controversial": pd.Series(dtype="bool"),
                                 "unanimous": pd.Series(dtype="bool")})
        total = int(df["n"].sum())

        def cnt(v):
            return int(df.loc[df["vote"] == v, "n"].sum())

        voor, tegen = cnt("voor"), cnt("tegen")
        level = round2_away(max(voor, tegen) / total * 100) if total else 0.0
        return pd.DataFrame([{
            "topic": df["topic"].iloc[0], "total_votes": total,
            "voor_n": voor, "tegen_n": tegen, "onthouding_n": cnt("onthouding"),
            "consensus_level": level,
            "controversial": bool(level < 80 and total > 0),
            "unanimous": bool(level >= 95 and total > 0),
        }])

    return grouped_apply(counts, ["topic"], pattern)


def interruption_type_counts(analysis: rd.Dataset) -> rd.Dataset:
    """Counts per interruption type, INCLUDING events with unlinked sides
    (interruption_analyzer.py:114-117)."""
    rows = _kind(analysis, "interruption").map_batches(
        lambda b: b.select(["type"]), batch_format="pyarrow")
    partial, final = _count_reduce(["type"])
    return reduce_blocks(rows.map_batches(partial, batch_format="pyarrow"),
                         ["type"], final)


def interruption_topic_counts(analysis: rd.Dataset) -> rd.Dataset:
    """Topics causing interruptions (interruption_analyzer.py:148-157)."""
    rows = _kind(analysis, "interruption_topic").map_batches(
        lambda b: b.select(["topic"]), batch_format="pyarrow")
    partial, final = _count_reduce(["topic"])
    counts = reduce_blocks(rows.map_batches(partial, batch_format="pyarrow"),
                           ["topic"], final)
    return counts.sort(["n", "topic"], descending=[True, False])


def response_pattern_counts(analysis: rd.Dataset) -> rd.Dataset:
    """Who responds to whom after being interrupted
    (interruption_analyzer.py:159-179): only interruption_with_response
    events, keyed (responder, interrupter)."""
    def fn(b: pa.Table) -> pa.Table:
        sel = b.filter(pc.and_(
            pc.equal(b.column("kind"), "interruption"),
            pc.equal(b.column("type"), "interruption_with_response")))
        return sel.select(["responder", "interrupter"])

    rows = analysis.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    partial, final = _count_reduce(["responder", "interrupter"])
    counts = reduce_blocks(rows.map_batches(partial, batch_format="pyarrow"),
                           ["responder", "interrupter"], final)
    return counts.sort(["n", "responder", "interrupter"],
                       descending=[True, False, False])


def vote_type_distribution(analysis: rd.Dataset) -> rd.Dataset:
    """Corpus-wide vote-type histogram over every individual fractie vote
    (voting_analyzer.py:118-120 vote_type_counts, surfaced at :167 as
    vote_type_distribution)."""
    rows = _kind(analysis, "vote").map_batches(
        lambda b: b.select(["vote"]), batch_format="pyarrow")
    partial, final = _count_reduce(["vote"])
    return reduce_blocks(rows.map_batches(partial, batch_format="pyarrow"),
                         ["vote"], final)


def interruption_pair_details(analysis: rd.Dataset,
                              max_examples: int = 5) -> rd.Dataset:
    """Per-pair detail payload: count + topic set + bounded example list
    per interrupter->interrupted pair (interruption_analyzer.py:119-146 —
    the reference keeps a topics set and an UNBOUNDED examples list per
    pair; here examples are the first ``max_examples`` DISTINCT
    (url, activity, type) keys in ascending order, the bounded analog of
    its <=100 failed-items cap). Linked pairs only (both persoon ids
    non-empty), matching the reference's guard.

    One exchange on the pair key; the interruption rows (count + example
    keys) and interruption_topic rows (topic set) of a pair land in the
    same block and assemble vectorized."""
    def fn(b: pa.Table) -> pa.Table:
        sel = b.filter(pc.and_(
            pc.and_(pc.is_in(b.column("kind"),
                             value_set=pa.array(["interruption",
                                                 "interruption_topic"])),
                    pc.not_equal(b.column("interrupter"), "")),
            pc.not_equal(b.column("interrupted"), "")))
        return sel.select(["kind", "interrupter", "interrupted", "topic",
                           "url", "activity_local_id", "type"])

    rows = analysis.map_batches(fn, batch_format="pyarrow",
                                zero_copy_batch=True)

    def detail(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"interrupter": pd.Series(dtype="object"),
                              "interrupted": pd.Series(dtype="object"),
                              "n": pd.Series(dtype="int64"),
                              "topics": pd.Series(dtype="object"),
                              "examples": pd.Series(dtype="object")})
        ints = df[df["kind"] == "interruption"]
        if ints.empty:
            return empty
        topics = sorted(set(df.loc[df["kind"] == "interruption_topic",
                                   "topic"]))
        keys = sorted(set(ints["url"] + "#" + ints["activity_local_id"]
                          + "#" + ints["type"]))[:max_examples]
        return pd.DataFrame([{"interrupter": df["interrupter"].iloc[0],
                              "interrupted": df["interrupted"].iloc[0],
                              "n": len(ints),
                              "topics": "|".join(topics),
                              "examples": "|".join(keys)}])

    return grouped_apply(rows, ["interrupter", "interrupted"], detail)


def interruption_pairs(triples: rd.Dataset) -> rd.Dataset:
    """who-interrupts-whom pair counts, sorted desc (A3)."""
    def fn(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(batch.column("pred"), "INTERRUPTED"))
        return pa.table({"interrupter": sel.column("subj"),
                         "interrupted": sel.column("obj")})

    pairs = triples.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    partial, final = _count_reduce(["interrupter", "interrupted"])
    counts = reduce_blocks(pairs.map_batches(partial, batch_format="pyarrow"),
                           ["interrupter", "interrupted"], final)
    return counts.sort(["n", "interrupter", "interrupted"],
                       descending=[True, False, False])

def interrupter_counts(triples: rd.Dataset) -> rd.Dataset:
    """most_frequent_interrupters (A3 — interruption_analyzer.py:128-146:
    per-speaker interrupter tally over linked pairs)."""
    def fn(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(batch.column("pred"), "INTERRUPTED"))
        return pa.table({"persoon_id": sel.column("subj")})

    rows = triples.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    partial, final = _count_reduce(["persoon_id"])
    counts = reduce_blocks(rows.map_batches(partial, batch_format="pyarrow"),
                           ["persoon_id"], final)
    return counts.sort(["n", "persoon_id"], descending=[True, False])


def interrupted_counts(triples: rd.Dataset) -> rd.Dataset:
    """most_interrupted_speakers (A3 — interruption_analyzer.py:128-146)."""
    def fn(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.equal(batch.column("pred"), "INTERRUPTED"))
        return pa.table({"persoon_id": sel.column("obj")})

    rows = triples.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
    partial, final = _count_reduce(["persoon_id"])
    counts = reduce_blocks(rows.map_batches(partial, batch_format="pyarrow"),
                           ["persoon_id"], final)
    return counts.sort(["n", "persoon_id"], descending=[True, False])
