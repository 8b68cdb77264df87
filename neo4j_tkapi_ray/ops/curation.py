"""End-to-end corpus curation: the composed keep/reject decision a
training-data pipeline makes per document, as ONE Ray Data pipeline.

Composes the public rule families the individual operators implement
(C4/Gopher-style quality heuristics, Gopher repetition rules, exact
dedup survivorship, benchmark decontamination) into a single per-doc
verdict with the FIRST failing rule as the reject reason — the table a
100-TB curation run writes next to its corpus so every drop is auditable.

Scale shape: one read of ``documents``, one vectorized map_batches that
computes every per-doc metric (token stats, bigram stats, stopword/length
ratios, 128-bit content hash, contamination flag against the broadcast
snippet set), then ONE exchange keyed by the content hash where exact-dup
survivorship (doc_id == group min) is decided — rows carry only small
scalars across the shuffle, texts never move. No driver-side collects.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..exchange import reduce_blocks
from .dedup import content_hash_batch
from .sampling import benchmark_snippets
from .textstats import _WS, ws_strip

# quality stopword set — shared with textstats.quality_scores
_STOPWORDS = ("the", "a", "of", "to", "and", "de", "het", "een", "van", "en",
              "data", "query", "table", "row")

# rule order IS the contract: the first failing rule names the reject
RULES = ("too_short", "mean_token_len", "stopword_ratio", "repetitive",
         "exact_duplicate", "contaminated")


def curate_docs(sf_dir: str, *, min_tokens: int = 20,
                mtl_lo: float = 3.0, mtl_hi: float = 8.0,
                stop_lo: float = 0.1, stop_hi: float = 0.6,
                top_token_max: float = 0.2, dup_bigram_max: float = 0.1,
                snippet_stride: int = 97) -> rd.Dataset:
    """Per-document curation verdict.

    Output: ``doc_id, n_tokens, keep (0/1), reject_reason`` where
    ``reject_reason`` is the first failing rule in ``RULES`` order
    ('' when kept). All threshold comparisons happen on the raw float64
    ratios (identical IEEE arithmetic on both engine and oracle sides),
    so no rounding enters the keep decision.
    """
    snips_ref = ray.put(benchmark_snippets(sf_dir, stride=snippet_stride))
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    stop_set = pa.array(sorted(_STOPWORDS), pa.string())

    def metrics(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "h1": pa.array([], pa.int64()),
                             "h2": pa.array([], pa.int64()),
                             "n_tokens": pa.array([], pa.int64()),
                             "flag_short": pa.array([], pa.bool_()),
                             "flag_mtl": pa.array([], pa.bool_()),
                             "flag_stop": pa.array([], pa.bool_()),
                             "flag_rep": pa.array([], pa.bool_()),
                             "flag_contam": pa.array([], pa.bool_())})
        text = batch.column("text").combine_chunks()
        trimmed = ws_strip(text)
        toks = pc.split_pattern_regex(trimmed, _WS)
        n = pc.list_value_length(toks).cast(pa.int64())
        n = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0),
                       pa.scalar(0, pa.int64()), n).to_numpy()
        nrows = batch.num_rows

        # token-level stats over the flattened stream (C-level groupbys)
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        offsets = toks.offsets.to_numpy()
        doc_idx = np.repeat(np.arange(nrows), np.diff(offsets))
        non_ws = pc.count_substring_regex(text, r"\S").cast(pa.int64()).to_numpy()
        hit = pc.is_in(pc.utf8_lower(pc.list_flatten(toks)), value_set=stop_set)
        hit_np = hit.to_numpy(zero_copy_only=False).astype(np.int64)
        stop_hits = (np.add.reduceat(hit_np, offsets[:-1])
                     if len(hit_np) else np.zeros(nrows, np.int64))
        stop_hits = np.where(np.diff(offsets) > 0, stop_hits, 0)
        tf = pd.DataFrame({"d": doc_idx, "t": flat})
        top = (tf.groupby(["d", "t"], sort=False).size().groupby("d").max()
               .reindex(range(nrows), fill_value=0).to_numpy())
        # bigrams within a document
        same_doc = doc_idx[:-1] == doc_idx[1:] if len(doc_idx) else np.array([], bool)
        bg_doc = doc_idx[:-1][same_doc]
        bg = pd.DataFrame({"d": bg_doc,
                           "b": pd.Series(flat[:-1][same_doc]).str.cat(
                               pd.Series(flat[1:][same_doc]), sep=" ")})
        bgg = bg.groupby("d", sort=True)
        bg_total = bgg.size().reindex(range(nrows), fill_value=0).to_numpy()
        bg_distinct = bgg["b"].nunique().reindex(range(nrows),
                                                 fill_value=0).to_numpy()

        safe_n = np.maximum(n, 1).astype(np.float64)
        mtl = np.where(n > 0, non_ws / safe_n, 0.0)
        sr = np.where(n > 0, stop_hits / safe_n, 0.0)
        ttr = np.where(n > 0, top / safe_n, 0.0)
        dbr = np.where(bg_total > 0,
                       (bg_total - bg_distinct) / np.maximum(bg_total, 1), 0.0)

        contam = np.zeros(nrows, dtype=bool)
        for s in ray.get(snips_ref):
            contam |= pc.match_substring(text, s).to_numpy(zero_copy_only=False)

        hashed = content_hash_batch(batch)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "h1": hashed.column("h1"), "h2": hashed.column("h2"),
            "n_tokens": pa.array(n, pa.int64()),
            "flag_short": pa.array(n < min_tokens),
            "flag_mtl": pa.array(~((mtl >= mtl_lo) & (mtl <= mtl_hi))),
            "flag_stop": pa.array(~((sr >= stop_lo) & (sr <= stop_hi))),
            "flag_rep": pa.array((ttr > top_token_max) | (dbr > dup_bigram_max)),
            "flag_contam": pa.array(contam)})

    scored = docs.map_batches(metrics, batch_format="pyarrow",
                              zero_copy_batch=True)

    def verdict(block: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "keep": pa.array([], pa.int64()),
                          "reject_reason": pa.array([], pa.string())})
        if block.num_rows == 0:
            return empty
        df = block.to_pandas()
        # exact-dup survivorship: all rows of a content hash co-locate here
        gmin = df.groupby(["h1", "h2"])["doc_id"].transform("min")
        is_dup = (df["doc_id"] != gmin).to_numpy()
        conds = [df["flag_short"].to_numpy(), df["flag_mtl"].to_numpy(),
                 df["flag_stop"].to_numpy(), df["flag_rep"].to_numpy(),
                 is_dup, df["flag_contam"].to_numpy()]
        reason = np.select(conds, list(RULES), default="")
        return pa.table({
            "doc_id": pa.array(df["doc_id"].to_numpy(), pa.int64()),
            "n_tokens": pa.array(df["n_tokens"].to_numpy(), pa.int64()),
            "keep": pa.array((reason == "").astype(np.int64), pa.int64()),
            "reject_reason": pa.array(reason, pa.string())})

    return reduce_blocks(scored, ["h1", "h2"], verdict)


def source_keep_rates(sf_dir: str, **curate_kw) -> rd.Dataset:
    """Per-source curation rollup: how much of each source survives the
    composed keep/reject rules — the table a 100-TB run uses to DROP whole
    domains (a source with a 5% keep rate isn't worth crawling).

    Composition: ``curate_docs`` verdicts exchange-join the (doc_id, source)
    projection on doc_id (tag + union + key exchange — both sides stream,
    nothing on the driver), partial (source, n, keep) counts are combined
    in-block, and one last tiny exchange on source finishes the rollup.
    Output: ``source, n_docs, n_keep, keep_pct`` (pct rounded half-away at
    2dp, bit-matching DuckDB ROUND(x, 2)).
    """
    verdicts = curate_docs(sf_dir, **curate_kw)
    src = rd.read_parquet(f"{sf_dir}/documents.parquet",
                          columns=["doc_id", "source"])

    def src_tag(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id"),
                         "source": b.column("source"),
                         "keep": pa.nulls(b.num_rows, pa.int64()),
                         "is_src": pa.array(np.ones(b.num_rows, np.int8))})

    def verdict_tag(b: pa.Table) -> pa.Table:
        return pa.table({"doc_id": b.column("doc_id"),
                         "source": pa.nulls(b.num_rows, pa.string()),
                         "keep": b.column("keep"),
                         "is_src": pa.array(np.zeros(b.num_rows, np.int8))})

    def join_partial(df: pd.DataFrame) -> pd.DataFrame:
        """Per doc_id: pair the source row with the verdict row, then
        partial-combine per source BEFORE the source exchange. Sides are
        told apart by the explicit ``is_src`` tag (NOT ``source.notna()``)
        and the groupby keeps the NULL-source group (``dropna=False``), so
        documents with a NULL source roll up into a NULL group exactly
        like the DuckDB oracle's GROUP BY (ADVICE r3: the pandas default
        silently dropped them)."""
        if df.empty:
            return pd.DataFrame({"source": pd.Series(dtype="object"),
                                 "n": pd.Series(dtype="int64"),
                                 "k": pd.Series(dtype="int64")})
        s = df[df["is_src"] == 1].set_index("doc_id")["source"]
        v = df[df["is_src"] == 0]
        joined = pd.DataFrame({"source": s.reindex(v["doc_id"]).to_numpy(),
                               "keep": v["keep"].to_numpy()})
        g = joined.groupby("source", sort=False, dropna=False)["keep"]
        src = np.array([None if isinstance(x, float) and np.isnan(x) else x
                        for x in g.size().index.to_numpy()], dtype=object)
        return pd.DataFrame({"source": src,
                             "n": g.size().to_numpy().astype(np.int64),
                             "k": g.sum().to_numpy().astype(np.int64)})

    partial = reduce_blocks(
        src.map_batches(src_tag, batch_format="pyarrow").union(
            verdicts.map_batches(verdict_tag, batch_format="pyarrow")),
        ["doc_id"], join_partial, batch_format="pandas")

    def finish(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"source": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_keep": pa.array([], pa.int64()),
                             "keep_pct": pa.array([], pa.float64())})
        g = block.group_by(["source"]).aggregate([("n", "sum"), ("k", "sum")])
        n = g.column("n_sum").cast(pa.int64()).to_numpy()
        k = g.column("k_sum").cast(pa.int64()).to_numpy()
        # half-away at 2dp == DuckDB ROUND(x, 2) for the non-negative pcts
        pct = np.floor((100.0 * k / n) * 100 + 0.5) / 100
        return pa.table({"source": g.column("source"),
                         "n_docs": pa.array(n, pa.int64()),
                         "n_keep": pa.array(k, pa.int64()),
                         "keep_pct": pa.array(pct, pa.float64())})

    return reduce_blocks(partial, ["source"], finish)
