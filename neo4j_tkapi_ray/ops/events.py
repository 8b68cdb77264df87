"""Stream-shaped operators over the ``events`` log table.

Ray Data has no event-time windows (ray_guide "Streaming-shaped
workloads"); the pattern is: treat the log as partitioned by key, exchange
by key, and window over the sorted group inside the block. Ordering
assumption: (ts, event_id) is a total order per user — both the Ray side
and the DuckDB oracle sort by it, so ties are deterministic.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..exchange import grouped_apply, reduce_blocks


def user_sessions(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Gap-based sessionization: a new session starts when the time since
    the user's previous event exceeds ``gap_minutes``.

    Output: (user_id, session_idx, n_events, session_start_epoch) — one row
    per session, session_idx 0-based in time order.
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts"])
    gap = np.timedelta64(gap_minutes * 60, "s")

    def sessionize(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "session_idx": pd.Series(dtype="int64"),
                                 "n_events": pd.Series(dtype="int64"),
                                 "session_start_epoch": pd.Series(dtype="int64")})
        df = df.sort_values(["ts", "event_id"], kind="stable")
        ts = df["ts"].to_numpy()
        new_session = np.zeros(len(df), dtype=np.int64)
        if len(df) > 1:
            new_session[1:] = (np.diff(ts) > gap).astype(np.int64)
        df = df.assign(session_idx=np.cumsum(new_session))
        out = (df.groupby("session_idx")
               .agg(n_events=("event_id", "size"), session_start=("ts", "min"))
               .reset_index())
        out["user_id"] = df["user_id"].iloc[0]
        out["session_start_epoch"] = (
            out["session_start"].astype("datetime64[s]").astype("int64"))
        return out[["user_id", "session_idx", "n_events", "session_start_epoch"]].astype(
            {"user_id": "int64", "session_idx": "int64", "n_events": "int64",
             "session_start_epoch": "int64"})

    return grouped_apply(ds, ["user_id"], sessionize)


def session_stats(sf_dir: str, gap_minutes: int = 30) -> rd.Dataset:
    """Per-user session rollup over user_sessions."""
    sessions = user_sessions(sf_dir, gap_minutes)

    def rollup(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                                 "n_sessions": pd.Series(dtype="int64"),
                                 "mean_events_per_session": pd.Series(dtype="float64")})
        return pd.DataFrame([{
            "user_id": int(df["user_id"].iloc[0]),
            "n_sessions": int(len(df)),
            "mean_events_per_session": round(float(df["n_events"].mean()), 4),
        }])

    return grouped_apply(sessions, ["user_id"], rollup)


def trailing_window_counts(sf_dir: str, window_minutes: int = 60) -> rd.Dataset:
    """Trailing event-time WINDOWED AGGREGATE: for every event, the number
    of same-user events in the closed interval [ts - window, ts].

    Frame semantics mirror SQL ``RANGE BETWEEN <window> PRECEDING AND
    CURRENT ROW``: the bound is on the ORDER-BY *value*, so peers (equal
    ts) are always all included regardless of row order — which makes the
    count a pure function of ts and keeps it deterministic under ties.

    Plan: exchange by user, then per partition ONE vectorized pass — sort
    the block once, np.searchsorted both window bounds per user segment.
    The exchange moves (event_id, user_id, ts) only; nothing is collected
    on the driver.
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_id", "user_id", "ts"])
    window = np.timedelta64(window_minutes * 60, "s")

    def window_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                                 "user_id": pd.Series(dtype="int64"),
                                 "ts_epoch": pd.Series(dtype="int64"),
                                 "n_trailing": pd.Series(dtype="int64")})
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        ts = df["ts"].to_numpy()
        users = df["user_id"].to_numpy()
        # contiguous per-user segments after the sort
        seg_starts = np.flatnonzero(np.r_[True, users[1:] != users[:-1]])
        seg_ends = np.r_[seg_starts[1:], len(users)]
        n = np.empty(len(df), dtype=np.int64)
        for s, e in zip(seg_starts, seg_ends):
            seg = ts[s:e]
            lo = np.searchsorted(seg, seg - window, side="left")
            hi = np.searchsorted(seg, seg, side="right")
            n[s:e] = hi - lo
        return pd.DataFrame({
            "event_id": df["event_id"].astype("int64"),
            "user_id": df["user_id"].astype("int64"),
            "ts_epoch": df["ts"].astype("datetime64[s]").astype("int64"),
            "n_trailing": n})

    from ..exchange import reduce_blocks
    return reduce_blocks(ds, ["user_id"], window_block, batch_format="pandas")


def event_type_transitions(sf_dir: str) -> rd.Dataset:
    """First-order Markov transition table over the activity log: for every
    pair of CONSECUTIVE same-user events (ordered by the module's (ts,
    event_id) total order), count (prev_type, next_type) occurrences
    corpus-wide — the "what do users do next" table behind funnel design
    and next-event prediction baselines.

    Plan: exchange by user (each user's full sequence lands in one block),
    then per partition ONE vectorized pass — sort the block, shift the
    type column, mask same-user adjacency, group-count the pairs. The
    per-block output is bounded by T² distinct type pairs (T = event-type
    vocabulary), so the final merge is a single type-pair-bounded block —
    never corpus-bounded (same bound argument as source_bigram_overlap's
    merge).

    Output: (prev_type, next_type, n); users with a single event
    contribute nothing.
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_id", "ts", "event_type"])
    _empty = pd.DataFrame({"prev_type": pd.Series(dtype="object"),
                           "next_type": pd.Series(dtype="object"),
                           "n": pd.Series(dtype="int64")})

    def trans_block(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) < 2:
            return _empty.copy()
        df = df.sort_values(["user_id", "ts", "event_id"], kind="stable")
        users = df["user_id"].to_numpy()
        types = df["event_type"].to_numpy()
        same = users[1:] == users[:-1]
        if not same.any():
            return _empty.copy()
        pairs = pd.DataFrame({"prev_type": types[:-1][same],
                              "next_type": types[1:][same]})
        out = (pairs.groupby(["prev_type", "next_type"], sort=False)
               .size().reset_index(name="n"))
        out["n"] = out["n"].astype("int64")
        return out

    partials = reduce_blocks(ds, ["user_id"], trans_block,
                             batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _empty.copy()
        out = (df.groupby(["prev_type", "next_type"], sort=True)["n"].sum()
               .reset_index())
        out["n"] = out["n"].astype("int64")
        return out

    # ≤ T² rows per upstream partition by construction: single-block merge
    return partials.repartition(1).map_batches(merge, batch_format="pandas",
                                               batch_size=None)


def event_props_rollup(sf_dir: str) -> rd.Dataset:
    """Sidecar-metadata extraction + rollup: pull the integer field ``k``
    out of the JSON-ish ``props`` string column with ONE vectorized RE2
    kernel pass (``pc.extract_regex``) — the crawl-sidecar / WARC-metadata
    extraction shape (a production pipeline with full JSON values would
    swap the regex kernel for an Arrow JSON parser; the plumbing is
    identical) — then roll up per event_type.

    Output: (event_type, n_events, sum_k, avg_k). The DuckDB oracle uses
    the same RE2 pattern via regexp_extract, so both sides agree on every
    input including rows where the field is absent (NULL, skipped by SUM).

    Scale shape: extraction is fused into the partial-combine map_batches
    (one row per (event_type, batch) crosses the exchange); the final
    reduce sums partials and derives the average — O(#event_types) output.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..exchange import reduce_blocks

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "props"])
    _PAT = r'"k":\s*(?P<k>\d+)'

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "sum_k": pa.array([], pa.int64()),
                             "n_events": pa.array([], pa.int64())})
        ks = pc.extract_regex(b.column("props").combine_chunks(), _PAT)
        k = pc.cast(pc.struct_field(ks, "k"), pa.int64())
        t = pa.table({"event_type": b.column("event_type"), "k": k})
        g = t.group_by("event_type").aggregate([("k", "sum"),
                                                ([], "count_all")])
        return pa.table({"event_type": g.column("event_type"),
                         "sum_k": g.column("k_sum").cast(pa.int64()),
                         "n_events": g.column("count_all").cast(pa.int64())})

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def final(b: pa.Table) -> pa.Table:
        g = b.group_by("event_type").aggregate([("sum_k", "sum"),
                                                ("n_events", "sum")])
        n = g.column("n_events_sum").cast(pa.int64())
        s = g.column("sum_k_sum").cast(pa.int64())
        avg = pc.divide(pc.cast(s, pa.float64()), pc.cast(n, pa.float64()))
        return pa.table({"event_type": g.column("event_type"),
                         "n_events": n, "sum_k": s, "avg_k": avg})

    return reduce_blocks(partials, ["event_type"], final)


def funnel_stages(sf_dir: str,
                  steps: tuple = ("view", "click", "purchase")) -> rd.Dataset:
    """Ordered conversion funnel per user — the product-analytics sibling
    of sessionization: the earliest ``steps[0]``, then the earliest
    ``steps[1]`` STRICTLY AFTER it, then the earliest ``steps[2]``
    strictly after that. Users with no ``steps[0]`` event are absent;
    unreached stages carry the -1 sentinel (hash-stable; NULLs as NaN
    floats would wobble the driver canon).

    Scale shape: column-pruned scan (user_id, event_type, ts only); the
    per-batch partial drops non-funnel event types and collapses the
    FIRST step to one min-ts row per (user, batch) — later steps keep
    their events (the "earliest AFTER x" minimum cannot be pruned without
    the global x), so the user exchange moves funnel-step events only.
    One vectorized per-block chain of filtered minima finishes it.

    Output: (user_id, view_us, click_us, purchase_us, stage) with
    timestamps as int64 epoch-microseconds and stage in 1..len(steps).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..exchange import reduce_blocks

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "event_type", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        mask = pc.is_in(b.column("event_type"),
                        value_set=pa.array(list(steps), pa.string()))
        t = b.filter(mask)
        typed = pa.table({"user_id": t.column("user_id"),
                          "event_type": t.column("event_type"),
                          "ts": t.column("ts").cast(pa.int64())})
        first_mask = pc.equal(typed.column("event_type"), steps[0])
        g0 = (typed.filter(first_mask).group_by(["user_id", "event_type"])
              .aggregate([("ts", "min")]))
        firsts = pa.table({"user_id": g0.column("user_id"),
                           "event_type": g0.column("event_type"),
                           "ts": g0.column("ts_min")})
        later = typed.filter(pc.invert(first_mask))
        return pa.concat_tables([firsts, later])

    partials = ds.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def chain_block(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"user_id": pd.Series(dtype="int64"),
                              "view_us": pd.Series(dtype="int64"),
                              "click_us": pd.Series(dtype="int64"),
                              "purchase_us": pd.Series(dtype="int64"),
                              "stage": pd.Series(dtype="int64")})
        if df.empty:
            return empty
        t0 = (df[df["event_type"] == steps[0]]
              .groupby("user_id", sort=True)["ts"].min())
        if t0.empty:
            return empty
        s1 = df[df["event_type"] == steps[1]].copy()
        s1["prev"] = s1["user_id"].map(t0)
        t1 = (s1[s1["prev"].notna() & (s1["ts"] > s1["prev"])]
              .groupby("user_id", sort=True)["ts"].min())
        s2 = df[df["event_type"] == steps[2]].copy()
        s2["prev"] = s2["user_id"].map(t1)
        t2 = (s2[s2["prev"].notna() & (s2["ts"] > s2["prev"])]
              .groupby("user_id", sort=True)["ts"].min())
        out = pd.DataFrame({"user_id": t0.index.to_numpy()})
        out["view_us"] = t0.to_numpy()
        out["click_us"] = t1.reindex(t0.index).fillna(-1).to_numpy(np.int64)
        out["purchase_us"] = t2.reindex(t0.index).fillna(-1).to_numpy(np.int64)
        out["stage"] = (1 + (out["click_us"] >= 0).astype(int)
                        + (out["purchase_us"] >= 0).astype(int)).astype("int64")
        return out.astype({"user_id": "int64", "view_us": "int64"})

    return reduce_blocks(partials, ["user_id"], chain_block,
                         batch_format="pandas")


def retention_cohorts(sf_dir: str) -> rd.Dataset:
    """Daily retention cohort table — the engagement matrix behind every
    "did our data/product change keep users coming back" review: users are
    cohorted by their FIRST active day; cell (cohort_day, day_offset)
    counts the cohort's users active exactly ``day_offset`` days after
    their first day (offset 0 row = cohort size).

    Scale shape: column-pruned (user_id, ts) scan with per-batch partials
    that collapse to distinct (user, day) + per-user min-day candidates —
    so the user exchange moves at most (active days + 1) rows per user,
    not events. After the exchange each user lives in ONE block: their
    cohort day and offsets are exact there, emitted pre-counted per
    (cohort_day, day_offset); a final tiny exchange on the cohort key sums
    the partials. The driver sees cohort-matrix-sized output only.

    Output: (cohort_day, day_offset, n_users) with days as int64 epoch
    days (hash-stable; matches DuckDB's DATE subtraction).
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    US_PER_DAY = 86_400_000_000

    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["user_id", "ts"])

    def partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "day": pa.array([], pa.int64())})
        # normalize the unit first: parquet writers vary between us and ns
        us = pc.cast(pc.cast(b.column("ts"), pa.timestamp("us")), pa.int64())
        # integer division: exact epoch-day for the post-1970 timestamps
        # this table carries (pyarrow divide on int64 truncates like SQL)
        day = pc.divide(us, US_PER_DAY)
        t = pa.table({"user_id": pc.cast(b.column("user_id"), pa.int64()),
                      "day": pc.cast(day, pa.int64())})
        return t.group_by(["user_id", "day"]).aggregate([])

    def per_user_block(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"cohort_day": pd.Series(dtype="int64"),
                              "day_offset": pd.Series(dtype="int64"),
                              "n": pd.Series(dtype="int64")})
        if df.empty:
            return empty
        d = df.drop_duplicates(["user_id", "day"])
        cohort = d.groupby("user_id", sort=False)["day"].transform("min")
        out = pd.DataFrame({"cohort_day": cohort.to_numpy(),
                            "day_offset": (d["day"] - cohort).to_numpy()})
        g = (out.groupby(["cohort_day", "day_offset"], sort=False)
             .size().rename("n").reset_index())
        return g.astype({"cohort_day": "int64", "day_offset": "int64",
                         "n": "int64"})

    tagged = reduce_blocks(ds.map_batches(partial, batch_format="pyarrow",
                                          zero_copy_batch=True),
                           ["user_id"], per_user_block,
                           batch_format="pandas")

    def merge(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"cohort_day": pd.Series(dtype="int64"),
                                 "day_offset": pd.Series(dtype="int64"),
                                 "n_users": pd.Series(dtype="int64")})
        g = (df.groupby(["cohort_day", "day_offset"], sort=False)["n"]
             .sum().reset_index().rename(columns={"n": "n_users"}))
        return g.astype({"cohort_day": "int64", "day_offset": "int64",
                         "n_users": "int64"})

    return reduce_blocks(tagged, ["cohort_day", "day_offset"], merge,
                         batch_format="pandas", coalesce_rows=None)
