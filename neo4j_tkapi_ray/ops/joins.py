"""Distributed join shapes Ray Data lacks natively: as-of join, exchange
anti-join, grouped top-k.

Reference parallels: the engine's linker does broadcast range/interval joins
(J1/J2, `linking.py`) because the dimension side is small; these operators
cover the OTHER regime — both sides large — where the only scale-valid plan
is a co-partitioning exchange: tag each side, union into one stream, hash-
exchange on the join key, and resolve the join inside each partition block
(every row of a key lands in exactly one block — the exchange contract,
`exchange.reduce_blocks`). Nothing is materialized on the driver and no side
is broadcast, so the plan holds when both inputs are 100-TB tables.

Determinism: every operator defines a total tie order (documented per fn)
shared with its DuckDB oracle so results hash-match.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..exchange import reduce_blocks


def _epoch_s(ts: pd.Series) -> pd.Series:
    """Floor-to-second epoch, mirroring CAST(floor(epoch(ts)) AS BIGINT)."""
    return ts.astype("datetime64[s]").astype("int64")


def asof_join_order_events(sf_dir: str) -> rd.Dataset:
    """AS-OF JOIN: each event is matched to the customer's most recent order
    at-or-before the event timestamp (backward inner as-of join on
    user_id == o_custkey, o_orderdate <= ts).

    Plan: both sides tagged and unioned into one stream, hash-exchanged on
    the key, then ONE vectorized ``pandas.merge_asof(by=key)`` per partition
    block — no per-group Python loop, no broadcast of either side.

    Tie order (shared with the oracle): among orders with equal o_orderdate,
    the largest o_orderkey wins (right side sorted ascending; merge_asof
    takes the last match).
    """
    events = rd.read_parquet(f"{sf_dir}/events.parquet",
                             columns=["event_id", "user_id", "ts"])
    orders = rd.read_parquet(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_orderkey", "o_totalprice", "o_orderdate"])

    null_i64 = lambda n: pa.nulls(n, pa.int64())  # noqa: E731
    null_f64 = lambda n: pa.nulls(n, pa.float64())  # noqa: E731

    def tag_events(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": b.column("user_id"),
            "ts": pc.cast(b.column("ts"), pa.timestamp("us")),
            "event_id": b.column("event_id"),
            "o_orderkey": null_i64(b.num_rows),
            "o_totalprice": null_f64(b.num_rows)})

    def tag_orders(b: pa.Table) -> pa.Table:
        return pa.table({
            "key": b.column("o_custkey"),
            "ts": pc.cast(b.column("o_orderdate"), pa.timestamp("us")),
            "event_id": null_i64(b.num_rows),
            "o_orderkey": b.column("o_orderkey"),
            "o_totalprice": b.column("o_totalprice")})

    tagged = (events.map_batches(tag_events, batch_format="pyarrow")
              .union(orders.map_batches(tag_orders, batch_format="pyarrow")))

    def asof_block(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"event_id": pd.Series(dtype="int64"),
                              "user_id": pd.Series(dtype="int64"),
                              "ts_epoch": pd.Series(dtype="int64"),
                              "o_orderkey": pd.Series(dtype="int64"),
                              "o_totalprice": pd.Series(dtype="float64")})
        if df.empty:
            return empty
        left = df[df["event_id"].notna()]
        right = df[df["o_orderkey"].notna()]
        if left.empty or right.empty:
            return empty
        left = left.sort_values("ts", kind="stable")
        right = right.sort_values(["ts", "o_orderkey"], kind="stable")
        m = pd.merge_asof(
            left[["key", "ts", "event_id"]],
            right[["key", "ts", "o_orderkey", "o_totalprice"]],
            on="ts", by="key", direction="backward", allow_exact_matches=True)
        m = m[m["o_orderkey"].notna()]
        if m.empty:
            return empty
        return pd.DataFrame({
            "event_id": m["event_id"].astype("int64"),
            "user_id": m["key"].astype("int64"),
            "ts_epoch": _epoch_s(m["ts"]),
            "o_orderkey": m["o_orderkey"].astype("int64"),
            "o_totalprice": m["o_totalprice"].astype("float64")})

    return reduce_blocks(tagged, ["key"], asof_block, batch_format="pandas")


def customers_without_orders(sf_dir: str, status: str = "F") -> rd.Dataset:
    """Exchange ANTI-JOIN: customers with no order of the given status.

    Scale shape: the probe side is pre-deduplicated per batch (unique keys
    only — a per-batch combiner, so the exchange moves at most one probe row
    per key per upstream block, not the raw orders table), then both sides
    co-partition on the key and the block fn keeps build rows whose key saw
    no probe row. No NOT-IN broadcast, no driver set.
    """
    cust = rd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_name", "c_acctbal"])
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderstatus"])

    def tag_cust(b: pa.Table) -> pa.Table:
        return pa.table({"key": b.column("c_custkey"),
                         "c_name": b.column("c_name"),
                         "c_acctbal": b.column("c_acctbal"),
                         "probe": pa.array([False] * b.num_rows)})

    def tag_orders(b: pa.Table) -> pa.Table:
        keys = pc.unique(b.filter(pc.equal(b.column("o_orderstatus"), status))
                         .column("o_custkey"))
        n = len(keys)
        return pa.table({"key": keys,
                         "c_name": pa.nulls(n, pa.string()),
                         "c_acctbal": pa.nulls(n, pa.float64()),
                         "probe": pa.array([True] * n)})

    tagged = (cust.map_batches(tag_cust, batch_format="pyarrow")
              .union(orders.map_batches(tag_orders, batch_format="pyarrow")))

    def anti_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"c_custkey": pd.Series(dtype="int64"),
                                 "c_name": pd.Series(dtype="object"),
                                 "c_acctbal": pd.Series(dtype="float64")})
        probed = set(df.loc[df["probe"], "key"].to_numpy())
        keep = df[~df["probe"] & ~df["key"].isin(probed)]
        return pd.DataFrame({"c_custkey": keep["key"].astype("int64"),
                             "c_name": keep["c_name"],
                             "c_acctbal": keep["c_acctbal"].astype("float64")})

    return reduce_blocks(tagged, ["key"], anti_block, batch_format="pandas")


def top_orders_per_customer(sf_dir: str, k: int = 3) -> rd.Dataset:
    """Grouped TOP-K: each customer's k most expensive orders with rank.

    Partial top-k inside map_batches (per batch, per key, keep k — the
    combiner) bounds what the exchange moves to k rows per key per upstream
    block; the final per-partition pass re-ranks. Tie order (shared with the
    oracle): (o_totalprice DESC, o_orderkey ASC).
    """
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_orderkey", "o_totalprice"])

    def partial_topk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return df
        return (df.sort_values(["o_totalprice", "o_orderkey"],
                               ascending=[False, True], kind="stable")
                .groupby("o_custkey", sort=False).head(k))

    partials = orders.map_batches(partial_topk, batch_format="pandas",
                                  batch_size=128 * 1024)

    def final_topk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"o_custkey": pd.Series(dtype="int64"),
                                 "rank": pd.Series(dtype="int64"),
                                 "o_orderkey": pd.Series(dtype="int64"),
                                 "o_totalprice": pd.Series(dtype="float64")})
        df = (df.sort_values(["o_totalprice", "o_orderkey"],
                             ascending=[False, True], kind="stable")
              .groupby("o_custkey", sort=False).head(k))
        df = df.assign(rank=df.groupby("o_custkey", sort=False).cumcount() + 1)
        return df[["o_custkey", "rank", "o_orderkey", "o_totalprice"]].astype(
            {"o_custkey": "int64", "rank": "int64", "o_orderkey": "int64",
             "o_totalprice": "float64"})

    return reduce_blocks(partials, ["o_custkey"], final_topk,
                         batch_format="pandas")
