"""Relational operators, Ray-Data-first.

Pattern for every aggregate: PARTIAL pre-aggregation inside ``map_batches``
(vectorized pyarrow ``Table.group_by`` per batch, one row per key per batch)
followed by a small global ``groupby().aggregate`` over the partials — the
shuffle moves per-key partials, not raw rows (ray_guide "Aggregation at
scale"). Joins against dimension tables are broadcast lookups inside
``map_batches`` (no shuffle), mirroring how the KG linker broadcasts the
entity registry.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..exchange import reduce_blocks


def partial_grouped_sums(ds: rd.Dataset, keys: Sequence[str],
                         sum_cols: Dict[str, str],
                         count_alias: Optional[str] = None) -> rd.Dataset:
    """sum/count aggregate: per-batch partial combine (vectorized pyarrow
    group_by), hash exchange of the small partials, whole-block final
    combine. sum_cols: {input_col: output_alias}; count_alias: row count.
    """
    keys = list(keys)

    def partial(batch: pa.Table) -> pa.Table:
        aggs: List[Tuple[str, str]] = [(c, "sum") for c in sum_cols]
        if count_alias:
            aggs.append((keys[0], "count"))
        g = batch.group_by(keys).aggregate(aggs)
        cols = {k: g.column(k) for k in keys}
        for c, alias in sum_cols.items():
            cols[alias] = g.column(f"{c}_sum")
        if count_alias:
            cols[count_alias] = g.column(f"{keys[0]}_count").cast(pa.int64())
        return pa.table(cols)

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=128 * 1024,
                              zero_copy_batch=True)

    aliases = list(sum_cols.values()) + ([count_alias] if count_alias else [])

    def final(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return block
        g = block.group_by(keys).aggregate([(a, "sum") for a in aliases])
        cols = {k: g.column(k) for k in keys}
        for a in aliases:
            cols[a] = g.column(f"{a}_sum")
        return pa.table(cols)

    return reduce_blocks(partials, keys, final)


# ---------------------------------------------------------------------------
# concrete pipelines over the TPC-H-ish testdata (used by queries())
# ---------------------------------------------------------------------------

def lineitem_pricing_summary(sf_dir: str) -> rd.Dataset:
    """TPC-H-Q1-shaped rollup, columns pruned at the read."""
    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount"])

    def derive(batch: pa.Table) -> pa.Table:
        disc_price = pc.multiply(batch.column("l_extendedprice"),
                                 pc.subtract(pa.scalar(1.0), batch.column("l_discount")))
        return batch.append_column("disc_price", disc_price)

    ds = ds.map_batches(derive, batch_format="pyarrow", zero_copy_batch=True)
    out = partial_grouped_sums(
        ds, ["l_returnflag", "l_linestatus"],
        {"l_quantity": "sum_qty", "l_extendedprice": "sum_base_price",
         "disc_price": "sum_disc_price"},
        count_alias="count_order")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": batch.column("l_returnflag"),
            "l_linestatus": batch.column("l_linestatus"),
            "sum_qty": pc.round(batch.column("sum_qty"), 4),
            "sum_base_price": pc.round(batch.column("sum_base_price"), 4),
            "sum_disc_price": pc.round(batch.column("sum_disc_price"), 4),
            "count_order": batch.column("count_order"),
        })

    return out.map_batches(finish, batch_format="pyarrow")


def revenue_by_nation(sf_dir: str) -> rd.Dataset:
    """orders |><| customer |><| nation via BROADCAST dimension lookup (no
    shuffle join: customer/nation are the small side, shipped once via
    ray.put and mapped per batch with numpy take)."""
    cust = pd.read_parquet(f"{sf_dir}/customer.parquet",
                           columns=["c_custkey", "c_nationkey"])
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet",
                             columns=["n_nationkey", "n_name"])
    cust_nation = cust.merge(nation, left_on="c_nationkey", right_on="n_nationkey")
    # parallel key/value arrays: zero-copy from plasma, vectorized probe
    lookup_ref = ray.put((pa.array(cust_nation.c_custkey, pa.int64()),
                          pa.array(cust_nation.n_name, pa.string())))

    class Enrich:
        def __init__(self, ref):
            self.keys, self.names = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            idx = pc.index_in(batch.column("o_custkey"), value_set=self.keys)
            return pa.table({"n_name": pc.take(self.names, idx),
                             "o_totalprice": batch.column("o_totalprice")})

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    enriched = orders.map_batches(Enrich, fn_constructor_kwargs={"ref": lookup_ref},
                                  batch_format="pyarrow", concurrency=2, num_cpus=0.5)
    out = partial_grouped_sums(enriched, ["n_name"], {"o_totalprice": "revenue"},
                               count_alias="n_orders")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"n_name": batch.column("n_name"),
                         "revenue": pc.round(batch.column("revenue"), 4),
                         "n_orders": batch.column("n_orders")})

    return out.map_batches(finish, batch_format="pyarrow")


def top_customers(sf_dir: str, k: int = 10) -> rd.Dataset:
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet",
                             columns=["o_custkey", "o_totalprice"])
    agg = partial_grouped_sums(orders, ["o_custkey"], {"o_totalprice": "total_spent"},
                               count_alias="n_orders")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"o_custkey": batch.column("o_custkey"),
                         "total_spent": pc.round(batch.column("total_spent"), 4),
                         "n_orders": batch.column("n_orders")})

    # deterministic tie-break on the key so the top-k set is stable
    return (agg.map_batches(finish, batch_format="pyarrow")
            .sort(["total_spent", "o_custkey"], descending=[True, False]).limit(k))


def events_hourly(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def derive(batch: pa.Table) -> pa.Table:
        hour = pc.floor_temporal(batch.column("ts"), unit="hour")
        epoch = pc.divide(pc.cast(hour, pa.int64()), 1_000_000)
        return pa.table({"hour_epoch": epoch, "event_type": batch.column("event_type"),
                         "value": batch.column("value")})

    ds = ds.map_batches(derive, batch_format="pyarrow")
    out = partial_grouped_sums(ds, ["hour_epoch", "event_type"],
                               {"value": "sum_value"}, count_alias="n_events")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"hour_epoch": batch.column("hour_epoch"),
                         "event_type": batch.column("event_type"),
                         "sum_value": pc.round(batch.column("sum_value"), 4),
                         "n_events": batch.column("n_events")})

    return out.map_batches(finish, batch_format="pyarrow")


def user_activity(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "value"])
    out = partial_grouped_sums(ds, ["user_id"], {"value": "sum_value"},
                               count_alias="n_events")

    def finish(batch: pa.Table) -> pa.Table:
        avg = pc.divide(batch.column("sum_value"),
                        pc.cast(batch.column("n_events"), pa.float64()))
        return pa.table({"user_id": batch.column("user_id"),
                         "n_events": batch.column("n_events"),
                         "sum_value": pc.round(batch.column("sum_value"), 4),
                         "avg_value": pc.round(avg, 4)})

    return out.map_batches(finish, batch_format="pyarrow")


def supplier_balance_by_region(sf_dir: str) -> rd.Dataset:
    """supplier -> nation -> region broadcast-joined rollup."""
    nation = pd.read_parquet(f"{sf_dir}/nation.parquet")
    region = pd.read_parquet(f"{sf_dir}/region.parquet")
    nr = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    ref = ray.put((pa.array(nr.n_nationkey, pa.int64()),
                   pa.array(nr.r_name, pa.string())))

    def enrich(batch: pa.Table) -> pa.Table:
        keys, names = ray.get(ref)
        idx = pc.index_in(batch.column("s_nationkey"), value_set=keys)
        return pa.table({"r_name": pc.take(names, idx),
                         "s_acctbal": batch.column("s_acctbal")})

    sup = rd.read_parquet(f"{sf_dir}/supplier.parquet", columns=["s_nationkey", "s_acctbal"])
    out = partial_grouped_sums(sup.map_batches(enrich, batch_format="pyarrow"),
                               ["r_name"], {"s_acctbal": "sum_acctbal"},
                               count_alias="n_suppliers")

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"r_name": batch.column("r_name"),
                         "sum_acctbal": pc.round(batch.column("sum_acctbal"), 4),
                         "n_suppliers": batch.column("n_suppliers")})

    return out.map_batches(finish, batch_format="pyarrow")


def distinct_users_per_event_type(sf_dir: str) -> rd.Dataset:
    """Exact distributed COUNT(DISTINCT): distinct users per event type.

    Two-level shape (the scale-critical part): per-batch (key, user) dedup
    is the combiner — the exchange moves at most one row per (event_type,
    user) pair per upstream block, never raw events — then each partition
    counts its keys' unique users in one vectorized group_by. No driver-side
    set, no global sort.
    """
    ds = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def partial_dedup(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["event_type", "user_id"]).aggregate([])
        return g

    partials = ds.map_batches(partial_dedup, batch_format="pyarrow",
                              batch_size=128 * 1024, zero_copy_batch=True)

    def count_block(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "n_users": pa.array([], pa.int64())})
        dd = block.group_by(["event_type", "user_id"]).aggregate([])
        g = dd.group_by(["event_type"]).aggregate([("user_id", "count")])
        return pa.table({"event_type": g.column("event_type"),
                         "n_users": g.column("user_id_count").cast(pa.int64())})

    return reduce_blocks(partials, ["event_type"], count_block)
