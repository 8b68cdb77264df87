"""Tie and boundary semantics of the distributed join shapes (ops/joins.py,
ops/events.trailing_window_counts) on crafted micro-corpora. The DuckDB
hash-match lives in test_queries_contract; these pin the edge rules the
oracle shares."""

import numpy as np
import pandas as pd
import pytest


def _write_corpus(tmp_path, events=None, orders=None, customer=None):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    if events is not None:
        events.to_parquet(d / "events.parquet", index=False)
    if orders is not None:
        orders.to_parquet(d / "orders.parquet", index=False)
    if customer is not None:
        customer.to_parquet(d / "customer.parquet", index=False)
    return str(d)


def _ts(*strs):
    return pd.to_datetime(list(strs)).astype("datetime64[us]")


def test_asof_tie_prefers_largest_orderkey_and_drops_unmatched(ray_session, tmp_path):
    from neo4j_tkapi_ray.ops.joins import asof_join_order_events
    events = pd.DataFrame({
        "event_id": [1, 2],
        "user_id": [7, 7],
        "ts": _ts("2024-01-10", "2023-12-01"),  # event 2 precedes all orders
        "event_type": ["x", "x"], "value": [0.0, 0.0], "props": ["", ""]})
    orders = pd.DataFrame({
        "o_custkey": [7, 7, 7],
        "o_orderkey": [100, 300, 200],   # 300 and 200 share the tie date
        "o_totalprice": [10.0, 30.0, 20.0],
        "o_orderdate": _ts("2024-01-01", "2024-01-05", "2024-01-05"),
        "o_orderstatus": ["F", "F", "F"], "o_orderpriority": ["1"] * 3})
    sf = _write_corpus(tmp_path, events=events, orders=orders)
    out = asof_join_order_events(sf).to_pandas()
    assert len(out) == 1                       # pre-order event dropped (inner)
    row = out.iloc[0]
    assert row["event_id"] == 1
    assert row["o_orderkey"] == 300            # largest key among the tie date
    assert row["o_totalprice"] == 30.0


def test_asof_exact_timestamp_match_included(ray_session, tmp_path):
    from neo4j_tkapi_ray.ops.joins import asof_join_order_events
    t = _ts("2024-03-01")
    events = pd.DataFrame({"event_id": [1], "user_id": [3], "ts": t,
                           "event_type": ["x"], "value": [0.0], "props": [""]})
    orders = pd.DataFrame({"o_custkey": [3], "o_orderkey": [9],
                           "o_totalprice": [5.0], "o_orderdate": t,
                           "o_orderstatus": ["F"], "o_orderpriority": ["1"]})
    sf = _write_corpus(tmp_path, events=events, orders=orders)
    out = asof_join_order_events(sf).to_pandas()
    assert len(out) == 1 and out.iloc[0]["o_orderkey"] == 9


def test_anti_join_is_per_status(ray_session, tmp_path):
    from neo4j_tkapi_ray.ops.joins import customers_without_orders
    customer = pd.DataFrame({
        "c_custkey": [1, 2, 3], "c_name": ["a", "b", "c"],
        "c_nationkey": np.int32([0, 0, 0]),
        "c_acctbal": [1.0, 2.0, 3.0], "c_mktsegment": ["m"] * 3})
    orders = pd.DataFrame({
        "o_custkey": [1, 2], "o_orderkey": [10, 20],
        "o_totalprice": [1.0, 1.0],
        "o_orderdate": _ts("2024-01-01", "2024-01-01"),
        "o_orderstatus": ["F", "O"],   # cust 2 has orders, but none with 'F'
        "o_orderpriority": ["1", "1"]})
    sf = _write_corpus(tmp_path, customer=customer, orders=orders)
    out = customers_without_orders(sf, "F").to_pandas()
    assert sorted(out["c_custkey"]) == [2, 3]


def test_topk_tie_breaks_on_orderkey_and_short_groups_keep_all(ray_session, tmp_path):
    from neo4j_tkapi_ray.ops.joins import top_orders_per_customer
    orders = pd.DataFrame({
        "o_custkey": [5, 5, 5, 5, 6],
        "o_orderkey": [4, 2, 3, 1, 9],
        "o_totalprice": [100.0, 100.0, 50.0, 40.0, 7.0],
        "o_orderdate": _ts(*["2024-01-01"] * 5),
        "o_orderstatus": ["F"] * 5, "o_orderpriority": ["1"] * 5})
    sf = _write_corpus(tmp_path, orders=orders)
    out = (top_orders_per_customer(sf, 3).to_pandas()
           .sort_values(["o_custkey", "rank"]).reset_index(drop=True))
    five = out[out["o_custkey"] == 5]
    # equal prices 100/100: lower orderkey (2) ranks before 4
    assert list(five["o_orderkey"]) == [2, 4, 3]
    assert list(five["rank"]) == [1, 2, 3]
    assert list(out[out["o_custkey"] == 6]["o_orderkey"]) == [9]


def test_trailing_window_counts_peers_and_boundary(ray_session, tmp_path):
    from neo4j_tkapi_ray.ops.events import trailing_window_counts
    base = pd.Timestamp("2024-06-01 12:00:00")
    events = pd.DataFrame({
        "event_id": [1, 2, 3, 4, 5],
        "user_id": [1] * 5,
        "ts": pd.Series([
            base,                              # t0
            base,                              # peer of t0 (equal ts)
            base + pd.Timedelta(minutes=60),   # exactly window edge from t0
            base + pd.Timedelta(minutes=121),  # outside any prior window
            base + pd.Timedelta(minutes=150),
        ]).astype("datetime64[us]"),
        "event_type": ["x"] * 5, "value": [0.0] * 5, "props": [""] * 5})
    sf = _write_corpus(tmp_path, events=events)
    out = (trailing_window_counts(sf, 60).to_pandas()
           .sort_values("event_id").reset_index(drop=True))
    # peers at equal ts each count both (RANGE frame includes all peers)
    assert list(out["n_trailing"]) == [2, 2, 3, 1, 2]
