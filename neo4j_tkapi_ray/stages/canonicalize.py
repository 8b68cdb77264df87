"""Stage [4] — canonicalization: the central shuffle (D1/D2).

Replaces the reference's graph-global ``MERGE`` upserts (helpers.py:13-54)
and its module-level PROCESSED_* dedup sets (common_processors.py:17-22,
ST2) with hash-shuffle dedup:

  * edges: distinct on (subj, pred, obj) — two-phase: a vectorized
    within-batch partial combine (pyarrow group_by) shrinks the stream
    BEFORE the shuffle, then one global groupby finishes. Re-emissions
    accumulate into a ``weight`` column instead of being suppressed by
    shared mutable state.
  * nodes: MERGE-by-key with ``SET n +=`` last-write-wins property union
    => per-key merge ordered by warc_ts. Two-phase SALTED aggregation for
    head-entity skew (SURVEY §4): phase A groups on (node_id, salt) where
    salt = sha1(url) % S so one hot entity fans out over S reducers, phase
    B merges the S partials per key.
"""

from __future__ import annotations

import json
import zlib

import pandas as pd
import pyarrow as pa
import ray.data as rd
from ray.data.aggregate import Max, Sum

from ..config import EngineConfig
from .triples import FAILED_PRED


# ---------------------------------------------------------------------------
# edges
# ---------------------------------------------------------------------------

def _edge_partial(batch: pa.Table) -> pa.Table:
    """Vectorized within-batch combine: (subj, pred, obj) -> count, max score."""
    ok = batch.filter(pa.compute.not_equal(batch.column("pred"), FAILED_PRED))
    if ok.num_rows == 0:
        return pa.table({"subj": pa.array([], pa.string()), "pred": pa.array([], pa.string()),
                         "obj": pa.array([], pa.string()), "weight": pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    g = ok.select(["subj", "pred", "obj", "score"]).group_by(["subj", "pred", "obj"])
    agg = g.aggregate([("score", "max"), ("score", "count")])
    return pa.table({
        "subj": agg.column("subj"), "pred": agg.column("pred"), "obj": agg.column("obj"),
        "weight": agg.column("score_count").cast(pa.int64()),
        "score": agg.column("score_max"),
    })


def canonicalize_edges(triples: rd.Dataset, cfg: EngineConfig) -> rd.Dataset:
    partial = triples.map_batches(_edge_partial, batch_format="pyarrow",
                                  batch_size=64 * 1024, zero_copy_batch=True)
    return partial.groupby(["subj", "pred", "obj"]).aggregate(
        Sum("weight", alias_name="weight"), Max("score", alias_name="score"))


# ---------------------------------------------------------------------------
# nodes
# ---------------------------------------------------------------------------

def _salt(key: str, buckets: int) -> int:
    return zlib.crc32(key.encode()) % buckets


def node_stubs_batch(batch: pa.Table) -> pa.Table:
    """Emit minimal node stubs from both triple endpoints (SURVEY §2.9:
    replaces the reference's defensive placeholder-node creation,
    vergadering_loader.py:86-99) and locally merge per key."""
    merged: dict = {}
    for subj, pred, obj, sl, ol, url, ts in zip(
            batch.column("subj").to_pylist(), batch.column("pred").to_pylist(),
            batch.column("obj").to_pylist(), batch.column("subj_label").to_pylist(),
            batch.column("obj_label").to_pylist(), batch.column("url").to_pylist(),
            batch.column("warc_ts").to_pylist()):
        if pred == FAILED_PRED:
            continue
        for node_id, label in ((subj, sl), (obj, ol)):
            cur = merged.get(node_id)
            props = {"last_url": url}
            if cur is None or ts >= cur["warc_ts"]:
                merged[node_id] = {"node_id": node_id, "label": label,
                                   "props": json.dumps(props), "warc_ts": ts}
    if not merged:
        return pa.table({"node_id": pa.array([], pa.string()), "label": pa.array([], pa.string()),
                         "props": pa.array([], pa.string()),
                         "warc_ts": pa.array([], pa.timestamp("us"))})
    return pa.Table.from_pylist(list(merged.values()))


def _merge_group(df: pd.DataFrame) -> pd.DataFrame:
    """Last-write-wins property union in warc_ts order (``SET n +=`` —
    helpers.py:20-24): later props overwrite earlier keys."""
    df = df.sort_values("warc_ts", kind="stable")
    props: dict = {}
    for p in df["props"]:
        props.update(json.loads(p))
    last = df.iloc[-1]
    return pd.DataFrame([{"node_id": last["node_id"], "label": last["label"],
                          "props": json.dumps(props, sort_keys=True),
                          "warc_ts": last["warc_ts"]}])


def canonicalize_nodes(triples: rd.Dataset, cfg: EngineConfig,
                       salted: bool = True) -> rd.Dataset:
    stubs = triples.map_batches(node_stubs_batch, batch_format="pyarrow",
                                batch_size=64 * 1024, zero_copy_batch=True)
    buckets = cfg.ray.canonical_salt_buckets
    if salted and buckets > 1:
        def add_salt(b: pa.Table) -> pa.Table:
            salts = pa.array([_salt(k, buckets) for k in b.column("node_id").to_pylist()],
                             pa.int32())
            return b.append_column("salt", salts)

        stubs = stubs.map_batches(add_salt, batch_format="pyarrow")
        # phase A: per-(key, salt) partial merge — hot keys fan out
        partial = stubs.groupby(["node_id", "salt"]).map_groups(
            lambda df: _merge_group(df.drop(columns=["salt"])), batch_format="pandas")
        # phase B: per-key final merge over <= S partials
        return partial.groupby("node_id").map_groups(_merge_group, batch_format="pandas")
    return stubs.groupby("node_id").map_groups(_merge_group, batch_format="pandas")
