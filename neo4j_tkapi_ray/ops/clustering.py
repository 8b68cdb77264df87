"""Deterministic distributed k-means over the embeddings table.

The training-data use: cluster document embeddings for semantic dedup
buckets, domain discovery, and cluster-balanced sampling. Classic Lloyd's
iterations, made hash-gate reproducible the same way ops/graph.pagerank is:
ALL arithmetic is int64 micro-units, so distributed partial sums are
bit-exact regardless of block order (float sums are not associative; a
float k-means would flake the driver's value-hash gate).

Contract (mirrored exactly by the unrolled DuckDB oracle):
  * quantize: q = round(x * 1e6) per dimension (int64), half away from
    zero (DuckDB round() semantics; the engine spells it out because
    np.rint rounds half to even)
  * init: centroids = the K smallest vec_ids' quantized vectors
  * iterate T times: assign each vector to the centroid minimizing the
    int64 squared L2 distance (ties -> lowest cluster id), then recompute
    each centroid as the FLOOR-division mean (python // semantics; the
    oracle spells floor out because DuckDB's ``//`` truncates); empty
    clusters keep their previous centroid
  * output: final assignment against the T-th centroids

Scale shape: centroids (K x D int64, a few KB) broadcast via ``ray.put``
each iteration; one ``map_batches`` pass computes per-batch per-cluster
partial sums (K x (D+1) ints per batch) — the only thing that ever leaves
a worker; the driver folds those bounded partials (#blocks x K rows, like
the CC loop's one-int-per-round convergence read). Overflow bound: a
cluster's per-dim sum is < 1e6 * n_members, safe to ~9e12 members per
cluster in int64.

No reference counterpart (the reference runs no clustering); this is a
brief-mandated training-data operator like ops/dedup and ops/ann.
"""

from __future__ import annotations

from typing import List

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from .ann import emb_matrix

SCALE = 1_000_000
DEFAULT_K = 8
DEFAULT_ITERS = 4


def _quantized(sf_dir: str) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def fn(batch: pa.Table) -> pa.Table:
        xs = emb_matrix(batch.column("embedding")) * SCALE
        # round HALF AWAY FROM ZERO — DuckDB's round() semantics; np.rint
        # rounds half to even and would diverge on exact .5 products
        q = np.trunc(xs + np.copysign(0.5, xs)).astype(np.int64)
        return pa.table({"vec_id": batch.column("vec_id").cast(pa.int64()),
                         "q": pa.FixedSizeListArray.from_arrays(
                             pa.array(q.reshape(-1), pa.int64()),
                             q.shape[1])})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _init_centroids(qds: rd.Dataset, k: int) -> np.ndarray:
    """K smallest vec_ids' vectors — deterministic, and tiny: a per-batch
    top-k partial keeps only k rows per block before the driver fold."""
    parts: List[pd.DataFrame] = qds.map_batches(
        lambda df: df.nsmallest(k, "vec_id"), batch_format="pandas"
    ).take_all()
    head = pd.DataFrame(parts).nsmallest(k, "vec_id").sort_values("vec_id")
    return np.stack(head["q"].to_numpy()).astype(np.int64)


def _assign(qmat: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Argmin int64 squared L2, ties -> lowest cluster id. Computed in
    int64 throughout: ||q||^2 terms cancel in the argmin, so use
    -2 q.c + ||c||^2 (monotone in the true distance, exact integers)."""
    cross = qmat @ cents.T                       # (n, k) int64
    c2 = np.einsum("kd,kd->k", cents, cents)     # (k,) int64
    scores = c2[None, :] - 2 * cross
    return np.argmin(scores, axis=1).astype(np.int64)  # first min wins


def _fit(sf_dir: str, k: int, iters: int):
    """Run the Lloyd iterations; returns (quantized dataset, final
    centroids). Shared by embedding_kmeans and kmeans_outliers so both
    score against the IDENTICAL fixed point."""
    qds = _quantized(sf_dir).materialize()  # bounded: n x (d+1) ints
    cents = _init_centroids(qds, k)
    d = cents.shape[1]

    for _ in range(iters):
        ref = ray.put(cents)

        def partials(batch: pa.Table, _ref=ref) -> pa.Table:
            c = ray.get(_ref)
            q = emb_matrix(batch.column("q")).astype(np.int64)
            lab = _assign(q, c)
            sums = np.zeros((k, d), dtype=np.int64)
            np.add.at(sums, lab, q)
            cnt = np.bincount(lab, minlength=k).astype(np.int64)
            return pa.table({
                "cluster": pa.array(np.arange(k, dtype=np.int64)),
                "cnt": pa.array(cnt),
                "sums": pa.FixedSizeListArray.from_arrays(
                    pa.array(sums.reshape(-1), pa.int64()), d)})

        # bounded driver fold: k rows per block, ints only (cf. the CC
        # loop's convergence scalar) — int64 addition is associative, so
        # the fold is bit-exact in any order
        folded = qds.map_batches(partials, batch_format="pyarrow").take_all()
        sums = np.zeros((k, d), dtype=np.int64)
        cnt = np.zeros(k, dtype=np.int64)
        for row in folded:
            sums[row["cluster"]] += np.asarray(row["sums"], dtype=np.int64)
            cnt[row["cluster"]] += row["cnt"]
        nonempty = cnt > 0
        new_c = cents.copy()
        new_c[nonempty] = sums[nonempty] // cnt[nonempty, None]  # floor div
        cents = new_c

    return qds, cents


def embedding_kmeans(sf_dir: str, k: int = DEFAULT_K,
                     iters: int = DEFAULT_ITERS) -> rd.Dataset:
    """(vec_id, cluster): assignment against the iteration-``iters``
    centroids."""
    qds, cents = _fit(sf_dir, k, iters)
    ref = ray.put(cents)

    def final_assign(batch: pa.Table, _ref=ref) -> pa.Table:
        c = ray.get(_ref)
        q = emb_matrix(batch.column("q")).astype(np.int64)
        return pa.table({"vec_id": batch.column("vec_id"),
                         "cluster": pa.array(_assign(q, c))})

    return qds.map_batches(final_assign, batch_format="pyarrow")


def _kmeans_ctes(k: int, iters: int) -> list:
    """The unrolled Lloyd's CTE chain (shared by embedding_kmeans_sql and
    kmeans_outliers_sql): quantize -> K-smallest init -> ``iters`` rounds
    of assign/recompute -> final per-(vec, cluster) score table ``df``.
    Floor division is spelled out because DuckDB's ``//`` truncates toward
    zero while the engine floors. Reads the driver-registered
    ``embeddings`` view."""
    ctes = [
        """e AS (
            SELECT vec_id, unnest(embedding) AS x,
                   generate_subscripts(embedding, 1) AS dim
            FROM embeddings)""",
        """q AS (
            SELECT vec_id, dim,
                   CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT) AS q
            FROM e)""",
        f"""c0 AS (
            SELECT dense_rank() OVER (ORDER BY vec_id) - 1 AS cluster,
                   dim, q AS c
            FROM q WHERE vec_id IN (SELECT DISTINCT vec_id FROM q
                                    ORDER BY vec_id LIMIT {k}))""",
    ]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        ctes.append(f"""d{i} AS (
            SELECT q.vec_id, {prev}.cluster,
                   SUM({prev}.c * {prev}.c - 2 * q.q * {prev}.c) AS score
            FROM q JOIN {prev} USING (dim)
            GROUP BY q.vec_id, {prev}.cluster)""")
        ctes.append(f"""a{i} AS (
            SELECT vec_id, cluster
            FROM d{i}
            QUALIFY row_number() OVER (PARTITION BY vec_id
                                       ORDER BY score, cluster) = 1)""")
        ctes.append(f"""s{i} AS (
            SELECT a.cluster, q.dim, SUM(q.q) AS s,
                   CAST(COUNT(DISTINCT q.vec_id) AS BIGINT) AS n
            FROM q JOIN a{i} a USING (vec_id)
            GROUP BY a.cluster, q.dim)""")
        # MATERIALIZED: c_i is referenced twice (next round's distance CTE
        # and next round's centroid fallback) — DuckDB inlines CTE refs, so
        # without it the round chain expands 2^iters-fold (cf. _kcore_sql)
        ctes.append(f"""c{i} AS MATERIALIZED (
            SELECT p.cluster, p.dim,
                   CASE WHEN s.n IS NULL THEN p.c
                        ELSE s.s // s.n - CASE WHEN s.s % s.n <> 0
                                               AND s.s < 0
                                          THEN 1 ELSE 0 END
                   END AS c
            FROM {prev} p
            LEFT JOIN s{i} s ON s.cluster = p.cluster AND s.dim = p.dim)""")
    last = f"c{iters}"
    ctes.append(f"""df AS (
        SELECT q.vec_id, {last}.cluster,
               SUM({last}.c * {last}.c - 2 * q.q * {last}.c) AS score
        FROM q JOIN {last} USING (dim)
        GROUP BY q.vec_id, {last}.cluster)""")
    return ctes


def embedding_kmeans_sql(k: int = DEFAULT_K,
                         iters: int = DEFAULT_ITERS) -> str:
    return ("WITH " + ",\n".join(_kmeans_ctes(k, iters)) + """
        SELECT vec_id, cluster FROM df
        QUALIFY row_number() OVER (PARTITION BY vec_id
                                   ORDER BY score, cluster) = 1""")


def cluster_sample(sf_dir: str, n_per_cluster: int = 10, k: int = DEFAULT_K,
                   iters: int = DEFAULT_ITERS) -> rd.Dataset:
    """Cluster-balanced sample: the ``n_per_cluster`` smallest vec_ids per
    k-means cluster — the deterministic core of cluster-balanced data
    selection (equal representation per semantic bucket regardless of
    cluster skew). Output (vec_id, cluster, rank), rank 1-based by vec_id
    within the cluster.

    One exchange by cluster after the k-means assignment; the per-cluster
    head is a vectorized groupby-rank inside each block (a cluster's full
    id list lands in one partition — at extreme cluster sizes swap the
    block rank for a per-batch partial top-n before the exchange, the same
    combiner shape _init_centroids uses)."""
    from ..exchange import reduce_blocks

    assigned = embedding_kmeans(sf_dir, k=k, iters=iters)

    def head_per_cluster(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("vec_id", pa.int64()),
                              ("cluster", pa.int64()),
                              ("rank", pa.int64())]).empty_table()
        df = b.to_pandas().sort_values(["cluster", "vec_id"], kind="stable")
        rank = df.groupby("cluster", sort=False).cumcount().to_numpy() + 1
        df = df.assign(rank=rank)
        df = df[df["rank"] <= n_per_cluster]
        return pa.table({"vec_id": df["vec_id"].to_numpy(np.int64),
                         "cluster": df["cluster"].to_numpy(np.int64),
                         "rank": df["rank"].to_numpy(np.int64)})

    return reduce_blocks(assigned, ["cluster"], head_per_cluster)


def cluster_sample_sql(n_per_cluster: int = 10,
                       k: int = DEFAULT_K, iters: int = DEFAULT_ITERS) -> str:
    return f"""
        WITH km AS ({embedding_kmeans_sql(k, iters)})
        SELECT vec_id, cluster,
               CAST(row_number() OVER (PARTITION BY cluster
                                       ORDER BY vec_id) AS BIGINT) AS rank
        FROM km
        QUALIFY rank <= {n_per_cluster}
    """


def kmeans_outliers(sf_dir: str, n_per_cluster: int = 5, k: int = DEFAULT_K,
                    iters: int = DEFAULT_ITERS) -> rd.Dataset:
    """Centroid-distance outliers — the embedding-space pruning signal of
    semantic curation: the ``n_per_cluster`` vectors FARTHEST from their
    assigned k-means centroid per cluster (the candidates a cleaning pass
    inspects or drops). dist2 is the exact int64 squared L2 in quantized
    micro-units, so the ranking is bit-stable; ties break vec_id ASC.

    Scale shape: centroids broadcast once via ``ray.put``; one
    map_batches scores AND prunes to a per-batch top-n per cluster
    (≤ n·k rows leave each batch), then one exchange by cluster ranks the
    bounded survivors per block. Nothing corpus-sized moves or lands on
    the driver.

    Output: (cluster, rank, vec_id, dist2), rank 1-based by dist2 DESC.
    """
    from ..exchange import reduce_blocks

    qds, cents = _fit(sf_dir, k, iters)
    ref = ray.put(cents)

    def score_prune(batch: pa.Table, _ref=ref) -> pa.Table:
        empty = pa.schema([("vec_id", pa.int64()), ("cluster", pa.int64()),
                           ("dist2", pa.int64())]).empty_table()
        if batch.num_rows == 0:
            return empty
        c = ray.get(_ref)
        q = emb_matrix(batch.column("q")).astype(np.int64)
        lab = _assign(q, c)
        diff = q - c[lab]
        dist2 = np.einsum("nd,nd->n", diff, diff)
        df = pd.DataFrame({
            "vec_id": batch.column("vec_id").to_numpy(zero_copy_only=False),
            "cluster": lab, "dist2": dist2})
        df = (df.sort_values(["cluster", "dist2", "vec_id"],
                             ascending=[True, False, True], kind="stable")
              .groupby("cluster", sort=False).head(n_per_cluster))
        return pa.table({"vec_id": df["vec_id"].to_numpy(np.int64),
                         "cluster": df["cluster"].to_numpy(np.int64),
                         "dist2": df["dist2"].to_numpy(np.int64)})

    pruned = qds.map_batches(score_prune, batch_format="pyarrow")

    def rank_block(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.schema([("cluster", pa.int64()), ("rank", pa.int64()),
                              ("vec_id", pa.int64()),
                              ("dist2", pa.int64())]).empty_table()
        df = b.to_pandas().sort_values(["cluster", "dist2", "vec_id"],
                                       ascending=[True, False, True],
                                       kind="stable")
        rank = df.groupby("cluster", sort=False).cumcount().to_numpy() + 1
        df = df.assign(rank=rank)
        df = df[df["rank"] <= n_per_cluster]
        return pa.table({"cluster": df["cluster"].to_numpy(np.int64),
                         "rank": df["rank"].to_numpy(np.int64),
                         "vec_id": df["vec_id"].to_numpy(np.int64),
                         "dist2": df["dist2"].to_numpy(np.int64)})

    return reduce_blocks(pruned, ["cluster"], rank_block)


def kmeans_outliers_sql(n_per_cluster: int = 5, k: int = DEFAULT_K,
                        iters: int = DEFAULT_ITERS) -> str:
    """Full-distance ranking against the unrolled Lloyd's fixed point:
    embedding_kmeans_sql's CTE chain extended with the exact int64
    ||q - c||^2 per (vec, assigned centroid); same DESC/vec_id tie rule
    as the engine."""
    ctes = _kmeans_ctes(k, iters)
    ctes.append("""asg AS (
        SELECT vec_id, cluster FROM df
        QUALIFY row_number() OVER (PARTITION BY vec_id
                                   ORDER BY score, cluster) = 1)""")
    ctes.append(f"""dist AS (
        SELECT a.vec_id, a.cluster,
               SUM((q.q - c.c) * (q.q - c.c)) AS dist2
        FROM asg a
        JOIN q USING (vec_id)
        JOIN c{iters} c ON c.cluster = a.cluster AND c.dim = q.dim
        GROUP BY a.vec_id, a.cluster)""")
    return ("WITH " + ",\n".join(ctes) + f"""
        SELECT cluster,
               CAST(row_number() OVER (PARTITION BY cluster
                                       ORDER BY dist2 DESC, vec_id)
                    AS BIGINT) AS rank,
               vec_id, CAST(dist2 AS BIGINT) AS dist2
        FROM dist
        QUALIFY rank <= {n_per_cluster}""")
