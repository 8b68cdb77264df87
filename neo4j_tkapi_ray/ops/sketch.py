"""Probabilistic sketches over the event stream.

HyperLogLog (Flajolet et al. 2007) is THE sketch a 100-TB pipeline uses
for distinct counts: the exact COUNT(DISTINCT) in
``ops/relational.distinct_users_per_event_type`` must move one row per
distinct (type, user) pair across the exchange — at web scale that is the
cardinality itself.  The HLL register table is O(m) per group *no matter
how many distinct values exist*: per-batch partial registers (a max is
idempotent and order-independent) → one tiny exchange → per-block max.

Everything here is made hash-gate EXACT (bit-identical to the DuckDB
oracle at any partitioning):

  * the hash is md5 of the decimal value string — both sides share it
    (DuckDB ``md5(CAST(user_id AS VARCHAR))``); bucket/rho are derived
    from the HEX STRING on both sides so no binary conversion can differ;
  * rho is capped at ``RHO_CAP`` (41) so the harmonic-mean denominator
    ``sum(2^(RHO_CAP - rho))`` is an exact int64 SUM (≤ m·2^41 = 2^49) —
    order-independent integer addition, the same trick as the integer
    micro-unit PageRank (a float ``sum(2^-rho)`` could round differently
    under a different association). The cap biases only registers with
    >41 leading zero bits (P ≈ 2^-41 per insert) — real HLLs cap the
    register width anyway (6 bits → 64);
  * the estimate is one DOUBLE expression evaluated in the identical
    left-to-right association on both sides, then rounded half-away 3dp.

Reference parity: the reference engine has no sketches (it counts in
Neo4j/Cypher); this family is part of the training-data toolkit the task
brief asks for beyond reference coverage.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..exchange import reduce_blocks

P_BITS = 8                 # 2^8 = 256 registers per group
M = 1 << P_BITS
RHO_CAP = 41               # keeps sum(2^(cap - rho)) an exact int64
_HEXLZ = {c: lz for c, lz in zip("0123456789abcdef",
                                 [4, 3, 2, 2, 1, 1, 1, 1, 0, 0, 0, 0,
                                  0, 0, 0, 0])}


def _bucket_rho(value: str) -> tuple[int, int]:
    """(bucket, rho) from md5(value): bucket = first 2 hex chars, rho =
    1 + leading zero BITS of the next 14 hex chars (56 bits), capped.
    String-domain arithmetic so the DuckDB mirror (strpos/ltrim on the
    same md5 hex) is identical by construction."""
    hx = hashlib.md5(value.encode()).hexdigest()
    bucket = int(hx[:2], 16)
    tail = hx[2:16]
    stripped = tail.lstrip("0")
    if not stripped:
        rho = 4 * 14 + 1
    else:
        zeros_hex = len(tail) - len(stripped)
        rho = 4 * zeros_hex + _HEXLZ[stripped[0]] + 1
    return bucket, min(rho, RHO_CAP)


def hll_registers(sf_dir: str) -> rd.Dataset:
    """Per-(event_type, bucket) HLL register table over distinct users.

    Scale shape: each batch inserts its rows into a LOCAL register dict
    (the md5 per distinct user IS the sketch's insert kernel) and emits at
    most #types × 256 partial rows; one event_type exchange and a
    vectorized per-block max finish. Row traffic is O(m × blocks),
    independent of the number of distinct users — the entire point of the
    sketch vs the exact COUNT(DISTINCT) exchange.
    """
    ev = rd.read_parquet(f"{sf_dir}/events.parquet",
                         columns=["event_type", "user_id"])

    def partial(b: pa.Table) -> pa.Table:
        et = b.column("event_type").to_pylist()
        uid = b.column("user_id").to_pylist()
        regs: dict[tuple[str, int], int] = {}
        seen: set[tuple[str, int]] = set()
        for t, u in zip(et, uid):
            if (t, u) in seen:          # batch-local distinct first
                continue
            seen.add((t, u))
            bucket, rho = _bucket_rho(str(u))
            k = (t, bucket)
            if rho > regs.get(k, 0):
                regs[k] = rho
        if not regs:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "bucket": pa.array([], pa.int64()),
                             "max_rho": pa.array([], pa.int64())})
        keys = sorted(regs)
        return pa.table({
            "event_type": pa.array([k[0] for k in keys], pa.string()),
            "bucket": pa.array([k[1] for k in keys], pa.int64()),
            "max_rho": pa.array([regs[k] for k in keys], pa.int64())})

    partials = ev.map_batches(partial, batch_format="pyarrow",
                              zero_copy_batch=True)

    def block_max(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"event_type": pd.Series(dtype="object"),
                                 "bucket": pd.Series(dtype="int64"),
                                 "max_rho": pd.Series(dtype="int64")})
        g = (df.groupby(["event_type", "bucket"], sort=False)["max_rho"]
             .max().reset_index())
        return g.astype({"bucket": "int64", "max_rho": "int64"})

    return reduce_blocks(partials, ["event_type"], block_max,
                         batch_format="pandas", coalesce_rows=None)


def hll_distinct_users(sf_dir: str) -> rd.Dataset:
    """HLL distinct-user estimate per event_type from the register table.

    E_raw = alpha_m · m² / Σ_j 2^(-M_j); with the rho cap the denominator
    is carried as the exact int64 Σ 2^(RHO_CAP − M_j) (absent registers
    contribute 2^RHO_CAP). Small-range correction m·ln(m/V) applied when
    V > 0 and E_raw ≤ 2.5m, exactly as in the paper. The registers table
    is ≤ 256 rows per type, so the estimate block is trivially bounded.
    """
    regs = hll_registers(sf_dir)

    def estimate(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"event_type": pd.Series(dtype="object"),
                              "n_registers": pd.Series(dtype="int64"),
                              "hll_estimate": pd.Series(dtype="float64")})
        if df.empty:
            return empty
        rows = []
        for t, g in df.groupby("event_type", sort=False):
            npres = len(g)
            s = int(np.left_shift(
                np.int64(1), RHO_CAP - g["max_rho"].to_numpy()).sum())
            s += (M - npres) * (1 << RHO_CAP)
            alpha = 0.7213 / (1.0 + 1.079 / 256.0)
            e = alpha * 256.0 * 256.0 * float(1 << RHO_CAP) / float(s)
            v = M - npres
            if v > 0 and e <= 2.5 * 256.0:
                e = 256.0 * math.log(256.0 / v)
            rows.append((t, npres, np.floor(e * 1e3 + 0.5) / 1e3))
        out = pd.DataFrame(rows, columns=["event_type", "n_registers",
                                          "hll_estimate"])
        return out.astype({"n_registers": "int64",
                           "hll_estimate": "float64"})

    return reduce_blocks(regs, ["event_type"], estimate,
                         batch_format="pandas", coalesce_rows=None)


def hll_sql(table: str = "events", key: str = "user_id",
            group: str = "event_type") -> tuple[str, str]:
    """Render the DuckDB mirror (registers CTE, estimate SELECT) from the
    same constants, so engine and oracle cannot drift."""
    regs = f"""
        WITH hx AS (
            SELECT {group} AS grp,
                   md5(CAST({key} AS VARCHAR)) AS h
            FROM (SELECT DISTINCT {group}, {key} FROM {table})),
        br AS (
            SELECT grp,
                   (strpos('0123456789abcdef', substr(h, 1, 1)) - 1) * 16
                   + (strpos('0123456789abcdef', substr(h, 2, 1)) - 1)
                       AS bucket,
                   substr(h, 3, 14) AS tail
            FROM hx),
        rho AS (
            SELECT grp, bucket,
                   CASE WHEN tail = repeat('0', 14) THEN {4 * 14 + 1}
                        ELSE 4 * (14 - length(ltrim(tail, '0')))
                             + CASE substr(ltrim(tail, '0'), 1, 1)
                                    WHEN '1' THEN 3
                                    WHEN '2' THEN 2 WHEN '3' THEN 2
                                    WHEN '4' THEN 1 WHEN '5' THEN 1
                                    WHEN '6' THEN 1 WHEN '7' THEN 1
                                    ELSE 0 END + 1
                   END AS raw_rho
            FROM br),
        reg AS (
            SELECT grp, bucket,
                   MAX(LEAST(raw_rho, {RHO_CAP})) AS max_rho
            FROM rho GROUP BY grp, bucket)
    """
    est = f"""
        agg AS (
            SELECT grp,
                   CAST(COUNT(*) AS BIGINT) AS npres,
                   SUM(CAST(1 AS BIGINT) << ({RHO_CAP} - max_rho))
                       + (256 - COUNT(*)) * (CAST(1 AS BIGINT) << {RHO_CAP})
                       AS s
            FROM reg GROUP BY grp)
        SELECT grp AS event_type,
               npres AS n_registers,
               ROUND(CASE WHEN npres < 256
                          AND (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0
                              * 256.0 * CAST(CAST(1 AS BIGINT) << {RHO_CAP}
                                             AS DOUBLE) / CAST(s AS DOUBLE)
                              <= 2.5 * 256.0
                     THEN 256.0 * ln(256.0 / (256 - npres))
                     ELSE (0.7213 / (1.0 + 1.079 / 256.0)) * 256.0 * 256.0
                          * CAST(CAST(1 AS BIGINT) << {RHO_CAP} AS DOUBLE)
                          / CAST(s AS DOUBLE)
                     END, 3) AS hll_estimate
        FROM agg
    """
    return regs, est


# ---------------------------------------------------------------------------
# Count-min sketch (Cormode & Muthukrishnan 2005)
# ---------------------------------------------------------------------------

CMS_DEPTH = 4
CMS_WIDTH = 512


def _cms_bucket(row: int, token: str) -> int:
    """Bucket for (row, token): first 4 hex chars of md5('row:token') mod
    width — string-domain so the DuckDB mirror (strpos arithmetic on the
    same md5 hex) is identical by construction."""
    hx = hashlib.md5(f"{row}:{token}".encode()).hexdigest()
    return int(hx[:4], 16) % CMS_WIDTH


def cms_token_counts(sf_dir: str, probe_k: int = 20) -> "pa.Table":
    """Count-min sketch over token OCCURRENCES, reported as (token,
    true_count, cms_estimate) for the ``probe_k`` most frequent tokens —
    the heavy-hitter frequency table a 100-TB run reads from O(d·w)
    registers instead of a vocabulary-sized exact count (CMS estimates
    overcount only: estimate ≥ truth, within εN w.h.p.).

    Scale shape: each batch folds its token counts into a LOCAL d×w
    register array (md5 per DISTINCT token per batch — the sketch insert
    kernel) and emits ≤ d·w partial rows; one register exchange sums them.
    The register table (d·w = 2048 rows, corpus-independent) and the
    probe top-k (≤ k×P partial-top-k rows, the oov_rate discipline) are
    the ONLY driver-side data. Tokenization is the sampling module's
    shared kernel, so the oracle's string_split_regex mirror applies.
    """
    from .sampling import _doc_tokens

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    _empty_tc = pa.table({"token": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})

    def batch_counts(b: pa.Table) -> pa.Table:
        _, flat = _doc_tokens(b)
        if flat is None:
            return _empty_tc
        g = pa.table({"token": flat}).group_by("token").aggregate(
            [("token", "count")])
        return pa.table({"token": g.column("token"),
                         "c": g.column("token_count").cast(pa.int64())})

    counts = docs.map_batches(batch_counts, batch_format="pyarrow",
                              zero_copy_batch=True)

    # --- registers: local d×w fold per batch, one exchange, block sums
    def reg_partial(b: pa.Table) -> pa.Table:
        toks = b.column("token").to_pylist()
        cs = b.column("c").to_numpy(zero_copy_only=False)
        reg = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
        for t, c in zip(toks, cs):
            for i in range(CMS_DEPTH):
                reg[i, _cms_bucket(i, t)] += int(c)
        rows, buckets = np.nonzero(reg)
        return pa.table({"row": pa.array(rows.astype(np.int64)),
                         "bucket": pa.array(buckets.astype(np.int64)),
                         "s": pa.array(reg[rows, buckets])})

    def reg_sum(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"row": pd.Series(dtype="int64"),
                                 "bucket": pd.Series(dtype="int64"),
                                 "s": pd.Series(dtype="int64")})
        g = (df.groupby(["row", "bucket"], sort=False)["s"].sum()
             .reset_index())
        return g.astype({"row": "int64", "bucket": "int64", "s": "int64"})

    registers = reduce_blocks(
        counts.map_batches(reg_partial, batch_format="pyarrow"),
        ["row"], reg_sum, batch_format="pandas", coalesce_rows=None)

    # --- exact probe top-k (count desc, token asc): token exchange gives
    # exact per-token counts in-block; per-block partial top-k bounds the
    # driver merge at k rows per partition
    def block_topk(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"token": pd.Series(dtype="object"),
                                 "c": pd.Series(dtype="int64")})
        g = df.groupby("token", sort=False)["c"].sum().reset_index()
        g = g.sort_values(["c", "token"], ascending=[False, True],
                          kind="mergesort").head(probe_k)
        return g.astype({"c": "int64"})

    probe_parts = reduce_blocks(counts, ["token"], block_topk,
                                batch_format="pandas", coalesce_rows=None)
    probe = (probe_parts.to_pandas()
             .sort_values(["c", "token"], ascending=[False, True],
                          kind="mergesort").head(probe_k))

    # registers are d×w rows, corpus-independent — bounded driver read
    reg_df = registers.to_pandas()
    reg = np.zeros((CMS_DEPTH, CMS_WIDTH), dtype=np.int64)
    reg[reg_df["row"].to_numpy(), reg_df["bucket"].to_numpy()] = \
        reg_df["s"].to_numpy()

    est = [int(min(reg[i, _cms_bucket(i, t)] for i in range(CMS_DEPTH)))
           for t in probe["token"]]
    return pa.table({"token": pa.array(probe["token"].to_numpy(),
                                       pa.string()),
                     "true_count": pa.array(
                         probe["c"].to_numpy().astype(np.int64)),
                     "cms_estimate": pa.array(np.array(est, np.int64))})


def cms_sql(probe_k: int = 20) -> str:
    """DuckDB mirror rendered from the same constants: identical
    md5('row:token') 4-hex-char bucket, register sums, probe top-k and
    min-over-rows estimate."""
    hexpos = "(strpos('0123456789abcdef', substr(h, {k}, 1)) - 1)"
    val4 = " + ".join(f"{hexpos.format(k=k)} * {16 ** (4 - k)}"
                      for k in range(1, 5))
    rows_vals = ", ".join(f"({i})" for i in range(CMS_DEPTH))
    return f"""
        WITH d AS (
            SELECT regexp_replace(lower(text), '^\\s+|\\s+$', '', 'g') AS t
            FROM documents),
        toks AS (
            SELECT unnest(string_split_regex(t, '\\s+')) AS token
            FROM d WHERE t <> ''),
        tc AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS c
               FROM toks GROUP BY token),
        rows_t(i) AS (VALUES {rows_vals}),
        hx AS (
            SELECT r.i, tc.token, tc.c,
                   md5(CAST(r.i AS VARCHAR) || ':' || tc.token) AS h
            FROM tc CROSS JOIN rows_t r),
        bk AS (SELECT i, c, ({val4}) % {CMS_WIDTH} AS b FROM hx),
        reg AS (SELECT i, b, SUM(c) AS s FROM bk GROUP BY i, b),
        probe AS (SELECT token, c FROM tc
                  ORDER BY c DESC, token LIMIT {probe_k}),
        pb AS (
            SELECT p.token, p.c, r.i,
                   md5(CAST(r.i AS VARCHAR) || ':' || p.token) AS h
            FROM probe p CROSS JOIN rows_t r),
        pbk AS (SELECT token, c, i, ({val4}) % {CMS_WIDTH} AS b FROM pb)
        SELECT pbk.token,
               pbk.c AS true_count,
               CAST(MIN(reg.s) AS BIGINT) AS cms_estimate
        FROM pbk JOIN reg ON reg.i = pbk.i AND reg.b = pbk.b
        GROUP BY pbk.token, pbk.c
    """
