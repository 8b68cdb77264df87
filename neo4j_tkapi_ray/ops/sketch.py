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
