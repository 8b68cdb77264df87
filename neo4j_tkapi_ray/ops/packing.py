"""Sequence packing: greedy token-budget packing of documents into
context-window packs, shard-local.

The LLM-training preprocessing step this models: concatenate documents
into fixed-size context windows ("sequence packing") so training batches
carry minimal padding. At 100 TB a GLOBAL greedy pack is a sequential fold
over the whole corpus — unshardable by construction — so real pipelines
pack within a shard (a file / row-group range) and never across shards.
That is the semantics here: shards are fixed doc_id ranges
(``doc_id // shard_docs``), so shard assignment is computable at the scan
with no global pass, every shard packs independently (embarrassingly
parallel), and adding new shards never repacks old ones (resumable).

Greedy fold per shard, docs in doc_id order: a doc whose tokens no longer
fit the remaining window budget starts a new pack; a doc longer than the
window occupies a pack of its own. Token counts are the whitespace
tokenization shared with ops/textstats.token_counts (same RE2 class both
engine- and oracle-side).

Scale shape: one tokenize map (Arrow kernels, zero-copy) + one exchange by
shard_id; the per-shard fold is O(shard_docs) Python over a bounded group
(64 docs default) — the fold IS the semantics (a non-associative reset
scan), and bounding it to a shard is what makes it distributable at all.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..exchange import grouped_apply
from .textstats import _WS, ws_strip

DEFAULT_WINDOW = 1024
DEFAULT_SHARD_DOCS = 64

_EMPTY = {"doc_id": "int64", "shard_id": "int64", "pack_id": "int64",
          "n_tokens": "int64"}


def _tokenized(sf_dir: str, shard_docs: int) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        trimmed = ws_strip(batch.column("text"))
        toks = pc.split_pattern_regex(trimmed, _WS)
        n_tokens = pc.list_value_length(toks).cast(pa.int64())
        n_tokens = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0),
                              pa.scalar(0, pa.int64()), n_tokens)
        doc_id = batch.column("doc_id")
        shard = pc.divide(doc_id, pa.scalar(shard_docs, pa.int64()))
        return pa.table({"doc_id": doc_id,
                         "shard_id": shard.cast(pa.int64()),
                         "n_tokens": n_tokens})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def _pack_shard_kernel(df: pd.DataFrame, window: int) -> pd.DataFrame:
    """One shard's greedy reset fold — sequential by definition, bounded by
    shard_docs rows; doc_id // shard_docs guarantees co-location."""
    if df.empty:
        return pd.DataFrame({c: pd.Series(dtype=t)
                             for c, t in _EMPTY.items()})
    df = df.sort_values("doc_id", kind="stable")
    toks = df["n_tokens"].to_numpy()
    packs = np.zeros(len(toks), dtype=np.int64)
    fill, pack = 0, 0
    for i, t in enumerate(toks):
        if i > 0 and fill + t > window:
            pack += 1
            fill = 0
        fill += t
        packs[i] = pack
    return pd.DataFrame({"doc_id": df["doc_id"].to_numpy(),
                         "shard_id": df["shard_id"].to_numpy(),
                         "pack_id": packs,
                         "n_tokens": toks})


def pack_sequences(sf_dir: str, window: int = DEFAULT_WINDOW,
                   shard_docs: int = DEFAULT_SHARD_DOCS) -> rd.Dataset:
    """(doc_id, shard_id, pack_id, n_tokens): greedy shard-local packing.

    ``pack_id`` is 0-based within the shard; ``(shard_id, pack_id)`` is the
    global pack key.
    """
    return grouped_apply(_tokenized(sf_dir, shard_docs), ["shard_id"],
                         lambda df: _pack_shard_kernel(df, window))


def pack_stats(sf_dir: str, window: int = DEFAULT_WINDOW,
               shard_docs: int = DEFAULT_SHARD_DOCS) -> rd.Dataset:
    """Per-pack rollup: (shard_id, pack_id, n_docs, pack_tokens,
    fill_micro) where fill_micro = pack_tokens * 1e6 // window (integer
    fill ratio in micro-units — exact on both engine and oracle sides,
    unlike a float division).

    The rollup runs INSIDE the per-shard packing kernel (same single
    exchange as pack_sequences): a post-hoc map over pack_sequences output
    would silently double-count whenever Ray's dynamic block slicing split
    one shard's rows across batches."""
    def pack_and_rollup(df: pd.DataFrame) -> pd.DataFrame:
        packed = _pack_shard_kernel(df, window)
        if packed.empty:
            return pd.DataFrame({
                "shard_id": pd.Series(dtype="int64"),
                "pack_id": pd.Series(dtype="int64"),
                "n_docs": pd.Series(dtype="int64"),
                "pack_tokens": pd.Series(dtype="int64"),
                "fill_micro": pd.Series(dtype="int64")})
        g = (packed.groupby(["shard_id", "pack_id"], sort=False)["n_tokens"]
             .agg(["size", "sum"]).reset_index())
        return pd.DataFrame({
            "shard_id": g["shard_id"].to_numpy(np.int64),
            "pack_id": g["pack_id"].to_numpy(np.int64),
            "n_docs": g["size"].to_numpy(np.int64),
            "pack_tokens": g["sum"].to_numpy(np.int64),
            "fill_micro": (g["sum"].to_numpy(np.int64) * 1_000_000
                           // window)})

    return grouped_apply(_tokenized(sf_dir, shard_docs), ["shard_id"],
                         pack_and_rollup)


def pack_sequences_sql(window: int = DEFAULT_WINDOW,
                       shard_docs: int = DEFAULT_SHARD_DOCS) -> str:
    """DuckDB oracle: the same greedy fold as a recursive CTE stepping one
    doc per shard per iteration (depth bounded by shard_docs). Reads the
    driver-registered ``documents`` view."""
    return f"""
        WITH RECURSIVE d AS (
            SELECT doc_id, doc_id // {shard_docs} AS shard_id,
                   CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g')
                             = '' THEN 0
                        ELSE len(string_split_regex(
                                 regexp_replace(text, '^\\s+|\\s+$', '',
                                                'g'), '\\s+')) END
                       AS n_tokens,
                   row_number() OVER (PARTITION BY doc_id // {shard_docs}
                                      ORDER BY doc_id) AS idx
            FROM documents
        ), r AS (
            SELECT shard_id, idx, doc_id, n_tokens,
                   n_tokens AS fill, CAST(0 AS BIGINT) AS pack_id
            FROM d WHERE idx = 1
            UNION ALL
            SELECT d.shard_id, d.idx, d.doc_id, d.n_tokens,
                   CASE WHEN r.fill + d.n_tokens > {window}
                        THEN d.n_tokens ELSE r.fill + d.n_tokens END,
                   CASE WHEN r.fill + d.n_tokens > {window}
                        THEN r.pack_id + 1 ELSE r.pack_id END
            FROM r JOIN d ON d.shard_id = r.shard_id AND d.idx = r.idx + 1
        )
        SELECT doc_id, shard_id, pack_id, n_tokens FROM r
    """


def pack_stats_sql(window: int = DEFAULT_WINDOW,
                   shard_docs: int = DEFAULT_SHARD_DOCS) -> str:
    return f"""
        WITH packed AS ({pack_sequences_sql(window, shard_docs)})
        SELECT shard_id, pack_id,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens,
               CAST(SUM(n_tokens) AS BIGINT) * 1000000 // {window}
                   AS fill_micro
        FROM packed GROUP BY shard_id, pack_id
    """


DEFAULT_CHUNK_WINDOW = 32
DEFAULT_CHUNK_STRIDE = 24

_CHUNK_EMPTY = pa.schema([("doc_id", pa.int64()), ("chunk_id", pa.int64()),
                          ("start_tok", pa.int64()),
                          ("n_chunk_tokens", pa.int64()),
                          ("chunk_text", pa.string())])


def chunk_documents(sf_dir: str, window: int = DEFAULT_CHUNK_WINDOW,
                    stride: int = DEFAULT_CHUNK_STRIDE) -> rd.Dataset:
    """Sliding token-window chunking: split each document's whitespace
    tokens into overlapping chunks of ``window`` tokens every ``stride``
    tokens — the context-window chunking step of LLM training prep (long
    documents become several training sequences with ``window - stride``
    tokens of overlap).

    Chunk ``k`` spans tokens ``[k*stride, k*stride + window)`` and exists
    iff ``k*stride < n_tokens`` (so every token lands in >=1 chunk and no
    empty chunks are emitted; empty documents produce no rows).
    ``chunk_text`` re-joins the token slice with single spaces — both the
    engine (``binary_join``) and the oracle (``array_to_string``) perform
    the same join, so whitespace inside the original text never has to
    round-trip.

    Columns: ``doc_id, chunk_id, start_tok, n_chunk_tokens, chunk_text``.

    Scale shape: map-only fan-out (no exchange); output rows ~= n_tokens /
    stride per doc. The per-batch loop is over CHUNK ORDINALS (max
    ceil(max_tokens/stride) iterations, each fully vectorized over every
    doc long enough: mask -> filter -> ``list_slice`` -> ``binary_join``),
    never over rows. The slice bounds are the same for all docs at a given
    ordinal, which is what makes the scalar-bound ``list_slice`` kernel
    usable — the classic loop-over-the-short-axis trick.
    """
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        trimmed = ws_strip(batch.column("text").combine_chunks())
        toks = pc.split_pattern_regex(trimmed, _WS)
        n = pc.list_value_length(toks).cast(pa.int64())
        n = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0),
                       pa.scalar(0, pa.int64()), n)
        n_np = n.to_numpy(zero_copy_only=False)
        doc_id = batch.column("doc_id").combine_chunks()
        out: list[pa.Table] = []
        max_k = int(-(-n_np.max() // stride)) if len(n_np) else 0
        for k in range(max_k):
            start = k * stride
            mask = n_np > start
            if not mask.any():
                break
            pamask = pa.array(mask)
            sub_toks = toks.filter(pamask)
            sub_n = n_np[mask]
            sliced = pc.list_slice(sub_toks, start, start + window)
            m = int(mask.sum())
            out.append(pa.table({
                "doc_id": doc_id.filter(pamask),
                "chunk_id": pa.array(np.full(m, k, np.int64)),
                "start_tok": pa.array(np.full(m, start, np.int64)),
                "n_chunk_tokens": pa.array(
                    np.minimum(window, sub_n - start).astype(np.int64)),
                "chunk_text": pc.binary_join(sliced, " "),
            }))
        if not out:
            return _CHUNK_EMPTY.empty_table()
        return pa.concat_tables(out)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def chunk_documents_sql(window: int = DEFAULT_CHUNK_WINDOW,
                        stride: int = DEFAULT_CHUNK_STRIDE) -> str:
    """DuckDB oracle: unnest chunk ordinals per doc, 1-based inclusive list
    slice + array_to_string — same join-with-space semantics as the engine
    kernel. Reads the driver-registered ``documents`` view."""
    return f"""
        WITH t AS (
            SELECT doc_id,
                   string_split_regex(
                       regexp_replace(text, '^\\s+|\\s+$', '', 'g'),
                       '\\s+') AS toks,
                   CASE WHEN regexp_replace(text, '^\\s+|\\s+$', '', 'g')
                             = '' THEN 0
                        ELSE len(string_split_regex(
                                 regexp_replace(text, '^\\s+|\\s+$', '',
                                                'g'), '\\s+')) END AS n
            FROM documents
        ), k AS (
            SELECT doc_id, toks, n,
                   unnest(range(0, (n + {stride} - 1) // {stride}))
                       AS chunk_id
            FROM t WHERE n > 0
        )
        SELECT doc_id, chunk_id,
               chunk_id * {stride} AS start_tok,
               least({window}, n - chunk_id * {stride}) AS n_chunk_tokens,
               array_to_string(
                   toks[chunk_id * {stride} + 1 :
                        chunk_id * {stride} + {window}], ' ') AS chunk_text
        FROM k
    """
