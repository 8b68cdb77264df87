"""Sources: the pages table and the entity registry.

Replaces the reference's OData readers (S1/S2, document_loader.py:113-129
etc.): server-side ``$filter`` becomes Parquet predicate pushdown; full
in-memory entity lists become either a streamed Dataset (pages) or small
driver-side dimension tables broadcast via the object store (registry).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Union

import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

REGISTRY_TABLES = ["persons", "parties", "sessions", "activities", "cases",
                   "dossiers", "activity_cases", "activity_actors",
                   "reg_documents", "besluiten", "api_stemmingen",
                   "commissies", "zalen", "reserveringen", "toezeggingen",
                   "persoon_functies", "agendapunten", "fractie_zetels",
                   "fractie_zetel_persons", "fractie_zetel_vacatures",
                   "commissie_zetels", "commissie_zetel_persons",
                   "commissie_zetel_vacatures", "document_versies",
                   "zaak_actors", "document_actors"]


def read_pages(paths: Union[str, List[str]], lang: Optional[str] = "nl",
               min_warc_ts=None, include_text: bool = False) -> rd.Dataset:
    """Read the pages table with column pruning + row filters pushed to the
    parquet scan (F1 — replaces OData ``Datum ge``; the pre-extracted
    ``text`` column is dropped by default because the pipeline recomputes
    canonical text from html)."""
    columns = ["url", "warc_ts", "html", "lang"]
    if include_text:
        columns.append("text")
    flt = None
    if lang is not None:
        flt = pc.field("lang") == lang
    if min_warc_ts is not None:
        ts_flt = pc.field("warc_ts") >= min_warc_ts
        flt = ts_flt if flt is None else (flt & ts_flt)
    return rd.read_parquet(paths, columns=columns, filter=flt)


def latest_snapshots(paths: Union[str, List[str]]) -> rd.Dataset:
    """CDX-style crawl dedup: per URL, the LATEST warc_ts and the snapshot
    count — the first operator a web-crawl pipeline runs before any
    content work (the reference's last-write-wins re-crawl handling,
    surfaced as its own queryable table).

    Scale shape: only (url, warc_ts) pairs leave the scan (html/text never
    read — column pruning), partial per-batch max/count combiners run
    BEFORE the url exchange, so the shuffle moves one row per (url, block),
    bounded by distinct urls, not snapshots."""
    import pyarrow as pa

    from ..exchange import reduce_blocks

    ds = rd.read_parquet(paths, columns=["url", "warc_ts"])

    def partial(batch: "pa.Table") -> "pa.Table":
        g = batch.group_by(["url"]).aggregate([("warc_ts", "max"),
                                               ("warc_ts", "count")])
        return pa.table({"url": g.column("url"),
                         "warc_ts": g.column("warc_ts_max"),
                         "n": g.column("warc_ts_count").cast(pa.int64())})

    def final(block: "pa.Table") -> "pa.Table":
        # group_by on an EMPTY block preserves the input schema (incl. the
        # source's exact timestamp unit), so no empty special-case — a
        # hand-built empty table would be the only place a wrong unit could
        # diverge from the data blocks
        g = block.group_by(["url"]).aggregate([("warc_ts", "max"),
                                               ("n", "sum")])
        return pa.table({"url": g.column("url"),
                         "warc_ts": g.column("warc_ts_max"),
                         "n_snapshots": g.column("n_sum").cast(pa.int64())})

    return reduce_blocks(
        ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True),
        ["url"], final)


def snapshot_changes(paths: Union[str, List[str]]) -> rd.Dataset:
    """Per-URL re-crawl change detection (CDC over crawl snapshots): for
    each (url, warc_ts) snapshot, whether its extracted text differs from
    the PREVIOUS snapshot of the same url (a url's first snapshot counts
    as changed). Downstream of `latest_snapshots` this is the second
    standard crawl-ingest question: which re-crawls actually carry new
    content and which can be skipped.

    Scale shape: texts are hashed at the scan (128-bit blake2b), so only
    (url, warc_ts, h1, h2) rows cross the ONE url exchange; the change
    scan is a vectorized sort + shift per partition block. Ordering is by
    warc_ts within url — the corpus generator never emits two snapshots
    of one url at the same timestamp, and the SQL oracle's LAG ordering
    relies on the same invariant."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..exchange import reduce_blocks
    from ..ops.dedup import hash128_array

    ds = rd.read_parquet(paths, columns=["url", "warc_ts", "text"])

    def hash_rows(batch: "pa.Table") -> "pa.Table":
        h1, h2 = hash128_array(batch.column("text"))
        return pa.table({"url": batch.column("url"),
                         "warc_ts": batch.column("warc_ts"),
                         "h1": pa.array(h1, pa.int64()),
                         "h2": pa.array(h2, pa.int64())})

    def scan(df: "pd.DataFrame") -> "pd.DataFrame":
        if df.empty:
            # derive the empty frame from the INPUT block so warc_ts keeps
            # the exact timestamp dtype of the data blocks (a hand-built
            # empty dtype could diverge across partitions)
            out = df.head(0)[["url", "warc_ts"]].copy()
            out["changed"] = pd.Series(dtype="bool")
            return out
        df = df.sort_values(["url", "warc_ts"], kind="mergesort")
        url = df["url"].to_numpy()
        h1 = df["h1"].to_numpy()
        h2 = df["h2"].to_numpy()
        changed = np.ones(len(df), dtype=bool)
        changed[1:] = ((url[1:] != url[:-1]) | (h1[1:] != h1[:-1])
                       | (h2[1:] != h2[:-1]))
        return pd.DataFrame({"url": url, "warc_ts": df["warc_ts"].to_numpy(),
                             "changed": changed})

    hashed = ds.map_batches(hash_rows, batch_format="pyarrow",
                            zero_copy_batch=True)
    return reduce_blocks(hashed, ["url"], scan, batch_format="pandas")


def read_registry_tables(registry_dir: str) -> Dict[str, list]:
    """Load the small registry dimension tables driver-side (python lists —
    the gazetteer index is built from these inside each linker actor).
    Broadcast once with ``ray.put`` by the pipeline. Tables absent from the
    directory (older corpora / partial registries) load as empty."""
    import os
    out = {}
    for name in REGISTRY_TABLES:
        path = f"{registry_dir}/{name}.parquet"
        out[name] = pq.read_table(path).to_pylist() if os.path.exists(path) else []
    return out


def crawl_dir_stats(paths: Union[str, List[str]]) -> rd.Dataset:
    """URL-prefix bucket rollup — the per-directory crawl table web
    curation builds to spot over-crawled sections and dead zones: for each
    first-two-segment URL prefix (e.g. ``/session/s00042``), the page
    count, distinct-URL count and snapshot time span.

    Prefix extraction is RE2 on both sides (Arrow ``extract_regex`` here,
    DuckDB ``regexp_extract`` in the oracle); a non-matching url gets ''
    — DuckDB's no-match value (its regexp_extract never returns NULL), so
    the group keys agree on every input.

    Scale shape: only (url, warc_ts) leave the scan; per-batch partials
    collapse to one row per (prefix, url) per batch BEFORE the prefix
    exchange, so the shuffle is bounded by distinct urls, not snapshots;
    the block reduce computes the distinct-url count where the exchange
    contract guarantees all rows of a prefix are present.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..exchange import reduce_blocks

    ds = rd.read_parquet(paths, columns=["url", "warc_ts"])
    pat = r"^https?://[^/]+(?P<prefix>/[^/]+/[^/]+)"

    def partial(batch: "pa.Table") -> "pa.Table":
        ext = pc.extract_regex(batch.column("url"), pat)
        prefix = pc.fill_null(pc.struct_field(ext, "prefix"), "")
        t = pa.table({"prefix": prefix, "url": batch.column("url"),
                      "warc_ts": batch.column("warc_ts")})
        g = t.group_by(["prefix", "url"]).aggregate(
            [("warc_ts", "min"), ("warc_ts", "max"), ("warc_ts", "count")])
        return pa.table({"prefix": g.column("prefix"), "url": g.column("url"),
                         "ts_min": g.column("warc_ts_min"),
                         "ts_max": g.column("warc_ts_max"),
                         "n": g.column("warc_ts_count").cast(pa.int64())})

    def final(block: "pa.Table") -> "pa.Table":
        g = block.group_by(["prefix"]).aggregate(
            [("n", "sum"), ("url", "count_distinct"),
             ("ts_min", "min"), ("ts_max", "max")])
        return pa.table({"prefix": g.column("prefix"),
                         "n_pages": g.column("n_sum").cast(pa.int64()),
                         "n_urls": g.column("url_count_distinct").cast(pa.int64()),
                         "ts_min": g.column("ts_min_min"),
                         "ts_max": g.column("ts_max_max")})

    return reduce_blocks(ds.map_batches(partial, batch_format="pyarrow",
                                        zero_copy_batch=True),
                         ["prefix"], final)
