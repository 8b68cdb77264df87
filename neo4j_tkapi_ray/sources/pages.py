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
