"""Row-format source adapters: JSONL and CSV readers that land on the SAME
Arrow schema as the parquet documents table, so every downstream operator
(dedup, curation, text stats, packing) is format-agnostic.

Real corpora arrive as gzip'd JSONL (Common-Crawl derivatives, chat dumps)
or CSV exports at least as often as parquet; an engine that only reads
parquet forces a pre-conversion ETL hop. Ray Data's native readers
(``read_json`` / ``read_csv``) already stream and parallelize per file —
these adapters add the schema contract: required columns present, stable
dtypes (int64 ids, string text), and the same column-pruning knob the
parquet path has (JSON/CSV cannot prune at the scan the way parquet row
groups can — the adapter drops columns in the FIRST map so surplus bytes
die before any exchange; at 100 TB, convert to parquet once and keep these
readers for landing-zone ingest).

No reference counterpart (the reference ingests XML over HTTP —
`/root/reference/src` loaders); this is engine-completeness for the
training-data side.
"""

from __future__ import annotations

from typing import List, Optional, Union

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

DOC_FIELDS = {"doc_id": pa.int64(), "text": pa.string(),
              "lang": pa.string(), "source": pa.string(),
              "n_chars": pa.int64()}


def _conform(columns: Optional[List[str]]):
    want = list(columns) if columns else list(DOC_FIELDS)
    missing = [c for c in want if c not in DOC_FIELDS]
    if missing:
        raise ValueError(f"unknown document columns: {missing}")

    def fix(b: pa.Table) -> pa.Table:
        cols = {}
        for c in want:
            typ = DOC_FIELDS[c]
            if c in b.column_names:
                cols[c] = b.column(c).cast(typ)
            elif c == "n_chars" and "text" in b.column_names:
                # derived when the landing format omitted it
                cols[c] = pc.cast(pc.utf8_length(b.column("text")), typ)
            else:
                raise ValueError(f"source batch is missing column {c!r}")
        return pa.table(cols)

    return fix


def read_jsonl_docs(paths: Union[str, List[str]],
                    columns: Optional[List[str]] = None) -> rd.Dataset:
    """Documents from JSON-lines files (one object per line; .jsonl or
    .json accepted, gz transparently via Arrow). Column pruning happens in
    the first map — surplus fields never reach an exchange."""
    ds = rd.read_json(paths, file_extensions=["jsonl", "json", "gz"])
    return ds.map_batches(_conform(columns), batch_format="pyarrow",
                          zero_copy_batch=True)


def read_csv_docs(paths: Union[str, List[str]],
                  columns: Optional[List[str]] = None) -> rd.Dataset:
    """Documents from CSV files (header row required)."""
    ds = rd.read_csv(paths)
    return ds.map_batches(_conform(columns), batch_format="pyarrow",
                          zero_copy_batch=True)
