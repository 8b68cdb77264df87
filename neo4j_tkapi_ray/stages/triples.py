"""Stage [3] — triple / mention emission: stateless map_batches.

Per-document, order-aware (interruption A->B->A scan runs inside the batch
fn over the doc's own ordered sequence — fragments of one document never
cross block boundaries because the whole doc is one row).

Failed rows (extraction errors carried through stage [2]) are emitted as
``pred='_FAILED'`` rows so a single output stream carries both the graph and
the dead-letter channel; the materialize stage splits them into the failed
sidecar (mirrors the reference's failed_items ledger,
checkpoint_manager.py:335-339).
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data as rd

from .. import schemas
from ..emit import emit_doc

FAILED_PRED = "_FAILED"


def _empty(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()


def triples_batch(batch: pa.Table) -> pa.Table:
    rows = []
    for url, warc_ts, err, doc_json in zip(
            batch.column("url").to_pylist(), batch.column("warc_ts").to_pylist(),
            batch.column("error").to_pylist(), batch.column("doc").to_pylist()):
        if err is not None or doc_json is None:
            rows.append({"subj": url, "pred": FAILED_PRED, "obj": err or "unknown",
                         "subj_label": "Page", "obj_label": "Error", "url": url,
                         "warc_ts": warc_ts, "score": 0.0, "provenance": "failed_row"})
            continue
        tr, _ = emit_doc(json.loads(doc_json), url, warc_ts)
        rows.extend(tr)
    if not rows:
        return _empty(schemas.TRIPLES)
    return pa.Table.from_pylist(rows, schema=schemas.TRIPLES)


def mentions_batch(batch: pa.Table) -> pa.Table:
    rows = []
    for url, warc_ts, err, doc_json in zip(
            batch.column("url").to_pylist(), batch.column("warc_ts").to_pylist(),
            batch.column("error").to_pylist(), batch.column("doc").to_pylist()):
        if err is not None or doc_json is None:
            continue
        _, mn = emit_doc(json.loads(doc_json), url, warc_ts)
        rows.extend(mn)
    if not rows:
        return _empty(schemas.MENTIONS)
    return pa.Table.from_pylist(rows, schema=schemas.MENTIONS)


def analysis_batch(batch: pa.Table) -> pa.Table:
    from ..emit import emit_analysis_rows
    rows = []
    for url, warc_ts, err, doc_json in zip(
            batch.column("url").to_pylist(), batch.column("warc_ts").to_pylist(),
            batch.column("error").to_pylist(), batch.column("doc").to_pylist()):
        if err is not None or doc_json is None:
            continue
        rows.extend(emit_analysis_rows(json.loads(doc_json), url, warc_ts))
    if not rows:
        return _empty(schemas.ANALYSIS)
    return pa.Table.from_pylist(rows, schema=schemas.ANALYSIS)


def to_triples(linked: rd.Dataset) -> rd.Dataset:
    return linked.map_batches(triples_batch, batch_format="pyarrow")


def to_mentions(linked: rd.Dataset) -> rd.Dataset:
    return linked.map_batches(mentions_batch, batch_format="pyarrow")


def to_analysis(linked: rd.Dataset) -> rd.Dataset:
    """A2/A3 analysis rows from linked docs (stateless map stage)."""
    return linked.map_batches(analysis_batch, batch_format="pyarrow")
