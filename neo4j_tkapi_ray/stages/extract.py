"""Stage [1] — extract: pages -> structured docs (stateless map_batches).

html -> canonical text (byte-identical per url, reference M7 semantics) plus
the parsed mention structure, serialized as one JSON doc per row so all
in-document ordering stays inside a single record (SURVEY §2.9: interruption
scan must never see a document split across blocks).

Malformed pages do NOT kill the batch: they flow on as error-tagged rows and
end up in the failed-row sidecar (mirrors item-level error continuation,
reference checkpoint_decorator.py:181-186).
"""

from __future__ import annotations

import json
from typing import List

import pyarrow as pa
import ray.data as rd

from ..config import EngineConfig
from ..parsing import parse_page


def make_extract_fn(procedural_types: List[str]):
    def extract_batch(batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        texts, docs, errors = [], [], []
        for html in htmls:
            try:
                doc = parse_page(html, procedural_types)
                texts.append(doc.pop("text"))
                docs.append(json.dumps(doc, separators=(",", ":")))
                errors.append(None)
            except Exception as e:  # noqa: BLE001 — quarantine, don't crash
                texts.append(None)
                docs.append(None)
                errors.append(f"{type(e).__name__}: {e}")
        return pa.table({
            "url": batch.column("url"),
            "warc_ts": batch.column("warc_ts"),
            "lang": batch.column("lang"),
            "text": pa.array(texts, pa.string()),
            "doc": pa.array(docs, pa.string()),
            "error": pa.array(errors, pa.string()),
        })
    return extract_batch


def extract_docs(pages: rd.Dataset, cfg: EngineConfig) -> rd.Dataset:
    """Stateless task stage: html column is dropped on output (SURVEY §7.5
    risk 6 — wide binary rows must not travel past extraction)."""
    # num_cpus slightly under a full CPU (honest for the lighter parse-only
    # stage) and — deliberately — different remote args than the downstream
    # linker pool, which PREVENTS operator fusion: fused, the extract work
    # would run inside the scarce linker actors; unfused it runs in the
    # elastic task pool on leftover CPUs (~10% end-to-end win)
    return pages.map_batches(
        make_extract_fn(cfg.processing.procedural_activity_types),
        batch_format="pyarrow",
        batch_size=cfg.ray.extract_batch_size,
        zero_copy_batch=True,
        num_cpus=cfg.ray.extract_num_cpus,
    )
