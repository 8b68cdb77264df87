"""Single-process oracle: the reference pipeline semantics executed item-at-
a-time, exactly like /root/reference runs them (vlos_pipeline.py:39-235 per
document, sequential loop over documents like vlos_neo4j_loader.py:603-663).

Used ONLY by pytest / bench as the ground-truth side of the triple-set P/R
gate and the byte-identity text check — never on the Ray hot path. It shares
the semantic kernels (parsing.py, linking.py, emit.py) with the Ray stages;
what it does NOT share is any of the distributed execution: this is the
"would a single careful process produce the same graph?" check for the
Ray pipeline's batching, actor pooling, shuffling and dedup.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import pyarrow.parquet as pq

from .config import EngineConfig
from .emit import emit_doc
from .linking import Linker, RegistryIndex, link_doc
from .parsing import parse_page


def run_oracle_full(pages_path: str, registry_dir: str,
                    cfg: Optional[EngineConfig] = None, lang: str = "nl"
                    ) -> Dict[str, object]:
    """Run the full oracle over a pages parquet file/dir.

    Returns a dict with keys ``triples, mentions, text_by_url, failed,
    analysis, docs`` where ``docs`` is one row per processed page row
    (url, warc_ts, text, error) and ``analysis`` the A2/A3 analysis rows.
    Duplicate urls keep the row with the greatest warc_ts for text
    (last-write-wins, mirroring MERGE ``SET n +=`` at helpers.py:13-27).
    """
    import os

    from .emit import emit_analysis_rows

    cfg = cfg or EngineConfig.default()
    idx = RegistryIndex.from_parquet_dir(registry_dir)
    linker = Linker(idx, cfg)
    proc_types = cfg.processing.procedural_activity_types

    if os.path.isdir(pages_path):
        files = sorted(os.path.join(pages_path, f) for f in os.listdir(pages_path)
                       if f.endswith(".parquet"))
    else:
        files = [pages_path]
    pages: List[dict] = []
    for f in files:
        pages.extend(pq.read_table(f).to_pylist())
    pages.sort(key=lambda r: (r["url"], r["warc_ts"]))

    triples: List[dict] = []
    mentions: List[dict] = []
    analysis: List[dict] = []
    docs: List[dict] = []
    text_by_url: Dict[str, str] = {}
    failed: List[str] = []

    for row in pages:
        if row["lang"] != lang:
            continue
        try:
            doc = parse_page(row["html"], proc_types)
        except Exception as e:  # noqa: BLE001 — mirror the quarantine path
            failed.append(row["url"])
            docs.append({"url": row["url"], "warc_ts": row["warc_ts"],
                         "text": None, "error": f"{type(e).__name__}: {e}"})
            continue
        text_by_url[row["url"]] = doc["text"]  # later warc_ts wins (sorted)
        docs.append({"url": row["url"], "warc_ts": row["warc_ts"],
                     "text": doc["text"], "error": None})
        linked = link_doc(doc, linker)
        tr, mn = emit_doc(linked, row["url"], row["warc_ts"])
        triples.extend(tr)
        mentions.extend(mn)
        analysis.extend(emit_analysis_rows(linked, row["url"], row["warc_ts"]))

    return {"triples": triples, "mentions": mentions, "text_by_url": text_by_url,
            "failed": failed, "analysis": analysis, "docs": docs}


def run_oracle(pages_path: str, registry_dir: str,
               cfg: Optional[EngineConfig] = None, lang: str = "nl"
               ) -> Tuple[List[dict], List[dict], Dict[str, str], List[str]]:
    """Back-compat view of :func:`run_oracle_full`."""
    r = run_oracle_full(pages_path, registry_dir, cfg, lang)
    return r["triples"], r["mentions"], r["text_by_url"], r["failed"]


def triple_set(triples: List[dict]) -> set:
    return {(t["subj"], t["pred"], t["obj"]) for t in triples}


def precision_recall(predicted: set, expected: set) -> Tuple[float, float]:
    if not predicted and not expected:
        return 1.0, 1.0
    tp = len(predicted & expected)
    p = tp / len(predicted) if predicted else 0.0
    r = tp / len(expected) if expected else 0.0
    return p, r
