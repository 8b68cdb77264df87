"""End-to-end KG construction pipeline.

Two execution shapes over the same stages:

  * ``kg_triples_stream`` — ONE fused lazy Dataset
    (read -> extract -> link -> triples). No intermediates; the streaming
    executor pipelines all stages with backpressure. Used by entry(),
    queries() and the bench headline.

  * ``run_kg`` — partitioned, checkpointed, resumable run (the analog of the
    reference's ``python src/main.py --resume`` lifecycle, SURVEY §3.1):
    input files are grouped into partitions; each partition streams
    read->extract->link to ``linked/<pid>/`` Parquet, then derives
    triples/mentions/failed from that artifact, and commits an atomic
    lineage manifest. Already-committed partitions are skipped on resume.
    ``finalize_graph`` then runs the global canonicalization shuffle over
    all partitions' triples -> nodes/ + edges/ Parquet.
"""

from __future__ import annotations

import os
import shutil
import time
from typing import Dict, List, Optional, Union

import pyarrow.compute as pc
import ray
import ray.data as rd

from ..config import EngineConfig
from ..sources.pages import read_pages, read_registry_tables
from ..stages.extract import extract_docs
from ..stages.link import link_docs, link_emit_docs
from ..stages.triples import FAILED_PRED, to_mentions, to_triples
from ..stages.canonicalize import canonicalize_edges, canonicalize_nodes
from ..state.manifest import (
    commit_partition,
    partition_input_fingerprint,
    pending_partitions,
    validate_resume_config,
)


def _registry_ref(registry, cfg: Optional[EngineConfig] = None):
    """Build the gazetteer index ONCE on the driver (incl. the scoring
    invariants precompute) and broadcast the finished object — linker
    actors then spend ~1 s less each at spawn (measured: unpickle+index+
    precompute was ~2.2 s per actor at the 40k-session registry)."""
    from ..linking import RegistryIndex, precompute_candidate_invariants
    if isinstance(registry, ray.ObjectRef):
        return registry
    if isinstance(registry, str):
        registry = read_registry_tables(registry)
    if isinstance(registry, dict):
        registry = RegistryIndex(registry)
    if isinstance(registry, RegistryIndex):
        precompute_candidate_invariants(registry, cfg or EngineConfig.default())
        registry = ray.put(registry)
    return registry


def kg_triples_stream(pages_paths, registry, cfg: Optional[EngineConfig] = None,
                      lang: str = "nl") -> rd.Dataset:
    """Fused lazy pipeline: pages -> triples (failed rows tagged _FAILED).
    Uses the fused link+emit actor (stages/link.py LinkEmitActor) — one
    actor-pool hop from parsed docs straight to triple rows.

    ``cfg.ray.gazetteer_shards > 1`` switches the speaker gazetteer to the
    sharded opt-in path (stages/shard_link.py): the parsed docs are
    materialized once, a surface-collection pass over them feeds
    shard-keyed exchanges that resolve distinct speaker names against
    1/n-sized gazetteer shards, and the link stage reuses the same
    materialized docs with the resolved-surface table instead of the
    broadcast gazetteer. Results are bit-identical (oracle-parity test);
    the trade is pinning parsed docs in plasma (spillable) — the price a
    registry too big to broadcast pays."""
    cfg = cfg or EngineConfig.default()
    pages = read_pages(pages_paths, lang=lang)
    docs = extract_docs(pages, cfg)
    if cfg.ray.gazetteer_shards > 1:
        return _link_emit_sharded(docs, registry, cfg)
    return link_emit_docs(docs, _registry_ref(registry, cfg), cfg)


def _link_emit_sharded(docs: rd.Dataset, registry,
                       cfg: EngineConfig) -> rd.Dataset:
    from ..linking import RegistryIndex, precompute_candidate_invariants
    from ..stages.shard_link import speaker_overrides_via_shards
    if isinstance(registry, str):
        registry = read_registry_tables(registry)
    if not isinstance(registry, dict):
        raise TypeError("sharded gazetteer needs the registry tables dict "
                        "or a registry dir (the shard split happens here)")
    # ONE extract pass: the parsed docs are pinned in the object store and
    # reused by both consumers (surface collection, then link+emit) —
    # previously each consumer re-ran the full page parse, the dominant
    # share of the measured ~2.3x sharded overhead. Only the columns both
    # consumers read are pinned (the canonical text — the widest column —
    # is dropped; LinkEmitActor and the surface scan read url/warc_ts/
    # error/doc). Parsed docs are corpus-sized, so this trades plasma/
    # spill space for a second scan; the right trade exactly when this
    # path is on (a registry too big to broadcast — the pages re-parse
    # costs far more than the spill).
    docs = docs.select_columns(["url", "warc_ts", "error", "doc"]) \
        .materialize()
    overrides = speaker_overrides_via_shards(docs, registry["persons"], cfg)
    # the finish index skips the surname gazetteer entirely — that is the
    # broadcast-weight win; the resolution table stands in for it
    index = RegistryIndex(registry, build_gazetteer=False)
    precompute_candidate_invariants(index, cfg)
    return link_emit_docs(docs, ray.put(index), cfg,
                          speaker_overrides=overrides)


def _list_page_files(pages_path: str) -> List[str]:
    if os.path.isdir(pages_path):
        return sorted(os.path.join(pages_path, f) for f in os.listdir(pages_path)
                      if f.endswith(".parquet"))
    return [pages_path]


def make_partitions(pages_path: str, files_per_partition: int = 4) -> Dict[str, List[str]]:
    files = _list_page_files(pages_path)
    return {f"p{i // files_per_partition:05d}": files[i:i + files_per_partition]
            for i in range(0, len(files), files_per_partition)}


def run_kg(pages_path: str, registry_dir: str, out_dir: str,
           cfg: Optional[EngineConfig] = None, lang: str = "nl",
           files_per_partition: int = 4, finalize: bool = True,
           max_partitions: Optional[int] = None) -> dict:
    """Checkpointed partitioned run. Returns stats {partitions_run,
    partitions_skipped, counts...}. Safe to re-invoke after a crash: completed
    partitions (committed manifest + matching input fingerprint) are skipped;
    a partially-written partition is wiped and redone (idempotent outputs)."""
    cfg = cfg or EngineConfig.default()
    fp_cfg = cfg.fingerprint()
    err = validate_resume_config(out_dir, fp_cfg)
    if err:
        raise RuntimeError(err)

    # static vocabulary tables (S8 enum seeding analog) — written once per run
    from ..stages.materialize_vocab import write_vocab_tables
    write_vocab_tables(out_dir)

    partitions = make_partitions(pages_path, files_per_partition)
    pending = pending_partitions(out_dir, partitions, fp_cfg)
    if max_partitions is not None:
        pending = pending[:max_partitions]
    skipped = len(partitions) - len(pending)

    registry = _registry_ref(registry_dir, cfg)
    totals = {"docs": 0, "triples": 0, "mentions": 0, "failed": 0}

    for pid in pending:
        t0 = time.time()
        files = partitions[pid]
        # wipe any partial outputs of a previous attempt -> idempotent rerun
        for sub in ("linked", "triples", "mentions", "failed"):
            shutil.rmtree(os.path.join(out_dir, sub, pid), ignore_errors=True)

        linked_dir = os.path.join(out_dir, "linked", pid)
        pages = read_pages(files, lang=lang)
        linked = link_docs(extract_docs(pages, cfg), registry, cfg)
        linked.write_parquet(linked_dir)

        # ONE read of the partition's linked artifact, materialized (bounded:
        # a partition is files_per_partition input files) and shared by the
        # triples / mentions / failed derivations + counts — round-1 re-read
        # the parquet four times here (VERDICT r1 pipeline audit)
        linked_ds = rd.read_parquet(linked_dir).materialize()
        triples = to_triples(linked_ds)
        triples.write_parquet(os.path.join(out_dir, "triples", pid))
        to_mentions(linked_ds).write_parquet(os.path.join(out_dir, "mentions", pid))

        failed_ds = linked_ds.select_columns(["url", "warc_ts", "error"]) \
            .map_batches(lambda b: b.filter(pc.is_valid(b.column("error"))),
                         batch_format="pyarrow", zero_copy_batch=True)
        n_failed = failed_ds.count()
        if n_failed:
            failed_ds.write_parquet(os.path.join(out_dir, "failed", pid))

        counts = {
            "docs": linked_ds.count(),
            "triples": rd.read_parquet(os.path.join(out_dir, "triples", pid)).count(),
            "mentions": rd.read_parquet(os.path.join(out_dir, "mentions", pid)).count(),
            "failed": n_failed,
        }
        for k in totals:
            totals[k] += counts[k]
        commit_partition(out_dir, pid, input_fingerprint=partition_input_fingerprint(files),
                         config_fingerprint=fp_cfg, counts=counts, seconds=time.time() - t0)

    stats = {"partitions_total": len(partitions), "partitions_run": len(pending),
             "partitions_skipped": skipped, **totals}
    if finalize:
        stats.update(finalize_graph(out_dir, cfg, registry_dir=registry_dir))
    return stats


def finalize_graph(out_dir: str, cfg: Optional[EngineConfig] = None,
                   registry_dir: Optional[str] = None,
                   include_registry_edges: bool = False) -> dict:
    """Global canonicalization over all partitions' triples (the D1/D2
    shuffles) -> nodes/ + edges/. Idempotent: derived dirs are rebuilt.
    With ``registry_dir``, node props are enriched with the canonical
    entity properties (broadcast dimension join, stages/enrich.py).
    ``include_registry_edges=True`` additionally unions the declarative
    REGISTRY_REL_MAP projections (stages/registry_edges.registry_triples)
    into both shuffles — the full reference ``main.py`` load (API entities
    + relationships + VLOS facts in one graph)."""
    cfg = cfg or EngineConfig.default()
    triples_root = os.path.join(out_dir, "triples")

    def _triples() -> rd.Dataset:
        t = rd.read_parquet(triples_root)
        if include_registry_edges and registry_dir is not None:
            from ..stages.registry_edges import registry_triples
            t = t.union(registry_triples(registry_dir))
        return t

    edges_dir = os.path.join(out_dir, "edges")
    nodes_dir = os.path.join(out_dir, "nodes")
    shutil.rmtree(edges_dir, ignore_errors=True)
    shutil.rmtree(nodes_dir, ignore_errors=True)

    canonicalize_edges(_triples(), cfg).write_parquet(edges_dir)
    nodes = canonicalize_nodes(_triples(), cfg)
    if registry_dir is not None:
        from ..stages.enrich import enrich_nodes
        nodes = enrich_nodes(nodes, read_registry_tables(registry_dir))
    nodes.write_parquet(nodes_dir)
    return {
        "edges": rd.read_parquet(edges_dir).count(),
        "nodes": rd.read_parquet(nodes_dir).count(),
    }
