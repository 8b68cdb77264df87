"""Stage [2] — entity-link scoring: ACTOR-POOL map_batches.

The reference constructs its matcher bundle once per loader and reuses it
across files (vlos_neo4j_loader.py:27-29, ST3); here the analog is a Ray
actor pool: the gazetteer index (surname buckets, dossier hash maps, sorted
activity intervals) is built ONCE per actor in ``__init__`` from a
registry broadcast through the object store (``ray.put`` on the driver,
``ray.get`` in the actor — never re-shipped per batch), and ``__call__``
scores one batch of docs against it.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray
import ray.data as rd

from ..config import EngineConfig
from ..linking import Linker, RegistryIndex, link_doc


class LinkerActor:
    def __init__(self, registry, cfg: EngineConfig, speaker_overrides=None):
        # registry: ObjectRef of a PREBUILT RegistryIndex (preferred — the
        # driver builds and precomputes once, actors just deserialize), an
        # ObjectRef of the tables dict, a parquet dir, or the tables dict.
        # speaker_overrides: ObjectRef/dict of the sharded-gazetteer
        # resolution table (stages/shard_link.py) — preloads and SEALS the
        # Linker's speaker memo.
        import os as _os
        import time as _time
        trace_dir = _os.environ.get("NTR_ACTOR_TRACE_DIR")
        t0 = _time.time() if trace_dir else 0.0
        if isinstance(registry, ray.ObjectRef):
            registry = ray.get(registry)
        if isinstance(speaker_overrides, ray.ObjectRef):
            speaker_overrides = ray.get(speaker_overrides)
        if trace_dir:
            with open(_os.path.join(trace_dir, f"init-{_os.getpid()}.log"), "a") as f:
                f.write(f"{t0:.3f} {_time.time():.3f} get\n")
        if isinstance(registry, RegistryIndex):
            index = registry
        elif isinstance(registry, str):
            index = RegistryIndex.from_parquet_dir(registry)
        else:
            index = RegistryIndex(registry)
        self.linker = Linker(index, cfg, speaker_overrides=speaker_overrides)
        if trace_dir:
            with open(_os.path.join(trace_dir, f"init-{_os.getpid()}.log"), "a") as f:
                f.write(f"{t0:.3f} {_time.time():.3f} init_done\n")

    def __call__(self, batch: pa.Table) -> pa.Table:
        docs = batch.column("doc").to_pylist()
        errors = batch.column("error").to_pylist()
        out = []
        for doc_json, err in zip(docs, errors):
            if err is not None or doc_json is None:
                out.append(None)  # failed rows pass through untouched
                continue
            linked = link_doc(json.loads(doc_json), self.linker)
            linked.pop("text", None)
            out.append(json.dumps(linked, separators=(",", ":")))
        cols = {name: batch.column(name) for name in batch.column_names if name != "doc"}
        cols["doc"] = pa.array(out, pa.string())
        return pa.table(cols)


class LinkEmitActor(LinkerActor):
    """Fused stage [2]+[3] for the streaming path: link a doc and emit its
    triple rows in one actor call — no linked-doc JSON re-serialization, no
    extra operator hop through the object store. The staged/checkpointed
    runner (pipelines/kg.py run_kg) keeps the separate link stage because
    the linked-doc Parquet is its resume/lineage artifact."""

    def __call__(self, batch: pa.Table) -> pa.Table:  # noqa: D102
        import os as _os
        import time as _time

        import pyarrow as _pa

        from .. import schemas
        from ..emit import emit_doc
        from ..linking import link_doc as _link_doc

        trace_dir = _os.environ.get("NTR_ACTOR_TRACE_DIR")
        t_start = _time.time() if trace_dir else 0.0

        rows = []
        for url, warc_ts, err, doc_json in zip(
                batch.column("url").to_pylist(), batch.column("warc_ts").to_pylist(),
                batch.column("error").to_pylist(), batch.column("doc").to_pylist()):
            if err is not None or doc_json is None:
                rows.append({"subj": url, "pred": "_FAILED", "obj": err or "unknown",
                             "subj_label": "Page", "obj_label": "Error", "url": url,
                             "warc_ts": warc_ts, "score": 0.0,
                             "provenance": "failed_row"})
                continue
            linked = _link_doc(json.loads(doc_json), self.linker)
            tr, _ = emit_doc(linked, url, warc_ts)
            rows.extend(tr)
        out = (schemas.TRIPLES.empty_table() if not rows
               else _pa.Table.from_pylist(rows, schema=schemas.TRIPLES))
        if trace_dir:
            # one line per batch: pid, start, end, docs — post-processed by
            # bench tooling into pool-utilization numbers (diagnostic only)
            with open(_os.path.join(trace_dir, f"{_os.getpid()}.log"), "a") as f:
                f.write(f"{t_start:.3f} {_time.time():.3f} {batch.num_rows}\n")
        return out


def link_emit_docs(docs: rd.Dataset, registry, cfg: EngineConfig,
                   concurrency=None, speaker_overrides=None) -> rd.Dataset:
    """Fused extract-output -> triples actor-pool stage (see LinkEmitActor)."""
    if isinstance(registry, dict):
        registry = ray.put(registry)
    if isinstance(speaker_overrides, dict):
        speaker_overrides = ray.put(speaker_overrides)
    if concurrency is None:
        concurrency = _auto_concurrency(cfg)
    return docs.map_batches(
        LinkEmitActor,
        fn_constructor_kwargs={"registry": registry, "cfg": cfg,
                               "speaker_overrides": speaker_overrides},
        batch_format="pyarrow",
        batch_size=cfg.ray.link_batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def _auto_concurrency(cfg: EngineConfig) -> int:
    # leave (2 + cpus/8) whole CPUs for the read/coalesce/reduce task slots
    # and the hash-shuffle aggregator actors (0.1 CPU each) — a pool that
    # takes more deadlocks the fused plan: the actor pool holds its CPUs
    # while the downstream exchange waits for placement (observed at both
    # 4 and 32 CPUs). FIXED size, not autoscaling: the autoscaling pool
    # ramps up too conservatively under backpressure. 32 cpus -> 26 actors,
    # 8 -> 5, 4 -> 1.
    avail = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
    return max(1, min(cfg.ray.link_concurrency, avail - 2 - max(1, avail // 8)))


def link_docs(docs: rd.Dataset, registry, cfg: EngineConfig,
              concurrency=None) -> rd.Dataset:
    """``registry``: dict of tables, ObjectRef of same, or registry dir path.
    When a dict is passed it is ray.put() once here (broadcast)."""
    if isinstance(registry, dict):
        registry = ray.put(registry)
    if concurrency is None:
        concurrency = _auto_concurrency(cfg)
    return docs.map_batches(
        LinkerActor,
        fn_constructor_kwargs={"registry": registry, "cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.ray.link_batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
