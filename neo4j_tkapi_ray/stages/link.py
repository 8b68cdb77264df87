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
    def __init__(self, registry, cfg: EngineConfig):
        # registry: ObjectRef of the tables dict (broadcast) or a parquet dir
        if isinstance(registry, ray.ObjectRef):
            tables = ray.get(registry)
            index = RegistryIndex(tables)
        elif isinstance(registry, str):
            index = RegistryIndex.from_parquet_dir(registry)
        else:
            index = RegistryIndex(registry)
        self.linker = Linker(index, cfg)

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


def link_docs(docs: rd.Dataset, registry, cfg: EngineConfig,
              concurrency=None) -> rd.Dataset:
    """``registry``: dict of tables, ObjectRef of same, or registry dir path.
    When a dict is passed it is ray.put() once here (broadcast)."""
    if isinstance(registry, dict):
        registry = ray.put(registry)
    if concurrency is None:
        # size the pool to the session: leave a CPU for the read/emit stages
        # so the pipeline doesn't serialize (ray_guide: pool that reserves
        # every CPU starves the other stages); autoscaling (min, max) so
        # actor spawn overlaps with the first batches instead of gating them
        avail = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        cap = max(1, min(cfg.ray.link_concurrency, avail - 1))
        concurrency = (min(2, cap), cap)
    return docs.map_batches(
        LinkerActor,
        fn_constructor_kwargs={"registry": registry, "cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.ray.link_batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
