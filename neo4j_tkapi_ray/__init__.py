"""neo4j_tkapi_ray — a Ray-Data-native knowledge-graph construction engine.

Rebuilds the computation classes of the reference repo
(Niekvandam/neo4j-tkapi, read-only snapshot at /root/reference) as
streaming Ray Data pipelines over Common-Crawl-style web-page Parquet:

    pages(url, warc_ts, html, text, lang)
      -> [1] extract   : stateless map_batches, html -> canonical text +
                         structured session/activity/speaker/case/vote mentions
      -> [2] link      : actor-pool map_batches holding a gazetteer built from
                         the entity registry; entity-link scoring with the
                         reference's exact weights (vlos_config.py semantics)
      -> [3] triples   : stateless per-document triple emission (speaker x zaak
                         cross products, A->B->A interruption scan, votes)
      -> [4] canonical : salted two-phase groupby dedup -> nodes / edges
      -> [5] materialize: partitioned Parquet + per-partition lineage manifests
                         with checkpointed resume

The engine is NOT a port: the reference executes single-process Python with
per-item Cypher MERGEs; here every stage is a batch transform over Arrow
blocks scheduled by Ray Data's streaming executor.
"""

__version__ = "0.1.0"

from .config import EngineConfig, MatchingConfig, ProcessingConfig, TimeConfig  # noqa: F401

# Engine-wide shuffle strategy: every wide operation goes through the
# explicit hash exchange (exchange.py); Ray captures the DataContext at ROOT
# dataset creation, so the strategy must be set before any read_* call —
# import time is the only always-safe point. (Do NOT use
# Dataset.groupby().map_groups() with this package: it deadlocks under the
# hash-shuffle strategy in Ray 2.49 — use exchange.grouped_apply.)
try:  # pragma: no cover - trivial config shim
    from ray.data import DataContext as _DataContext
    from ray.data.context import ShuffleStrategy as _ShuffleStrategy

    _ctx = _DataContext.get_current()
    _ctx.shuffle_strategy = _ShuffleStrategy.HASH_SHUFFLE
    # shuffle aggregator actors only accumulate partition blocks under the
    # exchange pattern (the actual reduce runs in the whole-block map task
    # after); at the default of 1 CPU per partition, one 8-partition
    # exchange plus an actor pool deadlocks a small session, and chained
    # exchanges deadlock even a 32-CPU one. Reserve a token 0.01 CPU so
    # placement never blocks on aggregators.
    _ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.01
    _ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.01
except Exception:  # ray absent or too old — single-process oracle still works
    pass
