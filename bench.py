"""Benchmark harness.

Headline: the flagship KG-construction pipeline (pages -> extract -> link ->
triples -> canonicalized edges) over the deterministic synthetic pages
corpus sized for $GRAFT_SF_DIR, plus timings for representative operator
pipelines over the testdata tables.

Prints ONE JSON line:
  {"metric": ..., "value": <headline seconds>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N, ...extras}

--scaling: runs the headline twice in FRESH processes at num_cpus=8 and
num_cpus=32 on the same input and reports both throughputs + scaling
efficiency (sandbox protocol for the N -> 4N cluster criterion,
BASELINE.md §2).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
SF_TAG = os.path.basename(os.path.normpath(SF_DIR))
# KG corpus scale per sf (same map as __ray_entry__)
KG_SESSIONS = {"sf0.001": 24, "sf0.01": 120, "sf0.1": 800}.get(SF_TAG, 800)


def run_bench() -> dict:
    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from neo4j_tkapi_ray.config import EngineConfig
    from neo4j_tkapi_ray.corpus import generate_corpus
    from neo4j_tkapi_ray.pipelines.kg import kg_triples_stream
    from neo4j_tkapi_ray.stages.canonicalize import canonicalize_edges

    corpus_dir = f"/tmp/ntr_bench_{SF_TAG}_{KG_SESSIONS}"
    paths = generate_corpus(corpus_dir, n_sessions=KG_SESSIONS, seed=42)

    cfg = EngineConfig.default()
    cfg.ray.link_concurrency = max(1, NUM_CPUS - 2)

    # warm the OS page cache (untimed) so we measure compute + shuffle
    import pyarrow.parquet as pq
    n_pages = pq.read_table(paths["pages"], columns=["url"]).num_rows

    # ---- headline: KG pipeline end-to-end ------------------------------
    t0 = time.time()
    triples = kg_triples_stream(paths["pages"], corpus_dir, cfg)
    edges = canonicalize_edges(triples, cfg)
    n_edges = edges.count()
    headline = time.time() - t0

    n_triples_ds = kg_triples_stream(paths["pages"], corpus_dir, cfg)
    n_triples = None  # avoid a second full pass by default

    # ---- representative operator pipelines over testdata ---------------
    from neo4j_tkapi_ray.ops import ann, dedup, relational, textstats
    qfns = {
        "pricing_summary": lambda: relational.lineitem_pricing_summary(SF_DIR),
        "revenue_by_nation": lambda: relational.revenue_by_nation(SF_DIR),
        "events_hourly": lambda: relational.events_hourly(SF_DIR),
        "dedup_exact": lambda: dedup.exact_dedup(SF_DIR),
        "minhash_neardup": lambda: dedup.minhash_lsh_pairs(SF_DIR),
        "token_counts": lambda: textstats.token_counts(SF_DIR),
        "ann_topk": lambda: ann.brute_force_topk(SF_DIR, n_queries=5, k=5),
    }
    qtimes = {}
    for name, fn in qfns.items():
        t0 = time.time()
        fn().count()
        qtimes[name] = round(time.time() - t0, 3)

    ray.shutdown()
    return {
        "metric": "kg_pipeline_pages_to_edges_sec",
        "value": round(headline, 3),
        "unit": "sec",
        "queries": qtimes,
        "sf": SF_TAG,
        "num_cpus": NUM_CPUS,
        "kg_pages": int(n_pages),
        "kg_edges": int(n_edges),
        "pages_per_sec": round(n_pages / headline, 2),
        "edges_per_sec": round(n_edges / headline, 2),
    }


def run_scaling() -> dict:
    def run(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        out = subprocess.run([sys.executable, "bench.py"], env=env, cwd=os.path.dirname(
            os.path.abspath(__file__)), capture_output=True, text=True, check=True).stdout
        return json.loads(out.strip().splitlines()[-1])

    lo, hi = 8, 32
    r_lo = run(lo)
    r_hi = run(hi)
    thr_lo = r_lo["kg_pages"] / r_lo["value"]
    thr_hi = r_hi["kg_pages"] / r_hi["value"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    return {
        "metric": "scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sec_8": r_lo["value"],
        "sec_32": r_hi["value"],
        "pages_per_sec_8": round(thr_lo, 2),
        "pages_per_sec_32": round(thr_hi, 2),
        "sf": SF_TAG,
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    else:
        print(json.dumps(run_bench()))
