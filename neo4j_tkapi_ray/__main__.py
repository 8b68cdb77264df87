"""CLI entry point — the analog of the reference's ``python src/main.py``
(cli_config.py:8-55) reshaped for a Ray job:

    python -m neo4j_tkapi_ray build --pages DIR --registry DIR --out DIR
        [--resume] [--files-per-partition N] [--lang nl] [--num-cpus N]
        [--no-finalize] [--max-partitions K]
    python -m neo4j_tkapi_ray gen --out DIR --sessions N [--seed S] [--page-scale K]
    python -m neo4j_tkapi_ray status --out DIR
    python -m neo4j_tkapi_ray runs {list,show,delete,cleanup} --root DIR
        [--run-id ID] [--keep N] [--yes]

Run via ``ray job submit -- python -m neo4j_tkapi_ray build ...`` on a real
cluster; standalone it initialises a local Ray session itself (guarded).
The reference's --resume/--skip/--overwrite semantics map onto the
partition-manifest layer: ``build`` is ALWAYS resumable (completed
partitions skip); ``--overwrite`` wipes the manifests first.
"""

from __future__ import annotations

import argparse
import json
import shutil
import sys


def _ensure_ray(num_cpus):
    import ray
    if not ray.is_initialized():
        kwargs = {"address": "local", "include_dashboard": False,
                  "logging_level": "ERROR"}
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)


def cmd_build(args) -> int:
    _ensure_ray(args.num_cpus)
    from .pipelines.kg import run_kg
    if args.overwrite:
        shutil.rmtree(args.out, ignore_errors=True)
    stats = run_kg(args.pages, args.registry, args.out, lang=args.lang,
                   files_per_partition=args.files_per_partition,
                   finalize=not args.no_finalize,
                   max_partitions=args.max_partitions)
    print(json.dumps(stats))
    return 0


def cmd_gen(args) -> int:
    from .corpus import generate_corpus
    paths = generate_corpus(args.out, n_sessions=args.sessions, seed=args.seed,
                            page_scale=args.page_scale)
    print(json.dumps(paths))
    return 0


def cmd_status(args) -> int:
    from .state.manifest import load_manifests
    manifests = load_manifests(args.out)
    done = [m for m in manifests.values() if m.get("status") == "completed"]
    totals: dict = {}
    for m in done:
        for k, v in m.get("counts", {}).items():
            totals[k] = totals.get(k, 0) + v
    print(json.dumps({"partitions_completed": len(done), "totals": totals,
                      "partitions": sorted(manifests)}))
    return 0


def cmd_runs(args) -> int:
    """Run-management over a root of run dirs — the reference's
    checkpoint_cli.py list/show/delete/cleanup reshaped onto partition
    manifests (a run == an --out dir)."""
    from .state.manifest import (cleanup_runs, delete_run, list_runs,
                                 run_summary)
    if args.action in ("show", "delete") and not args.run_id:
        print(json.dumps({"error": f"--run-id is required for {args.action}"}))
        return 1
    if args.action == "list":
        print(json.dumps({"runs": list_runs(args.root)}))
    elif args.action == "show":
        import os
        d = os.path.join(args.root, args.run_id)
        if not os.path.isdir(d):
            print(json.dumps({"error": f"run {args.run_id} not found"}))
            return 1
        from .state.manifest import load_manifests
        s = run_summary(d)
        s["partitions"] = sorted(load_manifests(d).values(),
                                 key=lambda m: m["partition_id"])
        print(json.dumps(s))
    elif args.action == "delete":
        if not args.yes:
            print(json.dumps({"error": "pass --yes to confirm deletion"}))
            return 1
        ok = delete_run(args.root, args.run_id)
        print(json.dumps({"deleted": [args.run_id] if ok else []}))
        return 0 if ok else 1
    elif args.action == "cleanup":
        print(json.dumps({"deleted": cleanup_runs(args.root, args.keep)}))
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="neo4j_tkapi_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build", help="run the KG construction pipeline (resumable)")
    b.add_argument("--pages", required=True)
    b.add_argument("--registry", required=True)
    b.add_argument("--out", required=True)
    b.add_argument("--lang", default="nl")
    b.add_argument("--files-per-partition", type=int, default=4)
    b.add_argument("--max-partitions", type=int, default=None)
    b.add_argument("--no-finalize", action="store_true")
    b.add_argument("--overwrite", action="store_true",
                   help="wipe the out dir (manifests included) first")
    b.add_argument("--num-cpus", type=int, default=None)
    b.set_defaults(fn=cmd_build)

    g = sub.add_parser("gen", help="generate a deterministic synthetic corpus")
    g.add_argument("--out", required=True)
    g.add_argument("--sessions", type=int, default=100)
    g.add_argument("--seed", type=int, default=42)
    g.add_argument("--page-scale", type=int, default=1)
    g.add_argument("--num-cpus", type=int, default=None)
    g.set_defaults(fn=cmd_gen)

    s = sub.add_parser("status", help="show partition-manifest progress")
    s.add_argument("--out", required=True)
    s.set_defaults(fn=cmd_status)

    r = sub.add_parser("runs", help="list/show/delete/cleanup runs under a root dir")
    r.add_argument("action", choices=["list", "show", "delete", "cleanup"])
    r.add_argument("--root", required=True,
                   help="directory whose subdirectories are run out-dirs")
    r.add_argument("--run-id", default=None)
    r.add_argument("--keep", type=int, default=5,
                   help="runs to keep during cleanup (newest first)")
    r.add_argument("--yes", action="store_true", help="confirm delete")
    r.set_defaults(fn=cmd_runs)

    args = p.parse_args(argv)
    rc = args.fn(args)
    try:
        import ray
        if ray.is_initialized():
            ray.shutdown()
    except ImportError:
        pass
    return rc


if __name__ == "__main__":
    sys.exit(main())
