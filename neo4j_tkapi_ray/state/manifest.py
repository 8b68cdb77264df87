"""Partition-level lineage manifests + checkpointed resume.

Mirrors the SEMANTICS of the reference checkpoint system
(checkpoint_manager.py:21-120,179-210,305-365; checkpoint_decorator.py:
101-187) at partition granularity instead of item granularity — a
``processed_ids`` set serialized every 25 items does not scale to 10^12
documents (SURVEY §1.3 / §4):

  * deterministic partitioning of the input (list of file/fragment groups)
  * one JSON manifest per completed partition, committed atomically
    (tmp + rename) AFTER the partition's output files are fully written
  * manifests record input fingerprint + row counts + timings (lineage,
    north_rule "per-partition lineage + metrics")
  * resume = skip partitions whose manifest exists AND whose input
    fingerprint matches; config fingerprint mismatch refuses resume
    (mirrors validate_config_compatibility, checkpoint_manager.py:179-210)
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Dict, List, Optional

MANIFEST_DIR = "_manifests"


def _manifest_path(out_dir: str, partition_id: str) -> str:
    return os.path.join(out_dir, MANIFEST_DIR, f"{partition_id}.json")


def partition_input_fingerprint(files: List[str]) -> str:
    """Fingerprint of a partition's input: file names + sizes + mtimes —
    cheap, content-sensitive enough to catch a regenerated input."""
    h = hashlib.sha256()
    for f in sorted(files):
        st = os.stat(f)
        h.update(f"{os.path.basename(f)}:{st.st_size}:{int(st.st_mtime)}".encode())
    return h.hexdigest()[:16]


def commit_partition(out_dir: str, partition_id: str, *, input_fingerprint: str,
                     config_fingerprint: str, counts: Dict[str, int],
                     seconds: float, status: str = "completed") -> None:
    path = _manifest_path(out_dir, partition_id)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    payload = {
        "partition_id": partition_id,
        "input_fingerprint": input_fingerprint,
        "config_fingerprint": config_fingerprint,
        "counts": counts,
        "seconds": round(seconds, 3),
        "status": status,
        "committed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)  # atomic commit


def load_manifests(out_dir: str) -> Dict[str, dict]:
    mdir = os.path.join(out_dir, MANIFEST_DIR)
    if not os.path.isdir(mdir):
        return {}
    out = {}
    for name in os.listdir(mdir):
        if not name.endswith(".json"):
            continue
        try:
            with open(os.path.join(mdir, name)) as f:
                m = json.load(f)
            out[m["partition_id"]] = m
        except (json.JSONDecodeError, KeyError, OSError):
            continue  # torn manifest == not committed
    return out


def pending_partitions(out_dir: str, partitions: Dict[str, List[str]],
                       config_fingerprint: str) -> List[str]:
    """Partitions still to run: no manifest, stale input fingerprint, or
    non-completed status."""
    done = load_manifests(out_dir)
    pending = []
    for pid, files in sorted(partitions.items()):
        m = done.get(pid)
        if (m is None or m.get("status") != "completed"
                or m.get("input_fingerprint") != partition_input_fingerprint(files)):
            pending.append(pid)
    return pending


# ---------------------------------------------------------------------------
# Run management over a root of run dirs (reference checkpoint_cli.py:
# list/show/delete/cleanup over CheckpointManager runs — here a "run" is an
# out_dir holding a _manifests/ tree, and the same operations act on those)
# ---------------------------------------------------------------------------

def run_summary(out_dir: str) -> dict:
    """One run's rollup: partition counts, totals, first/last commit time,
    config fingerprint (reference checkpoint_cli.list_runs per-run block)."""
    manifests = load_manifests(out_dir)
    done = [m for m in manifests.values() if m.get("status") == "completed"]
    totals: Dict[str, int] = {}
    for m in done:
        for k, v in m.get("counts", {}).items():
            totals[k] = totals.get(k, 0) + v
    times = sorted(m.get("committed_at", "") for m in manifests.values())
    fps = {m.get("config_fingerprint") for m in manifests.values()}
    return {
        "run_id": os.path.basename(os.path.normpath(out_dir)),
        "path": out_dir,
        "partitions_completed": len(done),
        "partitions_failed": len(manifests) - len(done),
        "status": ("empty" if not manifests
                   else "failed" if len(done) < len(manifests) else "completed"),
        "totals": totals,
        "started_at": times[0] if times else None,
        "last_commit_at": times[-1] if times else None,
        "config_fingerprint": sorted(f or "" for f in fps)[0] if fps else None,
    }


def list_runs(root: str) -> List[dict]:
    """All run dirs under ``root`` (any subdir with a _manifests tree),
    newest activity first (reference checkpoint_manager.py:157 sorts runs
    by start_time desc)."""
    if not os.path.isdir(root):
        return []
    runs = []
    for name in sorted(os.listdir(root)):
        d = os.path.join(root, name)
        if os.path.isdir(os.path.join(d, MANIFEST_DIR)):
            runs.append(run_summary(d))
    runs.sort(key=lambda r: (r["last_commit_at"] or "", r["run_id"]),
              reverse=True)
    return runs


def delete_run(root: str, run_id: str) -> bool:
    """Remove one run dir (manifests + outputs). Refuses path escapes."""
    import shutil
    if os.sep in run_id or run_id in (".", ".."):
        raise ValueError(f"invalid run id {run_id!r}")
    d = os.path.join(root, run_id)
    if not os.path.isdir(os.path.join(d, MANIFEST_DIR)):
        return False
    shutil.rmtree(d)
    return True


def cleanup_runs(root: str, keep_last_n: int = 5) -> List[str]:
    """Delete all but the ``keep_last_n`` most recently active runs
    (reference checkpoint_manager.cleanup_old_runs:159-168). Returns the
    deleted run ids."""
    deleted = []
    for r in list_runs(root)[max(0, keep_last_n):]:
        if delete_run(root, r["run_id"]):
            deleted.append(r["run_id"])
    return deleted


def validate_resume_config(out_dir: str, config_fingerprint: str) -> Optional[str]:
    """Returns an error string if existing manifests were written under a
    different config (refuse resume — reference checkpoint_manager.py:179-210)."""
    for m in load_manifests(out_dir).values():
        if m.get("config_fingerprint") != config_fingerprint:
            return (f"config fingerprint mismatch: run dir has "
                    f"{m.get('config_fingerprint')}, current is {config_fingerprint}; "
                    f"use a fresh out_dir or revert the config")
    return None
