"""Node enrichment (broadcast dim join) + CLI entry point."""

import json
import subprocess
import sys

import pytest


def test_enrich_nodes(ray_session, corpus):
    from neo4j_tkapi_ray.config import EngineConfig
    from neo4j_tkapi_ray.pipelines.kg import kg_triples_stream
    from neo4j_tkapi_ray.sources.pages import read_registry_tables
    from neo4j_tkapi_ray.stages.canonicalize import canonicalize_nodes
    from neo4j_tkapi_ray.stages.enrich import enrich_nodes

    cfg = EngineConfig.default()
    triples = kg_triples_stream(corpus["pages"], corpus["dir"]).materialize()
    nodes = canonicalize_nodes(triples, cfg)
    tables = read_registry_tables(corpus["dir"])
    enriched = {n["node_id"]: n for n in enrich_nodes(nodes, tables).take_all()}

    persons = {p["person_id"]: p for p in tables["persons"]}
    hit = 0
    for node_id, node in enriched.items():
        props = json.loads(node["props"])
        assert "last_url" in props  # stream-derived props survive the merge
        if node_id in persons:
            hit += 1
            assert props["achternaam"] == persons[node_id]["achternaam"]
            assert props["entity"] == "persoon"
    assert hit > 0, "no persoon nodes were enriched"


def test_vocab_tables(tmp_path):
    """S8 enum-seeding analog: vocabulary tables cover every predicate the
    emitter can produce."""
    import pyarrow.parquet as pq
    from neo4j_tkapi_ray.stages.materialize_vocab import write_vocab_tables
    paths = write_vocab_tables(str(tmp_path))
    preds = set(pq.read_table(paths["predicates"]).column("pred").to_pylist())
    for p in ["DISCUSSES_ZAAK", "INTERRUPTED", "RESPONDED_TO", "MATCHES_PERSOON",
              "MATCHES_API_ACTIVITY", "MATCHES_API_ZAAK", "MATCHES_API_DOSSIER",
              "VOTED_VOOR", "VOTED_TEGEN", "VOTED_ONTHOUDING", "_FAILED"]:
        assert p in preds
    labels = pq.read_table(paths["labels"])
    assert labels.num_rows >= 10


def test_runs_cli(tmp_path):
    """Run-management parity (reference checkpoint_cli.py list/show/delete/
    cleanup): three synthetic runs under one root, listed newest-first,
    shown in detail, cleaned down to the newest, deleted explicitly."""
    from neo4j_tkapi_ray.state.manifest import commit_partition

    root = tmp_path / "runs"
    for i, rid in enumerate(["run_a", "run_b", "run_c"]):
        out = root / rid
        for p in range(i + 1):
            commit_partition(str(out), f"part-{p:05d}",
                             input_fingerprint="f" * 16,
                             config_fingerprint="cfg1",
                             counts={"edges": 10 * (p + 1)}, seconds=0.1)

    def run(*args):
        r = subprocess.run([sys.executable, "-m", "neo4j_tkapi_ray", *args],
                           capture_output=True, text=True, cwd="/root/repo")
        return r.returncode, json.loads(r.stdout.strip().splitlines()[-1])

    rc, listed = run("runs", "list", "--root", str(root))
    assert rc == 0 and [r["run_id"] for r in listed["runs"]] == \
        ["run_c", "run_b", "run_a"]  # newest activity first
    assert listed["runs"][0]["partitions_completed"] == 3
    assert listed["runs"][0]["totals"]["edges"] == 60

    rc, shown = run("runs", "show", "--root", str(root), "--run-id", "run_b")
    assert rc == 0 and len(shown["partitions"]) == 2
    assert shown["status"] == "completed"

    rc, res = run("runs", "delete", "--root", str(root), "--run-id", "run_a")
    assert rc == 1 and res["error"].startswith("pass --yes")  # confirm gate
    rc, res = run("runs", "delete", "--root", str(root), "--run-id", "run_a",
                  "--yes")
    assert rc == 0 and res["deleted"] == ["run_a"]

    rc, res = run("runs", "cleanup", "--root", str(root), "--keep", "1")
    assert rc == 0 and res["deleted"] == ["run_b"]
    rc, listed = run("runs", "list", "--root", str(root))
    assert [r["run_id"] for r in listed["runs"]] == ["run_c"]


def test_cli_roundtrip(tmp_path):
    """gen -> build -> status -> resume noop, through the real CLI in
    subprocesses (fresh Ray each)."""
    corpus = tmp_path / "corpus"
    out = tmp_path / "out"

    def run(*args):
        r = subprocess.run([sys.executable, "-m", "neo4j_tkapi_ray", *args],
                           capture_output=True, text=True, cwd="/root/repo")
        assert r.returncode == 0, r.stderr[-2000:]
        return json.loads(r.stdout.strip().splitlines()[-1])

    run("gen", "--out", str(corpus), "--sessions", "15", "--seed", "11")
    stats = run("build", "--pages", str(corpus / "pages"), "--registry", str(corpus),
                "--out", str(out), "--num-cpus", "4")
    assert stats["partitions_run"] >= 1 and stats["edges"] > 0

    status = run("status", "--out", str(out))
    assert status["partitions_completed"] == stats["partitions_total"]

    again = run("build", "--pages", str(corpus / "pages"), "--registry", str(corpus),
                "--out", str(out), "--num-cpus", "4")
    assert again["partitions_run"] == 0  # resume is the default
