"""Checkpointed resume semantics at partition granularity (mirrors the
reference's resume tests, test_decorator.py:171-237, lifted from item-level
to partition-level per SURVEY §4)."""

import os

import pytest
import ray.data as rd

from neo4j_tkapi_ray.config import EngineConfig
from neo4j_tkapi_ray.pipelines.kg import make_partitions, run_kg
from neo4j_tkapi_ray.state.manifest import load_manifests


@pytest.fixture(scope="module")
def big_corpus(tmp_path_factory):
    from neo4j_tkapi_ray.corpus import generate_corpus
    out = str(tmp_path_factory.mktemp("bigcorpus"))
    paths = generate_corpus(out, n_sessions=320, seed=9)
    return {"dir": out, **paths}


def _edges(out_dir):
    df = rd.read_parquet(os.path.join(out_dir, "edges")).to_pandas()
    return df.sort_values(["subj", "pred", "obj"]).reset_index(drop=True)


def test_kill_and_resume_identical_output(ray_session, big_corpus, tmp_path_factory):
    out_full = str(tmp_path_factory.mktemp("kg_full"))
    out_resume = str(tmp_path_factory.mktemp("kg_resume"))

    parts = make_partitions(big_corpus["pages"], files_per_partition=1)
    assert len(parts) >= 2, "corpus must span multiple partitions for this test"

    full = run_kg(big_corpus["pages"], big_corpus["dir"], out_full, files_per_partition=1)
    assert full["partitions_run"] == len(parts)

    # simulate a crash after k partitions
    k = len(parts) // 2
    partial = run_kg(big_corpus["pages"], big_corpus["dir"], out_resume,
                     files_per_partition=1, finalize=False, max_partitions=k)
    assert partial["partitions_run"] == k

    resumed = run_kg(big_corpus["pages"], big_corpus["dir"], out_resume, files_per_partition=1)
    # finished partitions were NOT recomputed
    assert resumed["partitions_skipped"] == k
    assert resumed["partitions_run"] == len(parts) - k

    assert _edges(out_full).equals(_edges(out_resume))

    manifests = load_manifests(out_resume)
    assert len(manifests) == len(parts)
    for m in manifests.values():
        assert m["status"] == "completed"
        assert "counts" in m and m["counts"]["docs"] >= 0
        assert m["seconds"] >= 0


def test_rerun_noop(ray_session, big_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_noop"))
    run_kg(big_corpus["pages"], big_corpus["dir"], out, files_per_partition=2)
    again = run_kg(big_corpus["pages"], big_corpus["dir"], out, files_per_partition=2)
    assert again["partitions_run"] == 0


def test_torn_partition_is_redone(ray_session, big_corpus, tmp_path_factory):
    """A partition whose output files exist but whose manifest was never
    committed (crash between write and commit) must be wiped and redone —
    and produce no duplicate rows."""
    import json
    import shutil

    out = str(tmp_path_factory.mktemp("kg_torn"))
    parts = make_partitions(big_corpus["pages"], files_per_partition=1)
    run_kg(big_corpus["pages"], big_corpus["dir"], out, files_per_partition=1,
           finalize=False)
    pid = sorted(parts)[0]

    # simulate the torn state: delete the manifest, leave (and pollute) outputs
    os.remove(os.path.join(out, "_manifests", f"{pid}.json"))
    with open(os.path.join(out, "triples", pid, "junk-partial.parquet"), "wb") as f:
        f.write(b"not parquet")

    before = rd.read_parquet(os.path.join(out, "triples")).count() if False else None
    stats = run_kg(big_corpus["pages"], big_corpus["dir"], out, files_per_partition=1)
    assert stats["partitions_run"] == 1  # only the torn one

    # junk gone, counts consistent with the committed manifest
    files = os.listdir(os.path.join(out, "triples", pid))
    assert "junk-partial.parquet" not in files
    m = load_manifests(out)[pid]
    n = rd.read_parquet(os.path.join(out, "triples", pid)).count()
    assert n == m["counts"]["triples"]


def test_config_change_refuses_resume(ray_session, big_corpus, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("kg_cfg"))
    run_kg(big_corpus["pages"], big_corpus["dir"], out, files_per_partition=2,
           finalize=False, max_partitions=1)
    cfg2 = EngineConfig.default()
    cfg2.matching.min_speaker_similarity_score = 61
    with pytest.raises(RuntimeError, match="config fingerprint mismatch"):
        run_kg(big_corpus["pages"], big_corpus["dir"], out, cfg=cfg2)


def test_finalize_with_registry_edges(ray_session, big_corpus, tmp_path_factory):
    """include_registry_edges=True unions the REGISTRY_REL_MAP projections
    into the same D1/D2 shuffles (the reference main.py full-load shape):
    every registry edge appears with weight >= 1, VLOS-only edges are
    unchanged, and registry-only nodes join the node table at epoch 0."""
    from neo4j_tkapi_ray.pipelines.kg import finalize_graph
    from neo4j_tkapi_ray.stages.registry_edges import registry_edges

    out = str(tmp_path_factory.mktemp("kg_fullgraph"))
    run_kg(big_corpus["pages"], big_corpus["dir"], out, files_per_partition=2,
           finalize=False)
    plain = finalize_graph(out, registry_dir=big_corpus["dir"])
    e_plain = _edges(out)
    full = finalize_graph(out, registry_dir=big_corpus["dir"],
                          include_registry_edges=True)
    e_full = _edges(out)

    reg = registry_edges(big_corpus["dir"]).to_pandas()
    reg_keys = set(zip(reg.subj, reg.pred, reg.obj))
    assert full["edges"] > plain["edges"]
    assert full["nodes"] > plain["nodes"]
    full_keys = set(zip(e_full.subj, e_full.pred, e_full.obj))
    assert reg_keys <= full_keys
    # VLOS-only edges keep their weights exactly
    vlos = e_plain.merge(e_full, on=["subj", "pred", "obj"],
                         suffixes=("_p", "_f"))
    assert len(vlos) == len(e_plain)
    overlap = {(s, p, o) for (s, p, o) in
               zip(e_plain.subj, e_plain.pred, e_plain.obj)} & reg_keys
    same = vlos[[(s, p, o) not in overlap for s, p, o in
                 zip(vlos.subj, vlos.pred, vlos.obj)]]
    assert (same.weight_p == same.weight_f).all()


def test_incremental_append_runs_only_delta(ray_session, big_corpus,
                                            tmp_path_factory):
    """The incremental-crawl scenario: after a completed run, NEW page
    files appear in the input; the next run_kg processes ONLY the new
    partitions (old manifests skip) and the final edge set equals a
    from-scratch run over everything."""
    import shutil

    src = big_corpus["dir"]
    pages_dir = big_corpus["pages"]
    files = sorted(os.listdir(pages_dir))
    assert len(files) >= 2
    held_out = files[-1]

    # stage 1: corpus minus the held-out shard
    stage = str(tmp_path_factory.mktemp("delta_pages"))
    for f in files[:-1]:
        shutil.copy(os.path.join(pages_dir, f), os.path.join(stage, f))
    out = str(tmp_path_factory.mktemp("kg_delta"))
    first = run_kg(stage, src, out, files_per_partition=1, finalize=False)
    assert first["partitions_run"] == len(files) - 1

    # the "crawler" delivers one more shard
    shutil.copy(os.path.join(pages_dir, held_out),
                os.path.join(stage, held_out))
    second = run_kg(stage, src, out, files_per_partition=1)
    assert second["partitions_skipped"] == len(files) - 1
    assert second["partitions_run"] == 1

    # equals the from-scratch run over the full input
    out_full = str(tmp_path_factory.mktemp("kg_delta_full"))
    run_kg(pages_dir, src, out_full, files_per_partition=1)
    assert _edges(out).equals(_edges(out_full))
