"""End-to-end Ray pipeline vs single-process oracle: the north-star gates.

  (a) byte-identical extracted text per url       (BASELINE.json input_hint)
  (b) triple-set P/R >= 0.95 vs reference-semantics oracle
"""

import pandas as pd
import pytest

import ray.data as rd

from neo4j_tkapi_ray.config import EngineConfig
from neo4j_tkapi_ray.oracle import precision_recall, triple_set
from neo4j_tkapi_ray.pipelines.kg import kg_triples_stream
from neo4j_tkapi_ray.sources.pages import read_pages
from neo4j_tkapi_ray.stages.extract import extract_docs


@pytest.fixture(scope="module")
def ray_triples(ray_session, corpus):
    ds = kg_triples_stream(corpus["pages"], corpus["dir"])
    return ds.take_all()


def test_text_byte_identity_per_url(ray_session, corpus, oracle_result):
    cfg = EngineConfig.default()
    docs = extract_docs(read_pages(corpus["pages"]), cfg).take_all()
    by_url = {}
    for row in sorted(docs, key=lambda r: (r["url"], r["warc_ts"])):
        if row["error"] is None:
            by_url[row["url"]] = row["text"]
    expected = oracle_result["texts"]
    assert set(by_url) == set(expected)
    mismatches = [u for u in by_url if by_url[u] != expected[u]]
    assert mismatches == []


def test_triple_pr_vs_oracle(ray_triples, oracle_result):
    pred = {(t["subj"], t["pred"], t["obj"]) for t in ray_triples if t["pred"] != "_FAILED"}
    exp = triple_set(oracle_result["triples"])
    p, r = precision_recall(pred, exp)
    assert p >= 0.95 and r >= 0.95, (p, r)
    # with shared semantic kernels the distributed run must be EXACT
    assert p == 1.0 and r == 1.0


def test_failed_rows_quarantined(ray_triples, oracle_result):
    failed_urls = {t["url"] for t in ray_triples if t["pred"] == "_FAILED"}
    assert failed_urls == set(oracle_result["failed"])


def test_all_predicate_families_present(ray_triples):
    preds = {t["pred"] for t in ray_triples}
    for expected in ["DISCUSSES_ZAAK", "INTERRUPTED", "RESPONDED_TO",
                     "MATCHES_PERSOON", "MATCHES_API_ACTIVITY", "MATCHES_API_ZAAK",
                     "MATCHES_API_DOSSIER", "VOTED_VOOR", "VOTED_TEGEN"]:
        assert expected in preds, f"missing predicate family {expected}"


def test_extract_quarantines_garbage_rows(ray_session, tmp_path):
    """Adversarial page payloads must land in the failed sidecar, never
    crash a batch (reference item-level continuation semantics)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime
    from neo4j_tkapi_ray import schemas as sch

    rows = [
        {"url": "u1", "warc_ts": datetime(2024, 1, 1), "html": b"", "text": "", "lang": "nl"},
        {"url": "u2", "warc_ts": datetime(2024, 1, 1), "html": b"\xff\xfe garbage bytes",
         "text": "", "lang": "nl"},
        {"url": "u3", "warc_ts": datetime(2024, 1, 1),
         "html": b"<html><vergadering soort='x' unclosed", "text": "", "lang": "nl"},
        {"url": "u4", "warc_ts": datetime(2024, 1, 1),
         "html": ("<html><vergadering soort=\"Plenair\" objectid=\"o\">"
                  "<titel>T</titel><vergaderingnummer>1</vergaderingnummer>"
                  "<datum>2024-01-01T00:00:00</datum></vergadering></html>").encode(),
         "text": "", "lang": "nl"},
    ]
    p = tmp_path / "pages.parquet"
    pq.write_table(pa.Table.from_pylist(rows, schema=sch.PAGES), p)

    from neo4j_tkapi_ray.config import EngineConfig
    from neo4j_tkapi_ray.sources.pages import read_pages
    from neo4j_tkapi_ray.stages.extract import extract_docs
    out = {r["url"]: r for r in extract_docs(read_pages(str(p)), EngineConfig.default()).take_all()}
    assert out["u1"]["error"] is not None     # no session island
    assert out["u2"]["error"] is not None     # undecodable garbage
    assert out["u3"]["error"] is not None     # truncated island
    assert out["u4"]["error"] is None         # minimal valid page
    assert out["u4"]["text"] == "T 1 2024-01-01T00:00:00"


def test_mention_truth_agreement(ray_session, corpus, oracle_result):
    """Linking accuracy vs the generator's intended entities — informative
    floor (the corpus includes deliberate near-threshold adversarial names,
    so this is NOT expected to be 1.0; the oracle-parity gate above is)."""
    truth = pd.read_parquet(corpus["truth_mentions"])
    truth = truth[truth.entity_id != ""]
    linked = pd.DataFrame(oracle_result["mentions"])
    merged = truth.merge(linked, left_on=["url", "surface"], right_on=["url", "surface"],
                         how="inner", suffixes=("_t", ""))
    agree = (merged.entity_id == merged.entity_id_t).mean()
    assert agree >= 0.75, f"linking truth agreement too low: {agree:.3f}"


def test_sharded_gazetteer_pipeline_parity(ray_session, corpus):
    """Opt-in sharded speaker gazetteer (cfg.ray.gazetteer_shards > 1,
    stages/shard_link.py): the full pipeline must emit the IDENTICAL
    triple multiset as the default broadcast-gazetteer path — same links,
    same scores, same failed rows (VERDICT r3 item 4 acceptance)."""
    from neo4j_tkapi_ray.config import EngineConfig

    def rows(cfg):
        out = kg_triples_stream(corpus["pages"], corpus["dir"], cfg).take_all()
        return sorted(tuple(t[k] for k in ("subj", "pred", "obj", "subj_label",
                                           "obj_label", "url", "score",
                                           "provenance"))
                      for t in out)

    base = rows(EngineConfig.default())
    cfg_sharded = EngineConfig.default()
    cfg_sharded.ray.gazetteer_shards = 4
    sharded = rows(cfg_sharded)
    assert len(base) > 0 and sharded == base
