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
