"""Canonicalization (the D1/D2 shuffles): dedup, last-write-wins, salt path."""

import json

import ray
import ray.data as rd

from neo4j_tkapi_ray import schemas
from neo4j_tkapi_ray.config import EngineConfig
from neo4j_tkapi_ray.oracle import triple_set
from neo4j_tkapi_ray.pipelines.kg import kg_triples_stream
from neo4j_tkapi_ray.stages.canonicalize import canonicalize_edges, canonicalize_nodes


def _triples_ds(corpus):
    return kg_triples_stream(corpus["pages"], corpus["dir"]).materialize()


def test_edge_dedup_matches_oracle_distinct(ray_session, corpus, oracle_result):
    cfg = EngineConfig.default()
    ds = _triples_ds(corpus)
    edges = canonicalize_edges(ds, cfg).take_all()
    got = {(e["subj"], e["pred"], e["obj"]) for e in edges}
    assert got == triple_set(oracle_result["triples"])
    # weights: sum of weights == number of emitted (non-failed) triple rows
    n_rows = sum(1 for _ in oracle_result["triples"])
    assert sum(e["weight"] for e in edges) == n_rows


def test_salted_and_unsalted_nodes_identical(ray_session, corpus):
    cfg = EngineConfig.default()
    ds = _triples_ds(corpus)
    salted = sorted((n["node_id"], n["label"], n["warc_ts"])
                    for n in canonicalize_nodes(ds, cfg, salted=True).take_all())
    plain = sorted((n["node_id"], n["label"], n["warc_ts"])
                   for n in canonicalize_nodes(ds, cfg, salted=False).take_all())
    assert salted == plain


def test_node_last_write_wins(ray_session):
    """MERGE ``SET n +=`` semantics: later warc_ts props overwrite."""
    import pyarrow as pa
    from datetime import datetime
    cfg = EngineConfig.default()
    rows = [
        {"subj": "n1", "pred": "P", "obj": "n2", "subj_label": "A", "obj_label": "B",
         "url": "u1", "warc_ts": datetime(2024, 1, 1), "score": 1.0, "provenance": "x"},
        {"subj": "n1", "pred": "P", "obj": "n3", "subj_label": "A", "obj_label": "B",
         "url": "u2", "warc_ts": datetime(2024, 2, 1), "score": 1.0, "provenance": "x"},
    ]
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=schemas.TRIPLES))
    nodes = {n["node_id"]: n for n in canonicalize_nodes(ds, cfg).take_all()}
    assert json.loads(nodes["n1"]["props"])["last_url"] == "u2"
    assert nodes["n1"]["warc_ts"].year == 2024 and nodes["n1"]["warc_ts"].month == 2


def test_hot_key_skew_survives_salt(ray_session):
    """One head entity at ~30% frequency (FIXTURES §4.5): salted two-phase
    must produce exactly one node and correct edge weights."""
    import pyarrow as pa
    from datetime import datetime
    cfg = EngineConfig.default()
    cfg.ray.canonical_salt_buckets = 8
    rows = []
    for i in range(3000):
        subj = "HOT" if i % 3 == 0 else f"cold{i}"
        rows.append({"subj": subj, "pred": "P", "obj": "x", "subj_label": "A",
                     "obj_label": "B", "url": f"u{i}", "warc_ts": datetime(2024, 1, 1),
                     "score": 1.0, "provenance": "s"})
    ds = rd.from_arrow(pa.Table.from_pylist(rows, schema=schemas.TRIPLES))
    edges = canonicalize_edges(ds, cfg).take_all()
    hot = [e for e in edges if e["subj"] == "HOT"]
    assert len(hot) == 1 and hot[0]["weight"] == 1000
    nodes = canonicalize_nodes(ds, cfg, salted=True).take_all()
    assert sum(1 for n in nodes if n["node_id"] == "HOT") == 1


def test_salt_varies_within_key():
    """VERDICT r1 #1: the pre-round salt must spread one hot key's rows over
    multiple (key, salt) partitions. Two adversarial shapes: (a) the key
    always at row 0 of its batch but with per-doc props (post-partial shape);
    (b) identical (key, props) rows repeated inside one batch."""
    import pyarrow as pa
    from datetime import datetime
    from neo4j_tkapi_ray.stages.canonicalize import add_salt

    def stub(props_list):
        return pa.table({
            "node_id": pa.array(["HOT"] * len(props_list)),
            "label": pa.array(["A"] * len(props_list)),
            "props": pa.array(props_list),
            "warc_ts": pa.array([datetime(2024, 1, 1)] * len(props_list),
                                pa.timestamp("us")),
        })

    # (a) one row per batch, distinct props, always at position 0
    salts_a = {add_salt(stub([f'{{"last_url": "u{i}"}}']), 16)
               .column("salt")[0].as_py() for i in range(24)}
    assert len(salts_a) >= 2

    # (b) one batch, identical props repeated
    t = add_salt(stub(['{"last_url": "same"}'] * 32), 16)
    assert len(set(t.column("salt").to_pylist())) >= 2
