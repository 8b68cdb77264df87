"""The manifest-driven shard source behind registry_edges /
nested_child_edges: driver expands (table, row-group) work items from
parquet metadata; one task reads exactly one shard. The registry fixtures
are single-row-group, so this pins the multi-row-group path explicitly."""

import os

import pyarrow as pa
import pyarrow.parquet as pq

from neo4j_tkapi_ray.stages.registry_edges import (_manifest_dataset,
                                                   registry_edges,
                                                   shard_manifest)


def _write_multi_rg(tmp_path, n_rows=100, rg_size=17):
    path = os.path.join(tmp_path, "cases.parquet")
    t = pa.table({
        "zaak_id": [f"z{i}" for i in range(n_rows)],
        "dossier_id": [f"d{i % 7}" if i % 3 else "" for i in range(n_rows)],
        "vervangen_door": ["" for _ in range(n_rows)],
    })
    pq.write_table(t, path, row_group_size=rg_size)
    return path


def test_shard_manifest_expands_row_groups(tmp_path):
    path = _write_multi_rg(str(tmp_path))
    items = shard_manifest([{"table": "cases", "path": path,
                             "cols": ["zaak_id", "dossier_id"]}])
    assert len(items) == 6  # ceil(100 / 17)
    assert sorted(i["rg"] for i in items) == list(range(6))
    assert all(i["table"] == "cases" for i in items)


def test_registry_edges_reads_every_shard(ray_session, tmp_path):
    """Every row group contributes edges; nothing is dropped or doubled."""
    _write_multi_rg(str(tmp_path))
    rel_map = [("cases", "zaak_id", "Zaak", "HAS_DOSSIER",
                "dossier_id", "Dossier")]
    out = registry_edges(str(tmp_path), rel_map).to_pandas()
    # rows with i % 3 == 0 have empty dossier_id and are filtered
    expected = {(f"z{i}", f"d{i % 7}") for i in range(100) if i % 3}
    assert set(zip(out["subj"], out["obj"])) == expected
    assert (out["pred"] == "HAS_DOSSIER").all()


def test_manifest_dataset_empty_is_empty_edge_table(ray_session):
    ds = _manifest_dataset([], None)
    assert ds.count() == 0
    # the edge schema survives the empty case (unions downstream rely on it)
    assert ds.schema().names == ["subj", "subj_label", "pred", "obj",
                                 "obj_label"]
