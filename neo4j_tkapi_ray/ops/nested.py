"""Nested list<struct> property flattening — the nesting families.

The reference stores persoon gifts / side positions / incomes as nested
child entities created per parent (persoon_processor.py:64-167:
PersoonGeschenk RECEIVED_GIFT, PersoonNevenfunctie HAS_SIDEPOSITION,
PersoonNevenfunctieInkomsten HAS_INCOME — REL_MAP_PERSOON /
REL_MAP_PERSOON_NEVENFUNCTIE in constants.py), and document-versie
publications as merged child entities per versie (document_loader.py:
205-236 — REL_MAP_DOCUMENT_VERSIE 'publicaties'/'publicatie_metadata',
constants.py:64-67). Here they are nested Arrow ``list<struct>`` columns
on the dimension tables, flattened to child rows by stateless
vectorized-enough map_batches (flat-map shape); the DuckDB oracle
re-derives the same rows with UNNEST + generate_subscripts.
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import ray.data as rd

_GIFTS_SCHEMA = pa.schema([
    ("person_id", pa.string()), ("gift_idx", pa.int64()),
    ("omschrijving", pa.string()), ("waarde", pa.float64()),
    ("datum_epoch", pa.int64())])

_INCOME_SCHEMA = pa.schema([
    ("person_id", pa.string()), ("func_idx", pa.int64()),
    ("omschrijving", pa.string()), ("jaar", pa.int64()),
    ("bedrag", pa.float64())])

_PUBLICATIE_SCHEMA = pa.schema([
    ("versie_id", pa.string()), ("pub_idx", pa.int64()),
    ("publicatie_id", pa.string()), ("soort", pa.string()),
    ("datum_epoch", pa.int64())])


def _epoch(dt) -> int:
    return int((dt - datetime(1970, 1, 1)).total_seconds())


def person_gifts(persons_path: str) -> rd.Dataset:
    """One row per (persoon, geschenk) — the PersoonGeschenk child entity."""
    ds = rd.read_parquet(persons_path, columns=["person_id", "geschenken"])

    def fn(batch: pa.Table) -> pa.Table:
        rows = []
        for pid, gifts in zip(batch.column("person_id").to_pylist(),
                              batch.column("geschenken").to_pylist()):
            for i, g in enumerate(gifts or []):
                rows.append({"person_id": pid, "gift_idx": i,
                             "omschrijving": g["omschrijving"],
                             "waarde": g["waarde"],
                             "datum_epoch": _epoch(g["datum"])})
        if not rows:
            return _GIFTS_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=_GIFTS_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def document_publicaties(versies_path: str) -> rd.Dataset:
    """One row per (document versie, publicatie) — the merged Publicatie /
    PublicatieMetadata children of document_loader.py:205-236."""
    ds = rd.read_parquet(versies_path, columns=["versie_id", "publicaties"])

    def fn(batch: pa.Table) -> pa.Table:
        rows = []
        for vid, pubs in zip(batch.column("versie_id").to_pylist(),
                             batch.column("publicaties").to_pylist()):
            for i, p in enumerate(pubs or []):
                rows.append({"versie_id": vid, "pub_idx": i,
                             "publicatie_id": p["publicatie_id"],
                             "soort": p["soort"],
                             "datum_epoch": _epoch(p["datum"])})
        if not rows:
            return _PUBLICATIE_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=_PUBLICATIE_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def nevenfunctie_incomes(persons_path: str) -> rd.Dataset:
    """One row per (persoon, nevenfunctie, inkomst) — the two-level
    PersoonNevenfunctie -> Inkomsten nesting flattened."""
    ds = rd.read_parquet(persons_path, columns=["person_id", "nevenfuncties"])

    def fn(batch: pa.Table) -> pa.Table:
        rows = []
        for pid, funcs in zip(batch.column("person_id").to_pylist(),
                              batch.column("nevenfuncties").to_pylist()):
            for i, f in enumerate(funcs or []):
                for ink in f["inkomsten"] or []:
                    rows.append({"person_id": pid, "func_idx": i,
                                 "omschrijving": f["omschrijving"],
                                 "jaar": ink["jaar"], "bedrag": ink["bedrag"]})
        if not rows:
            return _INCOME_SCHEMA.empty_table()
        return pa.Table.from_pylist(rows, schema=_INCOME_SCHEMA)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


# ---------------------------------------------------------------------------
# Nested child-entity EDGES — the REL_MAP_PERSOON / _FRACTIE / _COMMISSIE /
# _PERSOON_NEVENFUNCTIE / _DOCUMENT_VERSIE completion (constants.py:63-102).
# The reference creates one child NODE per nested record plus a typed edge
# from the parent; here child ids are synthesized deterministically as
# ``{parent_id}/{slug}/{ordinal}`` and the edges stream from the same
# list<struct> columns the flatteners read.
# ---------------------------------------------------------------------------

# (table, parent_col, parent_label, nested_col, rel_type, child_label, slug)
NESTED_EDGE_FAMILIES = [
    ("persons", "person_id", "Persoon", "geschenken",
     "RECEIVED_GIFT", "PersoonGeschenk", "gift"),
    ("persons", "person_id", "Persoon", "nevenfuncties",
     "HAS_SIDEPOSITION", "PersoonNevenfunctie", "nevenfunctie"),
    ("persons", "person_id", "Persoon", "contact_informaties",
     "HAS_CONTACTINFO", "PersoonContactinformatie", "contact"),
    ("persons", "person_id", "Persoon", "loopbaan",
     "HAS_CAREER", "PersoonLoopbaan", "loopbaan"),
    ("persons", "person_id", "Persoon", "onderwijs",
     "HAS_EDUCATION", "PersoonOnderwijs", "onderwijs"),
    ("persons", "person_id", "Persoon", "reizen",
     "HAS_TRAVEL", "PersoonReis", "reis"),
    ("parties", "fractie_id", "Fractie", "aanvullende_gegevens",
     "HAS_AANVULLEND", "FractieAanvullendGegeven", "aanvullend"),
    ("commissies", "commissie_id", "Commissie", "contact_informaties",
     "HAS_CONTACTINFO", "CommissieContactinformatie", "contact"),
]

_EDGE_SCHEMA = pa.schema([
    ("subj", pa.string()), ("subj_label", pa.string()),
    ("pred", pa.string()), ("obj", pa.string()), ("obj_label", pa.string())])


def _explode_index(parent, lst):
    """Vectorized (parent_id, ordinal) explode of a list column via list
    lengths — no per-row Python until the final id-format step."""
    import numpy as np
    import pyarrow.compute as pc
    lens = pc.fill_null(pc.list_value_length(lst), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    total = int(lens.sum())
    par = np.repeat(parent.to_numpy(zero_copy_only=False), lens)
    starts = np.repeat(np.cumsum(lens) - lens, lens)
    idx = np.arange(total) - starts
    return par, idx


def _edge_table(subj, subj_label, pred, obj, obj_label, n) -> pa.Table:
    return pa.table({
        "subj": pa.array(subj, pa.string()),
        "subj_label": pa.array([subj_label] * n, pa.string()),
        "pred": pa.array([pred] * n, pa.string()),
        "obj": pa.array(obj, pa.string()),
        "obj_label": pa.array([obj_label] * n, pa.string())})


def nested_child_edges(registry_dir: str) -> rd.Dataset:
    """All nested-family edges as one Dataset: the flat single-level
    families, the two-level nevenfunctie -> inkomsten chain (HAS_INCOME),
    and the DocumentVersie publicaties split by soort into HAS_PUBLICATIE /
    HAS_PUBLICATIE_METADATA (REL_MAP_DOCUMENT_VERSIE).

    Like ``registry_edges``, this is ONE manifest-driven operator: the
    driver lists (table, row-group) shards, each task reads only its shard
    and runs every family for that table — constant plan width instead of
    a Dataset-union leaf per table (each leaf cost ~2 s of executor
    overhead; 22 s for a 1.7k-row projection at sf0.01)."""
    import os
    by_table = {}
    for table, pcol, plabel, ncol, rel, clabel, slug in NESTED_EDGE_FAMILIES:
        by_table.setdefault(table, []).append(
            (pcol, plabel, ncol, rel, clabel, slug))

    def flat_fn(batch: pa.Table, fams) -> pa.Table:
        outs = []
        for pcol, plabel, ncol, rel, clabel, slug in fams:
            if ncol not in batch.column_names:
                continue
            par, idx = _explode_index(batch.column(pcol), batch.column(ncol))
            objs = [f"{p}/{slug}/{i}" for p, i in zip(par, idx)]
            outs.append(_edge_table(list(par), plabel, rel, objs,
                                    clabel, len(objs)))
        outs = [o for o in outs if o.num_rows] or [_EDGE_SCHEMA.empty_table()]
        return pa.concat_tables(outs)

    def incomes_fn(batch: pa.Table) -> pa.Table:
        rows_s, rows_o = [], []
        for pid, funcs in zip(batch.column("person_id").to_pylist(),
                              batch.column("nevenfuncties").to_pylist()):
            for i, f in enumerate(funcs or []):
                parent = f"{pid}/nevenfunctie/{i}"
                for j, _ in enumerate(f["inkomsten"] or []):
                    rows_s.append(parent)
                    rows_o.append(f"{parent}/inkomst/{j}")
        return _edge_table(rows_s, "PersoonNevenfunctie", "HAS_INCOME",
                           rows_o, "PersoonNevenfunctieInkomsten",
                           len(rows_s))

    # DocumentVersie publicaties (real child ids; soort discriminates the
    # reference's two sibling types)
    def pubs_fn(batch: pa.Table) -> pa.Table:
        outs = {("HAS_PUBLICATIE", "DocumentPublicatie"): ([], []),
                ("HAS_PUBLICATIE_METADATA",
                 "DocumentPublicatieMetadata"): ([], [])}
        for vid, ps in zip(batch.column("versie_id").to_pylist(),
                           batch.column("publicaties").to_pylist()):
            for p in ps or []:
                key = (("HAS_PUBLICATIE", "DocumentPublicatie")
                       if p["soort"] == "Publicatie" else
                       ("HAS_PUBLICATIE_METADATA",
                        "DocumentPublicatieMetadata"))
                outs[key][0].append(vid)
                outs[key][1].append(p["publicatie_id"])
        tables = [
            _edge_table(s, "DocumentVersie", rel, o, clabel, len(s))
            for (rel, clabel), (s, o) in outs.items() if s]
        return (pa.concat_tables(tables) if tables
                else _EDGE_SCHEMA.empty_table())

    # shard manifest: one job per (kind, table); expanded to row groups
    from ..stages.registry_edges import _manifest_dataset, shard_manifest
    jobs = []
    for table, fams in by_table.items():
        path = os.path.join(registry_dir, f"{table}.parquet")
        if os.path.exists(path):
            cols = sorted({fams[0][0]} | {f[2] for f in fams})
            jobs.append({"kind": "flat", "table": table, "path": path,
                         "cols": cols})
    p_path = os.path.join(registry_dir, "persons.parquet")
    if os.path.exists(p_path):
        jobs.append({"kind": "incomes", "table": "persons", "path": p_path,
                     "cols": ["person_id", "nevenfuncties"]})
    dv_path = os.path.join(registry_dir, "document_versies.parquet")
    if os.path.exists(dv_path):
        jobs.append({"kind": "pubs", "table": "document_versies",
                     "path": dv_path, "cols": ["versie_id", "publicaties"]})

    def project(shard: pa.Table, item: dict) -> pa.Table:
        if item["kind"] == "flat":
            return flat_fn(shard, by_table[item["table"]])
        if item["kind"] == "incomes":
            return incomes_fn(shard)
        return pubs_fn(shard)

    return _manifest_dataset(shard_manifest(jobs), project)


def nested_edges_sql(corpus_dir: str) -> str:
    """DuckDB mirror of nested_child_edges (UNNEST + generate_subscripts),
    kept next to NESTED_EDGE_FAMILIES so the two stay in sync."""
    parts = []
    for table, pcol, plabel, ncol, rel, clabel, slug in NESTED_EDGE_FAMILIES:
        parts.append(
            f"SELECT {pcol} AS subj, '{plabel}' AS subj_label, "
            f"'{rel}' AS pred, "
            f"{pcol} || '/{slug}/' || CAST(generate_subscripts({ncol}, 1) - 1 "
            f"AS VARCHAR) AS obj, '{clabel}' AS obj_label "
            f"FROM read_parquet('{corpus_dir}/{table}.parquet')")
    parts.append(f"""
        SELECT person_id || '/nevenfunctie/' || i AS subj,
               'PersoonNevenfunctie' AS subj_label, 'HAS_INCOME' AS pred,
               person_id || '/nevenfunctie/' || i || '/inkomst/' ||
                   CAST(generate_subscripts(f.inkomsten, 1) - 1 AS VARCHAR)
                   AS obj,
               'PersoonNevenfunctieInkomsten' AS obj_label
        FROM (SELECT person_id,
                     CAST(generate_subscripts(nevenfuncties, 1) - 1
                          AS VARCHAR) AS i,
                     unnest(nevenfuncties) AS f
              FROM read_parquet('{corpus_dir}/persons.parquet'))""")
    parts.append(f"""
        SELECT versie_id AS subj, 'DocumentVersie' AS subj_label,
               CASE WHEN p.soort = 'Publicatie' THEN 'HAS_PUBLICATIE'
                    ELSE 'HAS_PUBLICATIE_METADATA' END AS pred,
               p.publicatie_id AS obj,
               CASE WHEN p.soort = 'Publicatie' THEN 'DocumentPublicatie'
                    ELSE 'DocumentPublicatieMetadata' END AS obj_label
        FROM (SELECT versie_id, unnest(publicaties) AS p
              FROM read_parquet('{corpus_dir}/document_versies.parquet'))""")
    return " UNION ALL ".join(parts)
