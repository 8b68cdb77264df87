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
