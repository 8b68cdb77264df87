"""Nested list<struct> property flattening — the persoon nesting family.

The reference stores persoon gifts / side positions / incomes as nested
child entities created per parent (persoon_processor.py:64-167:
PersoonGeschenk RECEIVED_GIFT, PersoonNevenfunctie HAS_SIDEPOSITION,
PersoonNevenfunctieInkomsten HAS_INCOME — REL_MAP_PERSOON /
REL_MAP_PERSOON_NEVENFUNCTIE in constants.py). Here they are nested Arrow
``list<struct>`` columns on the persons dimension, flattened to child rows
by stateless vectorized-enough map_batches (flat-map shape); the DuckDB
oracle re-derives the same rows with UNNEST + generate_subscripts.
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
