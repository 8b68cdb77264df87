"""Declarative registry-edge projection — the REL_MAP analog.

The reference drives its whole edge taxonomy from 18 declarative
``REL_MAP_*`` dicts (``attr_name -> (target_label, rel_type, key)``,
/root/reference/src/core/config/constants.py:1-152) iterated by every
loader (e.g. zaak_loader.py via helpers.merge_rel). Here the same idea is a
single table-driven projection: each registry table's fk columns map to
typed edges, emitted by a stateless vectorized ``map_batches`` over the
parquet dimension tables (pure column select/rename + null filter — no
shuffle; dedup happens downstream in canonicalize_edges if desired).

The edge inventory is ``REGISTRY_REL_MAP`` itself — one entry per reference
relationship type, grouped and cited inline. Entries are 6-tuples
``(table, src_col, src_label, rel, dst_col, dst_label)``; an optional 7th
element ``(filter_col, filter_val)`` restricts the projection to rows with
that discriminator value (used where the reference models sibling child
entity types — e.g. CommissieZetelVastPersoon vs VervangerPersoon,
constants.py:105-110 — that this registry stores as one table with a
``soort`` column).

Deliberate deviations from the reference taxonomy, kept for compactness:
  - Activity -HAS_ACT_ACTOR-> Persoon collapses the intermediate
    ActiviteitActor node (REL_MAP_ACTIVITEIT 'actors' + REL_MAP_ACTOR
    'persoon') into one edge; ZaakActor/DocumentActor are modeled in full.
  - Persoon -HAS_FRACTIE-> Fractie is a convenience edge alongside the full
    FractieZetel chain (REL_MAP_FRACTIE_ZETEL_PERSOON).
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# (table, src_col, src_label, rel_type, dst_col, dst_label[, (flt_col,
# flt_val)]); src/dst cols are the row key or the fk column — direction
# encoded explicitly per entry.
REGISTRY_REL_MAP: List[tuple] = [
    ("cases", "zaak_id", "Zaak", "HAS_DOSSIER", "dossier_id", "Dossier"),
    ("cases", "zaak_id", "Zaak", "REPLACED_BY", "vervangen_door", "Zaak"),
    ("activities", "session_id", "Vergadering", "HAS_ACTIVITEIT",
     "activity_id", "Activity"),
    ("activity_actors", "activity_id", "Activity", "HAS_ACT_ACTOR",
     "person_id", "Persoon"),
    ("persons", "person_id", "Persoon", "HAS_FRACTIE", "fractie_id", "Fractie"),
    ("reg_documents", "document_id", "Document", "REFERS_TO_ZAAK",
     "zaak_id", "Zaak"),
    ("reg_documents", "document_id", "Document", "HAS_DOSSIER",
     "dossier_id", "Dossier"),
    ("besluiten", "besluit_id", "Besluit", "ABOUT_ZAAK", "zaak_id", "Zaak"),
    ("besluiten", "besluit_id", "Besluit", "BELONGS_TO_ACTIVITEIT",
     "activity_id", "Activity"),
    ("api_stemmingen", "besluit_id", "Besluit", "HAS_STEMMING",
     "stemming_id", "Stemming"),
    ("api_stemmingen", "stemming_id", "Stemming", "REPRESENTS_FRACTIE_VOTE",
     "fractie_id", "Fractie"),
    # committee lead (REL_MAP_ACTIVITEIT 'voortouwcommissies')
    ("activities", "activity_id", "Activity", "HAS_VOORTOUWCOMMISSIE",
     "commissie_id", "Commissie"),
    # rooms + reservations (REL_MAP_RESERVERING / REL_MAP_ZAAL)
    ("reserveringen", "reservering_id", "Reservering", "RESERVES_ZAAL",
     "zaal_id", "Zaal"),
    ("reserveringen", "reservering_id", "Reservering", "FOR_ACTIVITEIT",
     "activity_id", "Activity"),
    # toezegging self-referential pairs (REL_MAP_TOEZEGGING,
    # constants.py:35-42 — more J9 coverage) + provenance links
    ("toezeggingen", "toezegging_id", "Toezegging", "SUPPLEMENTS",
     "is_aanvulling_op", "Toezegging"),
    ("toezeggingen", "toezegging_id", "Toezegging", "REITERATES",
     "is_herhaling_van", "Toezegging"),
    ("toezeggingen", "toezegging_id", "Toezegging", "BELONGS_TO_ACTIVITEIT",
     "activity_id", "Activity"),
    ("toezeggingen", "toezegging_id", "Toezegging", "MADE_BY",
     "person_id", "Persoon"),
    # PersoonFunctie family (REL_MAP_PERSOON_FUNCTIE, constants.py:132-135)
    ("persoon_functies", "functie_id", "PersoonFunctie", "PERSON_HAS_FUNCTION",
     "person_id", "Persoon"),
    ("persoon_functies", "functie_id", "PersoonFunctie", "FUNCTION_FOR_FRACTIE",
     "fractie_id", "Fractie"),
    # Kamerstukdossier containment (REL_MAP_KAMERSTUKDOSSIER,
    # constants.py:137-140) — the reverse direction of the HAS_DOSSIER fks
    ("reg_documents", "dossier_id", "Dossier", "CONTAINS_DOCUMENT",
     "document_id", "Document"),
    ("cases", "dossier_id", "Dossier", "CONTAINS_ZAAK", "zaak_id", "Zaak"),
    # ---- REL_MAP_ZAAK completion (constants.py:1-9) ----------------------
    ("activity_cases", "zaak_id", "Zaak", "HAS_ACTIVITEIT",
     "activity_id", "Activity"),
    ("activity_cases", "activity_id", "Activity", "PART_OF_ZAAK",
     "zaak_id", "Zaak"),                      # REL_MAP_ACTIVITEIT 'zaken'
    ("besluiten", "zaak_id", "Zaak", "HAS_BESLUIT", "besluit_id", "Besluit"),
    ("reg_documents", "zaak_id", "Zaak", "HAS_DOCUMENT",
     "document_id", "Document"),
    ("agendapunten", "zaak_id", "Zaak", "HAS_AGENDAPUNT",
     "agendapunt_id", "Agendapunt"),
    ("zaak_actors", "zaak_id", "Zaak", "HAS_ACTOR", "actor_id", "ZaakActor"),
    # REL_MAP_ZAAK_ACTOR (constants.py:120-124)
    ("zaak_actors", "actor_id", "ZaakActor", "ACTED_AS_PERSOON",
     "person_id", "Persoon"),
    ("zaak_actors", "actor_id", "ZaakActor", "ACTED_AS_FRACTIE",
     "fractie_id", "Fractie"),
    ("zaak_actors", "actor_id", "ZaakActor", "ACTED_AS_COMMISSIE",
     "commissie_id", "Commissie"),
    # ---- REL_MAP_DOC completion (constants.py:11-17) ---------------------
    ("reg_documents", "document_id", "Document", "HAS_ACTIVITEIT",
     "activity_id", "Activity"),
    ("document_actors", "document_id", "Document", "HAS_ACTOR",
     "actor_id", "DocumentActor"),
    # REL_MAP_DOCUMENT_ACTOR (constants.py:57-61)
    ("document_actors", "actor_id", "DocumentActor", "ACTED_AS_PERSOON",
     "person_id", "Persoon"),
    ("document_actors", "actor_id", "DocumentActor", "ACTED_AS_FRACTIE",
     "fractie_id", "Fractie"),
    ("document_actors", "actor_id", "DocumentActor", "ACTED_AS_COMMISSIE",
     "commissie_id", "Commissie"),
    ("document_versies", "document_id", "Document", "HAS_VERSIE",
     "versie_id", "DocumentVersie"),          # REL_MAP_DOC 'versies'
    # ---- REL_MAP_ACTIVITEIT completion (constants.py:19-27) --------------
    ("reg_documents", "activity_id", "Activity", "HAS_DOCUMENT",
     "document_id", "Document"),
    ("agendapunten", "activity_id", "Activity", "HAS_AGENDAPUNT",
     "agendapunt_id", "Agendapunt"),
    ("reserveringen", "activity_id", "Activity", "HAS_RESERVERING",
     "reservering_id", "Reservering"),
    ("activities", "activity_id", "Activity", "HAS_ZAAL", "zaal_id", "Zaal"),
    # REL_MAP_ACTIVITEIT_SELF (constants.py:50-55): forward fks + derived
    # inverse directions
    ("activities", "activity_id", "Activity", "REPLACED_BY",
     "vervangen_door", "Activity"),
    ("activities", "vervangen_door", "Activity", "REPLACED_FROM",
     "activity_id", "Activity"),
    ("activities", "activity_id", "Activity", "CONTINUED_FROM",
     "voortgezet_vanuit", "Activity"),
    ("activities", "voortgezet_vanuit", "Activity", "CONTINUED_IN",
     "activity_id", "Activity"),
    # ---- REL_MAP_BESLUIT completion (constants.py:45-48) -----------------
    ("besluiten", "besluit_id", "Besluit", "BELONGS_TO_AGENDAPUNT",
     "agendapunt_id", "Agendapunt"),
    # ---- REL_MAP_TOEZEGGING inverse + modification pairs
    # (constants.py:35-42) -------------------------------------------------
    ("toezeggingen", "is_aanvulling_op", "Toezegging", "SUPPLEMENTED_BY",
     "toezegging_id", "Toezegging"),
    ("toezeggingen", "is_herhaling_van", "Toezegging", "REITERATED_BY",
     "toezegging_id", "Toezegging"),
    ("toezeggingen", "toezegging_id", "Toezegging", "MODIFIES",
     "is_wijziging_van", "Toezegging"),
    ("toezeggingen", "is_wijziging_van", "Toezegging", "MODIFIED_BY",
     "toezegging_id", "Toezegging"),
    # ---- Fractie seat chain (REL_MAP_FRACTIE / _ZETEL / _ZETEL_PERSOON /
    # REL_MAP_PERSOON 'fractieleden', constants.py:70-92) ------------------
    ("fractie_zetels", "fractie_id", "Fractie", "HAS_ZETEL",
     "zetel_id", "FractieZetel"),
    ("fractie_zetel_persons", "zetel_id", "FractieZetel", "HAS_INCUMBENT",
     "fzp_id", "FractieZetelPersoon"),
    ("fractie_zetel_persons", "fzp_id", "FractieZetelPersoon", "IS_PERSON",
     "person_id", "Persoon"),
    ("fractie_zetel_persons", "person_id", "Persoon", "HAS_SEAT_ASSIGNMENT",
     "fzp_id", "FractieZetelPersoon"),
    ("fractie_zetel_vacatures", "zetel_id", "FractieZetel", "HAS_VACANCY",
     "vacature_id", "FractieZetelVacature"),
    # ---- Commissie seat chain (REL_MAP_COMMISSIE / _ZETEL /
    # _ZETEL_PERSOON, constants.py:101-118) — the reference's four child
    # types are the ``soort`` discriminator here ---------------------------
    ("commissie_zetels", "commissie_id", "Commissie", "HAS_ZETEL",
     "zetel_id", "CommissieZetel"),
    ("commissie_zetel_persons", "zetel_id", "CommissieZetel", "HAS_MEMBER",
     "czp_id", "CommissieZetelVastPersoon", ("soort", "vast")),
    ("commissie_zetel_persons", "zetel_id", "CommissieZetel",
     "HAS_TEMP_MEMBER", "czp_id", "CommissieZetelVervangerPersoon",
     ("soort", "vervanger")),
    ("commissie_zetel_persons", "czp_id", "CommissieZetelVastPersoon",
     "IS_PERSON", "person_id", "Persoon", ("soort", "vast")),
    ("commissie_zetel_persons", "czp_id", "CommissieZetelVervangerPersoon",
     "IS_PERSON", "person_id", "Persoon", ("soort", "vervanger")),
    ("commissie_zetel_vacatures", "zetel_id", "CommissieZetel", "HAS_VACANCY",
     "vacature_id", "CommissieZetelVastVacature", ("soort", "vast")),
    ("commissie_zetel_vacatures", "zetel_id", "CommissieZetel",
     "HAS_TEMP_VACANCY", "vacature_id", "CommissieZetelVervangerVacature",
     ("soort", "vervanger")),
    # ---- REL_MAP_ZAAL / REL_MAP_RESERVERING completion
    # (constants.py:142-152) -----------------------------------------------
    ("reserveringen", "reservering_id", "Reservering", "FOR_VERGADERING",
     "vergadering_id", "Vergadering"),
    ("reserveringen", "zaal_id", "Zaal", "HOSTS_VERGADERING",
     "vergadering_id", "Vergadering"),
    ("reserveringen", "zaal_id", "Zaal", "HAS_RESERVERING",
     "reservering_id", "Reservering"),
    ("activities", "zaal_id", "Zaal", "HOSTS_ACTIVITEIT",
     "activity_id", "Activity"),
]

EDGE_SCHEMA = pa.schema([
    ("subj", pa.string()), ("subj_label", pa.string()),
    ("pred", pa.string()), ("obj", pa.string()), ("obj_label", pa.string()),
])


def _project_one(batch: pa.Table, src_col: str, src_label: str, rel: str,
                 dst_col: str, dst_label: str,
                 flt: Tuple[str, str] = None) -> pa.Table:
    if flt is not None:
        batch = batch.filter(
            pc.fill_null(pc.equal(batch.column(flt[0]), flt[1]), False))
    subj = batch.column(src_col)
    obj = batch.column(dst_col)
    # fk may be '' / null (e.g. vervangen_door on non-superseded zaken);
    # Kleene nulls in the mask filter out as false
    mask = pc.fill_null(pc.and_kleene(pc.not_equal(obj, ""),
                                      pc.not_equal(subj, "")), False)
    subj, obj = subj.filter(mask), obj.filter(mask)
    n = len(subj)
    return pa.table({
        "subj": subj,
        "subj_label": pa.array([src_label] * n, pa.string()),
        "pred": pa.array([rel] * n, pa.string()),
        "obj": obj,
        "obj_label": pa.array([dst_label] * n, pa.string()),
    })


def _project_table(entries: List[tuple]):
    """Emit ALL of a table's edge projections from one batch pass — the
    table's parquet is read once, not once per relation type."""
    def fn(batch: pa.Table) -> pa.Table:
        outs = [_project_one(batch, *e) for e in entries]
        outs = [o for o in outs if o.num_rows] or outs[:1]
        return pa.concat_tables(outs)
    return fn


def shard_manifest(jobs: List[dict]) -> List[dict]:
    """Expand per-table read jobs into per-row-group work items (a shard
    manifest). Driver touches parquet METADATA only, never data; each item
    becomes one Ray task that reads exactly its row group. This is the
    engine's pattern for many-heterogeneous-tables sources: one manifest
    Dataset + one map operator instead of a Dataset-union per table —
    plan width stays constant while row-group granularity preserves the
    read parallelism of ``read_parquet`` (SCALING.md §"Registry-edge ...").
    """
    import pyarrow.parquet as pq
    items = []
    for job in jobs:
        n_rg = pq.ParquetFile(job["path"]).metadata.num_row_groups
        for rg in range(n_rg):
            items.append({**job, "rg": rg})
    return items


def _manifest_dataset(items: List[dict], project_fn) -> rd.Dataset:
    """One block per manifest item -> one read+project task per shard.

    Owns the shard read so every adopter of the pattern shares one
    ParquetFile/read_row_group lifecycle: ``project_fn(shard, item)``
    receives the already-read row group (pruned to ``item['cols']``) and
    returns an edge-schema table."""
    if not items:
        return rd.from_arrow(EDGE_SCHEMA.empty_table())
    ds = rd.from_items(items, override_num_blocks=len(items))

    def emit(batch: pa.Table) -> pa.Table:
        import pyarrow.parquet as pq
        outs = [EDGE_SCHEMA.empty_table()]
        for item in batch.to_pylist():
            shard = pq.ParquetFile(item["path"]).read_row_group(
                item["rg"], columns=list(item["cols"]))
            outs.append(project_fn(shard, item))
        return pa.concat_tables(outs, promote_options="default")

    return ds.map_batches(emit, batch_size=None, batch_format="pyarrow")


def registry_edges(registry_dir: str, rel_map: List[tuple] = None
                   ) -> rd.Dataset:
    """All registry-projected edges as one Dataset (SQL-mirrorable: each
    rel-map entry is SELECT src, 'REL', dst FROM table WHERE fk <> ''
    [AND flt_col = flt_val]).

    Entries are grouped by source table (each dimension parquet is read
    once with the union of the columns its projections need, and every
    edge type for that table is emitted in one vectorized pass), and the
    whole projection is ONE manifest-driven operator: the driver lists
    (table, row-group) work items, each task opens only its shard. Plan
    width is 2 operators regardless of #tables (~20) or #relation-types
    (~66) — the earlier one-Dataset-per-table union paid ~2 s of executor
    overhead per leaf (42 s for an 11k-row projection at sf0.01)."""
    import os
    rel_map = rel_map or REGISTRY_REL_MAP
    by_table: dict = {}
    for table, *entry in rel_map:
        by_table.setdefault(table, []).append(tuple(entry))
    jobs = []
    for table, entries in by_table.items():
        path = os.path.join(registry_dir, f"{table}.parquet")
        if not os.path.exists(path):
            continue
        cols = set()
        for src_col, _, _, dst_col, _, *rest in entries:
            cols |= {src_col, dst_col} | ({rest[0][0]} if rest else set())
        jobs.append({"table": table, "path": path, "cols": sorted(cols)})

    def project(shard: pa.Table, item: dict) -> pa.Table:
        return _project_table(by_table[item["table"]])(shard)

    return _manifest_dataset(shard_manifest(jobs), project)


def lift_edges_to_triples(edges: rd.Dataset) -> rd.Dataset:
    """Lift (subj, subj_label, pred, obj, obj_label) edge rows into the
    triple-stream schema (schemas.TRIPLES): ``url='registry'``, ``warc_ts``
    at epoch 0 (any page-derived property wins the nodes' last-write-wins
    merge), ``score=1.0``, ``provenance='registry'``."""
    from datetime import datetime

    epoch0 = datetime(1970, 1, 1)

    def lift(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "subj": b.column("subj"), "pred": b.column("pred"),
            "obj": b.column("obj"),
            "subj_label": b.column("subj_label"),
            "obj_label": b.column("obj_label"),
            "url": pa.array(["registry"] * n, pa.string()),
            "warc_ts": pa.array([epoch0] * n, pa.timestamp("us")),
            "score": pa.array([1.0] * n, pa.float64()),
            "provenance": pa.array(["registry"] * n, pa.string()),
        })

    return edges.map_batches(lift, batch_format="pyarrow",
                             zero_copy_batch=True)


def registry_triples(registry_dir: str, rel_map: List[tuple] = None,
                     include_nested: bool = True) -> rd.Dataset:
    """The full registry edge surface lifted into the triple-stream schema
    so the FULL graph — API entities + relationships + VLOS-derived facts,
    the reference's ``python src/main.py`` load (SURVEY §3.1) — can flow
    through the same canonicalize shuffles as the page stream. With
    ``include_nested`` the nested child-entity edges (gifts, side
    positions, incomes, contacts, careers, publications — ops.nested)
    ride along."""
    edges = registry_edges(registry_dir, rel_map)
    if include_nested:
        from ..ops.nested import nested_child_edges
        edges = edges.union(nested_child_edges(registry_dir))
    return lift_edges_to_triples(edges)
