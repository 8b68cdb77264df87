"""Declarative registry-edge projection — the REL_MAP analog.

The reference drives its whole edge taxonomy from 18 declarative
``REL_MAP_*`` dicts (``attr_name -> (target_label, rel_type, key)``,
/root/reference/src/core/config/constants.py:1-152) iterated by every
loader (e.g. zaak_loader.py via helpers.merge_rel). Here the same idea is a
single table-driven projection: each registry table's fk columns map to
typed edges, emitted by a stateless vectorized ``map_batches`` over the
parquet dimension tables (pure column select/rename + null filter — no
shuffle; dedup happens downstream in canonicalize_edges if desired).

Edge inventory (reference provenance cited per entry):

  cases.dossier_id        Zaak -HAS_DOSSIER-> Dossier     constants.py:8 (REL_MAP_ZAAK 'dossier')
  cases.vervangen_door    Zaak -REPLACED_BY-> Zaak        constants.py:7 (J9 self-referential)
  activities.session_id   Vergadering -HAS_ACTIVITEIT-> Activity
                                                          vergadering_processor.py:15-20
  activity_actors         Activity -HAS_ACT_ACTOR-> Persoon
                                                          constants.py REL_MAP_ACTIVITEIT 'actors' +
                                                          REL_MAP_ACTOR 'persoon' (ACTED_AS_PERSOON) —
                                                          the intermediate ActiviteitActor node is
                                                          collapsed into one edge (documented deviation)
  persons.fractie_id      Persoon -HAS_FRACTIE-> Fractie  collapses the FractieZetel ->
                                                          FractieZetelPersoon chain
                                                          (constants.py REL_MAP_FRACTIE_ZETEL_PERSOON)
  reg_documents.zaak_id   Document -REFERS_TO_ZAAK-> Zaak constants.py:12 (REL_MAP_DOC 'zaken')
  reg_documents.dossier_id Document -HAS_DOSSIER-> Dossier constants.py:16 (REL_MAP_DOC 'dossiers')
  besluiten.zaak_id       Besluit -ABOUT_ZAAK-> Zaak      constants.py:46 (REL_MAP_BESLUIT 'zaken')
  besluiten.activity_id   Besluit -BELONGS_TO_ACTIVITEIT-> Activity
                                                          constants.py:47 agendapunt analog (this
                                                          registry models agendapunten as activities)
  api_stemmingen.besluit_id  Besluit -HAS_STEMMING-> Stemming
                                                          constants.py:45, common_processors.py:140-141
  api_stemmingen.fractie_id  Stemming -REPRESENTS_FRACTIE_VOTE-> Fractie
                                                          common_processors.py:186-187
  persoon_functies.person_id  PersoonFunctie -PERSON_HAS_FUNCTION-> Persoon
  persoon_functies.fractie_id PersoonFunctie -FUNCTION_FOR_FRACTIE-> Fractie
                                                          constants.py:132-135
  reg_documents.dossier_id  Dossier -CONTAINS_DOCUMENT-> Document
  cases.dossier_id          Dossier -CONTAINS_ZAAK-> Zaak constants.py:137-140
                                                          (REL_MAP_KAMERSTUKDOSSIER)
"""

from __future__ import annotations

from typing import Dict, List, Tuple

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# (table, src_col, src_label, rel_type, dst_col, dst_label); src/dst cols are
# the row key or the fk column — direction encoded explicitly per entry.
REGISTRY_REL_MAP: List[Tuple[str, str, str, str, str, str]] = [
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
]

EDGE_SCHEMA = pa.schema([
    ("subj", pa.string()), ("subj_label", pa.string()),
    ("pred", pa.string()), ("obj", pa.string()), ("obj_label", pa.string()),
])


def _project(src_col: str, src_label: str, rel: str, dst_col: str,
             dst_label: str):
    def fn(batch: pa.Table) -> pa.Table:
        subj = batch.column(src_col)
        obj = batch.column(dst_col)
        n = batch.num_rows
        out = pa.table({
            "subj": subj,
            "subj_label": pa.array([src_label] * n, pa.string()),
            "pred": pa.array([rel] * n, pa.string()),
            "obj": obj,
            "obj_label": pa.array([dst_label] * n, pa.string()),
        })
        # fk may be '' / null (e.g. vervangen_door on non-superseded zaken);
        # Kleene nulls in the mask filter out as false
        mask = pc.and_kleene(pc.not_equal(obj, ""), pc.not_equal(subj, ""))
        return out.filter(pc.fill_null(mask, False))
    return fn


def registry_edges(registry_dir: str,
                   rel_map: List[Tuple[str, str, str, str, str, str]] = None
                   ) -> rd.Dataset:
    """All registry-projected edges as one Dataset (SQL-mirrorable: each
    entry is SELECT src, 'REL', dst FROM table WHERE fk <> '')."""
    import os
    rel_map = rel_map or REGISTRY_REL_MAP
    parts: List[rd.Dataset] = []
    for table, src_col, src_label, rel, dst_col, dst_label in rel_map:
        path = os.path.join(registry_dir, f"{table}.parquet")
        if not os.path.exists(path):
            continue
        ds = rd.read_parquet(path, columns=list({src_col, dst_col}))
        parts.append(ds.map_batches(
            _project(src_col, src_label, rel, dst_col, dst_label),
            batch_format="pyarrow", zero_copy_batch=True))
    if not parts:
        return rd.from_arrow(EDGE_SCHEMA.empty_table())
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
