"""Node enrichment: join canonical entity properties from the registry onto
the deduplicated node table.

The reference writes full API-entity property maps on every MERGE
(projection operators M1, e.g. persoon_processor.py:37-54 /
zaak_processor.py:26-37); here that projection is a BROADCAST join — the
registry prop maps are ray.put once and looked up per batch, no shuffle
(the node table is the big side, the registry the small side).
"""

from __future__ import annotations

import json
from typing import Dict

import pyarrow as pa
import ray
import ray.data as rd


def build_prop_maps(tables: Dict[str, list]) -> Dict[str, dict]:
    """entity_id -> property dict, per entity family (the M1 projections:
    select + rename + stringify, reference zaak_processor.py:26-37 etc.)."""
    props: Dict[str, dict] = {}
    for p in tables["persons"]:
        props[p["person_id"]] = {
            "achternaam": p["achternaam"], "roepnaam": p["roepnaam"],
            "voornamen": p["voornamen"], "tussenvoegsel": p["tussenvoegsel"],
            "fractie_id": p["fractie_id"], "entity": "persoon",
        }
    for fr in tables["parties"]:
        props[fr["fractie_id"]] = {"naam": fr["naam"], "afkorting": fr["afkorting"],
                                   "entity": "fractie"}
    for c in tables["cases"]:
        props[c["zaak_id"]] = {
            "nummer": c["nummer"], "dossiernummer": str(c["dossiernummer"]),
            "stuknummer": str(c["stuknummer"]), "onderwerp": c["onderwerp"],
            "entity": "zaak",
        }
    for d in tables["dossiers"]:
        props[d["dossier_id"]] = {"nummer": str(d["nummer"]),
                                  "toevoeging": d["toevoeging"], "entity": "dossier"}
    for a in tables["activities"]:
        props[a["activity_id"]] = {
            "soort": a["soort"], "onderwerp": a["onderwerp"],
            "session_id": a["session_id"], "entity": "activity",
        }
    for s in tables["sessions"]:
        props[s["session_id"]] = {"soort": s["soort"], "nummer": str(s["nummer"]),
                                  "entity": "vergadering"}
    # widened entity families (document_loader.py:148-157,
    # common_processors.py:75-101 / :158-168 projections)
    for d in tables.get("reg_documents", []):
        props[d["document_id"]] = {
            "dossiernummer": str(d["dossiernummer"]), "toevoeging": d["toevoeging"],
            "volgnummer": str(d["volgnummer"]), "onderwerp": d["onderwerp"],
            "datum": str(d["datum"]), "entity": "document",
        }
    for b in tables.get("besluiten", []):
        props[b["besluit_id"]] = {
            "soort": b["soort"], "status": b["status"], "tekst": b["tekst"],
            # M15 is_hoofdelijk derivation (common_processors.py:152-156)
            "is_hoofdelijk": "hoofdelijk" in (b["tekst"] or "").lower(),
            "entity": "besluit",
        }
    for st in tables.get("api_stemmingen", []):
        props[st["stemming_id"]] = {
            "soort": st["soort"], "vergissing": bool(st["vergissing"]),
            "entity": "stemming",
        }
    for cm in tables.get("commissies", []):
        props[cm["commissie_id"]] = {"naam": cm["naam"],
                                     "afkorting": cm["afkorting"],
                                     "entity": "commissie"}
    for zl in tables.get("zalen", []):
        props[zl["zaal_id"]] = {"naam": zl["naam"], "entity": "zaal"}
    for rv in tables.get("reserveringen", []):
        props[rv["reservering_id"]] = {"entity": "reservering"}
    for tz in tables.get("toezeggingen", []):
        props[tz["toezegging_id"]] = {"tekst": tz["tekst"],
                                      "entity": "toezegging"}
    # PersoonFunctie node props (persoonfunctie_loader.py:85-93: functie/
    # omschrijving/van/tot_en_met/soort, dates stringified like the loader)
    for pf in tables.get("persoon_functies", []):
        props[pf["functie_id"]] = {
            "functie": pf["functie"], "omschrijving": pf["omschrijving"],
            "van": str(pf["van"]),
            "tot_en_met": (str(pf["tot_en_met"])
                           if pf["tot_en_met"] is not None else None),
            "soort": pf["soort"], "entity": "persoon_functie",
        }
    # Agendapunt node props (agendapunt_loader.py:98-107: nummer/onderwerp/
    # volgorde/rubriek)
    for ap in tables.get("agendapunten", []):
        props[ap["agendapunt_id"]] = {
            "nummer": ap["nummer"], "onderwerp": ap["onderwerp"],
            "volgorde": str(ap["volgorde"]), "rubriek": ap["rubriek"],
            "entity": "agendapunt",
        }
    # DocumentVersie node props (document_loader.py:188-200)
    for dv in tables.get("document_versies", []):
        props[dv["versie_id"]] = {
            "versienummer": str(dv["versienummer"]), "status": dv["status"],
            "datum": str(dv["datum"]), "entity": "document_versie",
        }
    # Zaak/Document actor relation nodes (naam + relatie, the reference's
    # ZaakActor/DocumentActor property projection)
    for za in tables.get("zaak_actors", []):
        props[za["actor_id"]] = {"naam": za["naam"], "relatie": za["relatie"],
                                 "entity": "zaak_actor"}
    for da in tables.get("document_actors", []):
        props[da["actor_id"]] = {"naam": da["naam"], "relatie": da["relatie"],
                                 "entity": "document_actor"}
    # seat-chain rows (functie + validity window, fractie_loader.py /
    # commissie_loader.py zetel projections)
    for fzp in tables.get("fractie_zetel_persons", []):
        props[fzp["fzp_id"]] = {
            "functie": fzp["functie"], "van": str(fzp["van"]),
            "tot_en_met": (str(fzp["tot_en_met"])
                           if fzp["tot_en_met"] is not None else None),
            "entity": "fractie_zetel_persoon",
        }
    for czp in tables.get("commissie_zetel_persons", []):
        props[czp["czp_id"]] = {
            "functie": czp["functie"], "soort": czp["soort"],
            "van": str(czp["van"]),
            "tot_en_met": (str(czp["tot_en_met"])
                           if czp["tot_en_met"] is not None else None),
            "entity": "commissie_zetel_persoon",
        }
    # nested child-entity props — ids match ops.nested's deterministic
    # {parent}/{slug}/{ordinal} scheme (persoon_processor.py:64-167,
    # document_loader.py:205-236 projections)
    for p in tables.get("persons", []):
        pid = p["person_id"]
        for i, g in enumerate(p.get("geschenken") or []):
            props[f"{pid}/gift/{i}"] = {
                "omschrijving": g["omschrijving"],
                "waarde": str(g["waarde"]), "entity": "persoon_geschenk"}
        for i, f in enumerate(p.get("nevenfuncties") or []):
            props[f"{pid}/nevenfunctie/{i}"] = {
                "omschrijving": f["omschrijving"],
                "entity": "persoon_nevenfunctie"}
            for j, ink in enumerate(f.get("inkomsten") or []):
                props[f"{pid}/nevenfunctie/{i}/inkomst/{j}"] = {
                    "jaar": str(ink["jaar"]), "bedrag": str(ink["bedrag"]),
                    "entity": "persoon_nevenfunctie_inkomsten"}
        for i, c in enumerate(p.get("contact_informaties") or []):
            props[f"{pid}/contact/{i}"] = {
                "soort": c["soort"], "waarde": c["waarde"],
                "entity": "persoon_contactinformatie"}
        for i, lb in enumerate(p.get("loopbaan") or []):
            props[f"{pid}/loopbaan/{i}"] = {
                "functie": lb["functie"], "werkgever": lb["werkgever"],
                "van_jaar": str(lb["van_jaar"]),
                "tot_jaar": str(lb["tot_jaar"]), "entity": "persoon_loopbaan"}
        for i, ow in enumerate(p.get("onderwijs") or []):
            props[f"{pid}/onderwijs/{i}"] = {
                "opleiding": ow["opleiding"], "instelling": ow["instelling"],
                "jaar": str(ow["jaar"]), "entity": "persoon_onderwijs"}
        for i, rz in enumerate(p.get("reizen") or []):
            props[f"{pid}/reis/{i}"] = {
                "bestemming": rz["bestemming"], "doel": rz["doel"],
                "betaald_door": rz["betaald_door"], "entity": "persoon_reis"}
    for fr in tables.get("parties", []):
        for i, ag in enumerate(fr.get("aanvullende_gegevens") or []):
            props[f"{fr['fractie_id']}/aanvullend/{i}"] = {
                "soort": ag["soort"], "waarde": ag["waarde"],
                "entity": "fractie_aanvullend_gegeven"}
    for cm in tables.get("commissies", []):
        for i, c in enumerate(cm.get("contact_informaties") or []):
            props[f"{cm['commissie_id']}/contact/{i}"] = {
                "soort": c["soort"], "waarde": c["waarde"],
                "entity": "commissie_contactinformatie"}
    for dv in tables.get("document_versies", []):
        for p_ in dv.get("publicaties") or []:
            props[p_["publicatie_id"]] = {
                "soort": p_["soort"], "datum": str(p_["datum"]),
                "entity": "document_publicatie"}
    return props


def enrich_nodes(nodes: rd.Dataset, registry_tables: Dict[str, list]) -> rd.Dataset:
    """Merge registry props into each node's props JSON (provenance props
    from the stream keep precedence semantics of ``SET n +=``: registry
    dims first, stream-derived last)."""
    ref = ray.put(build_prop_maps(registry_tables))

    class Enricher:
        def __init__(self, ref):
            self.props = ray.get(ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            out = []
            for node_id, props_json in zip(batch.column("node_id").to_pylist(),
                                           batch.column("props").to_pylist()):
                base = dict(self.props.get(node_id, {}))
                base.update(json.loads(props_json))
                out.append(json.dumps(base, sort_keys=True))
            cols = {n: batch.column(n) for n in batch.column_names if n != "props"}
            cols["props"] = pa.array(out, pa.string())
            return pa.table(cols)

    return nodes.map_batches(Enricher, fn_constructor_kwargs={"ref": ref},
                             batch_format="pyarrow", concurrency=2, num_cpus=0.5)
