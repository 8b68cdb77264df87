"""Page parsing: html bytes -> canonical text + structured doc (mentions).

Re-expresses the reference's XML extraction semantics
(/root/reference/src/vlos/extractors/xml_extractor.py) over html-embedded
session markup:

  * M2  vergadering header parse            (xml_extractor.py:25-42)
  * M3  activities parse + procedural filter (xml_extractor.py:44-116)
  * M4  two-method speaker parse + dedup     (xml_extractor.py:118-192)
  * M5  zaak parse, dossier+stuk required    (xml_extractor.py:194-217)
  * M6  voting parse                         (xml_extractor.py:219-257)
  * M7  canonical text collapse              (xml_extractor.py:309-326)
  * M14 BOM strip                            (vlos_neo4j_loader.py:163-171)
  * §2.9 ordered fragment speaker sequence   (interruption_analyzer.py:36-98)

The output ``doc`` dict is JSON-serializable; all per-document ordering the
interruption scan depends on is preserved inside the single doc record, so
downstream Ray stages never have to co-locate rows of one document.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from typing import List, Optional

from .functions.textkit import collapse_text, decode_page_bytes

ISLAND_OPEN = "<vergadering"
ISLAND_CLOSE = "</vergadering>"


def extract_island(page_text: str) -> Optional[str]:
    """Locate the session markup island inside the html without parsing the
    full page (pages are arbitrary web html; only the island is structured)."""
    start = page_text.find(ISLAND_OPEN)
    if start < 0:
        return None
    end = page_text.find(ISLAND_CLOSE, start)
    if end < 0:
        return None
    return page_text[start:end + len(ISLAND_CLOSE)]


def _speaker_fields(sprek_el: ET.Element) -> Optional[dict]:
    voornaam = sprek_el.findtext("voornaam", default="")
    achternaam = (sprek_el.findtext("verslagnaam", default="")
                  or sprek_el.findtext("achternaam", default=""))
    fractie = sprek_el.findtext("fractie", default=None)
    if not achternaam:  # reference: only process if we have a last name
        return None
    return {"voornaam": voornaam, "achternaam": achternaam, "fractie": fractie}


def parse_page(html: bytes, procedural_types: List[str]) -> dict:
    """Parse one page; raises on malformed markup (caller routes the row to
    the failed sidecar, mirroring item-level error continuation at
    checkpoint_decorator.py:181-186)."""
    page_text = decode_page_bytes(html)
    island = extract_island(page_text)
    if island is None:
        raise ValueError("no session markup found")
    root = ET.fromstring(island)

    doc = {
        "object_id": root.get("objectid", "unknown"),
        "soort": root.get("soort", ""),
        "titel": root.findtext("titel", default=""),
        "nummer": root.findtext("vergaderingnummer", default=None),
        "datum": root.findtext("datum", default=""),
        "text": collapse_text(root),   # byte-identity invariant per url
        "activities": [],
    }

    for xml_act in root.findall("activiteit"):
        soort = xml_act.get("soort", "").lower()
        titel = xml_act.findtext("titel", default="").lower()
        # procedural filter (xml_extractor.py:67-83)
        if soort in procedural_types:
            continue
        if any(pt in titel for pt in procedural_types):
            continue

        act = {
            "object_id": xml_act.get("objectid", ""),
            "soort": xml_act.get("soort", ""),
            "titel": xml_act.findtext("titel", default=""),
            "onderwerp": xml_act.findtext("onderwerp", default=""),
            "start_time": (xml_act.findtext("aanvangstijd", default=None)
                           or xml_act.findtext("markeertijdbegin", default=None)),
            "end_time": (xml_act.findtext("eindtijd", default=None)
                         or xml_act.findtext("markeertijdeind", default=None)),
            "speakers": [],
            "zaken": [],
            "votes": [],
            "sequence": [],
        }

        # --- speakers: method 1 (draadboekfragment) + ordered sequence -----
        seen = set()
        fragment_count = 0
        for frag in xml_act.iter("draadboekfragment"):
            tekst_el = frag.find("tekst")
            if tekst_el is None:
                continue
            fragment_count += 1
            speech_text = collapse_text(tekst_el)
            if not speech_text:
                continue
            for sprek_el in frag.findall("sprekers/spreker"):
                sf = _speaker_fields(sprek_el)
                if sf is None:
                    continue
                # sequence entry for the interruption scan — one entry per
                # spreker element, document order (interruption_analyzer.py:40-70)
                act["sequence"].append({
                    "frag": fragment_count,
                    "voornaam": sf["voornaam"],
                    "achternaam": sf["achternaam"],
                    "speech_len": len(speech_text),
                })
                key = f"{sf['voornaam']}|{sf['achternaam']}|{sf['fractie'] or 'none'}"
                if key in seen:
                    continue
                seen.add(key)
                act["speakers"].append({
                    **sf,
                    "fragment_id": f"{act['object_id']}_frag_{fragment_count}",
                    "speech_preview": speech_text[:100],
                })

        # --- speakers: method 2 (any other spreker element) ----------------
        speaker_element_count = 0
        for sprek_el in xml_act.iter("spreker"):
            sf = _speaker_fields(sprek_el)
            if sf is None:
                continue
            key = f"{sf['voornaam']}|{sf['achternaam']}|{sf['fractie'] or 'none'}"
            if key in seen:
                continue
            seen.add(key)
            speaker_element_count += 1
            act["speakers"].append({
                **sf,
                "fragment_id": f"{act['object_id']}_speaker_{speaker_element_count}",
                "speech_preview": "[Speaker element - speech text not in draadboekfragment]",
            })

        # --- zaken (dossiernummer + stuknummer required, F6) ---------------
        for xml_zaak in xml_act.iter("zaak"):
            dossiernr = (xml_zaak.findtext("dossiernummer", default="") or "").strip()
            stuknr = (xml_zaak.findtext("stuknummer", default="") or "").strip()
            z_titel = (xml_zaak.findtext("titel", default="") or "").strip()
            if not (dossiernr and stuknr):
                continue
            direct_speakers = []
            for sprek_el in xml_zaak.findall("sprekers/spreker"):
                sf = _speaker_fields(sprek_el)
                if sf is not None:
                    direct_speakers.append({
                        **sf,
                        "fragment_id": f"zaak_{dossiernr}_{stuknr}",
                        "speech_preview": "[Direct zaak speaker link - no speech text]",
                    })
            act["zaken"].append({
                "dossiernummer": dossiernr,
                "stuknummer": stuknr,
                "titel": z_titel,
                "speakers": direct_speakers,
            })

        # --- votes (activiteititem soort in {besluit, stemming, vote}) -----
        for item in xml_act.iter("activiteititem"):
            if item.get("soort", "").lower() not in ("besluit", "stemming", "vote"):
                continue
            fractie_votes = []
            stemmingen_el = item.find("stemmingen")
            if stemmingen_el is not None:
                for stemming in stemmingen_el.findall("stemming"):
                    fractie_name = stemming.findtext("fractie", default="")
                    stem_value = stemming.findtext("stem", default="")
                    if fractie_name and stem_value:
                        fractie_votes.append({
                            "fractie": fractie_name,
                            "vote": stem_value,
                            "vote_normalized": stem_value.lower(),
                        })
            if fractie_votes:
                act["votes"].append({
                    "titel": item.findtext("titel", default=""),
                    "besluitvorm": item.findtext("besluitvorm", default=""),
                    "uitslag": item.findtext("uitslag", default=""),
                    "fracties": fractie_votes,
                })

        doc["activities"].append(act)

    return doc
