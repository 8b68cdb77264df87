"""Triple + mention emission from a linked doc — the reference's "persist"
step re-expressed as pure row emission.

Semantics sources (file:line into /root/reference):
  * speaker x zaak cross product        vlos_pipeline.py:324-353 (J7)
  * direct zaak speaker links           vlos_pipeline.py:132-151
  * interruption A->B->A scan           interruption_analyzer.py:26-98,191-238
  * vote edges                          vlos_neo4j_loader.py:486-544
  * MATCHES_* mention edges             vlos_neo4j_loader.py:233-421

Predicate taxonomy (FIXTURES.md §3): DISCUSSES_ZAAK, INTERRUPTED,
RESPONDED_TO, VOTED_{VOOR,TEGEN,ONTHOUDING,...}, MATCHES_PERSOON,
MATCHES_API_ACTIVITY, MATCHES_API_ZAAK, MATCHES_API_DOSSIER.

Synthetic node ids use content-stable sha1 (functions/textkit.stable_id),
replacing the reference's per-process-salted Python hash()
(vlos_neo4j_loader.py:239 etc.; SURVEY.md §7.5 risk 3).
"""

from __future__ import annotations

from typing import List, Optional

from .functions.textkit import stable_id

ENTITY_LABEL = {"zaak": "Zaak", "dossier": "Dossier"}
MATCH_PRED = {"zaak": "MATCHES_API_ZAAK", "dossier": "MATCHES_API_DOSSIER"}


def _find_matching_speaker(v_first: str, v_last: str, speaker_matches: List[dict]
                           ) -> Optional[dict]:
    """interruption_analyzer.py:240-250: first activity speaker whose xml
    surname equals, or whose canonical persoon name contains, v_last."""
    for sm in speaker_matches:
        if sm["achternaam"].lower() == v_last.lower():
            return sm
        pname = sm.get("persoon_name")
        if pname and v_last.lower() in pname.lower():
            return sm
    return None


def emit_doc(linked: dict, url: str, warc_ts) -> tuple:
    """Returns (triples, mentions) row lists for one linked doc."""
    triples: List[dict] = []
    mentions: List[dict] = []

    def t(subj, pred, obj, subj_label, obj_label, score, provenance):
        triples.append({"subj": subj, "pred": pred, "obj": obj,
                        "subj_label": subj_label, "obj_label": obj_label,
                        "url": url, "warc_ts": warc_ts, "score": float(score),
                        "provenance": provenance})

    for act in linked.get("activities", []):
        act_mention_id = stable_id(url, act["object_id"])
        mentions.append({
            "url": url, "mention_id": act_mention_id, "kind": "activity",
            "surface": act.get("onderwerp") or act.get("titel") or "",
            "activity_local_id": act["object_id"],
            "entity_id": act["api_activity_id"], "entity_kind": "activity",
            "match_type": act["activity_match_type"], "score": float(act["activity_score"]),
        })
        if act["api_activity_id"]:
            t(act_mention_id, "MATCHES_API_ACTIVITY", act["api_activity_id"],
              "XmlActivity", "Activity", act["activity_score"], "activity_match")

        # speaker mentions
        ok_speakers = []
        for sp in act.get("speaker_matches", []):
            mid = stable_id(url, act["object_id"], sp["fragment_id"],
                            sp["voornaam"], sp["achternaam"], sp.get("fractie"))
            mentions.append({
                "url": url, "mention_id": mid, "kind": "speaker",
                "surface": f"{sp['voornaam']} {sp['achternaam']}".strip(),
                "activity_local_id": act["object_id"],
                "entity_id": sp["person_id"], "entity_kind": "persoon",
                "match_type": sp["match_type"], "score": float(sp["score"]),
            })
            if sp["person_id"]:
                t(mid, "MATCHES_PERSOON", sp["person_id"], "XmlSpeaker", "Persoon",
                  sp["score"], "name_match")
                ok_speakers.append(sp)

        # zaak mentions
        ok_zaken = []
        for zm in act.get("zaak_matches", []):
            mid = stable_id(url, act["object_id"], zm["dossiernummer"],
                            zm["stuknummer"], zm["source"])
            mentions.append({
                "url": url, "mention_id": mid, "kind": "zaak",
                "surface": f"{zm['dossiernummer']}:{zm['stuknummer']}",
                "activity_local_id": act["object_id"],
                "entity_id": zm["entity_id"], "entity_kind": zm["entity_kind"],
                "match_type": zm["match_type"], "score": float(zm["score"]),
            })
            if zm["entity_id"]:
                t(mid, MATCH_PRED[zm["entity_kind"]], zm["entity_id"], "XmlZaak",
                  ENTITY_LABEL[zm["entity_kind"]], zm["score"], f"zaak_match:{zm['source']}")
                ok_zaken.append(zm)
            if zm.get("document_id"):
                # J5 tier-2 document-within-dossier fallback — the columnar
                # re-expression of ZaakMatch.document_id /
                # MatchResult.fallback_entity (api_extractor.py:196-201,
                # vlos_pipeline.py:296-305)
                t(mid, "MATCHES_API_DOCUMENT", zm["document_id"], "XmlZaak",
                  "Document", zm["score"], "zaak_match:document_fallback")

        # J7: speaker x zaak cross product within the activity
        for sp in ok_speakers:
            for zm in ok_zaken:
                t(sp["person_id"], "DISCUSSES_ZAAK", zm["entity_id"], "Persoon",
                  ENTITY_LABEL[zm["entity_kind"]],
                  min(sp["score"], zm["score"]), "activity_based")

        # direct zaak speaker links (vlos_pipeline.py:132-151) — xml zaken only
        for zm in act.get("zaak_matches", []):
            if zm["source"] != "xml" or not zm["entity_id"]:
                continue
            for sp in zm.get("direct_speaker_matches", []):
                if sp["person_id"]:
                    t(sp["person_id"], "DISCUSSES_ZAAK", zm["entity_id"], "Persoon",
                      ENTITY_LABEL[zm["entity_kind"]],
                      min(sp["score"], zm["score"]), "direct_zaak_link")

        # interruption scan over the ordered fragment sequence (§2.9)
        triples.extend(_interruption_triples(act, url, warc_ts))

        # votes
        for v in act.get("vote_links", []):
            event_id = stable_id(url, act["object_id"], v["titel"], v["uitslag"])
            for fv in v["fracties"]:
                if not fv["fractie_id"]:
                    continue
                pred = "VOTED_" + fv["vote_normalized"].upper()
                t(fv["fractie_id"], pred, event_id, "Fractie", "VotingEvent",
                  100.0, "vote")
                for zm in ok_zaken:
                    t(fv["fractie_id"], pred, zm["entity_id"], "Fractie",
                      ENTITY_LABEL[zm["entity_kind"]], 100.0, "vote_on_zaak")

    return triples, mentions


def _interruption_events(act: dict) -> List[dict]:
    """Fragment + sequential (A->B->A) interruption detection, as an event
    list shared by triple emission and the A3 analysis rows.

    Mirrors interruption_analyzer.py: the sequence is every spreker element
    of every non-empty draadboekfragment, in document order; fragment
    interruptions compare each later speaker of a fragment against the
    fragment's first (:71-89); the sequential scan walks i-1, i, i+1
    (:191-238). Events exist whenever both sides have a SPEAKER MATCH entry
    (matched or not — the reference also creates events with persoon_id
    None); ids may be '' for unlinked sides. Types mirror the reference's
    InterruptionType enum (models.py:21-25)."""
    events: List[dict] = []
    sms = act.get("speaker_matches", [])
    seq = []
    for entry in act.get("sequence", []):
        sm = _find_matching_speaker(entry["voornaam"], entry["achternaam"], sms)
        seq.append({"frag": entry["frag"], "sm": sm, "speech_len": entry["speech_len"]})

    def pid(e):
        return (e["sm"].get("person_id") or "") if (e and e["sm"]) else ""

    # fragment interruptions: multiple speakers in one fragment
    by_frag: dict = {}
    for e in seq:
        by_frag.setdefault(e["frag"], []).append(e)
    for frag_no in sorted(by_frag):
        grp = by_frag[frag_no]
        if len(grp) <= 1:
            continue
        for i in range(1, len(grp)):
            if not (grp[0]["sm"] and grp[i]["sm"]):
                continue
            a, b = pid(grp[0]), pid(grp[i])
            if a == b:
                continue
            events.append({"type": "fragment_interruption", "interrupted": a,
                           "interrupter": b, "responder": "",
                           "provenance": f"fragment:{frag_no}"})

    # sequential A->B->A
    for i in range(1, len(seq) - 1):
        prev_e, cur_e, next_e = seq[i - 1], seq[i], seq[i + 1]
        if not (prev_e["sm"] and cur_e["sm"]):
            continue
        a, b = pid(prev_e), pid(cur_e)
        if a == b:
            continue
        responds = bool(next_e["sm"]) and pid(next_e) == a
        if responds:
            events.append({"type": "interruption_with_response", "interrupted": a,
                           "interrupter": b, "responder": a,
                           "provenance": "sequential_with_response"})
        else:
            events.append({"type": "simple_interruption", "interrupted": a,
                           "interrupter": b, "responder": "",
                           "provenance": "sequential"})
    return events


def _interruption_triples(act: dict, url: str, warc_ts) -> List[dict]:
    """Edge emission from the interruption events: events where either side
    failed to link carry no persoon id and emit no triple (the reference
    persists them as unlinked nodes; here unlinked endpoints cannot form
    edges)."""
    out: List[dict] = []

    def t(subj, pred, obj, provenance):
        out.append({"subj": subj, "pred": pred, "obj": obj,
                    "subj_label": "Persoon", "obj_label": "Persoon",
                    "url": url, "warc_ts": warc_ts, "score": 100.0,
                    "provenance": provenance})

    for ev in _interruption_events(act):
        a, b = ev["interrupted"], ev["interrupter"]
        if a and b:
            t(b, "INTERRUPTED", a, ev["provenance"])
            if ev["type"] == "interruption_with_response":
                t(a, "RESPONDED_TO", b, "response")
    return out


def emit_analysis_rows(linked: dict, url: str, warc_ts) -> List[dict]:
    """A2/A3 analysis-grain rows for the corpus rollups — the distributed
    re-expression of the reference's in-memory analyzer inputs:

      * kind='vote':        one row per (voting event, fractie vote) —
                            feeds fractie alignment / vote-type distribution
                            (voting_analyzer.py:79-104,131-142)
      * kind='vote_topic':  one row per (event, fractie vote, topic), topic
                            = titel of each successful zaak match of the
                            activity, duplicates preserved
                            (voting_analyzer.py:53,108-122)
      * kind='interruption': one row per interruption event incl. unlinked
                            sides (interruption_analyzer.py:114-117 type
                            counts include them)
      * kind='interruption_topic': one row per (event, topic)
                            (interruption_analyzer.py:148-157)

    All rows share one wide schema; unused fields are ''/False.
    """
    rows: List[dict] = []

    def base(kind: str, act: dict) -> dict:
        return {"url": url, "activity_local_id": act["object_id"], "kind": kind,
                "type": "", "event_id": "", "fractie_id": "", "fractie_naam": "",
                "vote": "", "uitslag": "", "is_hoofdelijk": False, "topic": "",
                "interrupter": "", "interrupted": "", "responder": ""}

    for act in linked.get("activities", []):
        topics = [zm["titel"] for zm in act.get("zaak_matches", [])
                  if zm["entity_id"]]

        for v in act.get("vote_links", []):
            event_id = stable_id(url, act["object_id"], v["titel"], v["uitslag"])
            hoofdelijk = "hoofdelijk" in (v.get("besluitvorm") or "").lower()  # M15
            for fv in v["fracties"]:
                row = base("vote", act)
                row.update({"event_id": event_id, "fractie_id": fv["fractie_id"],
                            "fractie_naam": fv["fractie"],
                            "vote": fv["vote_normalized"], "uitslag": v["uitslag"],
                            "is_hoofdelijk": hoofdelijk})
                rows.append(row)
                for topic in topics:
                    trow = dict(row)
                    trow.update({"kind": "vote_topic", "topic": topic})
                    rows.append(trow)

        for ev in _interruption_events(act):
            row = base("interruption", act)
            row.update({"type": ev["type"], "interrupter": ev["interrupter"],
                        "interrupted": ev["interrupted"],
                        "responder": ev["responder"]})
            rows.append(row)
            for topic in topics:
                trow = dict(row)
                trow.update({"kind": "interruption_topic", "topic": topic})
                rows.append(trow)

    return rows
