"""A2/A3 analysis rows + registry-edge projection semantics."""

from datetime import datetime

import pandas as pd
import pytest

from neo4j_tkapi_ray.emit import emit_analysis_rows


def _linked_doc():
    sp = {"voornaam": "Anna", "achternaam": "Berg", "fractie": "GU",
          "fragment_id": "a1_frag_1", "speech_preview": "x",
          "person_id": "p1", "score": 100, "match_type": "EXACT",
          "persoon_name": "Anna Berg"}
    sp2 = {**sp, "voornaam": "Bram", "achternaam": "Vos", "person_id": "p2",
           "persoon_name": "Bram Vos"}
    sp3 = {**sp, "voornaam": "Zed", "achternaam": "Qqq", "person_id": "",
           "match_type": "NO_MATCH", "persoon_name": ""}
    return {
        "object_id": "doc1", "activities": [{
            "object_id": "a1", "api_activity_id": "api_a1",
            "activity_score": 10.0, "activity_match_type": "EXACT",
            "speaker_matches": [sp, sp2, sp3],
            "zaak_matches": [
                {"dossiernummer": "36200", "stuknummer": "1", "titel": "Topic A",
                 "entity_id": "z1", "entity_kind": "zaak", "score": 100.0,
                 "match_type": "EXACT", "source": "xml",
                 "direct_speaker_matches": []},
                {"dossiernummer": "9", "stuknummer": "9", "titel": "miss",
                 "entity_id": "", "entity_kind": "", "score": 0.0,
                 "match_type": "NO_MATCH", "source": "xml",
                 "direct_speaker_matches": []},
            ],
            "vote_links": [{
                "titel": "Stemming", "besluitvorm": "Hoofdelijk",
                "uitslag": "Aangenomen",
                "fracties": [
                    {"fractie": "GU", "vote": "Voor", "vote_normalized": "voor",
                     "fractie_id": "f1"},
                    {"fractie": "Onbekend", "vote": "Tegen",
                     "vote_normalized": "tegen", "fractie_id": ""},
                ]}],
            # A->B->A with response (a1: p1, p2, p1) then unlinked speaker
            "sequence": [
                {"frag": 1, "voornaam": "Anna", "achternaam": "Berg", "speech_len": 10},
                {"frag": 2, "voornaam": "Bram", "achternaam": "Vos", "speech_len": 9},
                {"frag": 3, "voornaam": "Anna", "achternaam": "Berg", "speech_len": 8},
                {"frag": 4, "voornaam": "Zed", "achternaam": "Qqq", "speech_len": 7},
            ],
        }],
    }


def test_emit_analysis_rows_semantics():
    rows = emit_analysis_rows(_linked_doc(), "u1", datetime(2024, 1, 1))
    df = pd.DataFrame(rows)

    votes = df[df.kind == "vote"]
    # one row per (event, fractie) incl. the unlinked fractie
    assert len(votes) == 2
    assert set(votes.vote) == {"voor", "tegen"}
    assert votes.is_hoofdelijk.all()  # M15: besluitvorm contains 'hoofdelijk'
    assert (votes[votes.fractie_naam == "GU"].fractie_id == "f1").all()
    assert (votes[votes.fractie_naam == "Onbekend"].fractie_id == "").all()

    vt = df[df.kind == "vote_topic"]
    # topics = successful zaak titles only ('miss' failed to link)
    assert set(vt.topic) == {"Topic A"}
    assert len(vt) == 2  # 2 votes x 1 topic

    ints = df[df.kind == "interruption"]
    # sequence p1,p2,p1,unlinked: i=2 is p2 interrupted by... walk: i=1
    # (p1,p2,p1) -> with_response; i=2 (p2,p1,unlinked-sm) -> simple
    assert sorted(ints.type) == ["interruption_with_response",
                                 "simple_interruption"]
    wr = ints[ints.type == "interruption_with_response"].iloc[0]
    assert (wr.interrupter, wr.interrupted, wr.responder) == ("p2", "p1", "p1")

    it = df[df.kind == "interruption_topic"]
    assert set(it.topic) == {"Topic A"} and len(it) == 2


def test_registry_edges_projection(ray_session, corpus):
    from neo4j_tkapi_ray.stages.registry_edges import (
        REGISTRY_REL_MAP, registry_edges)
    df = registry_edges(corpus["dir"]).to_pandas()
    assert set(df.columns) == {"subj", "subj_label", "pred", "obj", "obj_label"}
    preds = set(df.pred)
    # J9 self-referential edges actually exercised now
    assert "REPLACED_BY" in preds
    # Zaak and Activity both carry the self-referential pair now
    rb = df[(df.pred == "REPLACED_BY") & (df.subj_label == "Zaak")]
    assert len(rb) > 0 and (rb.obj_label == "Zaak").all()
    assert (rb.subj != rb.obj).all()
    # every declared relation type with source data shows up
    assert {"HAS_DOSSIER", "HAS_ACTIVITEIT", "HAS_ACT_ACTOR", "HAS_FRACTIE",
            "REFERS_TO_ZAAK", "ABOUT_ZAAK", "HAS_STEMMING",
            "REPRESENTS_FRACTIE_VOTE", "BELONGS_TO_ACTIVITEIT",
            "HAS_VOORTOUWCOMMISSIE", "RESERVES_ZAAL", "FOR_ACTIVITEIT",
            "SUPPLEMENTS", "REITERATES", "MADE_BY",
            "PERSON_HAS_FUNCTION", "FUNCTION_FOR_FRACTIE",
            "CONTAINS_DOCUMENT", "CONTAINS_ZAAK",
            # round-2 widening: zaak/doc completion, actors, versies,
            # agendapunten, seat chains, zaal/reservering, self-refs
            "HAS_BESLUIT", "HAS_DOCUMENT", "HAS_AGENDAPUNT", "HAS_ACTOR",
            "ACTED_AS_PERSOON", "ACTED_AS_FRACTIE", "ACTED_AS_COMMISSIE",
            "HAS_VERSIE", "PART_OF_ZAAK", "HAS_RESERVERING", "HAS_ZAAL",
            "REPLACED_FROM", "CONTINUED_FROM", "CONTINUED_IN",
            "BELONGS_TO_AGENDAPUNT", "SUPPLEMENTED_BY", "REITERATED_BY",
            "MODIFIES", "MODIFIED_BY", "HAS_ZETEL", "HAS_INCUMBENT",
            "IS_PERSON", "HAS_SEAT_ASSIGNMENT", "HAS_VACANCY", "HAS_MEMBER",
            "HAS_TEMP_MEMBER", "FOR_VERGADERING", "HOSTS_VERGADERING",
            "HOSTS_ACTIVITEIT"} <= preds
    # PersoonFunctie edges target real persons; fractie edge only where bound
    pf = df[df.pred == "PERSON_HAS_FUNCTION"]
    persons = pd.read_parquet(f"{corpus['dir']}/persons.parquet")
    assert len(pf) > 0 and set(pf.obj) <= set(persons.person_id)
    functies = pd.read_parquet(f"{corpus['dir']}/persoon_functies.parquet")
    ff = df[df.pred == "FUNCTION_FOR_FRACTIE"]
    assert len(ff) == (functies.fractie_id != "").sum()
    # toezegging self-referential pairs never self-loop
    for pred in ("SUPPLEMENTS", "REITERATES"):
        sub = df[df.pred == pred]
        assert len(sub) > 0 and (sub.subj != sub.obj).all()
    # spot-check one projection against the raw table
    cases = pd.read_parquet(f"{corpus['dir']}/cases.parquet")
    exp = cases[cases.vervangen_door != ""]
    got = rb.sort_values("subj").reset_index(drop=True)
    assert list(got.subj) == sorted(exp.zaak_id)
    # no empty endpoints anywhere
    assert (df.subj != "").all() and (df.obj != "").all()
    # rel map is total: every entry names a real table column pair
    assert len(REGISTRY_REL_MAP) == 66
    # soort-discriminated commissie seat projections partition correctly
    czp = pd.read_parquet(f"{corpus['dir']}/commissie_zetel_persons.parquet")
    hm = df[df.pred == "HAS_MEMBER"]
    htm = df[df.pred == "HAS_TEMP_MEMBER"]
    assert len(hm) == (czp.soort == "vast").sum()
    assert len(htm) == (czp.soort == "vervanger").sum()
    assert (hm.obj_label == "CommissieZetelVastPersoon").all()
    assert (htm.obj_label == "CommissieZetelVervangerPersoon").all()
    # IS_PERSON spans both discriminator values and totals the table
    assert len(df[df.pred == "IS_PERSON"]) == len(czp) + len(
        pd.read_parquet(f"{corpus['dir']}/fractie_zetel_persons.parquet"))
    # inverse self-ref pairs mirror the forward fks row-for-row
    acts = pd.read_parquet(f"{corpus['dir']}/activities.parquet")
    n_repl = (acts.vervangen_door != "").sum()
    assert len(df[(df.pred == "REPLACED_BY")
                  & (df.subj_label == "Activity")]) == n_repl
    assert len(df[df.pred == "REPLACED_FROM"]) == n_repl


def test_nested_child_edges_counts(ray_session, corpus):
    """Every nested list element yields exactly one edge; two-level incomes
    and soort-discriminated publicaties included (REL_MAP_PERSOON /
    _PERSOON_NEVENFUNCTIE / _DOCUMENT_VERSIE completion)."""
    from neo4j_tkapi_ray.ops.nested import nested_child_edges

    df = nested_child_edges(corpus["dir"]).to_pandas()
    persons = pd.read_parquet(f"{corpus['dir']}/persons.parquet")
    dv = pd.read_parquet(f"{corpus['dir']}/document_versies.parquet")

    def total(col, tbl=persons):
        return int(tbl[col].map(len).sum())

    assert len(df[df.pred == "RECEIVED_GIFT"]) == total("geschenken")
    assert len(df[df.pred == "HAS_SIDEPOSITION"]) == total("nevenfuncties")
    assert len(df[df.pred == "HAS_CAREER"]) == total("loopbaan")
    assert len(df[df.pred == "HAS_EDUCATION"]) == total("onderwijs")
    assert len(df[df.pred == "HAS_TRAVEL"]) == total("reizen")
    n_income = int(persons["nevenfuncties"].map(
        lambda fs: sum(len(f["inkomsten"]) for f in fs)).sum())
    assert len(df[df.pred == "HAS_INCOME"]) == n_income
    n_pub = int(dv["publicaties"].map(len).sum())
    pubs = df[df.pred.isin(["HAS_PUBLICATIE", "HAS_PUBLICATIE_METADATA"])]
    assert len(pubs) == n_pub
    # child ids are deterministic parent/slug/ordinal
    gifts = df[df.pred == "RECEIVED_GIFT"]
    assert gifts.obj.str.match(r"^p\d+/gift/\d+$").all()
    assert (gifts.subj == gifts.obj.str.split("/").str[0]).all()
    # publicatie edges reference real child ids from the nested structs
    real_pub_ids = {p["publicatie_id"] for ps in dv["publicaties"] for p in ps}
    assert set(pubs.obj) <= real_pub_ids
