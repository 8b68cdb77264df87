"""Unit tests for matcher semantics (J1-J6) against hand-built registries."""

from datetime import datetime, timedelta

import pytest

from neo4j_tkapi_ray.config import EngineConfig
from neo4j_tkapi_ray.linking import Linker, RegistryIndex
from neo4j_tkapi_ray.parsing import parse_page


def _mk_index(**over):
    tables = {
        "persons": [
            {"person_id": "p1", "voornamen": "Anna Maria", "roepnaam": "Anna",
             "tussenvoegsel": "van der", "achternaam": "Berg", "fractie_id": "f1"},
            {"person_id": "p2", "voornamen": "Bram", "roepnaam": "Bram",
             "tussenvoegsel": "", "achternaam": "Bergh", "fractie_id": "f1"},
            {"person_id": "p3", "voornamen": "Carla", "roepnaam": "Carla",
             "tussenvoegsel": "", "achternaam": "Jansen", "fractie_id": "f2"},
        ],
        "parties": [{"fractie_id": "f1", "naam": "Groene Unie", "afkorting": "GU"},
                    {"fractie_id": "f2", "naam": "Sociale Lijst", "afkorting": "SL"}],
        "sessions": [{"session_id": "s1", "soort": "Plenair", "nummer": 7,
                      "datum": datetime(2024, 5, 13),
                      "begin": datetime(2024, 5, 13, 10), "einde": datetime(2024, 5, 13, 18)}],
        "activities": [
            {"activity_id": "a1", "session_id": "s1", "soort": "Debat",
             "onderwerp": "wijziging begroting onderwijs",
             "begin": datetime(2024, 5, 13, 10, 5), "einde": datetime(2024, 5, 13, 11)},
            {"activity_id": "a2", "session_id": "s1", "soort": "Stemmingen",
             "onderwerp": "iets heel anders",
             "begin": datetime(2024, 5, 13, 15), "einde": datetime(2024, 5, 13, 16)},
        ],
        "cases": [{"zaak_id": "z1", "nummer": "2024Z00001", "dossiernummer": 36200,
                   "toevoeging": "", "stuknummer": 12, "onderwerp": "begroting onderwijs"},
                  {"zaak_id": "z2", "nummer": "2024Z00002", "dossiernummer": 36201,
                   "toevoeging": "VIII", "stuknummer": 3, "onderwerp": "zorg"}],
        "dossiers": [{"dossier_id": "d1", "nummer": 36200, "toevoeging": ""},
                     {"dossier_id": "d2", "nummer": 36201, "toevoeging": "VIII"},
                     {"dossier_id": "d3", "nummer": 36999, "toevoeging": ""}],
        "activity_cases": [{"activity_id": "a1", "zaak_id": "z2"}],
    }
    tables.update(over)
    return RegistryIndex(tables)


@pytest.fixture()
def linker():
    return Linker(_mk_index(), EngineConfig.default())


def test_speaker_exact_surname(linker):
    pid, score, mt = linker.match_speaker("Anna", "Berg")
    assert pid == "p1" and score == 100 and mt == "EXACT"


def test_speaker_full_surname_variant(linker):
    pid, score, mt = linker.match_speaker("", "van der Berg")
    assert pid == "p1" and score == 60 and mt == "FUZZY"


def test_speaker_contains_fallback(linker):
    # "van der Berg" bucket is empty under exact achternaam 'berg'? no —
    # 'berg' bucket exists; use a surname only reachable via token containment
    pid, score, mt = linker.match_speaker("Carla", "Mevrouw Jansen")
    assert pid == "p3"  # token 'jansen' contained in surname


def test_speaker_below_threshold(linker):
    pid, score, mt = linker.match_speaker("Xyz", "Qqqqq")
    assert pid is None and mt == "NO_MATCH"


def test_speaker_near_collision_prefers_higher_score(linker):
    # 'Bergh' exact beats fuzzy 'Berg'
    pid, _, _ = linker.match_speaker("Bram", "Bergh")
    assert pid == "p2"


def test_zaak_tier1_exact(linker):
    eid, kind, score, mt, doc_id = linker.match_zaak("36200", "12")
    assert (eid, kind, score, mt) == ("z1", "zaak", 100.0, "EXACT")


def test_zaak_toevoeging_code_falls_to_dossier(linker):
    # '36201-VIII' is not an int -> tier 1 misses (reference semantics:
    # filter_nummer on the zaak's own nummer), dossier fallback hits d2
    eid, kind, score, mt, doc_id = linker.match_zaak("36201-VIII", "3")
    assert (eid, kind, mt) == ("d2", "dossier", "FALLBACK")


def test_zaak_dossier_only_fallback(linker):
    eid, kind, score, mt, doc_id = linker.match_zaak("36999", "5")
    assert (eid, kind, mt) == ("d3", "dossier", "FALLBACK")


def test_zaak_no_match(linker):
    eid, kind, score, mt, doc_id = linker.match_zaak("11111", "1")
    assert eid is None and mt == "NO_MATCH"


def test_session_and_activity_match(linker):
    doc = {"soort": "Plenair", "nummer": "7", "datum": "2024-05-13T00:00:00"}
    s = linker.find_canonical_session(doc)
    assert s and s["session_id"] == "s1"
    lo, hi = linker.candidate_activities(s)
    assert linker.idx.cand_soa["ids"][lo:hi] == ["a1", "a2"]
    act = {"soort": "Debat", "titel": "wijziging begroting onderwijs",
           "onderwerp": "wijziging begroting onderwijs",
           "start_time": "2024-05-13T10:06:00", "end_time": "2024-05-13T11:00:00"}
    aid, score, mt, pos = linker.match_activity(act, (lo, hi), s)
    assert aid == "a1"
    # exact topic (4.0) + soort exact (2.0) + time proximity (3.0) + titel exact (1.5)
    assert score == pytest.approx(10.5)
    assert mt == "EXACT"


def test_activity_margin_rule(linker):
    """Accept below threshold when >= 1.0 ahead of runner-up (and >= 1.0)."""
    s = linker.idx.session_view(0)
    window = linker.candidate_activities(s)
    act = {"soort": "", "titel": "", "onderwerp": "",
           # close to a1's start but no topic/soort signals -> 3.0 time-only...
           # use a start 20 min away so only overlap (1.5) for a1, nothing for a2
           "start_time": "2024-05-13T10:25:00", "end_time": "2024-05-13T10:40:00"}
    aid, score, mt, pos = linker.match_activity(act, window, s)
    assert aid == "a1" and score == pytest.approx(1.5) and mt == "FUZZY"


def test_procedural_activities_filtered():
    html = ("<html><body><vergadering soort=\"Plenair\" objectid=\"o\">"
            "<titel>V</titel><vergaderingnummer>1</vergaderingnummer>"
            "<datum>2024-05-13T00:00:00</datum>"
            "<activiteit soort=\"Opening\" objectid=\"a\"><titel>Opening</titel></activiteit>"
            "<activiteit soort=\"Debat\" objectid=\"b\"><titel>Einde vergadering nadert</titel></activiteit>"
            "<activiteit soort=\"Debat\" objectid=\"c\"><titel>Echt debat</titel></activiteit>"
            "</vergadering></body></html>").encode()
    doc = parse_page(html, EngineConfig.default().processing.procedural_activity_types)
    # 'Opening' filtered by soort; 'Einde vergadering nadert' filtered by titel keyword
    assert [a["object_id"] for a in doc["activities"]] == ["c"]


def test_agenda_zaken_expansion(linker):
    ids = linker.idx.cand_soa["ids"]
    cases = linker.agenda_zaken(ids.index("a1"))
    assert [c["zaak_id"] for c in cases] == ["z2"]
    assert linker.agenda_zaken(ids.index("a2")) == []


def test_embedding_fallback_off_by_default(linker):
    """Reference parity: a heavily misspelled surname that misses both the
    exact bucket and the contains-fallback stays NO_MATCH by default."""
    pid, score, mt = linker.match_speaker("Carla", "Jansne")  # transposition
    assert pid is None and mt == "NO_MATCH"


def test_embedding_fallback_recovers_typo_when_enabled():
    cfg = EngineConfig.default()
    cfg.matching.enable_embedding_fallback = True
    linker = Linker(_mk_index(), cfg)
    # 'Jansne' retrieves 'Jansen' via trigram embedding; the fuzzy score
    # (ratio-20) must still clear the unchanged >= 60 acceptance gate
    pid, score, mt = linker.match_speaker("Carla", "Jansne")
    assert pid == "p3" and score >= 60
    # garbage still fails the gate even with retrieval widened
    pid, _, mt = linker.match_speaker("X", "Qqqqqwwww")
    assert pid is None and mt == "NO_MATCH"


def test_surname_trigram_index_equals_naive_contains(linker):
    """The contains-fallback trigram index must return exactly the naive
    substring scan's surname set (reference contains() semantics)."""
    idx = linker.idx
    for token in ["jans", "berg", "ber", "xyz", "a", "en", "bergh", "sen",
                  "jansen", "q", ""]:
        naive = sorted(s for s in idx._unique_surnames if token in s)
        assert idx.surnames_containing(token) == naive, token


def test_fractie_match(linker):
    assert linker.match_fractie("Groene Unie") == "f1"
    assert linker.match_fractie("gu") == "f1"
    assert linker.match_fractie("Onbekend") is None


def test_speaker_actor_priority_tier():
    """J4 priority-1 (api_extractor.py:134-143): the matched activity's
    actor roster resolves a speaker BEFORE the global search — an ambiguous
    surname picks the activity's own actor, not the global best."""
    idx = _mk_index(activity_actors=[{"activity_id": "a1", "person_id": "p2"}])
    linker = Linker(idx, EngineConfig.default())
    # globally 'Berg' resolves exactly to p1; within a1 the actor p2
    # ('Bergh', fuzzy ratio-20 >= 60) wins the priority tier
    pid, score, mt = linker.match_speaker("Bram", "Berg", activity_id="a1")
    assert pid == "p2"
    # without activity context the global cascade still picks p1
    pid2, _, _ = linker.match_speaker("Bram", "Berg")
    assert pid2 == "p1"
    # an activity without actors falls through to the global cascade
    pid3, _, _ = linker.match_speaker("Bram", "Berg", activity_id="a2")
    assert pid3 == "p1"
    # actor tier failing the >= 60 gate falls through too
    pid4, _, _ = linker.match_speaker("Carla", "Jansen", activity_id="a1")
    assert pid4 == "p3"


def test_zaak_document_fallback():
    """J5 tier-2 'also try to find document within this dossier'
    (api_extractor.py:196-201,257-268)."""
    idx = _mk_index(reg_documents=[
        {"document_id": "docA", "dossier_id": "d2", "dossiernummer": 36201,
         "toevoeging": "VIII", "volgnummer": 3, "onderwerp": "x",
         "datum": datetime(2024, 1, 1), "zaak_id": "z2"},
        {"document_id": "docB", "dossier_id": "d3", "dossiernummer": 36999,
         "toevoeging": "", "volgnummer": 7, "onderwerp": "y",
         "datum": datetime(2024, 1, 1), "zaak_id": ""},
    ])
    linker = Linker(idx, EngineConfig.default())
    # dossier fallback with matching document (volgnummer == stuknummer)
    eid, kind, score, mt, doc_id = linker.match_zaak("36201-VIII", "3")
    assert (eid, kind, mt, doc_id) == ("d2", "dossier", "FALLBACK", "docA")
    # wrong stuknummer -> dossier fallback without document
    eid, kind, score, mt, doc_id = linker.match_zaak("36201-VIII", "9")
    assert (eid, doc_id) == ("d2", "")
    # tier-1 exact zaak never carries a document id
    eid, kind, score, mt, doc_id = linker.match_zaak("36200", "12")
    assert (eid, doc_id) == ("z1", "")
    # toevoeging-less dossier document
    eid, kind, score, mt, doc_id = linker.match_zaak("36999", "7")
    assert (eid, kind, doc_id) == ("d3", "dossier", "docB")


def test_sharded_gazetteer_merge_equals_full_cascade():
    """Sharded speaker resolution (stages/shard_link.py) must reproduce the
    full-index global cascade bit-for-bit: exact-bucket [:20] cap +
    first-of-equals scan, contains-fallback person_id-order cap, threshold
    gate — swept over a surname-dense synthetic registry with misspelled,
    substring-token, tie-scored, sub-threshold and unknown probes, at
    several shard counts."""
    import itertools
    from neo4j_tkapi_ray.stages.shard_link import (
        GazetteerShard, merge_surface, shard_partial_rows,
        split_person_shards)
    import pandas as pd

    cfg = EngineConfig.default()
    surnames = ["berg", "van der berg", "bergsma", "den berg", "bergh",
                "jansen", "janssen", "de jong", "jong", "vries", "de vries",
                "bakker", "bakkers", "visser", "smit", "smits"]
    persons = []
    for i, (sn, v) in enumerate(itertools.product(surnames, "abc")):
        persons.append({"person_id": f"p{i:03d}",
                        "voornamen": f"{v.upper()}name {v}x",
                        "roepnaam": f"{v.upper()}roep",
                        "tussenvoegsel": "", "achternaam": sn.title(),
                        "fractie_id": "f1"})
    # a 25-person bucket exercises the exact-tier [:20] cap
    for i in range(25):
        persons.append({"person_id": f"q{i:03d}", "voornamen": "Piet Jan",
                        "roepnaam": "Piet", "tussenvoegsel": "",
                        "achternaam": "Hotbucket", "fractie_id": "f1"})
    tables = {"persons": persons, "parties": [], "sessions": [],
              "activities": [], "cases": [], "dossiers": [],
              "activity_cases": []}
    full = Linker(RegistryIndex(tables), EngineConfig.default())

    probes = [("Aroep", "Berg"), ("Broep", "berg"), ("Croep", "Bergg"),
              ("Aname", "van der Berg"), ("", "berg"), ("Piet", "Hotbucket"),
              ("Pieter", "Hotbucket"), ("X", "jong"), ("Y", "de Jong"),
              ("Z", "vries"), ("A", "bakker"), ("B", "bakkerss"),
              ("C", "nosuchname"), ("D", "visserig"), ("E", "smit"),
              ("F", " Smits "), ("G", "s")]
    for n_shards in (2, 4, 7):
        shards = [GazetteerShard(p) for p in
                  split_person_shards(persons, n_shards)]
        for vn, an in probes:
            want = full.match_speaker(vn, an)
            rows = []
            for sid, sh in enumerate(shards):
                rows.extend(shard_partial_rows(sh, sid, n_shards, vn, an, cfg))
            if rows:
                pid, score, mt = merge_surface(pd.DataFrame(rows), cfg)
            else:
                pid, score, mt = None, 0, "NO_MATCH"
            got = (pid, score, mt)
            assert got == want, (vn, an, n_shards, got, want)


def test_surface_regex_scan_matches_json_parse(ray_session, tmp_path):
    """collect_speaker_surfaces scans the raw doc JSON with a compiled
    regex (coupled to the engine's own serializer field order); it must
    recover the EXACT surface set a full json.loads walk produces,
    including escaped names."""
    import json as _json

    import pyarrow as pa
    import ray.data as rd

    from neo4j_tkapi_ray.config import EngineConfig
    from neo4j_tkapi_ray.corpus import generate_corpus
    from neo4j_tkapi_ray.pipelines.kg import read_pages
    from neo4j_tkapi_ray.stages.extract import extract_docs
    from neo4j_tkapi_ray.stages.shard_link import collect_speaker_surfaces

    paths = generate_corpus(str(tmp_path / "c"), n_sessions=40, seed=3)
    docs = extract_docs(read_pages(paths["pages"]),
                        EngineConfig.default()).materialize()

    expected = set()
    for r in docs.take_all():
        if r["error"] is not None or r["doc"] is None:
            continue
        d = _json.loads(r["doc"])
        for act in d.get("activities", []):
            for sp in act.get("speakers", []):
                if sp.get("achternaam"):
                    expected.add((sp["voornaam"], sp["achternaam"]))
            for zk in act.get("zaken", []):
                for sp in zk.get("speakers", []):
                    if sp.get("achternaam"):
                        expected.add((sp["voornaam"], sp["achternaam"]))
    got = {(r["voornaam"], r["achternaam"])
           for r in collect_speaker_surfaces(docs).take_all()}
    assert got == expected and len(got) > 0

    # escaped-content probe: names with quotes/backslashes round-trip
    weird = {"url": "u", "warc_ts": "t", "lang": "nl",
             "text": "x", "error": None,
             "doc": _json.dumps({"activities": [{"speakers": [
                 {"voornaam": 'Jan "J\\R"', "achternaam": 'O\\"Brien',
                  "fractie": None}], "zaken": []}]},
                 separators=(",", ":"))}
    got2 = {(r["voornaam"], r["achternaam"])
            for r in collect_speaker_surfaces(
                rd.from_arrow(pa.Table.from_pylist([weird]))).take_all()}
    assert got2 == {('Jan "J\\R"', 'O\\"Brien')}
