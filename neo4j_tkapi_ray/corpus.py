"""Deterministic synthetic corpus generator (FIXTURES.md §1-§4).

Generates, from a single seed:
  * ``pages``           — Common-Crawl-style page table (input_hint shape, exact)
  * entity registry     — persons / parties / sessions / activities / cases /
                          dossiers / activity_cases (the "canonical API side")
  * ``truth_mentions``  — intended entity per generated mention
                          (url, kind, surface, entity_id)

The embedded page structure mirrors the reference's VLOS grammar
(/root/reference/src/vlos/extractors/xml_extractor.py:25-284 and the element
census of its sample_vlos_*.xml fixtures): vergadering -> activiteit* ->
draadboekfragment* (ordered!) with sprekers, zaak elements with
dossier/stuk numbers, and activiteititem vote blocks. Adversarial cases per
FIXTURES.md §4: whitespace torture, duplicate speakers, near-name collisions,
missing times, head-entity skew, duplicate urls, partial stuknummers and
malformed html rows.

No external data; everything derives from `random.Random(seed)`.
"""

from __future__ import annotations

import os
import random
from datetime import datetime, timedelta
from typing import Dict, List, Optional, Tuple

import pyarrow as pa
import pyarrow.parquet as pq

from . import schemas

# --------------------------------------------------------------------------
# deterministic vocab pools (synthetic Dutch-parliament-ish)
# --------------------------------------------------------------------------

SURNAME_POOL = [
    # deliberate near-collisions (edit distance 1-2) to exercise fuzzy
    # thresholds 60/75/80 (reference vlos_config.py:36-42)
    "Jansen", "Janssen", "Jansens", "Vries", "Fries", "Berg", "Bergh",
    "Bakker", "Bakkers", "Visser", "Vissers", "Smit", "Smits", "Meijer",
    "Meyer", "Mulder", "Boer", "Boers", "Dijk", "Dijkstra", "Hendriks",
    "Hendrikx", "Peters", "Pieters", "Kok", "Bos", "Vos", "Wolf", "Wolff",
    "Groot", "Groots", "Veen", "Veenstra", "Brouwer", "Brouwers", "Koning",
    "Koningh", "Timmermans", "Timmerman", "Scholten", "Scholtens",
]
TUSSEN_POOL = ["", "", "", "van", "de", "van der", "van den", "ter", "van de"]
FIRSTNAME_POOL = [
    "Anna", "Bram", "Carla", "Daan", "Eva", "Femke", "Gijs", "Hanna",
    "Iris", "Joris", "Kees", "Lotte", "Maarten", "Nora", "Otto", "Pieter",
    "Renske", "Sander", "Tessa", "Wouter", "Ylva", "Zoe", "Hugo", "Mila",
]
PARTY_NAMES = [
    ("Partij voor Vooruitgang", "PvV+"), ("Democratisch Alternatief", "DA"),
    ("Groene Unie", "GU"), ("Sociale Lijst", "SL"), ("Vrije Kamer", "VK"),
    ("Nationale Beweging", "NB"), ("Liberaal Front", "LF"),
    ("Christelijk Verbond", "CV"), ("Stadspartij", "SP+"),
    ("Plattelandsalliantie", "PA"), ("Jongerenpartij", "JP"),
    ("Ouderenbond", "OB"), ("Technocraten", "TC"), ("Middenblok", "MB"),
    ("Eilandenpartij", "EP"),
]
ACT_SOORT_POOL = [
    "Debat", "Mededelingen", "Vragenuur", "Wetgevingsoverleg",
    "Procedurevergadering", "Stemmingen",
]
PROCEDURAL_SOORTEN = ["Opening", "Sluiting", "Aanvang", "Einde vergadering"]
TOPIC_WORDS = [
    "begroting", "onderwijs", "zorg", "klimaat", "woningbouw", "veiligheid",
    "arbeidsmarkt", "migratie", "landbouw", "energie", "digitalisering",
    "infrastructuur", "defensie", "cultuur", "belastingen", "jeugdzorg",
    "pensioenen", "stikstof", "innovatie", "europa",
]
BOILERPLATE_PREFIXES = [
    "Tweeminutendebat", "Procedurevergadering", "Wetgevingsoverleg",
    "Stemmingen", "Aanbieding", "Technische briefing",
]
SENTENCE_WORDS = [
    "voorzitter", "het", "kabinet", "moet", "nu", "echt", "werk", "maken",
    "van", "deze", "belangrijke", "kwestie", "wij", "steunen", "dit",
    "voorstel", "maar", "vragen", "om", "een", "toezegging", "over", "de",
    "uitvoering", "en", "financiering", "daarvan", "collega", "heeft",
    "gelijk", "dat", "er", "meer", "aandacht", "nodig", "is",
]

CORPUS_VERSION = "v8"  # bump to invalidate cached generated corpora
SHARD_SESSIONS = 250   # sessions per pages shard file (and per gen task)


# --------------------------------------------------------------------------
# registry generation
# --------------------------------------------------------------------------

def _gen_registry(rng: random.Random, n_sessions: int) -> Dict[str, list]:
    parties = [
        {"fractie_id": f"fr{i:03d}", "naam": naam, "afkorting": afk}
        for i, (naam, afk) in enumerate(PARTY_NAMES)
    ]

    base = datetime(2024, 1, 8, 0, 0, 0)

    n_persons = max(40, min(400, n_sessions * 2))
    persons = []
    gift_words = ["boek", "fles wijn", "schilderij", "toegangskaart", "pen"]
    func_words = ["bestuurslid", "adviseur", "docent", "commissaris"]
    for i in range(n_persons):
        # nested property lists (reference persoon_processor.py:64-167)
        geschenken = [{
            "omschrijving": f"{rng.choice(gift_words)} {rng.randrange(100)}",
            "waarde": round(rng.uniform(5, 250), 2),
            "datum": base + timedelta(days=rng.randrange(260)),
        } for _ in range(rng.randrange(3))]
        nevenfuncties = [{
            "omschrijving": f"{rng.choice(func_words)} {rng.randrange(100)}",
            "inkomsten": [{"jaar": 2023 + rng.randrange(2),
                           "bedrag": round(rng.uniform(100, 9000), 2)}
                          for _ in range(rng.randrange(3))],
        } for _ in range(rng.randrange(3))]
        persons.append({
            "person_id": f"p{i:05d}",
            "voornamen": rng.choice(FIRSTNAME_POOL) + " " + rng.choice(FIRSTNAME_POOL),
            "roepnaam": rng.choice(FIRSTNAME_POOL),
            "tussenvoegsel": rng.choice(TUSSEN_POOL),
            "achternaam": rng.choice(SURNAME_POOL),
            "fractie_id": rng.choice(parties)["fractie_id"],
            "geschenken": geschenken,
            "nevenfuncties": nevenfuncties,
        })
    commissies = [{"commissie_id": f"cm{i:03d}",
                   "naam": f"Commissie voor {w}",
                   "afkorting": w[:4].upper()}
                  for i, w in enumerate(TOPIC_WORDS[:12])]

    sessions, activities = [], []
    act_counter = 0
    for i in range(n_sessions):
        datum = base + timedelta(days=i % 260, minutes=0)
        begin = datum + timedelta(hours=9 + (i % 3))
        n_act = 2 + rng.randrange(5)
        einde = begin + timedelta(hours=2 + n_act)
        sid = f"s{i:05d}"
        sessions.append({
            "session_id": sid,
            "soort": "Plenair" if rng.random() < 0.7 else "Commissie",
            "nummer": i + 1,
            "datum": datum,
            "begin": begin,
            "einde": einde,
        })
        t = begin
        for j in range(n_act):
            a_begin = t + timedelta(minutes=rng.randrange(10))
            a_end = a_begin + timedelta(minutes=30 + rng.randrange(60))
            activities.append({
                "activity_id": f"a{act_counter:06d}",
                "session_id": sid,
                "soort": rng.choice(ACT_SOORT_POOL),
                "onderwerp": _topic(rng),
                "begin": a_begin,
                "einde": a_end,
                # committee lead only for commissie sessions (reference
                # REL_MAP_ACTIVITEIT 'voortouwcommissies')
                "commissie_id": (rng.choice(commissies)["commissie_id"]
                                 if sessions[-1]["soort"] == "Commissie" else ""),
                # assigned in the tail section (rng-draw ordering)
                "vervangen_door": "", "voortgezet_vanuit": "", "zaal_id": "",
            })
            act_counter += 1
            t = a_end

    n_dossiers = max(10, n_sessions)
    dossiers = []
    for i in range(n_dossiers):
        dossiers.append({
            "dossier_id": f"d{i:05d}",
            "nummer": 36000 + i,
            "toevoeging": rng.choice(["", "", "", "VIII", "A", "B", "XII"]),
        })

    cases = []
    n_cases = max(20, n_sessions * 3)
    for i in range(n_cases):
        # leave the last ~15% of dossiers case-less -> FALLBACK tier targets
        dossier = dossiers[rng.randrange(max(1, int(len(dossiers) * 0.85)))]
        cases.append({
            "zaak_id": f"z{i:05d}",
            "nummer": f"2024Z{i:05d}",
            "dossiernummer": dossier["nummer"],
            "toevoeging": dossier["toevoeging"],
            "stuknummer": 1 + rng.randrange(40),
            "onderwerp": _topic(rng),
            "dossier_id": dossier["dossier_id"],
            "vervangen_door": "",
        })
    # ~6% of cases are superseded by another case (J9 self-referential
    # REPLACED_BY — reference constants.py:7, zaak_loader_processor.py:44-50)
    for c in cases:
        if rng.random() < 0.06:
            other = rng.choice(cases)
            if other["zaak_id"] != c["zaak_id"]:
                c["vervangen_door"] = other["zaak_id"]

    activity_cases = []
    for act in activities:
        for _ in range(rng.randrange(3)):
            activity_cases.append({
                "activity_id": act["activity_id"],
                "zaak_id": rng.choice(cases)["zaak_id"],
            })

    # activity actor rosters (reference ActiviteitActor, expanded-relation
    # S3) — fragment speakers are mostly drawn from these, so the J4
    # priority-1 actor tier has signal to exploit
    activity_actors = []
    for act in activities:
        roster = rng.sample(persons, min(2 + rng.randrange(4), len(persons)))
        for p in roster:
            activity_actors.append({"activity_id": act["activity_id"],
                                    "person_id": p["person_id"]})

    # Document family: ~60% of cases carry one document whose (dossier,
    # volgnummer=stuknummer) coordinates make the J5 tier-2 document
    # fallback reachable for dossier-tier mentions
    reg_documents = []
    for c in cases:
        if rng.random() < 0.6:
            reg_documents.append({
                "document_id": f"doc{len(reg_documents):05d}",
                "dossier_id": c["dossier_id"],
                "dossiernummer": c["dossiernummer"],
                "toevoeging": c["toevoeging"],
                "volgnummer": c["stuknummer"],
                "onderwerp": c["onderwerp"],
                "datum": base + timedelta(days=rng.randrange(260)),
                "zaak_id": c["zaak_id"],
                "activity_id": "",
            })
        if rng.random() < 0.15:  # decoy: volgnummer off by one, no zaak link
            reg_documents.append({
                "document_id": f"doc{len(reg_documents):05d}",
                "dossier_id": c["dossier_id"],
                "dossiernummer": c["dossiernummer"],
                "toevoeging": c["toevoeging"],
                "volgnummer": c["stuknummer"] + 100,
                "onderwerp": _topic(rng),
                "datum": base + timedelta(days=rng.randrange(260)),
                "zaak_id": "",
                "activity_id": "",
            })

    # Besluit + API-Stemming families (reference common_processors.py:75-190)
    besluiten, api_stemmingen = [], []
    for c in cases:
        if rng.random() < 0.4:
            bid = f"b{len(besluiten):05d}"
            besluiten.append({
                "besluit_id": bid,
                "zaak_id": c["zaak_id"],
                "activity_id": rng.choice(activities)["activity_id"],
                "soort": rng.choice(["Stemming", "Hamerstuk", "Aangehouden"]),
                "status": rng.choice(["Besluit", "Voorstel"]),
                "tekst": ("hoofdelijk aangenomen" if rng.random() < 0.3
                          else "met handopsteken"),
                "agendapunt_id": "",
            })
            for fr in rng.sample(parties, 3 + rng.randrange(5)):
                api_stemmingen.append({
                    "stemming_id": f"st{len(api_stemmingen):06d}",
                    "besluit_id": bid,
                    "fractie_id": fr["fractie_id"],
                    "soort": rng.choice(["Voor", "Tegen", "Voor", "Onthouding"]),
                    "vergissing": rng.random() < 0.02,
                })

    zalen = [{"zaal_id": f"zl{i:02d}", "naam": f"Zaal {chr(65 + i)}"}
             for i in range(8)]
    reserveringen = []
    for act in activities:
        if rng.random() < 0.5:
            reserveringen.append({
                "reservering_id": f"rv{len(reserveringen):06d}",
                "zaal_id": rng.choice(zalen)["zaal_id"],
                "activity_id": act["activity_id"],
                "vergadering_id": "",
            })

    # toezeggingen with self-referential fk pairs (J9 —
    # reference REL_MAP_TOEZEGGING, constants.py:35-42)
    toezeggingen = []
    n_toez = max(5, n_sessions // 4)
    for i in range(n_toez):
        toezeggingen.append({
            "toezegging_id": f"tz{i:05d}",
            "tekst": _sentence(rng, 12),
            "activity_id": rng.choice(activities)["activity_id"],
            "person_id": rng.choice(persons)["person_id"],
            "is_aanvulling_op": "", "is_herhaling_van": "",
            "is_wijziging_van": "",
        })
    for t in toezeggingen:
        if rng.random() < 0.12:
            other = rng.choice(toezeggingen)
            if other["toezegging_id"] != t["toezegging_id"]:
                t["is_aanvulling_op"] = other["toezegging_id"]
        if rng.random() < 0.08:
            other = rng.choice(toezeggingen)
            if other["toezegging_id"] != t["toezegging_id"]:
                t["is_herhaling_van"] = other["toezegging_id"]

    # PersoonFunctie family (reference persoonfunctie_loader.py:85-116;
    # generated LAST so earlier rng draws — and therefore every other table
    # and page — are unchanged relative to prior corpus versions)
    functie_titles = ["Tweede Kamerlid", "Fractievoorzitter", "Voorzitter",
                      "Ondervoorzitter", "Commissievoorzitter"]
    persoon_functies = []
    for p in persons:
        for _ in range(1 + rng.randrange(2)):
            van = base - timedelta(days=365 * (1 + rng.randrange(8)))
            still_held = rng.random() < 0.6
            persoon_functies.append({
                "functie_id": f"pf{len(persoon_functies):05d}",
                "person_id": p["person_id"],
                # fractie-bound for party roles, '' for chamber offices
                "fractie_id": (p["fractie_id"] if rng.random() < 0.7 else ""),
                "functie": rng.choice(functie_titles),
                "omschrijving": _sentence(rng, 6),
                "van": van,
                "tot_en_met": (None if still_held
                               else van + timedelta(days=30 * (6 + rng.randrange(60)))),
                "soort": rng.choice(["Kamerlid", "Kabinet", "Overig"]),
            })

    # ---- tail section: every family below is generated after the tables
    # above, so their rng draws never shift earlier tables or the rendered
    # pages relative to prior corpus versions -----------------------------

    # Activiteit self-referential fks (REL_MAP_ACTIVITEIT_SELF,
    # constants.py:50-55) + zaal hosting (REL_MAP_ACTIVITEIT 'zaal')
    for a in activities:
        if rng.random() < 0.03:
            other = rng.choice(activities)
            if other["activity_id"] != a["activity_id"]:
                a["vervangen_door"] = other["activity_id"]
        if rng.random() < 0.03:
            other = rng.choice(activities)
            if other["activity_id"] != a["activity_id"]:
                a["voortgezet_vanuit"] = other["activity_id"]
        if rng.random() < 0.6:
            a["zaal_id"] = rng.choice(zalen)["zaal_id"]

    # Toezegging modification pair (REL_MAP_TOEZEGGING 'is_wijziging_van')
    for t in toezeggingen:
        if rng.random() < 0.15:
            other = rng.choice(toezeggingen)
            if other["toezegging_id"] != t["toezegging_id"]:
                t["is_wijziging_van"] = other["toezegging_id"]
    # small corpora may draw zero pairs — guarantee one so the MODIFIES /
    # MODIFIED_BY projections are always exercised (deterministic)
    if (len(toezeggingen) >= 2
            and not any(t["is_wijziging_van"] for t in toezeggingen)):
        toezeggingen[-1]["is_wijziging_van"] = toezeggingen[0]["toezegging_id"]

    # Session-level room reservations (REL_MAP_RESERVERING 'vergadering' /
    # REL_MAP_ZAAL 'vergaderingen')
    for s in sessions:
        if rng.random() < 0.4:
            reserveringen.append({
                "reservering_id": f"rv{len(reserveringen):06d}",
                "zaal_id": rng.choice(zalen)["zaal_id"],
                "activity_id": "",
                "vergadering_id": s["session_id"],
            })

    # Some documents are activity-bound (REL_MAP_DOC 'activiteiten')
    for d in reg_documents:
        if rng.random() < 0.3:
            d["activity_id"] = rng.choice(activities)["activity_id"]

    # Agendapunt family (agendapunt_loader.py:98-107; REL_MAP_ZAAK /
    # REL_MAP_ACTIVITEIT 'agendapunten', REL_MAP_BESLUIT 'agendapunt')
    rubrieken = ["Hamerstukken", "Stemmingen", "Brieven", "Overig"]
    agendapunten = []
    for a in activities:
        if rng.random() < 0.5:
            for j in range(1 + rng.randrange(2)):
                agendapunten.append({
                    "agendapunt_id": f"ap{len(agendapunten):06d}",
                    "activity_id": a["activity_id"],
                    "zaak_id": (rng.choice(cases)["zaak_id"]
                                if rng.random() < 0.7 else ""),
                    "nummer": f"{len(agendapunten) + 1}",
                    "onderwerp": _topic(rng),
                    "volgorde": j + 1,
                    "rubriek": rng.choice(rubrieken),
                })
    for b in besluiten:
        if agendapunten and rng.random() < 0.5:
            b["agendapunt_id"] = rng.choice(agendapunten)["agendapunt_id"]

    # Fractie seat chain (REL_MAP_FRACTIE / _ZETEL / _ZETEL_PERSOON)
    fractie_zetels, fractie_zetel_persons, fractie_zetel_vacatures = [], [], []
    for fr in parties:
        for _ in range(3 + rng.randrange(5)):
            zid = f"fz{len(fractie_zetels):05d}"
            fractie_zetels.append({"zetel_id": zid,
                                   "fractie_id": fr["fractie_id"],
                                   "gewicht": 1})
            if rng.random() < 0.8:
                van = base - timedelta(days=365 * (1 + rng.randrange(4)))
                fractie_zetel_persons.append({
                    "fzp_id": f"fzp{len(fractie_zetel_persons):05d}",
                    "zetel_id": zid,
                    "person_id": rng.choice(persons)["person_id"],
                    "functie": "Lid",
                    "van": van,
                    "tot_en_met": (None if rng.random() < 0.7 else
                                   van + timedelta(days=365 * (1 + rng.randrange(3)))),
                })
            elif rng.random() < 0.5:
                fractie_zetel_vacatures.append({
                    "vacature_id": f"fzv{len(fractie_zetel_vacatures):05d}",
                    "zetel_id": zid, "functie": "Lid",
                    "van": base - timedelta(days=rng.randrange(400)),
                })

    # Commissie seat chain (REL_MAP_COMMISSIE / _ZETEL / _ZETEL_PERSOON;
    # vast/vervanger discriminator replaces the reference's four child types)
    commissie_zetels, commissie_zetel_persons = [], []
    commissie_zetel_vacatures = []
    for cm in commissies:
        for _ in range(2 + rng.randrange(4)):
            zid = f"cz{len(commissie_zetels):05d}"
            commissie_zetels.append({"zetel_id": zid,
                                     "commissie_id": cm["commissie_id"],
                                     "gewicht": 1})
            for soort, prob in (("vast", 0.8), ("vervanger", 0.3)):
                if rng.random() < prob:
                    van = base - timedelta(days=365 * (1 + rng.randrange(3)))
                    commissie_zetel_persons.append({
                        "czp_id": f"czp{len(commissie_zetel_persons):05d}",
                        "zetel_id": zid,
                        "person_id": rng.choice(persons)["person_id"],
                        "soort": soort,
                        "functie": rng.choice(["Lid", "Voorzitter"]),
                        "van": van,
                        "tot_en_met": (None if rng.random() < 0.7 else
                                       van + timedelta(days=365)),
                    })
            if rng.random() < 0.1:
                commissie_zetel_vacatures.append({
                    "vacature_id": f"czv{len(commissie_zetel_vacatures):05d}",
                    "zetel_id": zid,
                    "soort": rng.choice(["vast", "vervanger"]),
                    "functie": "Lid",
                    "van": base - timedelta(days=rng.randrange(400)),
                })

    # DocumentVersie family with nested publicaties (document_loader.py:
    # 188-236)
    document_versies = []
    for d in reg_documents:
        if rng.random() < 0.5:
            for v in range(1 + rng.randrange(2)):
                pubs = [{
                    "publicatie_id":
                        f"pub{len(document_versies):05d}x{k}",
                    "soort": rng.choice(["Publicatie", "PublicatieMetadata"]),
                    "datum": base + timedelta(days=rng.randrange(260)),
                } for k in range(rng.randrange(3))]
                document_versies.append({
                    "versie_id": f"dv{len(document_versies):05d}",
                    "document_id": d["document_id"],
                    "versienummer": v + 1,
                    "status": rng.choice(["Vastgesteld", "Concept"]),
                    "datum": base + timedelta(days=rng.randrange(260)),
                    "publicaties": pubs,
                })

    # Zaak/Document actor relations (REL_MAP_ZAAK 'actors' +
    # REL_MAP_ZAAK_ACTOR / REL_MAP_DOCUMENT_ACTOR: one of persoon/fractie/
    # commissie per actor row)
    relaties = ["Indiener", "Medeindiener", "Rapporteur", "Volgcommissie"]

    def _make_actor(prefix: str, count: int) -> dict:
        roll = rng.random()
        person_id = fractie_id = commissie_id = ""
        if roll < 0.5:
            p = rng.choice(persons)
            person_id, naam = p["person_id"], p["achternaam"]
        elif roll < 0.8:
            fr = rng.choice(parties)
            fractie_id, naam = fr["fractie_id"], fr["naam"]
        else:
            cm = rng.choice(commissies)
            commissie_id, naam = cm["commissie_id"], cm["naam"]
        return {"actor_id": f"{prefix}{count:06d}", "person_id": person_id,
                "fractie_id": fractie_id, "commissie_id": commissie_id,
                "naam": naam, "relatie": rng.choice(relaties)}

    zaak_actors, document_actors = [], []
    for c in cases:
        if rng.random() < 0.4:
            a = _make_actor("za", len(zaak_actors))
            a["zaak_id"] = c["zaak_id"]
            zaak_actors.append(a)
    for d in reg_documents:
        if rng.random() < 0.3:
            a = _make_actor("da", len(document_actors))
            a["document_id"] = d["document_id"]
            document_actors.append(a)

    # Remaining nested child families (REL_MAP_PERSOON 'contact_informaties'
    # / 'loopbaan' / 'onderwijs' / 'reizen', REL_MAP_FRACTIE
    # 'aanvullende_gegevens', REL_MAP_COMMISSIE 'contact_informaties' —
    # constants.py:84-102). Child entities are list<struct> columns on the
    # parent dimension; ops.nested emits the HAS_* edges + child rows.
    contact_soorten = ["Email", "Telefoon", "Website"]
    werkgevers = ["Universiteit", "Gemeente", "Stichting", "Ministerie"]
    opleidingen = ["Rechten", "Economie", "Geschiedenis", "Bestuurskunde"]
    bestemmingen = ["Berlijn", "Parijs", "Brussel", "Washington", "Genève"]
    for p in persons:
        p["contact_informaties"] = [
            {"soort": rng.choice(contact_soorten),
             "waarde": f"{p['person_id']}-{k}@example.org"}
            for k in range(rng.randrange(3))]
        p["loopbaan"] = [
            {"functie": rng.choice(func_words),
             "werkgever": rng.choice(werkgevers),
             "van_jaar": 1995 + rng.randrange(20),
             "tot_jaar": 2015 + rng.randrange(9)}
            for _ in range(rng.randrange(3))]
        p["onderwijs"] = [
            {"opleiding": rng.choice(opleidingen),
             "instelling": f"Universiteit {rng.choice(bestemmingen)}",
             "jaar": 1990 + rng.randrange(20)}
            for _ in range(rng.randrange(2))]
        p["reizen"] = [
            {"bestemming": rng.choice(bestemmingen),
             "doel": "werkbezoek",
             "betaald_door": rng.choice(werkgevers)}
            for _ in range(rng.randrange(2))]
    for fr in parties:
        fr["aanvullende_gegevens"] = [
            {"soort": "website", "waarde": f"https://{fr['afkorting'].lower()}.example.org"}
        ] if rng.random() < 0.7 else []
    for cm in commissies:
        cm["contact_informaties"] = [
            {"soort": rng.choice(contact_soorten),
             "waarde": f"{cm['commissie_id']}-{k}@example.org"}
            for k in range(rng.randrange(2))]

    return {
        "persons": persons, "parties": parties, "sessions": sessions,
        "activities": activities, "cases": cases, "dossiers": dossiers,
        "activity_cases": activity_cases, "activity_actors": activity_actors,
        "reg_documents": reg_documents, "besluiten": besluiten,
        "api_stemmingen": api_stemmingen, "commissies": commissies,
        "zalen": zalen, "reserveringen": reserveringen,
        "toezeggingen": toezeggingen, "persoon_functies": persoon_functies,
        "agendapunten": agendapunten,
        "fractie_zetels": fractie_zetels,
        "fractie_zetel_persons": fractie_zetel_persons,
        "fractie_zetel_vacatures": fractie_zetel_vacatures,
        "commissie_zetels": commissie_zetels,
        "commissie_zetel_persons": commissie_zetel_persons,
        "commissie_zetel_vacatures": commissie_zetel_vacatures,
        "document_versies": document_versies,
        "zaak_actors": zaak_actors, "document_actors": document_actors,
    }


def _topic(rng: random.Random) -> str:
    w = rng.sample(TOPIC_WORDS, 2)
    return f"wijziging van de begrotingsstaat {w[0]} en {w[1]} {2024 + rng.randrange(2)}"


def _sentence(rng: random.Random, n: int = 10) -> str:
    return " ".join(rng.choice(SENTENCE_WORDS) for _ in range(n)).capitalize() + "."


# --------------------------------------------------------------------------
# page rendering
# --------------------------------------------------------------------------

def _speaker_xml(rng: random.Random, person: Optional[dict], party_by_id: Dict[str, dict],
                 truth: list, url: str, torture: bool) -> Tuple[str, str]:
    """Render one <spreker> element; returns (xml, surface_last)."""
    if person is None:
        first = rng.choice(FIRSTNAME_POOL)
        last = "Onbekend" + rng.choice(["sma", "er", "ius"])
        fractie_naam = ""
        entity_id = ""
    else:
        first = person["roepnaam"] if rng.random() < 0.7 else person["voornamen"].split()[0]
        roll = rng.random()
        bare = person["achternaam"]
        fullsur = (person["tussenvoegsel"] + " " + bare).strip()
        if roll < 0.62:
            last = bare
        elif roll < 0.80:
            last = fullsur
        elif roll < 0.90:
            # typo: drop or swap one char -> near fuzzy threshold
            k = rng.randrange(len(bare))
            last = (bare[:k] + bare[k + 1:]) if rng.random() < 0.5 else (
                bare[:k] + rng.choice("aeiou") + bare[k + 1:])
        else:
            last = bare.upper()[:1] + bare[1:]
        party = party_by_id.get(person["fractie_id"])
        fractie_naam = party["naam"] if party else ""
        entity_id = person["person_id"]
    truth.append({"url": url, "kind": "speaker",
                  "surface": f"{first} {last}".strip(), "entity_id": entity_id})
    ws = "\n      " if torture else ""
    xml = (f"<spreker>{ws}<voornaam>{first}</voornaam>"
           f"<achternaam>{last}</achternaam>"
           + (f"<fractie>{fractie_naam}</fractie>" if fractie_naam else "")
           + f"{ws}</spreker>")
    return xml, last


def _fmt(dt: datetime) -> str:
    return dt.strftime("%Y-%m-%dT%H:%M:%S")


def _render_page(rng: random.Random, session: dict, sess_acts: List[dict],
                 reg: Dict[str, list], url: str,
                 truth: list, skew_person: dict, skew_case: dict,
                 actors_by_act: Dict[str, List[dict]],
                 page_scale: int = 1) -> str:
    party_by_id = {p["fractie_id"]: p for p in reg["parties"]}
    parts = []
    parts.append(f'<vergadering soort="{session["soort"]}" objectid="obj-{session["session_id"]}">')
    parts.append(f"  <titel>Vergadering {session['nummer']}</titel>")
    parts.append(f"  <vergaderingnummer>{session['nummer']}</vergaderingnummer>")
    parts.append(f"  <datum>{_fmt(session['datum'])}</datum>")

    # a procedural activity that MUST be filtered (reference xml_extractor.py:67-83)
    if rng.random() < 0.6:
        psoort = rng.choice(PROCEDURAL_SOORTEN)
        parts.append(f'  <activiteit soort="{psoort}" objectid="proc-{session["session_id"]}">')
        parts.append(f"    <titel>{psoort} van de vergadering</titel>")
        parts.append("  </activiteit>")

    n_page_acts = min(len(sess_acts), 1 + rng.randrange(3))
    chosen = sess_acts[:n_page_acts]

    for act in chosen:
        aid = f"xml-{act['activity_id']}"
        # surface forms for onderwerp / soort (exercise J3 paths)
        roll = rng.random()
        ond = act["onderwerp"]
        if roll < 0.55:
            onderwerp = ond
        elif roll < 0.75:
            onderwerp = f"{rng.choice(BOILERPLATE_PREFIXES)} {ond}"
        elif roll < 0.9:
            onderwerp = ond.replace("begrotingsstaat", "begrotingstaat")
        else:
            onderwerp = "overige onderwerpen " + str(rng.randrange(100))
        soort_surface = act["soort"] if rng.random() < 0.8 else act["soort"].lower()
        truth.append({"url": url, "kind": "activity", "surface": onderwerp,
                      "entity_id": act["activity_id"]})

        parts.append(f'  <activiteit soort="{soort_surface}" objectid="{aid}">')
        parts.append(f"    <titel>{onderwerp}</titel>")
        parts.append(f"    <onderwerp>{onderwerp}</onderwerp>")
        if rng.random() < 0.85:  # some activities have no time data (fall back to vergadering)
            jitter = timedelta(minutes=rng.randrange(-10, 11))
            parts.append(f"    <aanvangstijd>{_fmt(act['begin'] + jitter)}</aanvangstijd>")
            parts.append(f"    <eindtijd>{_fmt(act['einde'] + jitter)}</eindtijd>")

        # fragments (ordered!) with speakers; build A->B->A patterns. The
        # pool draws mostly from the activity's ACTOR roster (so the J4
        # actor-priority tier is the tier that usually resolves them),
        # with the skew person and random non-actors mixed in
        n_frag = (2 + rng.randrange(6)) * page_scale
        frag_persons: List[Optional[dict]] = []
        pool: List[Optional[dict]] = []
        roster = actors_by_act.get(act["activity_id"], [])
        for _ in range(3):
            r = rng.random()
            if r < 0.3:
                pool.append(skew_person)
            elif r < 0.75 and roster:
                pool.append(rng.choice(roster))
            else:
                pool.append(rng.choice(reg["persons"]))
        if rng.random() < 0.1:
            pool.append(None)  # unknown speaker
        for i in range(n_frag):
            if i >= 2 and rng.random() < 0.4:
                frag_persons.append(frag_persons[i - 2])  # A -> B -> A
            else:
                frag_persons.append(rng.choice(pool))
        for i, person in enumerate(frag_persons):
            torture = rng.random() < 0.3
            sp_xml, _ = _speaker_xml(rng, person, party_by_id, truth, url, torture)
            sent = _sentence(rng, 8 + rng.randrange(20))
            if torture:
                tekst = (f"<tekst>\n   <alinea>Voorzitter,   <nadruk>let op</nadruk>\n "
                         f"{sent}</alinea>\n  <alinea>  {_sentence(rng, 6)} </alinea>\n </tekst>")
            else:
                tekst = f"<tekst><alinea>{sent}</alinea></tekst>"
            extra = ""
            if rng.random() < 0.15:  # duplicate speaker in same fragment (dedup case D4)
                dup_xml, _ = _speaker_xml(rng, person, party_by_id, truth, url, False)
                extra = dup_xml
            parts.append("    <draadboekfragment>")
            parts.append(f"      {tekst}")
            parts.append(f"      <sprekers>{sp_xml}{extra}</sprekers>")
            parts.append("    </draadboekfragment>")

        # zaak mentions
        for _ in range(rng.randrange(3)):
            if rng.random() < 0.25:
                case = skew_case
            else:
                case = rng.choice(reg["cases"])
            code = str(case["dossiernummer"]) + (
                f"-{case['toevoeging']}" if case["toevoeging"] and rng.random() < 0.5 else "")
            if rng.random() < 0.12:
                # incomplete: missing stuknummer -> filtered (F6)
                parts.append(f'    <zaak objectid="zx" soort="Wetgeving">'
                             f"<dossiernummer>{code}</dossiernummer>"
                             f"<titel>{case['onderwerp']}</titel></zaak>")
                continue
            if rng.random() < 0.12:
                # unknown dossier -> NO_MATCH tier
                code, stuk, entity = "99" + str(rng.randrange(100, 999)), 99, ""
                titel = "onbekend onderwerp"
            else:
                stuk = case["stuknummer"]
                titel = case["onderwerp"]
                has_toevoeging = "-" in code
                # exact zaak reachable only via int dossier code (tier 1);
                # toevoeging codes fall through to dossier fallback — reference
                # api_extractor.py:207-240 semantics
                entity = case["zaak_id"]
            truth.append({"url": url, "kind": "zaak",
                          "surface": f"{code}:{stuk}", "entity_id": entity})
            direct_speaker = ""
            if entity and rng.random() < 0.2:
                person = rng.choice(reg["persons"])
                sp, _ = _speaker_xml(rng, person, party_by_id, truth, url, False)
                direct_speaker = f"<sprekers>{sp}</sprekers>"
            parts.append(f'    <zaak objectid="z-{code}-{stuk}" soort="Wetgeving">'
                         f"<dossiernummer>{code}</dossiernummer>"
                         f"<stuknummer>{stuk}</stuknummer>"
                         f"<titel>{titel}</titel>{direct_speaker}</zaak>")

        # vote block
        if rng.random() < 0.35:
            uitslag = rng.choice(["Aangenomen", "Verworpen"])
            votes = []
            n_votes = 5 + rng.randrange(8)
            fracties = rng.sample(reg["parties"], min(n_votes, len(reg["parties"])))
            for fr in fracties:
                stem = rng.choice(["Voor", "Tegen", "Voor", "Voor", "Onthouding"])
                votes.append(f"<stemming><fractie>{fr['naam']}</fractie>"
                             f"<stem>{stem}</stem></stemming>")
            parts.append(f'    <activiteititem soort="besluit">'
                         f"<titel>Stemming over {onderwerp}</titel>"
                         f"<besluitvorm>hoofdelijk</besluitvorm>"
                         f"<uitslag>{uitslag}</uitslag>"
                         f"<stemmingen>{''.join(votes)}</stemmingen></activiteititem>")

        parts.append("  </activiteit>")

    parts.append("</vergadering>")
    body = "\n".join(parts)
    return ("<html><head><title>Verslag</title></head><body>\n"
            '<div class="verslag">\n' + body + "\n</div>\n</body></html>")


# --------------------------------------------------------------------------
# top-level generation (sharded; parallel via Ray tasks when available)
# --------------------------------------------------------------------------

def _gen_pages_shard(shard_idx: int, sessions: List[dict], reg: Dict[str, list],
                     seed: int, page_scale: int, pages_dir: str) -> List[dict]:
    """Generate one shard of pages (deterministic per (seed, shard_idx),
    independent of how shards are scheduled) and write its parquet file.
    Returns the shard's truth-mention rows."""
    rng = random.Random((seed + 1) * 1_000_003 + shard_idx)
    acts_by_session: Dict[str, List[dict]] = {}
    for a in reg["activities"]:
        acts_by_session.setdefault(a["session_id"], []).append(a)
    person_by_id = {p["person_id"]: p for p in reg["persons"]}
    actors_by_act: Dict[str, List[dict]] = {}
    for aa in reg.get("activity_actors", []):
        actors_by_act.setdefault(aa["activity_id"], []).append(
            person_by_id[aa["person_id"]])
    skew_person = reg["persons"][0]
    skew_case = reg["cases"][0]

    pages, truth = [], []
    for session in sessions:
        url = f"https://example.org/session/{session['session_id']}/part1"
        lang = "nl" if rng.random() < 0.92 else rng.choice(["en", "de"])
        page_truth: list = []
        html = _render_page(rng, session, acts_by_session.get(session["session_id"], []),
                            reg, url, page_truth, skew_person, skew_case,
                            actors_by_act, page_scale)
        if rng.random() < 0.01:  # malformed row -> failed-row sidecar (FIXTURES §4.8)
            html = html[: len(html) // 2]
            page_truth = []
        warc_ts = session["datum"] + timedelta(hours=20, minutes=rng.randrange(60))
        bom = b"\xef\xbb\xbf" if rng.random() < 0.1 else b""
        pages.append({
            "url": url,
            "warc_ts": warc_ts,
            "html": bom + html.encode("utf-8"),
            "text": "pre-extracted placeholder (pipeline must recompute from html)",
            "lang": lang,
        })
        if lang == "nl":
            truth.extend(page_truth)
        # duplicate url with later warc_ts (last-write-wins merge case)
        if rng.random() < 0.05:
            pages.append({**pages[-1], "warc_ts": warc_ts + timedelta(hours=5)})

    tbl = pa.Table.from_pylist(pages, schema=schemas.PAGES)
    pq.write_table(tbl, os.path.join(pages_dir, f"pages-{shard_idx:05d}.parquet"),
                   row_group_size=64)
    return truth


def generate_corpus(out_dir: str, n_sessions: int = 50, seed: int = 42,
                    page_scale: int = 1) -> Dict[str, str]:
    """Generate the full corpus into ``out_dir``; returns {table: path}.

    Deterministic for a given (n_sessions, seed, page_scale, CORPUS_VERSION)
    regardless of execution mode: pages are generated per SHARD_SESSIONS-sized
    shard with a shard-seeded RNG, in parallel Ray tasks when a Ray session
    exists (large corpora), serially otherwise. Reuses an existing directory
    if its marker file matches (cheap cache for tests / bench / queries()).
    """
    marker = os.path.join(out_dir,
                          f".complete-{CORPUS_VERSION}-{n_sessions}-{seed}-{page_scale}")
    paths = {name: os.path.join(out_dir, f"{name}.parquet")
             for name in ["persons", "parties", "sessions", "activities",
                          "cases", "dossiers", "activity_cases",
                          "activity_actors", "reg_documents", "besluiten",
                          "api_stemmingen", "commissies", "zalen",
                          "reserveringen", "toezeggingen", "persoon_functies",
                          "agendapunten", "fractie_zetels",
                          "fractie_zetel_persons", "fractie_zetel_vacatures",
                          "commissie_zetels", "commissie_zetel_persons",
                          "commissie_zetel_vacatures", "document_versies",
                          "zaak_actors", "document_actors",
                          "truth_mentions"]}
    paths["pages"] = os.path.join(out_dir, "pages")  # sharded directory
    if os.path.exists(marker):
        return paths

    rng = random.Random(seed)
    reg = _gen_registry(rng, n_sessions)

    os.makedirs(out_dir, exist_ok=True)
    pages_dir = paths["pages"]
    os.makedirs(pages_dir, exist_ok=True)

    shards = [reg["sessions"][i:i + SHARD_SESSIONS]
              for i in range(0, len(reg["sessions"]), SHARD_SESSIONS)]

    truth: list = []
    use_ray = False
    if len(shards) > 2:
        try:
            import ray
            use_ray = ray.is_initialized()
        except ImportError:
            use_ray = False
    if use_ray:
        import ray
        gen_remote = ray.remote(num_cpus=1)(_gen_pages_shard)
        reg_ref = ray.put(reg)
        futs = [gen_remote.remote(i, shard, reg_ref, seed, page_scale, pages_dir)
                for i, shard in enumerate(shards)]
        for t in ray.get(futs):
            truth.extend(t)
    else:
        for i, shard in enumerate(shards):
            truth.extend(_gen_pages_shard(i, shard, reg, seed, page_scale, pages_dir))

    tables = {
        "persons": pa.Table.from_pylist(reg["persons"], schema=schemas.PERSONS),
        "parties": pa.Table.from_pylist(reg["parties"], schema=schemas.PARTIES),
        "sessions": pa.Table.from_pylist(reg["sessions"], schema=schemas.SESSIONS),
        "activities": pa.Table.from_pylist(reg["activities"], schema=schemas.ACTIVITIES),
        "cases": pa.Table.from_pylist(reg["cases"], schema=schemas.CASES),
        "dossiers": pa.Table.from_pylist(reg["dossiers"], schema=schemas.DOSSIERS),
        "activity_cases": pa.Table.from_pylist(reg["activity_cases"], schema=schemas.ACTIVITY_CASES),
        "activity_actors": pa.Table.from_pylist(reg["activity_actors"], schema=schemas.ACTIVITY_ACTORS),
        "reg_documents": pa.Table.from_pylist(reg["reg_documents"], schema=schemas.REG_DOCUMENTS),
        "besluiten": pa.Table.from_pylist(reg["besluiten"], schema=schemas.BESLUITEN),
        "api_stemmingen": pa.Table.from_pylist(reg["api_stemmingen"], schema=schemas.API_STEMMINGEN),
        "commissies": pa.Table.from_pylist(reg["commissies"], schema=schemas.COMMISSIES),
        "zalen": pa.Table.from_pylist(reg["zalen"], schema=schemas.ZALEN),
        "reserveringen": pa.Table.from_pylist(reg["reserveringen"], schema=schemas.RESERVERINGEN),
        "toezeggingen": pa.Table.from_pylist(reg["toezeggingen"], schema=schemas.TOEZEGGINGEN),
        "persoon_functies": pa.Table.from_pylist(reg["persoon_functies"], schema=schemas.PERSOON_FUNCTIES),
        "agendapunten": pa.Table.from_pylist(reg["agendapunten"], schema=schemas.AGENDAPUNTEN),
        "fractie_zetels": pa.Table.from_pylist(reg["fractie_zetels"], schema=schemas.FRACTIE_ZETELS),
        "fractie_zetel_persons": pa.Table.from_pylist(reg["fractie_zetel_persons"], schema=schemas.FRACTIE_ZETEL_PERSONS),
        "fractie_zetel_vacatures": pa.Table.from_pylist(reg["fractie_zetel_vacatures"], schema=schemas.FRACTIE_ZETEL_VACATURES),
        "commissie_zetels": pa.Table.from_pylist(reg["commissie_zetels"], schema=schemas.COMMISSIE_ZETELS),
        "commissie_zetel_persons": pa.Table.from_pylist(reg["commissie_zetel_persons"], schema=schemas.COMMISSIE_ZETEL_PERSONS),
        "commissie_zetel_vacatures": pa.Table.from_pylist(reg["commissie_zetel_vacatures"], schema=schemas.COMMISSIE_ZETEL_VACATURES),
        "document_versies": pa.Table.from_pylist(reg["document_versies"], schema=schemas.DOCUMENT_VERSIES),
        "zaak_actors": pa.Table.from_pylist(reg["zaak_actors"], schema=schemas.ZAAK_ACTORS),
        "document_actors": pa.Table.from_pylist(reg["document_actors"], schema=schemas.DOCUMENT_ACTORS),
        "truth_mentions": pa.Table.from_pylist(truth) if truth else pa.table(
            {"url": pa.array([], pa.string()), "kind": pa.array([], pa.string()),
             "surface": pa.array([], pa.string()), "entity_id": pa.array([], pa.string())}),
    }
    for name, tbl in tables.items():
        pq.write_table(tbl, paths[name])
    with open(marker, "w") as f:
        f.write("ok")
    return paths
