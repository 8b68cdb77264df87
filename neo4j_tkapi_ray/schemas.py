"""Arrow schemas for every table flowing through the engine.

The reference's data model is implicit property dicts built ad hoc per loader
(SURVEY.md §1.2); here every stage boundary has a fixed pyarrow schema.
"""

from __future__ import annotations

import pyarrow as pa

# Input — BASELINE.json input_hint, exact shape.
PAGES = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

# Entity registry ("the canonical API side" — link targets).
# Nested list<struct> property lists mirror the reference's persoon nesting
# (persoon_processor.py:64-167: geschenken, nevenfuncties -> inkomsten).
GESCHENK = pa.struct([("omschrijving", pa.string()),
                      ("waarde", pa.float64()),
                      ("datum", pa.timestamp("us"))])
INKOMST = pa.struct([("jaar", pa.int32()), ("bedrag", pa.float64())])
NEVENFUNCTIE = pa.struct([("omschrijving", pa.string()),
                          ("inkomsten", pa.list_(INKOMST))])
# remaining REL_MAP_PERSOON / _FRACTIE / _COMMISSIE nested children
# (constants.py:84-102): contact info, career, education, travel, party
# extras — child entities as list<struct> columns, flattened + edge-emitted
# by ops.nested
CONTACT = pa.struct([("soort", pa.string()), ("waarde", pa.string())])
LOOPBAAN = pa.struct([("functie", pa.string()), ("werkgever", pa.string()),
                      ("van_jaar", pa.int32()), ("tot_jaar", pa.int32())])
ONDERWIJS = pa.struct([("opleiding", pa.string()),
                       ("instelling", pa.string()), ("jaar", pa.int32())])
REIS = pa.struct([("bestemming", pa.string()), ("doel", pa.string()),
                  ("betaald_door", pa.string())])
AANVULLEND = pa.struct([("soort", pa.string()), ("waarde", pa.string())])
PERSONS = pa.schema([
    ("person_id", pa.string()),
    ("voornamen", pa.string()),
    ("roepnaam", pa.string()),
    ("tussenvoegsel", pa.string()),
    ("achternaam", pa.string()),
    ("fractie_id", pa.string()),
    ("geschenken", pa.list_(GESCHENK)),
    ("nevenfuncties", pa.list_(NEVENFUNCTIE)),
    ("contact_informaties", pa.list_(CONTACT)),
    ("loopbaan", pa.list_(LOOPBAAN)),
    ("onderwijs", pa.list_(ONDERWIJS)),
    ("reizen", pa.list_(REIS)),
])

PARTIES = pa.schema([
    ("fractie_id", pa.string()),
    ("naam", pa.string()),
    ("afkorting", pa.string()),
    ("aanvullende_gegevens", pa.list_(AANVULLEND)),
])

SESSIONS = pa.schema([
    ("session_id", pa.string()),
    ("soort", pa.string()),          # Plenair | Commissie
    ("nummer", pa.int32()),
    ("datum", pa.timestamp("us")),   # naive local, midnight
    ("begin", pa.timestamp("us")),
    ("einde", pa.timestamp("us")),
])

ACTIVITIES = pa.schema([
    ("activity_id", pa.string()),
    ("session_id", pa.string()),
    ("soort", pa.string()),
    ("onderwerp", pa.string()),
    ("begin", pa.timestamp("us")),
    ("einde", pa.timestamp("us")),
    ("commissie_id", pa.string()),   # fk -> commissies ('' for plenary;
                                      # REL_MAP_ACTIVITEIT 'voortouwcommissies')
    # self-referential fk pairs (REL_MAP_ACTIVITEIT_SELF, constants.py:50-55)
    ("vervangen_door", pa.string()),
    ("voortgezet_vanuit", pa.string()),
    ("zaal_id", pa.string()),        # fk -> zalen (REL_MAP_ACTIVITEIT 'zaal')
])

# Commissie / Zaal / Reservering / Toezegging families — reference
# commissie_loader.py:51-67, zaal_loader.py:69-94, reservering_loader.py:
# 69-94, toezegging_loader.py:70-116
COMMISSIES = pa.schema([
    ("commissie_id", pa.string()),
    ("naam", pa.string()),
    ("afkorting", pa.string()),
    ("contact_informaties", pa.list_(CONTACT)),
])

ZALEN = pa.schema([
    ("zaal_id", pa.string()),
    ("naam", pa.string()),
])

RESERVERINGEN = pa.schema([
    ("reservering_id", pa.string()),
    ("zaal_id", pa.string()),        # fk (REL_MAP_RESERVERING 'zaal')
    ("activity_id", pa.string()),    # fk (REL_MAP_RESERVERING 'activiteit')
    ("vergadering_id", pa.string()),  # fk -> sessions (REL_MAP_RESERVERING
                                      # 'vergadering'; '' for activity slots)
])

TOEZEGGINGEN = pa.schema([
    ("toezegging_id", pa.string()),
    ("tekst", pa.string()),
    ("activity_id", pa.string()),    # made during
    ("person_id", pa.string()),      # made by
    # self-referential fk pairs (REL_MAP_TOEZEGGING, constants.py:35-42)
    ("is_aanvulling_op", pa.string()),
    ("is_herhaling_van", pa.string()),
    ("is_wijziging_van", pa.string()),
])

# PersoonFunctie family — reference persoonfunctie_loader.py:85-116 (node
# props functie/omschrijving/van/tot_en_met/soort) + REL_MAP_PERSOON_FUNCTIE
# (constants.py:132-135: persoon -> PERSON_HAS_FUNCTION, fractie ->
# FUNCTION_FOR_FRACTIE)
PERSOON_FUNCTIES = pa.schema([
    ("functie_id", pa.string()),
    ("person_id", pa.string()),      # fk -> persons
    ("fractie_id", pa.string()),     # fk -> parties ('' when function is
                                      # not fractie-bound)
    ("functie", pa.string()),
    ("omschrijving", pa.string()),
    ("van", pa.timestamp("us")),
    ("tot_en_met", pa.timestamp("us")),  # null while the function is held
    ("soort", pa.string()),
])

CASES = pa.schema([
    ("zaak_id", pa.string()),
    ("nummer", pa.string()),         # zaak's own number, e.g. 2024Z00123
    ("dossiernummer", pa.int32()),
    ("toevoeging", pa.string()),
    ("stuknummer", pa.int32()),
    ("onderwerp", pa.string()),
    ("dossier_id", pa.string()),     # fk -> dossiers (REL_MAP_ZAAK 'dossier')
    ("vervangen_door", pa.string()),  # self-fk -> cases; '' if none (J9,
                                      # reference constants.py:7 REPLACED_BY)
])

DOSSIERS = pa.schema([
    ("dossier_id", pa.string()),
    ("nummer", pa.int32()),
    ("toevoeging", pa.string()),
])

# agenda link table — reference J6 (activity -> agendapunt -> zaak expansion)
ACTIVITY_CASES = pa.schema([
    ("activity_id", pa.string()),
    ("zaak_id", pa.string()),
])

# activity actor roster — reference ActiviteitActor (expanded relation S3,
# actor_loader.py:69-76); drives the J4 priority-1 speaker tier
# (api_extractor.py:134-143)
ACTIVITY_ACTORS = pa.schema([
    ("activity_id", pa.string()),
    ("person_id", pa.string()),
])

# Document entity family — reference document_loader.py:113-157; volgnummer
# + dossier coordinates feed the J5 tier-2 document fallback
# (api_extractor.py:196-201,257-268)
REG_DOCUMENTS = pa.schema([
    ("document_id", pa.string()),
    ("dossier_id", pa.string()),
    ("dossiernummer", pa.int32()),
    ("toevoeging", pa.string()),
    ("volgnummer", pa.int32()),
    ("onderwerp", pa.string()),
    ("datum", pa.timestamp("us")),
    ("zaak_id", pa.string()),        # fk -> cases (REL_MAP_DOC 'zaken')
    ("activity_id", pa.string()),    # fk -> activities (REL_MAP_DOC
                                      # 'activiteiten'; '' for most)
])

# Besluit family — reference common_processors.py:75-142
BESLUITEN = pa.schema([
    ("besluit_id", pa.string()),
    ("zaak_id", pa.string()),        # fk -> cases (REL_MAP_BESLUIT 'zaken')
    ("activity_id", pa.string()),    # fk -> activities (agendapunt analog)
    ("soort", pa.string()),
    ("status", pa.string()),
    ("tekst", pa.string()),          # carries 'hoofdelijk' for M15
    ("agendapunt_id", pa.string()),  # fk -> agendapunten (REL_MAP_BESLUIT
                                      # 'agendapunt' BELONGS_TO_AGENDAPUNT)
])

# Agendapunt family — reference agendapunt_loader.py:98-107 (node props
# onderwerp/volgorde/rubriek) + REL_MAP_ZAAK / REL_MAP_ACTIVITEIT
# 'agendapunten' (HAS_AGENDAPUNT)
AGENDAPUNTEN = pa.schema([
    ("agendapunt_id", pa.string()),
    ("activity_id", pa.string()),    # fk -> activities
    ("zaak_id", pa.string()),        # fk -> cases ('' for procedural items)
    ("nummer", pa.string()),
    ("onderwerp", pa.string()),
    ("volgorde", pa.int32()),
    ("rubriek", pa.string()),
])

# Fractie seat chain — reference REL_MAP_FRACTIE / REL_MAP_FRACTIE_ZETEL /
# REL_MAP_FRACTIE_ZETEL_PERSOON (constants.py:70-83): Fractie -HAS_ZETEL->
# FractieZetel -HAS_INCUMBENT-> FractieZetelPersoon -IS_PERSON-> Persoon,
# plus Persoon -HAS_SEAT_ASSIGNMENT-> FractieZetelPersoon (REL_MAP_PERSOON
# 'fractieleden') and FractieZetel -HAS_VACANCY-> FractieZetelVacature.
FRACTIE_ZETELS = pa.schema([
    ("zetel_id", pa.string()),
    ("fractie_id", pa.string()),     # fk -> parties
    ("gewicht", pa.int32()),
])

FRACTIE_ZETEL_PERSONS = pa.schema([
    ("fzp_id", pa.string()),
    ("zetel_id", pa.string()),       # fk -> fractie_zetels
    ("person_id", pa.string()),      # fk -> persons
    ("functie", pa.string()),
    ("van", pa.timestamp("us")),
    ("tot_en_met", pa.timestamp("us")),  # null while the seat is held
])

FRACTIE_ZETEL_VACATURES = pa.schema([
    ("vacature_id", pa.string()),
    ("zetel_id", pa.string()),       # fk -> fractie_zetels
    ("functie", pa.string()),
    ("van", pa.timestamp("us")),
])

# Commissie seat chain — reference REL_MAP_COMMISSIE / REL_MAP_COMMISSIE_ZETEL
# / REL_MAP_COMMISSIE_ZETEL_PERSOON (constants.py:101-118). The reference's
# four child types (vast/vervanger x persoon/vacature) are one table each
# with a ``soort`` discriminator; the edge projection filters on it.
COMMISSIE_ZETELS = pa.schema([
    ("zetel_id", pa.string()),
    ("commissie_id", pa.string()),   # fk -> commissies
    ("gewicht", pa.int32()),
])

COMMISSIE_ZETEL_PERSONS = pa.schema([
    ("czp_id", pa.string()),
    ("zetel_id", pa.string()),       # fk -> commissie_zetels
    ("person_id", pa.string()),      # fk -> persons
    ("soort", pa.string()),          # vast | vervanger
    ("functie", pa.string()),
    ("van", pa.timestamp("us")),
    ("tot_en_met", pa.timestamp("us")),
])

COMMISSIE_ZETEL_VACATURES = pa.schema([
    ("vacature_id", pa.string()),
    ("zetel_id", pa.string()),       # fk -> commissie_zetels
    ("soort", pa.string()),          # vast | vervanger
    ("functie", pa.string()),
    ("van", pa.timestamp("us")),
])

# DocumentVersie family — reference document_loader.py:188-236 (versie node
# props versienummer/status/datum; publicaties + metadata merged per versie
# via REL_MAP_DOCUMENT_VERSIE, constants.py:64-67). Publications are a
# nested list<struct> column flattened by ops.nested.document_publicaties.
PUBLICATIE = pa.struct([("publicatie_id", pa.string()),
                        ("soort", pa.string()),
                        ("datum", pa.timestamp("us"))])
DOCUMENT_VERSIES = pa.schema([
    ("versie_id", pa.string()),
    ("document_id", pa.string()),    # fk -> reg_documents (HAS_VERSIE)
    ("versienummer", pa.int32()),
    ("status", pa.string()),
    ("datum", pa.timestamp("us")),
    ("publicaties", pa.list_(PUBLICATIE)),
])

# Zaak/Document actor relations — reference ZaakActor / DocumentActor
# entities (REL_MAP_ZAAK 'actors' HAS_ACTOR; REL_MAP_ZAAK_ACTOR /
# REL_MAP_DOCUMENT_ACTOR: exactly one of persoon/fractie/commissie set,
# constants.py:57-61,120-124)
ZAAK_ACTORS = pa.schema([
    ("actor_id", pa.string()),
    ("zaak_id", pa.string()),        # fk -> cases
    ("person_id", pa.string()),
    ("fractie_id", pa.string()),
    ("commissie_id", pa.string()),
    ("naam", pa.string()),
    ("relatie", pa.string()),
])

DOCUMENT_ACTORS = pa.schema([
    ("actor_id", pa.string()),
    ("document_id", pa.string()),    # fk -> reg_documents
    ("person_id", pa.string()),
    ("fractie_id", pa.string()),
    ("commissie_id", pa.string()),
    ("naam", pa.string()),
    ("relatie", pa.string()),
])

# API-side Stemming family — reference common_processors.py:145-190
API_STEMMINGEN = pa.schema([
    ("stemming_id", pa.string()),
    ("besluit_id", pa.string()),     # fk -> besluiten (HAS_STEMMING)
    ("fractie_id", pa.string()),     # fk -> parties (REPRESENTS_FRACTIE_VOTE)
    ("soort", pa.string()),          # Voor | Tegen | Onthouding
    ("vergissing", pa.bool_()),
])

# Stage outputs.
DOCS = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("lang", pa.string()),
    ("text", pa.string()),           # canonical collapsed text — byte-identity invariant
    ("doc", pa.string()),            # parsed doc structure, JSON (nested, order-preserving)
    ("error", pa.string()),          # non-null -> failed-row sidecar
])

MENTIONS = pa.schema([
    ("url", pa.string()),
    ("mention_id", pa.string()),
    ("kind", pa.string()),           # activity | speaker | zaak | vote
    ("surface", pa.string()),
    ("activity_local_id", pa.string()),
    ("entity_id", pa.string()),      # linked canonical entity ('' if NO_MATCH)
    ("entity_kind", pa.string()),
    ("match_type", pa.string()),     # EXACT | FUZZY | FALLBACK | NO_MATCH
    ("score", pa.float64()),
])

TRIPLES = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("subj_label", pa.string()),
    ("obj_label", pa.string()),
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("score", pa.float64()),
    ("provenance", pa.string()),
])

# A2/A3 analysis-grain rows (emit.emit_analysis_rows) — wide union schema
ANALYSIS = pa.schema([
    ("url", pa.string()),
    ("activity_local_id", pa.string()),
    ("kind", pa.string()),           # vote | vote_topic | interruption | interruption_topic
    ("type", pa.string()),           # interruption type (reference enum values)
    ("event_id", pa.string()),
    ("fractie_id", pa.string()),
    ("fractie_naam", pa.string()),
    ("vote", pa.string()),
    ("uitslag", pa.string()),
    ("is_hoofdelijk", pa.bool_()),
    ("topic", pa.string()),
    ("interrupter", pa.string()),
    ("interrupted", pa.string()),
    ("responder", pa.string()),
])

NODES = pa.schema([
    ("node_id", pa.string()),
    ("label", pa.string()),
    ("props", pa.string()),          # JSON property map (merged last-write-wins)
    ("warc_ts", pa.timestamp("us")),
])

EDGES = pa.schema([
    ("subj", pa.string()),
    ("pred", pa.string()),
    ("obj", pa.string()),
    ("weight", pa.int64()),
    ("score", pa.float64()),
])
