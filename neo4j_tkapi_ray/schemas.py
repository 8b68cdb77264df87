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
PERSONS = pa.schema([
    ("person_id", pa.string()),
    ("voornamen", pa.string()),
    ("roepnaam", pa.string()),
    ("tussenvoegsel", pa.string()),
    ("achternaam", pa.string()),
    ("fractie_id", pa.string()),
])

PARTIES = pa.schema([
    ("fractie_id", pa.string()),
    ("naam", pa.string()),
    ("afkorting", pa.string()),
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
])

CASES = pa.schema([
    ("zaak_id", pa.string()),
    ("nummer", pa.string()),         # zaak's own number, e.g. 2024Z00123
    ("dossiernummer", pa.int32()),
    ("toevoeging", pa.string()),
    ("stuknummer", pa.int32()),
    ("onderwerp", pa.string()),
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
