"""Static vocabulary tables (S8) — the analog of the reference's enum
seeding (seed_enums.py:10-25: MERGE one node per enum member), written once
per run as small dimension parquet: the predicate vocabulary and the
entity-kind/label taxonomy the edge stream emits against.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.parquet as pq

PREDICATES = [
    ("MATCHES_API_ACTIVITY", "mention->entity", "activity match (J3)"),
    ("MATCHES_PERSOON", "mention->entity", "speaker match (J4)"),
    ("MATCHES_API_ZAAK", "mention->entity", "zaak match tier 1 (J5)"),
    ("MATCHES_API_DOSSIER", "mention->entity", "zaak match tier 2 fallback (J5)"),
    ("DISCUSSES_ZAAK", "persoon->zaak|dossier", "speaker x zaak cross (J7)"),
    ("INTERRUPTED", "persoon->persoon", "A->B(->A) interruption scan"),
    ("RESPONDED_TO", "persoon->persoon", "response leg of A->B->A"),
    ("VOTED_VOOR", "fractie->event|zaak", "vote"),
    ("VOTED_TEGEN", "fractie->event|zaak", "vote"),
    ("VOTED_ONTHOUDING", "fractie->event|zaak", "vote"),
    ("_FAILED", "page->error", "dead-letter channel"),
]

LABELS = [
    ("Persoon", "canonical"), ("Fractie", "canonical"), ("Zaak", "canonical"),
    ("Dossier", "canonical"), ("Activity", "canonical"),
    ("XmlActivity", "mention"), ("XmlSpeaker", "mention"), ("XmlZaak", "mention"),
    ("VotingEvent", "derived"), ("Page", "provenance"), ("Error", "provenance"),
]


def write_vocab_tables(out_dir: str) -> dict:
    vocab_dir = os.path.join(out_dir, "vocab")
    os.makedirs(vocab_dir, exist_ok=True)
    preds = pa.table({
        "pred": pa.array([p for p, _, _ in PREDICATES]),
        "signature": pa.array([s for _, s, _ in PREDICATES]),
        "description": pa.array([d for _, _, d in PREDICATES]),
    })
    labels = pa.table({
        "label": pa.array([l for l, _ in LABELS]),
        "kind": pa.array([k for _, k in LABELS]),
    })
    p1 = os.path.join(vocab_dir, "predicates.parquet")
    p2 = os.path.join(vocab_dir, "labels.parquet")
    pq.write_table(preds, p1)
    pq.write_table(labels, p2)
    return {"predicates": p1, "labels": p2}
