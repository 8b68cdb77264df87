"""Engine configuration.

Mirrors the behavior-defining scoring weights / thresholds of the reference
(`/root/reference/src/vlos/config/vlos_config.py:13-100`) exactly — these are
load-bearing for triple P/R parity — plus Ray-execution knobs (batch sizes,
actor-pool sizing, salt width) that the reference has no equivalent for.
"""

from __future__ import annotations

import hashlib
import json
from dataclasses import dataclass, field, asdict
from datetime import timedelta
from typing import Dict, List


@dataclass
class MatchingConfig:
    """Scoring weights — values from reference vlos_config.py:18-49 (exact)."""

    # Activity matching scores
    score_time_start_proximity: float = 3.0
    score_time_overlap_only: float = 1.5
    score_soort_exact: float = 2.0
    score_soort_partial_xml_in_api: float = 2.0
    score_soort_partial_api_in_xml: float = 1.5
    score_onderwerp_exact: float = 4.0
    score_onderwerp_fuzzy_high: float = 2.5
    score_onderwerp_fuzzy_medium: float = 2.0
    score_titel_exact_vs_api_onderwerp: float = 1.5
    score_titel_fuzzy_high_vs_api_onderwerp: float = 1.25
    score_titel_fuzzy_medium_vs_api_onderwerp: float = 0.5

    # Matching thresholds
    min_match_score_for_activiteit: float = 3.0
    time_start_proximity_tolerance_seconds: int = 300  # 5 minutes
    time_general_overlap_buffer_seconds: int = 600  # 10 minutes

    # Fuzzy thresholds
    fuzzy_similarity_threshold_high: int = 85
    fuzzy_similarity_threshold_medium: int = 70
    fuzzy_firstname_threshold: int = 75
    fuzzy_surname_threshold: int = 80

    # Speaker matching
    min_speaker_similarity_score: int = 60

    # Embedding-index candidate retrieval (NEW-ENGINE EXTENSION, default
    # off: the reference has no embedding tier and the oracle-parity gate
    # runs with it disabled). When on, speakers that miss both the exact
    # surname bucket and the contains-fallback get candidates from a
    # char-trigram embedding index; the ACCEPTANCE rule is unchanged
    # (same name_similarity score, same >= min_speaker_similarity_score
    # gate) — only candidate retrieval widens.
    enable_embedding_fallback: bool = False
    embedding_topk: int = 20

    # Topic-normalization prefixes (reference vlos_config.py:45-50)
    common_topic_prefixes: List[str] = field(default_factory=lambda: [
        'tweeminutendebat', 'procedurevergadering', 'wetgevingsoverleg',
        'plenaire afronding', 'plenaire debat', 'debate over', 'debate',
        'aanvang', 'einde vergadering', 'regeling van werkzaamheden',
        'stemmingen', 'aanbieding', 'technische briefing',
    ])


@dataclass
class TimeConfig:
    """Reference vlos_config.py:53-59."""

    local_timezone_offset_hours: int = 2  # CEST for summer samples
    api_time_buffer: timedelta = field(default_factory=lambda: timedelta(hours=1))
    vergadering_lookup_buffer: timedelta = field(default_factory=lambda: timedelta(days=1))


@dataclass
class ProcessingConfig:
    """Reference vlos_config.py:62-80 plus Ray execution knobs."""

    max_candidate_activities: int = 200
    max_candidate_vergaderingen: int = 5
    max_persoon_candidates: int = 100
    max_zaak_candidates: int = 10

    skip_procedural_activities: bool = True
    enable_interruption_analysis: bool = True
    enable_voting_analysis: bool = True
    enable_speaker_zaak_connections: bool = True

    procedural_activity_types: List[str] = field(default_factory=lambda: [
        'opening', 'sluiting', 'aanvang', 'einde vergadering',
    ])


@dataclass
class RayExecConfig:
    """Ray Data execution knobs — no reference equivalent (it is
    single-process; cf. SURVEY.md §4)."""

    extract_batch_size: int = 64          # pages per extract batch (html rows are wide)
    extract_num_cpus: float = 0.9         # per extract task (≠ linker args -> no fusion)
    link_batch_size: int = 64             # docs per linker batch
    link_concurrency: int = 8             # linker actor-pool size (scaled to cluster)
    canonical_salt_buckets: int = 16      # head-entity skew fan-out (SURVEY §4 skew)
    target_max_block_size: int = 64 * 1024 * 1024
    min_rows_per_output_file: int = 100_000
    # Sharded speaker gazetteer (0/1 = off, the default broadcast path).
    # >1 enables the opt-in scale path for registries too big to broadcast
    # (SCALING.md §"Map stages": at 10M persons the surname gazetteer +
    # trigram index is ~10 GB): the person gazetteer is sharded by surname
    # hash, distinct speaker surfaces are routed through shard-keyed
    # exchanges (stages/shard_link.py), and the link stage runs with the
    # resolved-surface table instead of the gazetteer. Execution-strategy
    # knob only — results are bit-identical (oracle-parity test), so it is
    # deliberately NOT part of fingerprint().
    gazetteer_shards: int = 0


@dataclass
class EngineConfig:
    matching: MatchingConfig = field(default_factory=MatchingConfig)
    time: TimeConfig = field(default_factory=TimeConfig)
    processing: ProcessingConfig = field(default_factory=ProcessingConfig)
    ray: RayExecConfig = field(default_factory=RayExecConfig)

    @classmethod
    def default(cls) -> "EngineConfig":
        return cls()

    def fingerprint(self) -> str:
        """Stable hash of the behavior-defining config — used by the resume
        layer to refuse resuming a run under an incompatible config
        (mirrors reference checkpoint_manager.py:179-210
        validate_config_compatibility)."""
        d = {
            "matching": asdict(self.matching),
            "time": {
                "local_timezone_offset_hours": self.time.local_timezone_offset_hours,
                "api_time_buffer_s": self.time.api_time_buffer.total_seconds(),
                "vergadering_lookup_buffer_s": self.time.vergadering_lookup_buffer.total_seconds(),
            },
            "processing": asdict(self.processing),
        }
        blob = json.dumps(d, sort_keys=True, default=str).encode()
        return hashlib.sha256(blob).hexdigest()[:16]
