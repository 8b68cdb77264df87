"""Sharded speaker gazetteer — the opt-in scale path for registries too
big to broadcast (SCALING.md §"Map stages"; VERDICT r3 item 4).

The default link stage broadcasts the whole surname gazetteer (buckets +
trigram postings) into every linker actor. At a 10M-person registry that
object is ~10 GB per node; past that the design seam is to SHARD the
gazetteer by surname hash and route speaker mentions through exchanges
instead. This module implements that path with BIT-IDENTICAL results
(oracle-parity test in tests/test_linking.py):

  1. ``collect_speaker_surfaces`` — a surface-collection pass over the
     parsed docs: per-batch set-dedup of (voornaam, achternaam), then one
     exchange-distinct. Speaker surfaces are a DIMENSION (distinct names),
     orders of magnitude smaller than the corpus.
  2. ``resolve_surfaces`` — scatter each surface to all ``n_shards`` shard
     groups (scatter-gather: the contains-fallback can match surnames in
     any shard), one exchange on shard id; each shard group evaluates the
     exact-bucket tier (owner shard only — a surname's WHOLE bucket lives
     in one shard, so the reference's ``[:20]`` cap and first-of-equals
     scan are preserved verbatim) and its local contains-tier candidates
     (per-shard capped by person_id order); a second exchange on the
     surface merges the partials back into the reference cascade.
  3. The fused link+emit stage then runs with ``speaker_overrides`` — the
     resolved-surface table preloaded into the Linker's speaker memo (the
     global cascade is a pure function of the surface, which is WHY the
     memo exists) and a ``build_gazetteer=False`` index, so the broadcast
     never carries the surname buckets / trigram postings. The
     activity-actor priority tier (J4 tier 1) is untouched: it scores
     doc-local rosters, not the gazetteer.

Merge-equivalence argument (why results are bit-identical):
  * exact tier — owner shard holds the full bucket in the same person_id
    order, same ``[:20]`` cap, same strictly-greater scan, same threshold;
  * contains tier — the full algorithm takes all persons whose surname
    contains the token, sorts by person_id, caps at
    ``max_persoon_candidates``, then scans. The global top-cap by
    person_id is a subset of the union of per-shard top-caps (each shard
    returns its local top-cap), so merging shard partials, re-sorting by
    person_id, re-capping and re-scanning reproduces the exact candidate
    list and pick.
The embedding-retrieval tier (a default-off extension) is not supported
sharded; enabling both raises.

Reference analog: the candidate-cache cap machinery
(``/root/reference/src/vlos/extractors/api_extractor.py:33-87,134-168``)
bounds per-document candidate sets; this path bounds the REGISTRY side.
"""

from __future__ import annotations

import json
import zlib
from typing import Dict, List, Optional, Tuple

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

from ..config import EngineConfig
from ..exchange import reduce_blocks
from ..linking import name_similarity

_SURFACE_SCHEMA = pa.schema([("voornaam", pa.string()),
                             ("achternaam", pa.string())])
_PARTIAL_SCHEMA = pa.schema([("voornaam", pa.string()),
                             ("achternaam", pa.string()),
                             ("tier", pa.int8()),
                             ("person_id", pa.string()),
                             ("score", pa.int64())])
_RESOLVED_SCHEMA = pa.schema([("voornaam", pa.string()),
                              ("achternaam", pa.string()),
                              ("person_id", pa.string()),
                              ("score", pa.int64()),
                              ("match_type", pa.string())])


def shard_of(surname_key: str, n_shards: int) -> int:
    """Deterministic cross-process shard owner of a normalized surname
    (NOT Python hash(), which is per-process salted — SURVEY §7.5)."""
    return zlib.crc32(surname_key.encode("utf-8")) % n_shards


def split_person_shards(persons: List[dict], n_shards: int) -> List[List[dict]]:
    """Partition the person table by surname hash. A surname's whole
    bucket lands in ONE shard (exact-tier cap semantics depend on it);
    person_id order within each shard is preserved (persons arrive
    person_id-sorted from the registry reader)."""
    shards: List[List[dict]] = [[] for _ in range(n_shards)]
    for p in sorted(persons, key=lambda p: p["person_id"]):
        shards[shard_of(p["achternaam"].lower(), n_shards)].append(p)
    return shards


class GazetteerShard:
    """One shard's surname gazetteer: bucket map + trigram postings over
    the shard's surnames only — the same structures RegistryIndex builds
    globally, at 1/n_shards the memory."""

    def __init__(self, persons: List[dict]):
        self.by_surname: Dict[str, List[dict]] = {}
        for p in persons:  # person_id-sorted per split_person_shards
            self.by_surname.setdefault(p["achternaam"].lower(), []).append(p)
        self._unique = sorted(self.by_surname)
        self._tri: Dict[str, set] = {}
        for s in self._unique:
            for i in range(max(1, len(s) - 2)):
                self._tri.setdefault(s[i:i + 3], set()).add(s)

    def surnames_containing(self, token: str) -> List[str]:
        # identical semantics to RegistryIndex.surnames_containing
        if len(token) < 3:
            return [s for s in self._unique if token in s]
        grams = [token[i:i + 3] for i in range(len(token) - 2)]
        postings = [self._tri.get(g) for g in grams]
        if any(p is None for p in postings):
            return []
        cands = set.intersection(*sorted(postings, key=len))
        return sorted(s for s in cands if token in s)


def _scan_best(voornaam: str, achternaam: str, candidates: List[dict],
               cfg: EngineConfig) -> Optional[Tuple[str, int]]:
    """The reference's strictly-greater first-of-equals scan + threshold
    (linking.Linker._best_person semantics, memo-free)."""
    m = cfg.matching
    best_p, best_s = None, 0
    for p in candidates:
        s = name_similarity(voornaam, achternaam, p["achternaam"],
                            p["tussenvoegsel"], p["roepnaam"], p["voornamen"],
                            m.fuzzy_firstname_threshold)
        if s > best_s:
            best_s, best_p = s, p
    if best_p is not None and best_s >= m.min_speaker_similarity_score:
        return best_p["person_id"], best_s
    return None


def shard_partial_rows(shard: GazetteerShard, sid: int, n_shards: int,
                       voornaam: str, achternaam: str,
                       cfg: EngineConfig) -> List[dict]:
    """One shard's contribution for one surface: an accepted exact-tier
    row (tier 0, owner shard only) and/or scored local contains-tier
    candidates (tier 1, per-shard person_id-order cap)."""
    rows: List[dict] = []
    key = achternaam.lower().strip()
    if shard_of(key, n_shards) == sid:
        hit = _scan_best(voornaam, achternaam,
                         shard.by_surname.get(key, [])[:20], cfg)
        if hit is not None:
            rows.append({"voornaam": voornaam, "achternaam": achternaam,
                         "tier": 0, "person_id": hit[0], "score": hit[1]})
        else:
            # presence marker: a surface with NO candidate anywhere must
            # still reach the merge so the sealed cache carries its
            # NO_MATCH (the owner shard emits exactly one such row)
            rows.append({"voornaam": voornaam, "achternaam": achternaam,
                         "tier": 2, "person_id": "", "score": 0})
    token = achternaam.strip().split()[-1].lower()
    cands: List[dict] = []
    for s in shard.surnames_containing(token):
        cands.extend(shard.by_surname[s])
    cands = sorted(cands, key=lambda p: p["person_id"])
    cands = cands[:cfg.processing.max_persoon_candidates]
    m = cfg.matching
    for p in cands:
        rows.append({"voornaam": voornaam, "achternaam": achternaam,
                     "tier": 1, "person_id": p["person_id"],
                     "score": name_similarity(
                         voornaam, achternaam, p["achternaam"],
                         p["tussenvoegsel"], p["roepnaam"], p["voornamen"],
                         m.fuzzy_firstname_threshold)})
    return rows


def merge_surface(rows: pd.DataFrame, cfg: EngineConfig) -> Tuple[Optional[str], int, str]:
    """Merge one surface's shard partials back into the reference cascade:
    an accepted exact-tier row wins outright; else re-sort + re-cap the
    union of per-shard contains candidates and re-run the scan. Tier-2
    rows are presence markers only (they guarantee every surface gets a
    resolution row, possibly NO_MATCH)."""
    t0 = rows[rows["tier"] == 0]
    if len(t0):
        pid, score = t0.iloc[0]["person_id"], int(t0.iloc[0]["score"])
        return pid, score, ("EXACT" if score >= 90 else "FUZZY")
    c = rows[rows["tier"] == 1].sort_values("person_id", kind="stable")
    c = c.head(cfg.processing.max_persoon_candidates)
    best_pid, best_s = None, 0
    for pid, s in zip(c["person_id"], c["score"]):
        if s > best_s:
            best_s, best_pid = int(s), pid
    if best_pid is not None and best_s >= cfg.matching.min_speaker_similarity_score:
        return best_pid, best_s, ("EXACT" if best_s >= 90 else "FUZZY")
    return None, 0, "NO_MATCH"


_SURFACE_RE = None


def _surface_re():
    global _SURFACE_RE
    if _SURFACE_RE is None:
        import re
        # The doc JSON is OUR OWN serializer's output (stages/extract.py:
        # json.dumps of parse_page dicts, separators=(",", ":")), and every
        # speaker-bearing dict is built ``{**sf, ...}`` with sf =
        # {voornaam, achternaam, fractie} (parsing.py:51), so the two keys
        # are ALWAYS adjacent and in this order — a compiled scan over the
        # raw JSON string recovers the exact surface set without a full
        # json.loads of every doc (the dominant cost of this pass; the
        # interleaved A/B in SCALING.md). ``sequence`` entries match too —
        # duplicates of the same surfaces, harmless for a distinct-set.
        _SURFACE_RE = re.compile(
            r'"voornaam":"((?:[^"\\]|\\.)*)","achternaam":"((?:[^"\\]|\\.)*)"')
    return _SURFACE_RE


def _unescape(s: str) -> str:
    return json.loads(f'"{s}"') if "\\" in s else s


def collect_speaker_surfaces(docs: rd.Dataset) -> rd.Dataset:
    """Distinct (voornaam, achternaam) over every speaker mention (activity
    speakers AND direct zaak speakers): per-batch regex-scan set-dedup
    partial (see _surface_re — exact on the engine's own doc format), then
    one exchange-distinct. Empty surnames are excluded — match_speaker
    short-circuits them to NO_MATCH before the cascade."""
    def partial(batch: pa.Table) -> pa.Table:
        rx = _surface_re()
        seen = set()
        for doc_json, err in zip(batch.column("doc").to_pylist(),
                                 batch.column("error").to_pylist()):
            if err is not None or doc_json is None:
                continue
            seen.update(rx.findall(doc_json))
        seen = {(_unescape(vn), _unescape(an)) for vn, an in seen if an}
        if not seen:
            return _SURFACE_SCHEMA.empty_table()
        vn, an = zip(*sorted(seen))
        return pa.table({"voornaam": pa.array(vn, pa.string()),
                         "achternaam": pa.array(an, pa.string())})

    def distinct(block: pa.Table) -> pa.Table:
        if block.num_rows == 0:
            return _SURFACE_SCHEMA.empty_table()
        g = block.group_by(["voornaam", "achternaam"]).aggregate([])
        return g.select(["voornaam", "achternaam"])

    return reduce_blocks(docs.map_batches(partial, batch_format="pyarrow"),
                         ["voornaam", "achternaam"], distinct)


def resolve_surfaces(surfaces: rd.Dataset, shard_refs: List[ray.ObjectRef],
                     cfg: EngineConfig) -> rd.Dataset:
    """Scatter surfaces to every shard group, resolve per shard, merge per
    surface — two exchanges of dimension-sized rows; the gazetteer never
    leaves its shard."""
    n_shards = len(shard_refs)
    # exchange parallelism: keyed on shard alone there are only n_shards
    # reducer groups, so every group scores ALL surfaces serially — the
    # measured bottleneck of this path (21.8 s of a 62 s sharded run at
    # the 40k-session corpus was this stage at 4-way parallelism). A
    # surface-hash salt widens the exchange to n_shards x n_salts groups;
    # any per-surface salt works (the merge re-groups by surface).
    n_salts = max(1, (int(ray.cluster_resources().get("CPU", 8))
                      if ray.is_initialized() else 8) // max(1, n_shards))

    def scatter(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table({"voornaam": pa.array([], pa.string()),
                             "achternaam": pa.array([], pa.string()),
                             "shard": pa.array([], pa.int32()),
                             "salt": pa.array([], pa.int32())})
        salt = np.array([zlib.crc32(f"{v}|{a}".encode()) % n_salts
                         for v, a in zip(
                             batch.column("voornaam").to_pylist(),
                             batch.column("achternaam").to_pylist())],
                        dtype=np.int32)
        idx = np.repeat(np.arange(n), n_shards)
        return pa.table({
            "voornaam": batch.column("voornaam").take(pa.array(idx)),
            "achternaam": batch.column("achternaam").take(pa.array(idx)),
            "shard": pa.array(np.tile(np.arange(n_shards, dtype=np.int32), n)),
            "salt": pa.array(salt[idx])})

    # per-worker shard sub-index cache: a shard's persons are fetched from
    # plasma and indexed once per (worker process, shard), not per block
    _cache: Dict[int, GazetteerShard] = {}

    def resolve_block(df: pd.DataFrame) -> pd.DataFrame:
        out: List[dict] = []
        for sid, g in df.groupby("shard", sort=True):
            sid = int(sid)
            shard = _cache.get(sid)
            if shard is None:
                shard = GazetteerShard(ray.get(shard_refs[sid]))
                _cache[sid] = shard
            for vn, an in zip(g["voornaam"], g["achternaam"]):
                out.extend(shard_partial_rows(shard, sid, n_shards,
                                              vn, an, cfg))
        if not out:
            return _PARTIAL_SCHEMA.empty_table().to_pandas()
        return pd.DataFrame(out)

    ncpu = int(ray.cluster_resources().get("CPU", 8)) \
        if ray.is_initialized() else 8
    partials = reduce_blocks(surfaces.map_batches(scatter,
                                                  batch_format="pyarrow"),
                             ["shard", "salt"], resolve_block,
                             num_partitions=max(8, ncpu),
                             batch_format="pandas")

    def merge_block(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return _RESOLVED_SCHEMA.empty_table().to_pandas()
        out = []
        # per-surface merge: groups are tiny (<= n_shards * cap rows) and
        # surfaces are a dimension, so the per-group python merge is not a
        # corpus-proportional hot path
        for (vn, an), g in df.groupby(["voornaam", "achternaam"], sort=False):
            pid, score, mt = merge_surface(g, cfg)
            out.append({"voornaam": vn, "achternaam": an,
                        "person_id": pid or "", "score": score,
                        "match_type": mt})
        return pd.DataFrame(out)

    return reduce_blocks(partials, ["voornaam", "achternaam"], merge_block,
                         batch_format="pandas")


def speaker_overrides_via_shards(docs: rd.Dataset, persons: List[dict],
                                 cfg: EngineConfig) -> Dict[tuple, tuple]:
    """End-to-end sharded resolution: docs -> distinct surfaces -> shard
    scatter/resolve/merge -> the {surface: (person_id|None, score,
    match_type)} table the sealed Linker memo is preloaded with. The
    result is dimension-sized (distinct speaker names) — comparable to a
    broadcast side table, NOT the corpus."""
    if cfg.matching.enable_embedding_fallback:
        raise ValueError("sharded gazetteer does not support the embedding "
                         "retrieval tier — disable one of the two")
    n_shards = cfg.ray.gazetteer_shards
    shard_refs = [ray.put(s) for s in
                  split_person_shards(persons, n_shards)]
    resolved = resolve_surfaces(collect_speaker_surfaces(docs), shard_refs, cfg)
    # to_pandas, NOT take_all: same driver-bounded collect, but take_all's
    # per-row dict conversion measured 14 s for 14k rows where the columnar
    # fetch is 0.03 s
    df = resolved.to_pandas()
    return {(vn, an): (pid or None, int(score), mt)
            for vn, an, pid, score, mt in zip(
                df["voornaam"], df["achternaam"], df["person_id"],
                df["score"], df["match_type"])}
