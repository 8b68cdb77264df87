"""Entity-link scoring — the reference matcher semantics, re-expressed as
pure functions over a prebuilt in-memory registry index.

Semantics sources (file:line into /root/reference):
  * J1 canonical vergadering lookup   api_extractor.py:33-71
  * J2 candidate activity time join   api_extractor.py:73-87
  * J3 activity fuzzy-score match     activity_matcher.py:26-265
  * J4 speaker -> persoon cascade     api_extractor.py:134-168,270-302;
                                      name_matcher.py:21-119
  * J5 zaak multi-tier fallback       api_extractor.py:170-268
  * J6 agendapunt -> zaak expansion   api_extractor.py:89-102; vlos_pipeline.py:109-124

Determinism note (SURVEY.md §7.5 risk 2): the reference's best-candidate loop
updates on strict ``>`` so the FIRST of equal scores wins, and candidate
order is whatever the API returned. Here every candidate list is sorted by a
stable key (documented per function) before the first-wins scan, making the
result deterministic across runs and processes.

These functions are executed inside Ray actor-pool workers (stages/link.py)
AND by the single-process pytest oracle (oracle.py) — one semantics
implementation, two execution models.
"""

from __future__ import annotations

from datetime import datetime, timedelta
from typing import Dict, List, Optional, Tuple

import pyarrow.parquet as pq

from .config import EngineConfig
from .functions.textkit import (
    build_prefix_regex,
    fuzz_ratio_bounded,
    name_similarity,
    normalize_topic,
    parse_xml_datetime,
    safe_int,
    split_dossier_code,
    to_utc,
)

_EPOCH0 = datetime(1970, 1, 1)


def naive_epoch(dt: datetime) -> float:
    """Naive datetime -> epoch seconds, timezone-free (never .timestamp()
    on naive values — that would apply the process's local zone)."""
    return (dt - _EPOCH0).total_seconds()


def epoch_naive(e: float) -> datetime:
    return _EPOCH0 + timedelta(seconds=e)


# soort aliases — reference activity_matcher.py:193-197
SOORT_ALIASES = {
    "opening": ["aanvang", "regeling van werkzaamheden", "reglementair"],
    "sluiting": ["einde vergadering", "stemmingen", "stemmen"],
    "mededelingen": ["procedurevergadering", "procedures en brieven", "uitstel brieven"],
}


class RegistryIndex:
    """In-memory index over the entity registry (the small 'API side').

    Built once per linker actor (amortized across batches — reference analog:
    VlosPipeline constructed once per loader, vlos_neo4j_loader.py:27-29) and
    broadcast via the Ray object store at pipeline build time.
    """

    def __init__(self, tables: Dict[str, list], build_gazetteer: bool = True):
        import numpy as np

        # ------- memory/broadcast design (round 2) ------------------------
        # Every large dimension is stored as numpy arrays + flat python
        # lists, NEVER as per-row dicts or dict-of-list indexes: the index
        # is broadcast once and deserialized by EVERY linker actor, and 26
        # simultaneous unpickles of a dict forest were measured at 26 s per
        # actor (vs ~6 s uncontended) — numpy buffers deserialize
        # zero-copy, flat string lists deserialize ~10x faster than dicts.
        # Row "views" (small dicts) are materialized on demand only for the
        # handful of rows a document actually touches.

        sess = sorted(tables["sessions"], key=lambda s: (s["datum"], s["session_id"]))
        self.sess_soa = {
            "ids": [s["session_id"] for s in sess],
            "soort": [s["soort"] for s in sess],
            "nummer": np.array([int(s["nummer"]) for s in sess], dtype=np.int64),
            "datum": np.array([naive_epoch(s["datum"]) for s in sess]),
            "begin": np.array([naive_epoch(s["begin"]) for s in sess]),
            "einde": np.array([naive_epoch(s["einde"]) for s in sess]),
        }
        order = np.argsort(self.sess_soa["nummer"], kind="stable")
        self._sess_num_sorted = self.sess_soa["nummer"][order]
        self._sess_num_pos = order.astype(np.int64)

        acts = sorted(tables["activities"], key=lambda a: (a["begin"], a["activity_id"]))
        self.activities = acts  # dropped by precompute_candidate_invariants
        self._act_begins_ep = np.array([naive_epoch(a["begin"]) for a in acts])
        act_pos = {a["activity_id"]: i for i, a in enumerate(acts)}

        self.persons_by_achternaam: Dict[str, List[dict]] = {}
        self.person_name_by_id: Dict[str, str] = {}
        persons_sorted = sorted(tables["persons"], key=lambda p: p["person_id"])
        self.persons_list = persons_sorted
        person_pos = {p["person_id"]: i for i, p in enumerate(persons_sorted)}
        for p in persons_sorted:
            self.persons_by_achternaam.setdefault(p["achternaam"].lower(), []).append(p)
            # display name — reference name_matcher.py:105
            self.person_name_by_id[p["person_id"]] = (
                f"{p['roepnaam'] or p['voornamen']} {p['achternaam']}")
        self._unique_surnames = sorted(self.persons_by_achternaam.keys())
        # trigram inverted index over surnames: the contains-fallback
        # (api_extractor.py:157-163 `contains(tolower(Achternaam))`) becomes
        # posting-list intersection + substring verify instead of a scan
        # over every unique surname — O(candidates) at gazetteer scale.
        # ``build_gazetteer=False`` (sharded-gazetteer finish stage,
        # stages/shard_link.py) skips the bucket map + trigram postings —
        # the speaker cascade is pre-resolved there, so this index never
        # serves surname lookups and the broadcast drops the gazetteer
        # weight (persons_list stays: actor rosters are activity-keyed).
        self._surname_trigrams: Dict[str, set] = {}
        if not build_gazetteer:
            self.persons_by_achternaam = {}
            self._unique_surnames = []
        for s in self._unique_surnames:
            for i in range(max(1, len(s) - 2)):
                self._surname_trigrams.setdefault(s[i:i + 3], set()).add(s)

        cases = sorted(tables["cases"], key=lambda c: c["zaak_id"])
        self.cases_soa = {
            "ids": [c["zaak_id"] for c in cases],
            "nummer": [c["nummer"] for c in cases],
            "toevoeging": [c["toevoeging"] for c in cases],
            "onderwerp": [c["onderwerp"] for c in cases],
            "dossiernummer": np.array([int(c["dossiernummer"]) for c in cases],
                                      dtype=np.int64),
            "stuknummer": np.array([int(c["stuknummer"]) for c in cases],
                                   dtype=np.int64),
        }
        corder = np.argsort(self.cases_soa["dossiernummer"], kind="stable")
        self._case_dnr_sorted = self.cases_soa["dossiernummer"][corder]
        self._case_dnr_pos = corder.astype(np.int64)  # zaak_id order within key
        self._cases_by_nummer: Optional[Dict[str, List[int]]] = None  # lazy (rare path)
        case_pos = {c["zaak_id"]: i for i, c in enumerate(cases)}

        dossiers = sorted(tables["dossiers"], key=lambda d: d["dossier_id"])
        self.dossiers_soa = {
            "ids": [d["dossier_id"] for d in dossiers],
            "toevoeging": [d["toevoeging"] for d in dossiers],
            "nummer": np.array([int(d["nummer"]) for d in dossiers], dtype=np.int64),
        }
        dorder = np.argsort(self.dossiers_soa["nummer"], kind="stable")
        self._dos_num_sorted = self.dossiers_soa["nummer"][dorder]
        self._dos_num_pos = dorder.astype(np.int64)  # dossier_id order in key

        # J6 agenda links as offsets per activity POSITION
        agenda_lists: List[List[int]] = [[] for _ in acts]
        for ac in tables["activity_cases"]:
            pos = act_pos.get(ac["activity_id"])
            cpos = case_pos.get(ac["zaak_id"])
            if pos is not None and cpos is not None:
                agenda_lists[pos].append(cpos)
        self._agenda_off = np.cumsum([0] + [len(l) for l in agenda_lists],
                                     dtype=np.int64)
        self._agenda_case_idx = np.array(
            [i for l in agenda_lists for i in l], dtype=np.int64)

        self.party_by_name: Dict[str, dict] = {}
        for fr in tables["parties"]:
            self.party_by_name.setdefault(fr["naam"].lower(), fr)
            self.party_by_name.setdefault(fr["afkorting"].lower(), fr)

        # J4 priority-1 tier: actor rosters as offsets per activity POSITION
        # (reference api_extractor.py:134-143). Person idx sorted per roster
        # for the deterministic first-of-equals scan.
        roster_lists: List[List[int]] = [[] for _ in acts]
        for aa in tables.get("activity_actors", []):
            pos = act_pos.get(aa["activity_id"])
            ppos = person_pos.get(aa["person_id"])
            if pos is not None and ppos is not None:
                roster_lists[pos].append(ppos)
        for l in roster_lists:
            l.sort()  # persons_list is person_id-sorted
        self._roster_off = np.cumsum([0] + [len(l) for l in roster_lists],
                                     dtype=np.int64)
        self._roster_person_idx = np.array(
            [i for l in roster_lists for i in l], dtype=np.int64)
        self._act_pos_by_id: Optional[Dict[str, int]] = None  # lazy (tests)

        # J5 tier-2 document fallback: documents keyed by packed
        # (dossiernummer, volgnummer) in sorted arrays — reference
        # _find_best_document (api_extractor.py:257-268)
        docs = sorted(tables.get("reg_documents", []),
                      key=lambda d: d["document_id"])
        self.docs_soa = {
            "ids": [d["document_id"] for d in docs],
            "toevoeging": [d["toevoeging"] for d in docs],
        }
        dkey = np.array([(int(d["dossiernummer"]) << 21) | int(d["volgnummer"])
                         for d in docs], dtype=np.int64)
        dko = np.argsort(dkey, kind="stable")  # document_id order within key
        self._doc_key_sorted = dkey[dko]
        self._doc_key_pos = dko.astype(np.int64)

    # ---- row views (materialized only for rows a document touches) -------

    def session_view(self, pos: int) -> dict:
        s = self.sess_soa
        return {"session_id": s["ids"][pos], "soort": s["soort"][pos],
                "nummer": int(s["nummer"][pos]),
                "datum": epoch_naive(float(s["datum"][pos])),
                "begin": epoch_naive(float(s["begin"][pos])),
                "einde": epoch_naive(float(s["einde"][pos])),
                "_pos": pos}

    def sessions_with_nummer(self, nummer: int):
        import numpy as np
        lo = np.searchsorted(self._sess_num_sorted, nummer, side="left")
        hi = np.searchsorted(self._sess_num_sorted, nummer, side="right")
        return np.sort(self._sess_num_pos[lo:hi])  # datum order

    def actors_for_pos(self, pos: int) -> List[dict]:
        o = self._roster_off
        return [self.persons_list[int(i)]
                for i in self._roster_person_idx[o[pos]:o[pos + 1]]]

    def actors_for_activity_id(self, activity_id: str) -> List[dict]:
        """Id-keyed roster lookup (test/back-compat path; the pipeline
        resolves rosters by position). The id->pos dict builds lazily."""
        if self._act_pos_by_id is None:
            self._act_pos_by_id = {aid: i
                                   for i, aid in enumerate(self.cand_soa["ids"])}
        pos = self._act_pos_by_id.get(activity_id)
        return self.actors_for_pos(pos) if pos is not None else []

    def case_view(self, cpos: int) -> dict:
        c = self.cases_soa
        return {"zaak_id": c["ids"][cpos], "nummer": c["nummer"][cpos],
                "dossiernummer": int(c["dossiernummer"][cpos]),
                "stuknummer": int(c["stuknummer"][cpos]),
                "toevoeging": c["toevoeging"][cpos],
                "onderwerp": c["onderwerp"][cpos]}

    def case_positions_for_dossiernr(self, dnr: int):
        import numpy as np
        lo = np.searchsorted(self._case_dnr_sorted, dnr, side="left")
        hi = np.searchsorted(self._case_dnr_sorted, dnr, side="right")
        return np.sort(self._case_dnr_pos[lo:hi])  # zaak_id order

    def case_positions_for_nummer(self, nummer: str) -> List[int]:
        if self._cases_by_nummer is None:
            by: Dict[str, List[int]] = {}
            for i, n in enumerate(self.cases_soa["nummer"]):
                by.setdefault(n, []).append(i)
            self._cases_by_nummer = by
        return self._cases_by_nummer.get(nummer, [])

    def dossier_positions_for_nummer(self, nummer: int):
        import numpy as np
        lo = np.searchsorted(self._dos_num_sorted, nummer, side="left")
        hi = np.searchsorted(self._dos_num_sorted, nummer, side="right")
        return np.sort(self._dos_num_pos[lo:hi])  # dossier_id order

    def document_positions_for(self, dnr: int, volg: int):
        import numpy as np
        key = (dnr << 21) | volg
        lo = np.searchsorted(self._doc_key_sorted, key, side="left")
        hi = np.searchsorted(self._doc_key_sorted, key, side="right")
        return np.sort(self._doc_key_pos[lo:hi])  # document_id order

    def surnames_containing(self, token: str) -> List[str]:
        """Unique surnames with ``token`` as a substring (exact semantics of
        the reference's contains() filter, served from the trigram index)."""
        if len(token) < 3:
            return [s for s in self._unique_surnames if token in s]
        grams = [token[i:i + 3] for i in range(len(token) - 2)]
        postings = [self._surname_trigrams.get(g) for g in grams]
        if any(p is None for p in postings):
            return []
        cands = set.intersection(*sorted(postings, key=len))
        return sorted(s for s in cands if token in s)

    @classmethod
    def from_parquet_dir(cls, registry_dir: str) -> "RegistryIndex":
        from .sources.pages import read_registry_tables
        return cls(read_registry_tables(registry_dir))

    def activities_in_window(self, start: datetime, end: datetime, cap: int
                             ) -> Tuple[int, int]:
        """J2: index window [lo, hi) of activities with begin in
        [start, end], begin-sorted, capped. Candidates are addressed by
        position into the struct-of-arrays (``cand_soa``), never as dict
        rows — the dict form is dropped after precompute to keep the
        broadcast index compact."""
        import numpy as np
        lo = int(np.searchsorted(self._act_begins_ep, naive_epoch(start),
                                 side="left"))
        hi = int(np.searchsorted(self._act_begins_ep, naive_epoch(end),
                                 side="right"))
        return lo, min(hi, lo + cap)


class NameEmbeddingIndex:
    """Char-trigram hashing embeddings over person surnames — the 'embedding
    index' half of the linker actor state (north_star stage [2]). Brute-force
    cosine top-k retrieval (the person table is a dimension table; at larger
    gazetteer scale this is where an IVF/LSH structure slots in)."""

    DIM = 512

    def __init__(self, persons_by_achternaam: Dict[str, List[dict]]):
        import numpy as np
        self._np = np
        names, rows = [], []
        for surname, persons in sorted(persons_by_achternaam.items()):
            names.append((surname, persons))
            rows.append(self._vec(surname))
        self.surname_entries = names
        self.matrix = (np.stack(rows) if rows
                       else np.zeros((0, self.DIM), dtype=np.float32))

    def _vec(self, text: str):
        import numpy as np
        v = np.zeros(self.DIM, dtype=np.float32)
        t = f"^{text.lower()}$"
        for i in range(len(t) - 2):
            v[zlib_crc32(t[i:i + 3]) % self.DIM] += 1.0
        n = float(np.linalg.norm(v))
        return v / n if n else v

    def topk(self, surname: str, k: int) -> List[dict]:
        if not len(self.matrix):
            return []
        sims = self.matrix @ self._vec(surname)
        order = sims.argsort()[::-1][:k]
        out: List[dict] = []
        for i in order:
            out.extend(self.surname_entries[int(i)][1])
        return out


def zlib_crc32(s: str) -> int:
    import zlib
    return zlib.crc32(s.encode())


def precompute_candidate_invariants(index: RegistryIndex, cfg: EngineConfig) -> None:
    """Build the candidate struct-of-arrays ONCE on the driver before
    broadcasting the index.

    Memory/locality design (round-2): the activity dimension is the big
    index (450k rows at the 100k-session bench corpus). Per-candidate
    scoring state lives in numpy arrays + flat string lists instead of
    450k per-activity dicts with datetime objects — the numpy arrays
    deserialize ZERO-COPY from the plasma broadcast, so all linker actors
    on a node share one physical copy instead of 26 private dict forests
    (the per-actor heap pressure was a measured drag on the 32-CPU leg).
    Idempotent."""
    import numpy as np
    if getattr(index, "cand_soa", None) is not None:
        return
    acts = index.activities
    off = cfg.time.local_timezone_offset_hours
    prefix_re = build_prefix_regex(cfg.matching.common_topic_prefixes)
    n = len(acts)
    begin = np.full(n, np.nan)
    einde = np.full(n, np.nan)
    soort_l: List[str] = []
    ond_l: List[str] = []
    napi: List[str] = []
    ids: List[str] = []
    norm_cache: Dict[str, str] = {}
    for i, a in enumerate(acts):
        bu = to_utc(a["begin"], off)
        eu = to_utc(a["einde"], off)
        if bu is not None:
            begin[i] = bu.timestamp()
        if eu is not None:
            einde[i] = eu.timestamp()
        soort_l.append((a.get("soort") or "").lower())
        ond = (a.get("onderwerp") or "").lower()
        ond_l.append(ond)
        got = norm_cache.get(ond)
        if got is None:
            got = normalize_topic(ond, prefix_re)
            norm_cache[ond] = got
        napi.append(got)
        ids.append(a["activity_id"])
    # soort as small-vocab ids -> pairwise score rows memoize per xml soort
    vocab = sorted(set(soort_l))
    vid = {s: i for i, s in enumerate(vocab)}
    index.cand_soa = {
        "begin": begin, "einde": einde, "soort_id": np.fromiter(
            (vid[s] for s in soort_l), dtype=np.int32, count=n),
        "soort_vocab": vocab, "ond": ond_l, "napi": napi, "ids": ids,
    }
    # the per-activity dict rows are no longer addressed anywhere on the
    # hot path — drop them so the broadcast object ships only the SoA
    index.activities = None


class Linker:
    """Stateful scorer: compiled topic regex + registry index + config."""

    def __init__(self, index: RegistryIndex, cfg: EngineConfig,
                 speaker_overrides: Optional[Dict[tuple, tuple]] = None):
        self.idx = index
        self.cfg = cfg
        self._prefix_re = build_prefix_regex(cfg.matching.common_topic_prefixes)
        self._norm_cache: Dict[str, str] = {}
        # speaker_overrides (sharded-gazetteer path): the global speaker
        # cascade is a pure function of the surface name and is memoized in
        # _speaker_cache — the sharded resolver precomputes EVERY surface
        # and seals the cache, so a miss is a pipeline bug, not a fallback.
        self._speaker_cache: Dict[tuple, tuple] = dict(speaker_overrides or {})
        self._speaker_sealed = speaker_overrides is not None
        self._actor_cache: Dict[tuple, tuple] = {}
        self._name_score_cache: Dict[tuple, int] = {}
        self._soort_cache: Dict[tuple, float] = {}
        precompute_candidate_invariants(index, cfg)
        self._emb_index: Optional[NameEmbeddingIndex] = (
            NameEmbeddingIndex(index.persons_by_achternaam)
            if cfg.matching.enable_embedding_fallback else None)

    # -- topic normalization with memoization (api onderwerp reuse is heavy)
    def _norm(self, text: str) -> str:
        got = self._norm_cache.get(text)
        if got is None:
            got = normalize_topic(text, self._prefix_re)
            if len(self._norm_cache) < 50_000:
                self._norm_cache[text] = got
        return got

    # ------------------------------------------------------------------ J1
    def find_canonical_session(self, doc: dict) -> Optional[dict]:
        target = parse_xml_datetime(doc.get("datum"))
        if not target:
            return None
        tc = self.cfg.time
        lo = naive_epoch(target - tc.vergadering_lookup_buffer
                         - timedelta(hours=tc.local_timezone_offset_hours))
        hi = naive_epoch(target + tc.vergadering_lookup_buffer
                         - timedelta(hours=tc.local_timezone_offset_hours))
        soort = (doc.get("soort") or "").lower()
        nummer = safe_int(doc.get("nummer"))

        sess = self.idx.sess_soa
        # narrow by nummer when present (equality filter in the reference)
        if nummer is not None:
            pool = self.idx.sessions_with_nummer(nummer)
        else:
            pool = range(len(sess["ids"]))
        for pos in pool:
            pos = int(pos)
            if not (lo <= sess["datum"][pos] <= hi):
                continue
            s_soort = sess["soort"][pos]
            if soort == "plenair" and s_soort != "Plenair":
                continue
            if soort == "commissie" and s_soort != "Commissie":
                continue
            # reference takes the FIRST of <= max_candidate_vergaderingen
            return self.idx.session_view(pos)
        return None

    # ------------------------------------------------------------------ J2
    def candidate_activities(self, session: dict) -> Tuple[int, int]:
        """Returns the [lo, hi) candidate window into ``idx.cand_soa``."""
        buf = self.cfg.time.api_time_buffer
        return self.idx.activities_in_window(
            session["begin"] - buf, session["einde"] + buf,
            self.cfg.processing.max_candidate_activities)

    # ------------------------------------------------------------------ J3
    def match_activity(self, act: dict, window: Tuple[int, int], session: dict
                       ) -> Tuple[Optional[str], float, str, int]:
        """Returns (activity_id | None, best_score, match_type,
        candidate_pos | -1) — the position feeds the J4 actor-roster and J6
        agenda offset lookups.

        Exact branch-and-bound over the reference scoring: cheap components
        (time, soort, exact-topic equality) are computed for every candidate
        — time + soort fully VECTORIZED over the struct-of-arrays window —
        and the O(n^2) fuzzy ratios run only for candidates whose score
        UPPER BOUND can still affect the top-2 values or the first-of-equals
        tie-break. The final (best activity, best score, runner-up score,
        accept decision) are bit-identical to scoring every candidate — the
        reference's argmax-with-margin semantics (activity_matcher.py:26-91,
        252-265) over <=200 candidates is preserved at a fraction of the
        fuzzy-ratio calls.
        """
        import numpy as np
        m = self.cfg.matching
        lo, hi = window
        n = hi - lo
        if n <= 0:
            return None, 0.0, "NO_MATCH", -1
        soa = self.idx.cand_soa
        xml_start = parse_xml_datetime(act.get("start_time"))
        xml_end = parse_xml_datetime(act.get("end_time"))
        xml_ond = (act.get("onderwerp") or "").lower()
        xml_tit = (act.get("titel") or "").lower()
        xml_s = (act.get("soort") or "").lower()
        nxo = self._norm(xml_ond)
        nxt = self._norm(xml_tit)

        # xml-side times converted ONCE (activity_matcher.py:129-140: fall
        # back to vergadering times; end falls back to start + 1 min)
        off = self.cfg.time.local_timezone_offset_hours
        xs = xml_start or session["begin"]
        xe = (xml_end or session["einde"]) or (xs + timedelta(minutes=1) if xs else None)
        xs_u = to_utc(xs, off)
        xe_u = to_utc(xe, off)

        # time proximity (activity_matcher.py:125-163), vectorized over the
        # window's epoch arrays; NaN = candidate without times -> 0
        base = np.zeros(n)
        if xs_u is not None and xe_u is not None:
            cb = soa["begin"][lo:hi]
            ce = soa["einde"][lo:hi]
            xs_e, xe_e = xs_u.timestamp(), xe_u.timestamp()
            with np.errstate(invalid="ignore"):
                start_close = np.abs(xs_e - cb) <= m.time_start_proximity_tolerance_seconds
                buf = float(m.time_general_overlap_buffer_seconds)
                overlap = np.maximum(xs_e, cb - buf) < np.minimum(xe_e, ce + buf)
            valid = ~(np.isnan(cb) | np.isnan(ce))
            base = np.where(valid & start_close, m.score_time_start_proximity,
                            np.where(valid & overlap, m.score_time_overlap_only,
                                     0.0))
        # soort score (activity_matcher.py:165-205): one memoized row per
        # xml soort over the tiny api-soort vocabulary
        base = base + self._soort_row(xml_s)[soa["soort_id"][lo:hi]]

        napis = soa["napi"]
        onds = soa["ond"]
        cheap = [0.0] * n       # exact part: time + soort + equal-topic
        fuzzy_ub = [0.0] * n    # max possible from the fuzzy comparisons
        for i in range(n):
            c = float(base[i])
            api_ond = onds[lo + i]
            napi = napis[lo + i]
            fub = 0.0
            if xml_ond and api_ond:
                if nxo == napi:
                    c += m.score_onderwerp_exact
                else:
                    fub += m.score_onderwerp_fuzzy_high
            if xml_tit and api_ond:
                if nxt == napi:
                    c += m.score_titel_exact_vs_api_onderwerp
                else:
                    fub += m.score_titel_fuzzy_high_vs_api_onderwerp
            cheap[i] = c
            fuzzy_ub[i] = fub

        order = sorted(range(n), key=lambda i: (-(cheap[i] + fuzzy_ub[i]), i))
        best1_val, best1_idx, best2_val = 0.0, None, 0.0
        for i in order:
            ub = cheap[i] + fuzzy_ub[i]
            if ub < best2_val or (ub == best2_val and ub < best1_val):
                break  # sorted desc: no remaining candidate can change top-2
            s = cheap[i] + self._fuzzy_topic_score(
                nxo, nxt, napis[lo + i], xml_ond, xml_tit, bool(onds[lo + i]))
            if s > best1_val:
                best2_val = best1_val
                best1_val, best1_idx = s, i
            elif s == best1_val and best1_idx is not None:
                # first-of-equals wins: reference iterates in candidate
                # order with strict > (activity_matcher.py:45-48)
                if i < best1_idx:
                    best1_idx = i
                best2_val = best1_val
            elif s > best2_val:
                best2_val = s

        accept = best1_val >= m.min_match_score_for_activiteit
        if not accept and n > 1:
            accept = (best1_val - best2_val >= 1.0 and best1_val >= 1.0)
        if accept and best1_idx is not None:
            mt = "EXACT" if best1_val >= m.min_match_score_for_activiteit + 2 else "FUZZY"
            return soa["ids"][lo + best1_idx], best1_val, mt, lo + best1_idx
        return None, best1_val, "NO_MATCH", -1

    def _soort_row(self, xml_s: str):
        """Per-xml-soort score row over the api-soort vocabulary
        (activity_matcher.py:165-205 semantics, unchanged)."""
        import numpy as np
        row = self._soort_cache.get(xml_s)
        if row is None:
            m = self.cfg.matching

            def pair(api_s: str) -> float:
                if not (xml_s and api_s):
                    return 0.0
                if xml_s == api_s:
                    return m.score_soort_exact
                if xml_s in api_s:
                    return m.score_soort_partial_xml_in_api
                if api_s in xml_s:
                    return m.score_soort_partial_api_in_xml
                for main_soort, aliases in SOORT_ALIASES.items():
                    if xml_s == main_soort and any(a in api_s for a in aliases):
                        return m.score_soort_partial_xml_in_api
                return 0.0

            row = np.array([pair(v) for v in self.idx.cand_soa["soort_vocab"]])
            if len(self._soort_cache) < 10_000:
                self._soort_cache[xml_s] = row
        return row

    def _fuzzy_topic_score(self, nxo: str, nxt: str, napi: str,
                           xml_ond: str, xml_tit: str, api_nonempty: bool) -> float:
        """Only the non-equal fuzzy branches of the topic comparison
        (activity_matcher.py:222-248); equality contributions live in the
        cheap part."""
        m = self.cfg.matching
        score = 0.0
        if xml_ond and api_nonempty and nxo != napi:
            r = fuzz_ratio_bounded(nxo, napi, m.fuzzy_similarity_threshold_medium)
            if r >= m.fuzzy_similarity_threshold_high:
                score += m.score_onderwerp_fuzzy_high
            elif r >= m.fuzzy_similarity_threshold_medium:
                score += m.score_onderwerp_fuzzy_medium
        if xml_tit and api_nonempty and nxt != napi:
            r = fuzz_ratio_bounded(nxt, napi, m.fuzzy_similarity_threshold_medium)
            if r >= m.fuzzy_similarity_threshold_high:
                score += m.score_titel_fuzzy_high_vs_api_onderwerp
            elif r >= m.fuzzy_similarity_threshold_medium:
                score += m.score_titel_fuzzy_medium_vs_api_onderwerp
        return score

    # ------------------------------------------------------------------ J4
    def match_speaker(self, voornaam: str, achternaam: str,
                      activity_id: str = "",
                      actors: Optional[List[dict]] = None
                      ) -> Tuple[Optional[str], int, str]:
        """Returns (person_id | None, score, match_type).

        Priority-1 tier (reference api_extractor.py:134-143): when the
        speaker's activity matched and that activity has an actor roster,
        the best actor with score >= min_speaker_similarity_score wins
        BEFORE any global search — speaker resolution is activity-dependent.
        Then the global cascade: exact achternaam bucket (cap 20) ->
        contains-token fallback (cap max_persoon_candidates); accept >=
        min_speaker_similarity_score; EXACT iff score >= 90
        (name_matcher.py:84-90). ``actors`` may be pre-resolved by the
        caller (position-based roster lookup); ``activity_id`` keys the
        per-activity memo either way."""
        if not achternaam:
            return None, 0, "NO_MATCH"
        if actors is None:
            actors = (self.idx.actors_for_activity_id(activity_id)
                      if activity_id else [])
        if actors:
            # memoized per (activity, surface): hot speakers repeat within
            # and across the documents of one matched activity
            akey = (activity_id, voornaam, achternaam)
            hit = self._actor_cache.get(akey)
            if hit is None:
                best = self._best_person(voornaam, achternaam, actors)
                if best is not None:
                    person, score = best
                    hit = (person["person_id"], score,
                           "EXACT" if score >= 90 else "FUZZY")
                else:
                    hit = (None, 0, "NO_MATCH")
                if len(self._actor_cache) < 500_000:
                    self._actor_cache[akey] = hit
            if hit[0] is not None:
                return hit
        # global cascade — memoized: a pure function of the surface name,
        # and speaker surfaces repeat heavily across documents
        ckey = (voornaam, achternaam)
        hit = self._speaker_cache.get(ckey)
        if hit is not None:
            return hit
        if self._speaker_sealed:
            raise RuntimeError(
                f"sharded gazetteer: unresolved speaker surface {ckey!r} — "
                "the surface-collection pass must cover every speaker")
        result = self._match_speaker_uncached(voornaam, achternaam)
        if len(self._speaker_cache) < 500_000:
            self._speaker_cache[ckey] = result
        return result

    def _match_speaker_uncached(self, voornaam: str, achternaam: str
                                ) -> Tuple[Optional[str], int, str]:
        m = self.cfg.matching
        best = self._best_person(voornaam, achternaam,
                                 self.idx.persons_by_achternaam.get(achternaam.lower().strip(), [])[:20])
        if best is None:
            token = achternaam.strip().split()[-1].lower()
            cands: List[dict] = []
            for surname in self.idx.surnames_containing(token):
                cands.extend(self.idx.persons_by_achternaam[surname])
            cands = sorted(cands, key=lambda p: p["person_id"])[:self.cfg.processing.max_persoon_candidates]
            best = self._best_person(voornaam, achternaam, cands)
        if best is None and self._emb_index is not None:
            # embedding-retrieval tier (extension; same acceptance gate)
            cands = self._emb_index.topk(achternaam.strip().lower(),
                                         self.cfg.matching.embedding_topk)
            best = self._best_person(voornaam, achternaam, cands)
        if best is None:
            return None, 0, "NO_MATCH"
        person, score = best
        mt = "EXACT" if score >= 90 else "FUZZY"
        return person["person_id"], score, mt

    def _person_score(self, voornaam: str, achternaam: str, p: dict) -> int:
        """name_similarity memoized per (surface, person): the person pool
        is a small dimension, and the actor-priority tier re-scores the
        same few persons across ~every activity roster — without this memo
        the tier costs ~2-3 ms/doc in fresh fuzzy ratios."""
        key = (voornaam, achternaam, p["person_id"])
        s = self._name_score_cache.get(key)
        if s is None:
            s = name_similarity(voornaam, achternaam, p["achternaam"],
                                p["tussenvoegsel"], p["roepnaam"], p["voornamen"],
                                self.cfg.matching.fuzzy_firstname_threshold)
            if len(self._name_score_cache) < 1_000_000:
                self._name_score_cache[key] = s
        return s

    def _best_person(self, voornaam: str, achternaam: str, candidates: List[dict]
                     ) -> Optional[Tuple[dict, int]]:
        m = self.cfg.matching
        best_p, best_s = None, 0
        for p in candidates:
            s = self._person_score(voornaam, achternaam, p)
            if s > best_s:
                best_s, best_p = s, p
        if best_p is not None and best_s >= m.min_speaker_similarity_score:
            return best_p, best_s
        return None

    # ------------------------------------------------------------------ J5
    def match_zaak(self, dossiernummer: str, stuknummer: str
                   ) -> Tuple[Optional[str], str, float, str, str]:
        """Returns (entity_id | None, entity_kind, score, match_type,
        document_id). ``document_id`` is non-empty only on the dossier
        fallback tier when a Document with volgnummer == stuknummer exists
        in the dossier (reference api_extractor.py:196-201 'Also try to
        find document within this dossier', _find_best_document
        :257-268; surfaced by vlos_pipeline.py:296-301 as
        MatchResult.fallback_entity / ZaakMatch.document_id)."""
        dnr_int = safe_int(dossiernummer)
        snr_int = safe_int(stuknummer)
        cs = self.idx.cases_soa

        # tier 1 — exact zaak (api_extractor.py:207-240)
        if dnr_int is not None:
            cpos = [int(i) for i in self.idx.case_positions_for_dossiernr(dnr_int)]
        elif dossiernummer:
            cpos = self.idx.case_positions_for_nummer(dossiernummer)
        else:
            cpos = []
        if snr_int is not None:
            cpos = [i for i in cpos if int(cs["stuknummer"][i]) == snr_int]
        elif stuknummer:
            cpos = [i for i in cpos if str(cs["stuknummer"][i]) == stuknummer]
        cpos = cpos[:self.cfg.processing.max_zaak_candidates]
        if cpos:
            chosen = cpos[0]
            if len(cpos) > 1:
                for i in cpos:
                    if (dnr_int and int(cs["dossiernummer"][i]) == dnr_int) and (
                            snr_int is None or int(cs["stuknummer"][i]) == snr_int):
                        chosen = i
                        break
            return cs["ids"][chosen], "zaak", 100.0, "EXACT", ""

        # tier 2 — dossier fallback (api_extractor.py:188-205,242-254)
        num, toevoeg = split_dossier_code(dossiernummer)
        if num is not None:
            dsoa = self.idx.dossiers_soa
            dpos = [int(i) for i in self.idx.dossier_positions_for_nummer(num)]
            if toevoeg:
                dpos = [i for i in dpos if dsoa["toevoeging"][i] == toevoeg]
            if dpos:
                # optional document within the dossier (api_extractor.py:
                # 196-201): volgnummer == stuknummer, dossier coordinates
                # match; first of <= 5 in document_id order
                document_id = ""
                if snr_int is not None:
                    docsoa = self.idx.docs_soa
                    doc_pos = [int(i) for i
                               in self.idx.document_positions_for(num, snr_int)]
                    if toevoeg:
                        doc_pos = [i for i in doc_pos
                                   if docsoa["toevoeging"][i] == toevoeg]
                    if doc_pos:
                        document_id = docsoa["ids"][doc_pos[0]]
                return (dsoa["ids"][dpos[0]], "dossier", 75.0, "FALLBACK",
                        document_id)

        return None, "", 0.0, "NO_MATCH", ""

    # ------------------------------------------------------------------ J6
    def agenda_zaken(self, activity_pos: int) -> List[dict]:
        """Agendapunt-linked case views for the matched activity POSITION
        (offset-array lookup; case views built on demand)."""
        idx = self.idx
        o = idx._agenda_off
        return [idx.case_view(int(i))
                for i in idx._agenda_case_idx[o[activity_pos]:o[activity_pos + 1]]]

    # ------------------------------------------------------------------ J8
    def match_fractie(self, name: str) -> Optional[str]:
        fr = self.idx.party_by_name.get((name or "").lower())
        return fr["fractie_id"] if fr else None


# ---------------------------------------------------------------------------
# doc-level linking — mirrors vlos_pipeline.py:82-151 step 4
# ---------------------------------------------------------------------------

def link_doc(doc: dict, linker: Linker) -> dict:
    """Annotate a parsed doc with entity links. Pure; mutates a copy."""
    out = dict(doc)
    session = linker.find_canonical_session(doc)
    out["session_id"] = session["session_id"] if session else ""
    window = linker.candidate_activities(session) if session else (0, 0)

    linked_acts = []
    for act in doc.get("activities", []):
        a = dict(act)
        if session:
            aid, score, mt, apos = linker.match_activity(act, window, session)
        else:
            aid, score, mt, apos = None, 0.0, "NO_MATCH", -1
        a["api_activity_id"] = aid or ""
        a["activity_score"] = score
        a["activity_match_type"] = mt
        actors = linker.idx.actors_for_pos(apos) if apos >= 0 else []

        # activity speakers resolve with the matched activity's actor roster
        # as the priority tier (vlos_pipeline.py:95-99: actors only when the
        # activity match succeeded); direct zaak speakers below resolve
        # WITHOUT actors (vlos_pipeline.py:136 passes [])
        a["speaker_matches"] = []
        for sp in act.get("speakers", []):
            pid, s, smt = linker.match_speaker(sp["voornaam"], sp["achternaam"],
                                               activity_id=a["api_activity_id"],
                                               actors=actors)
            a["speaker_matches"].append({
                **sp, "person_id": pid or "", "score": s, "match_type": smt,
                "persoon_name": linker.idx.person_name_by_id.get(pid or "", "")})

        zms = []
        for zk in act.get("zaken", []):
            eid, kind, zscore, zmt, doc_id = linker.match_zaak(
                zk["dossiernummer"], zk["stuknummer"])
            direct = []
            for sp in zk.get("speakers", []):
                pid, s, smt = linker.match_speaker(sp["voornaam"], sp["achternaam"])
                direct.append({**sp, "person_id": pid or "", "score": s, "match_type": smt})
            zms.append({"dossiernummer": zk["dossiernummer"], "stuknummer": zk["stuknummer"],
                        "titel": zk["titel"], "entity_id": eid or "", "entity_kind": kind,
                        "score": zscore, "match_type": zmt, "source": "xml",
                        "document_id": doc_id,
                        "direct_speaker_matches": direct})
        # agendapunt expansion (J6): EXACT score 100 per linked zaak
        if a["api_activity_id"]:
            for case in linker.agenda_zaken(apos):
                zms.append({"dossiernummer": str(case["dossiernummer"]),
                            "stuknummer": str(case["stuknummer"]),
                            "titel": case["onderwerp"], "entity_id": case["zaak_id"],
                            "entity_kind": "zaak", "score": 100.0, "match_type": "EXACT",
                            "source": "agendapunt", "document_id": "",
                            "direct_speaker_matches": []})
        a["zaak_matches"] = zms

        a["vote_links"] = []
        for v in act.get("votes", []):
            fr_votes = [{**fv, "fractie_id": linker.match_fractie(fv["fractie"]) or ""}
                        for fv in v["fracties"]]
            a["vote_links"].append({**v, "fracties": fr_votes})

        linked_acts.append(a)
    out["activities"] = linked_acts
    return out
