"""Pure text / scoring kernels shared by the Ray stages and the pytest oracle.

Each function re-expresses one semantic unit of the reference (file:line
citations into /root/reference). They are deliberately dependency-free
(stdlib only) so the same code runs inside Ray workers, the oracle, and
tests — semantic drift between pipeline and oracle is impossible for these
primitives.
"""

from __future__ import annotations

import hashlib
import re
import xml.etree.ElementTree as ET
from datetime import datetime, timedelta, timezone
from difflib import SequenceMatcher
from typing import List, Optional, Tuple

_WS_RE = re.compile(r"\s+")


# ---------------------------------------------------------------------------
# decode / BOM handling — reference vlos_neo4j_loader.py:163-171 (3 BOM forms)
# ---------------------------------------------------------------------------

def decode_page_bytes(html: bytes) -> str:
    """Decode a raw page payload to text, stripping the three BOM forms the
    reference strips (unicode BOM, UTF-8 BOM leaked as cp1252 chars, raw
    UTF-8 BOM bytes)."""
    if isinstance(html, str):
        text = html
    else:
        if html.startswith(b"\xef\xbb\xbf"):
            html = html[3:]
        text = html.decode("utf-8", errors="replace")
    if text.startswith("\ufeff"):
        text = text[1:]
    elif text.startswith("\xef\xbb\xbf"):  # UTF-8 BOM double-decoded to chars
        text = text[3:]
    return text


# ---------------------------------------------------------------------------
# canonical text collapse — reference xml_extractor.py:309-326 (M7).
# THE byte-identity-critical kernel: strip each text/tail part, join
# non-empty parts with ' ', collapse \s+ runs, strip ends.
# ---------------------------------------------------------------------------

def collapse_text(element: ET.Element) -> str:
    parts: List[str] = []

    def _extract(elem: ET.Element) -> None:
        if elem.text:
            parts.append(elem.text.strip())
        for child in elem:
            _extract(child)
            if child.tail:
                parts.append(child.tail.strip())

    _extract(element)
    full = " ".join(p for p in parts if p)
    return _WS_RE.sub(" ", full).strip()


# ---------------------------------------------------------------------------
# fuzzy ratio — reference uses thefuzz.fuzz.ratio (pure-python path =
# difflib.SequenceMatcher ratio scaled to 0-100 and rounded). Two documented
# deviations from a stock SequenceMatcher:
#   * autojunk=False: with the default autojunk heuristic, strings >= 200
#     chars treat popular characters as junk and the ratio collapses for
#     long topic strings — diverging from thefuzz's rapidfuzz backend (no
#     autojunk), which the reference uses. Long onderwerp/titel values are
#     realistic, so autojunk is disabled (parity caveat: difflib ratio !=
#     rapidfuzz Indel ratio in general; weights/thresholds are tuned against
#     this difflib implementation on both the pipeline and oracle side).
# ---------------------------------------------------------------------------

def fuzz_ratio(s1: str, s2: str) -> int:
    if not s1 and not s2:
        return 100
    if not s1 or not s2:
        return 0
    m = SequenceMatcher(None, s1, s2, autojunk=False)
    return int(round(100 * m.ratio()))


def fuzz_ratio_bounded(s1: str, s2: str, min_needed: int) -> int:
    """Exact-when-it-matters fuzzy ratio: if difflib's cheap upper bounds
    prove round(ratio*100) < min_needed, return 0 WITHOUT the O(n^2) match
    pass.

    Semantics-preserving for threshold checks (callers only compare the
    result against thresholds >= min_needed): a true rounded ratio below the
    bound contributes nothing either way. The bounds compare against
    min_needed - 0.5 because the exact path ROUNDS: a raw ratio*100 in
    [min_needed - 0.5, min_needed) rounds up to the threshold and must NOT
    be pruned. This is the linker's hot path — most candidate topics are
    unrelated and get rejected by the character-multiset bound
    (quick_ratio) at O(n)."""
    if not s1 and not s2:
        return 100
    if not s1 or not s2:
        return 0
    m = SequenceMatcher(None, s1, s2, autojunk=False)
    if m.real_quick_ratio() * 100 < min_needed - 0.5:
        return 0
    if m.quick_ratio() * 100 < min_needed - 0.5:
        return 0
    return int(round(100 * m.ratio()))


# ---------------------------------------------------------------------------
# topic normalization — reference topic_normalizer.py:21-41 (M10)
# ---------------------------------------------------------------------------

def build_prefix_regex(prefixes: List[str]) -> "re.Pattern[str]":
    escaped = [re.escape(p) for p in prefixes]
    return re.compile(r"^(" + "|".join(escaped) + r")[\s:,-]+", re.IGNORECASE)


def normalize_topic(text: str, prefix_regex: "re.Pattern[str]") -> str:
    if not text:
        return ""
    text = text.strip().lower()
    text = prefix_regex.sub("", text, count=1)
    text = _WS_RE.sub(" ", text)
    return text.strip()


# ---------------------------------------------------------------------------
# datetime parsing — reference xml_extractor.py:286-301 (M8)
# ---------------------------------------------------------------------------

def parse_xml_datetime(datetime_str: Optional[str]) -> Optional[datetime]:
    if not datetime_str or not isinstance(datetime_str, str):
        return None
    dt_str = datetime_str.strip()
    try:
        if dt_str.endswith("Z"):
            return datetime.fromisoformat(dt_str[:-1] + "+00:00")
        if len(dt_str) >= 24 and (dt_str[19] in "+-") and dt_str[22] == ":":
            return datetime.fromisoformat(dt_str)
        if len(dt_str) >= 23 and (dt_str[19] in "+-") and dt_str[22] != ":":
            return datetime.fromisoformat(dt_str[:22] + ":" + dt_str[22:])
        return datetime.strptime(dt_str, "%Y-%m-%dT%H:%M:%S")
    except ValueError:
        return None


# ---------------------------------------------------------------------------
# UTC normalization — reference activity_matcher.py:267-275 (M9):
# naive datetimes are assumed local (fixed offset) and shifted to UTC.
# ---------------------------------------------------------------------------

def to_utc(dt_obj: Optional[datetime], local_offset_hours: int) -> Optional[datetime]:
    if not dt_obj:
        return None
    if dt_obj.tzinfo is None or dt_obj.tzinfo.utcoffset(dt_obj) is None:
        return (dt_obj - timedelta(hours=local_offset_hours)).replace(tzinfo=timezone.utc)
    return dt_obj.astimezone(timezone.utc)


# ---------------------------------------------------------------------------
# surname handling — reference name_matcher.py:121-125 (M11)
# ---------------------------------------------------------------------------

def full_surname(tussenvoegsel: Optional[str], achternaam: str) -> str:
    full = f"{tussenvoegsel or ''} {achternaam or ''}".strip()
    return _WS_RE.sub(" ", full).lower()


def name_similarity(
    v_first: str,
    v_last: str,
    p_achternaam: Optional[str],
    p_tussenvoegsel: Optional[str],
    p_roepnaam: Optional[str],
    p_voornamen: Optional[str],
    fuzzy_firstname_threshold: int,
) -> int:
    """Speaker-name score — reference name_matcher.py:21-61 (J4), exact:
    surname exact -> +60, else max(ratio(bare), ratio(full)) - 20 floored at
    0; firstname/roepnaam boost +40 (>= threshold) or +20 (>= 60); cap 100."""
    score = 0
    if not (v_last and p_achternaam):
        return score

    v_last_lower = v_last.lower()
    bare = p_achternaam.lower()
    full = full_surname(p_tussenvoegsel, p_achternaam)

    if v_last_lower in (bare, full):
        score += 60
    else:
        best_ratio = max(fuzz_ratio(v_last_lower, bare), fuzz_ratio(v_last_lower, full))
        score += max(best_ratio - 20, 0)

    v_first_lower = (v_first or "").lower()
    if v_first_lower:
        first_candidates = [c for c in (p_roepnaam, p_voornamen) if c]
        if first_candidates:
            best_first = max(fuzz_ratio(v_first_lower, fc.lower()) for fc in first_candidates)
            if best_first >= fuzzy_firstname_threshold:
                score += 40
            elif best_first >= 60:
                score += 20

    return min(score, 100)


# ---------------------------------------------------------------------------
# dossier code splitting — reference api_extractor.py:304-318 (M12, M13)
# ---------------------------------------------------------------------------

_DOSSIER_RE = re.compile(r"^(\d+)(?:[-\s]?([A-Za-z0-9]+))?$")


def split_dossier_code(code: Optional[str]) -> Tuple[Optional[int], Optional[str]]:
    m = _DOSSIER_RE.match(code.strip()) if code else None
    if not m:
        return None, None
    return safe_int(m.group(1)), (m.group(2) or None)


def safe_int(val) -> Optional[int]:
    try:
        return int(val)
    except (TypeError, ValueError):
        return None


# ---------------------------------------------------------------------------
# stable synthetic IDs — replaces the reference's per-process-salted Python
# hash() (vlos_neo4j_loader.py:239,320,367,...; SURVEY §7.5 risk 3). sha1 of
# the canonical fields, 16 hex chars: stable across runs/processes for
# resume + dedup.
# ---------------------------------------------------------------------------

def stable_id(*fields) -> str:
    blob = "\x1f".join("" if f is None else str(f) for f in fields)
    return hashlib.sha1(blob.encode("utf-8")).hexdigest()[:16]
