"""Text analysis over the ``documents`` table: token counting, quality
scoring, language-ID, document fingerprinting.

All hot paths are vectorized (pyarrow.compute string kernels / numpy):
token/quality/language scoring run entirely on Arrow kernels + numpy
reductions; fingerprints' only scalar loop is the per-token crc32 pass
(no vectorized kernel exists) — its windowing is numpy over the whole
batch. Language-ID holds its profiles in an actor pool (state loaded
once per actor, not per batch).
"""

from __future__ import annotations

import zlib
from typing import Dict, List

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

_WS = r"\s+"


def ws_strip(text):
    """Strip leading/trailing RE2 ``\\s`` runs — the SAME character class
    the ``\\s+`` token split uses, and the same RE2 engine DuckDB's
    regexp_replace runs, so engine and SQL oracle agree on every input.
    (``utf8_trim_whitespace`` strips the wider Unicode White_Space set,
    while DuckDB's ``trim()`` strips only ' ' — both diverge from the
    split class on tab/newline-adjacent text, which is ubiquitous in real
    web text even though the synthetic corpus lacks it.)"""
    return pc.replace_substring_regex(text, r"^\s+|\s+$", "")


def token_counts(sf_dir: str) -> rd.Dataset:
    """doc_id, n_tokens (whitespace tokenization), n_chars."""
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        trimmed = ws_strip(text)
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

    stop_set = pa.array(sorted(stop), pa.string())

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "mean_token_len": pa.array([], pa.float64()),
                             "stopword_ratio": pa.array([], pa.float64()),
                             "punct_ratio": pa.array([], pa.float64()),
                             "quality": pa.array([], pa.float64())})
        text = batch.column("text").combine_chunks()
        n_chars = pc.utf8_length(text).cast(pa.int64()).to_numpy()
        trimmed = pc.utf8_trim_whitespace(text)
        toks = pc.split_pattern_regex(trimmed, _WS)
        n = pc.list_value_length(toks).cast(pa.int64())
        # empty string -> 0 tokens (split gives [''] -> 1)
        n = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0),
                       pa.scalar(0, pa.int64()), n).to_numpy()
        # sum of token lengths == count of non-whitespace chars
        non_ws = pc.count_substring_regex(text, r"\S").cast(pa.int64()).to_numpy()
        # per-token stopword membership, summed per row via list offsets
        hit = pc.is_in(pc.utf8_lower(pc.list_flatten(toks)), value_set=stop_set)
        hit_np = hit.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = toks.offsets.to_numpy()
        stop_hits = np.add.reduceat(hit_np, offsets[:-1]) if len(hit_np) else np.zeros(len(n), np.int64)
        punct = pc.count_substring_regex(text, r"[.,;:!?]").cast(pa.int64()).to_numpy()

        safe_n = np.maximum(n, 1).astype(np.float64)
        mt = np.where(n > 0, non_ws / safe_n, 0.0)
        sr = np.where(n > 0, stop_hits / safe_n, 0.0)
        pr = punct / np.maximum(n_chars, 1)
        score = (0.4 * ((mt >= 3.0) & (mt <= 8.0))
                 + 0.4 * ((sr >= 0.1) & (sr <= 0.6))
                 + 0.2 * (n >= 20))
        return pa.table({"doc_id": batch.column("doc_id"),
                         "mean_token_len": pa.array(np.round(mt, 4), pa.float64()),
                         "stopword_ratio": pa.array(np.round(sr, 4), pa.float64()),
                         "punct_ratio": pa.array(np.round(pr, 4), pa.float64()),
                         "quality": pa.array(np.round(score, 4), pa.float64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def repetition_stats(sf_dir: str) -> rd.Dataset:
    """Gopher-style repetition filters (Rae et al. 2021, public rules):
    per document, the fraction of tokens that are the single most frequent
    token, the distinct-token ratio, and the duplicate-bigram fraction —
    the three signals used to drop boilerplate/looping web text.

    Vectorized: one Arrow regex split per batch, then C-level pandas
    groupbys over the flattened (doc, token) and (doc, bigram) streams —
    no per-document Python. Rounding is half-away (floor(x*1e5+0.5)/1e5,
    valid for ratios >= 0) to match DuckDB ROUND bit-for-bit.

    Output: doc_id, n_tokens, distinct_ratio, top_token_ratio,
    dup_bigram_ratio.
    """
    import pandas as pd
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def r5(x: np.ndarray) -> np.ndarray:
        return np.floor(x * 1e5 + 0.5) / 1e5

    def fn(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "distinct_ratio": pa.array([], pa.float64()),
                          "top_token_ratio": pa.array([], pa.float64()),
                          "dup_bigram_ratio": pa.array([], pa.float64())})
        if batch.num_rows == 0:
            return empty
        text = batch.column("text").combine_chunks()
        trimmed = ws_strip(text)
        toks = pc.split_pattern_regex(trimmed, _WS)
        n = pc.list_value_length(toks).cast(pa.int64())
        n = pc.if_else(pc.equal(pc.utf8_length(trimmed), 0),
                       pa.scalar(0, pa.int64()), n).to_numpy()
        doc_ids = batch.column("doc_id").to_numpy()
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        offsets = toks.offsets.to_numpy()
        doc_idx = np.repeat(np.arange(batch.num_rows), np.diff(offsets))
        df = pd.DataFrame({"d": doc_idx, "t": flat})
        g = df.groupby("d", sort=True)
        distinct = g["t"].nunique().reindex(range(batch.num_rows), fill_value=0).to_numpy()
        top = (df.groupby(["d", "t"], sort=False).size().groupby("d").max()
               .reindex(range(batch.num_rows), fill_value=0).to_numpy())
        # bigrams: adjacent token pairs within a document (never across)
        same_doc = doc_idx[:-1] == doc_idx[1:] if len(doc_idx) else np.array([], bool)
        bg_doc = doc_idx[:-1][same_doc]
        bg = pd.DataFrame({"d": bg_doc,
                           "b": pd.Series(flat[:-1][same_doc]).str.cat(
                               pd.Series(flat[1:][same_doc]), sep=" ")})
        bgg = bg.groupby("d", sort=True)
        bg_total = bgg.size().reindex(range(batch.num_rows), fill_value=0).to_numpy()
        bg_distinct = bgg["b"].nunique().reindex(range(batch.num_rows),
                                                 fill_value=0).to_numpy()
        safe_n = np.maximum(n, 1).astype(np.float64)
        safe_bg = np.maximum(bg_total, 1).astype(np.float64)
        return pa.table({
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "distinct_ratio": pa.array(r5(np.where(n > 0, distinct / safe_n, 0.0))),
            "top_token_ratio": pa.array(r5(np.where(n > 0, top / safe_n, 0.0))),
            "dup_bigram_ratio": pa.array(
                r5(np.where(bg_total > 0,
                            (bg_total - bg_distinct) / safe_bg, 0.0))),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


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
        # insertion order of PROFILES == first-wins tie order of the
        # scalar reference loop (score > best_score keeps the earlier lang)
        self.langs = list(self.PROFILES)
        self.grams = [self.PROFILES[lang] for lang in self.langs]

    def __call__(self, batch: pa.Table) -> pa.Table:
        n_rows = batch.num_rows
        out = {name: batch.column(name) for name in batch.column_names if name != "text"}
        if n_rows == 0:
            out["lang_pred"] = pa.array([], pa.string())
            out["lang_hits"] = pa.array([], pa.int64())
            return pa.table(out)
        # hay = " " + text.lower() + " "; count_substring is non-overlapping,
        # matching re.findall on the escaped literal
        hay = pc.binary_join_element_wise(
            pa.scalar(" "), pc.utf8_lower(batch.column("text")), pa.scalar(" "),
            pa.scalar(""))
        scores = np.zeros((n_rows, len(self.langs)), dtype=np.int64)
        for j, grams in enumerate(self.grams):
            for g in grams:
                scores[:, j] += pc.count_substring(hay, g).cast(pa.int64()).to_numpy()
        best = scores.argmax(axis=1)          # first max wins, like the loop
        hits = scores[np.arange(n_rows), best]
        preds = np.where(hits > 0, np.array(self.langs, dtype=object)[best], "und")
        out["lang_pred"] = pa.array(preds.tolist(), pa.string())
        out["lang_hits"] = pa.array(hits, pa.int64())
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
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "fingerprint": pa.array([], pa.uint64())})
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch.column("text").combine_chunks()), _WS)
        # crc32 has no vectorized kernel: one scalar pass over the flattened
        # token stream of the whole batch (the only Python-level loop here).
        # A whitespace-only doc yields [''] -> crc32('')=0 -> fp 0, same as
        # the scalar reference's empty-list -> 0.
        flat = pc.list_flatten(toks).to_pylist()
        crc = np.fromiter((zlib.crc32(t.encode()) for t in flat),
                          dtype=np.uint64, count=len(flat))
        offsets = toks.offsets.to_numpy()
        # rolling polynomial hash over the whole stream at once; windows that
        # cross a document boundary are never read below
        n_win = len(crc) - window + 1
        if n_win > 0:
            acc = np.zeros(n_win, dtype=np.uint64)
            for k in range(window):
                acc = acc * B + crc[k:k + n_win]
        fps = np.empty(batch.num_rows, dtype=np.uint64)
        for i in range(batch.num_rows):
            s, e = int(offsets[i]), int(offsets[i + 1])
            if e - s < window:
                fps[i] = crc[s:e].min() if e > s else 0
            else:
                fps[i] = acc[s:e - window + 1].min()
        return pa.table({"doc_id": batch.column("doc_id"),
                         "fingerprint": pa.array(fps, pa.uint64())})

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def unigram_logprob(sf_dir: str) -> rd.Dataset:
    """CCNet-style LM quality score (Wenzek et al. 2020, public method):
    each document scored by the mean log-probability of its tokens under a
    unigram LM estimated from the corpus itself — the classic
    "perplexity filter" reduced to its order-0 form so it stays exactly
    SQL-checkable.

    Fully distributed, nothing corpus-sized touches the driver:
      pass 1  per-batch (doc_id, token, c) partial counts (bounded by
              per-doc distinct tokens);
      hop 1   exchange by token — each block sees ALL rows of its tokens,
              computes the global count c_t in-block, and emits per-doc
              partials (doc_id, w=c*ln(c_t), c) pre-combined per block;
      hop 2   exchange by doc_id — avg_logprob = SUM(w)/SUM(c) - ln(total).
    The corpus token total is the only scalar the driver touches (one
    aggregate, like the CC convergence flag). avg = mean ln(c_t/total),
    algebraically rearranged; both sides round half-away at 5dp.

    Output: (doc_id, n_tokens, avg_logprob).
    """
    import pandas as pd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def token_rows(batch: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "token": pa.array([], pa.string()),
                          "c": pa.array([], pa.int64())})
        if batch.num_rows == 0:
            return empty
        text = batch.column("text").combine_chunks()
        trimmed = ws_strip(text)
        toks = pc.split_pattern_regex(trimmed, _WS)
        offsets = toks.offsets.to_numpy()
        lens = np.diff(offsets)
        nonempty = pc.utf8_length(trimmed).to_numpy(zero_copy_only=False) > 0
        doc_idx = np.repeat(np.arange(batch.num_rows), lens)
        keep = nonempty[doc_idx]
        if not keep.any():
            return empty
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)[keep]
        ids = batch.column("doc_id").to_numpy()[doc_idx[keep]]
        g = (pd.DataFrame({"doc_id": ids, "token": flat})
             .groupby(["doc_id", "token"], sort=False).size().reset_index(name="c"))
        return pa.table({"doc_id": pa.array(g["doc_id"].to_numpy(), pa.int64()),
                         "token": pa.array(g["token"], pa.string()),
                         "c": pa.array(g["c"].to_numpy(), pa.int64())})

    token_stream = ds.map_batches(token_rows, batch_format="pyarrow",
                                  zero_copy_batch=True)
    # ONE scalar to the driver: the corpus token total — computed from a
    # SEPARATE cheap count pass (a \S+ run count equals the \s+ split token
    # count, without building token lists), not by consuming token_stream
    # twice (the double-consume would recompute every per-batch groupby;
    # same lesson as the round-3 minhash fix)
    def count_rows(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch.column("text"),
                                     r"\S+").cast(pa.int64())
        return pa.table({"n": n})

    total = (rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
             .map_batches(count_rows, batch_format="pyarrow",
                          zero_copy_batch=True).sum("n"))
    ln_total = float(np.log(total)) if total else 0.0

    from ..exchange import reduce_blocks

    def per_token_block(df: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "w": pd.Series(dtype="float64"),
                              "c": pd.Series(dtype="int64")})
        if df.empty:
            return empty
        ct = df.groupby("token", sort=False)["c"].transform("sum")
        df = df.assign(w=df["c"].to_numpy() * np.log(ct.to_numpy(dtype=np.float64)))
        out = df.groupby("doc_id", sort=True).agg(w=("w", "sum"), c=("c", "sum"))
        return out.reset_index()

    partials = reduce_blocks(token_stream, ["token"], per_token_block,
                             batch_format="pandas")

    def per_doc_block(df: "pd.DataFrame") -> "pd.DataFrame":
        empty = pd.DataFrame({"doc_id": pd.Series(dtype="int64"),
                              "n_tokens": pd.Series(dtype="int64"),
                              "avg_logprob": pd.Series(dtype="float64")})
        if df.empty:
            return empty
        g = df.groupby("doc_id", sort=True).agg(w=("w", "sum"), c=("c", "sum"))
        avg = g["w"].to_numpy() / g["c"].to_numpy(dtype=np.float64) - ln_total
        # half-away rounding, valid for negatives too: sign * floor(|x|*1e5+0.5)
        r5 = np.sign(avg) * np.floor(np.abs(avg) * 1e5 + 0.5) / 1e5
        return pd.DataFrame({"doc_id": g.index.to_numpy(),
                             "n_tokens": g["c"].to_numpy(),
                             "avg_logprob": r5})

    return reduce_blocks(partials, ["doc_id"], per_doc_block,
                         batch_format="pandas")


def normalize_text(sf_dir: str) -> rd.Dataset:
    """Text normalization for training-data prep: Unicode NFC + RE2-``\\s``
    whitespace collapse + edge strip, per document.

    Columns: ``doc_id, norm_text, changed, n_chars, n_chars_norm`` (both
    lengths in code points, matching DuckDB ``length()``; ``changed`` is
    0/1 BIGINT — the driver canon handles ints more portably than bools).

    Scale shape: map-only (no exchange). The collapse/strip are RE2 Arrow
    kernels — the SAME regex engine and ``\\s`` class DuckDB's
    ``regexp_replace`` runs, so the oracle agrees on every input. NFC has
    no Arrow kernel, but is the IDENTITY on pure-ASCII strings, so rows
    are masked with the vectorized ``string_is_ascii`` kernel and only
    non-ASCII rows (a small minority of real web text after extraction)
    pay the per-row ``unicodedata.normalize`` C call.
    """
    import unicodedata

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        text = batch.column("text").combine_chunks()
        if isinstance(text, pa.ChunkedArray):
            text = text.chunk(0) if text.num_chunks else pa.array([], pa.string())
        ascii_mask = pc.string_is_ascii(text)
        if pc.all(pc.fill_null(ascii_mask, True)).as_py():
            nfc = text  # NFC is the identity on ASCII — zero-copy fast path
        else:
            mask = ascii_mask.to_pylist()
            nfc = pa.array(
                [t if (t is None or a) else unicodedata.normalize("NFC", t)
                 for t, a in zip(text.to_pylist(), mask)], pa.string())
        collapsed = pc.replace_substring_regex(nfc, r"\s+", " ")
        norm = pc.replace_substring_regex(collapsed, r"^ | $", "")
        changed = pc.cast(pc.not_equal(norm, batch.column("text")), pa.int64())
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "norm_text": norm,
            "changed": changed,
            "n_chars": pc.utf8_length(batch.column("text")).cast(pa.int64()),
            "n_chars_norm": pc.utf8_length(norm).cast(pa.int64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def oov_rate(sf_dir: str, vocab_size: int = 20) -> rd.Dataset:
    """Out-of-vocabulary rate per document against the corpus' own
    top-``vocab_size`` token vocabulary — the tokenizer-coverage /
    domain-shift signal a training-data pipeline computes before fixing a
    tokenizer vocab (high OOV flags code, tables, non-target languages).

    Tokenization is the module's shared kernel (RE2 ``\\s`` edge strip +
    ``\\s+`` split, case-sensitive — same class/engine as the oracle's
    ``string_split_regex``). Vocabulary = the ``vocab_size`` tokens with
    the highest total occurrence count, ties broken token ASC, so the
    boundary is deterministic on both sides. (Default 20: the synthetic
    corpus has only 31 distinct tokens, so a realistic 10k-100k vocab
    would be degenerate — 20 keeps the OOV selection path exercised, the
    same calibration note as embedding_neardup's 0.3 threshold.)

    Scale shape (nothing corpus-sized touches the driver):
      pass 1  per-batch (token, c) Arrow group_by partials — one row per
              distinct token per batch, never one per occurrence;
      hop 1   exchange by token → per-partition global sum + partial
              top-V (≤ V rows leave each partition; the global top-V is a
              subset of the union of per-partition top-Vs because each
              token's total is wholly within one partition);
      merge   one tiny block picks the global top-V — the only
              driver-held set, bounded at V rows regardless of corpus;
      scan    vocab broadcast ONCE via ``ray.put`` (an Arrow string array,
              zero-copy per task); one map_batches over documents runs a
              vectorized ``pc.is_in`` membership scan per batch.

    Output: (doc_id, n_tokens, n_oov, oov_rate) for docs with ≥1 token;
    oov_rate rounded half-away at 5dp to match DuckDB ROUND.
    """
    import pandas as pd
    import ray

    from ..exchange import reduce_blocks

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])
    _empty = pa.table({"token": pa.array([], pa.string()),
                       "c": pa.array([], pa.int64())})

    def _tok(b: pa.Table):
        """trim → mask whitespace-only docs → split; returns (list_array,
        flat_tokens). A whitespace-only doc would split to [''] — the
        nonempty mask nulls it out first (same rule as unigram_logprob)."""
        trimmed = ws_strip(b.column("text").combine_chunks())
        nonempty = pc.greater(pc.utf8_length(trimmed), 0)
        toks = pc.split_pattern_regex(pc.if_else(nonempty, trimmed, None), _WS)
        return toks, pc.list_flatten(toks)

    def partial_counts(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty
        _, flat = _tok(b)
        if len(flat) == 0:
            return _empty
        g = pa.table({"token": flat}).group_by("token").aggregate(
            [([], "count_all")])
        return pa.table({"token": g.column("token"),
                         "c": g.column("count_all").cast(pa.int64())})

    partials = docs.map_batches(partial_counts, batch_format="pyarrow",
                                zero_copy_batch=True)

    def partition_top(b: pa.Table) -> "pd.DataFrame":
        empty = pd.DataFrame({"token": pd.Series(dtype="object"),
                              "c": pd.Series(dtype="int64")})
        if b.num_rows == 0:
            return empty
        agg = (b.group_by("token").aggregate([("c", "sum")]).to_pandas()
               .rename(columns={"c_sum": "c"}))
        return (agg.sort_values(["c", "token"], ascending=[False, True],
                                kind="stable")
                .head(vocab_size).astype({"c": "int64"}))

    tops = reduce_blocks(partials, ["token"], partition_top,
                         batch_format="pyarrow")
    # ≤ V×P candidate rows by construction → a single-block merge is safe;
    # the V vocab rows are the only data the driver ever holds
    merged = (tops.repartition(1).to_pandas()
              .sort_values(["c", "token"], ascending=[False, True],
                           kind="stable").head(vocab_size))
    vocab_ref = ray.put(pa.array(merged["token"].to_numpy(), pa.string()))

    def scan(b: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "n_tokens": pa.array([], pa.int64()),
                          "n_oov": pa.array([], pa.int64()),
                          "oov_rate": pa.array([], pa.float64())})
        if b.num_rows == 0:
            return empty
        toks, flat = _tok(b)
        if len(flat) == 0:
            return empty
        in_vocab = pc.is_in(flat, value_set=ray.get(vocab_ref))
        lens = np.diff(toks.offsets.to_numpy())
        doc_idx = np.repeat(np.arange(b.num_rows), lens)
        hits = np.bincount(
            doc_idx, weights=in_vocab.to_numpy(zero_copy_only=False),
            minlength=b.num_rows)
        n_tok = np.bincount(doc_idx, minlength=b.num_rows)
        keep = n_tok > 0
        n_tok_k = n_tok[keep].astype(np.int64)
        n_oov = n_tok_k - hits[keep].astype(np.int64)
        rate = n_oov / n_tok_k
        # half-away at 5dp (rate ≥ 0, so plain floor(x*1e5+0.5) suffices)
        r5 = np.floor(rate * 1e5 + 0.5) / 1e5
        return pa.table({
            "doc_id": b.column("doc_id").to_numpy()[keep],
            "n_tokens": pa.array(n_tok_k, pa.int64()),
            "n_oov": pa.array(n_oov, pa.int64()),
            "oov_rate": pa.array(r5, pa.float64()),
        })

    return docs.map_batches(scan, batch_format="pyarrow",
                            zero_copy_batch=True)


def bpe_merges(sf_dir: str, n_merges: int = 5) -> rd.Dataset:
    """Learn the first ``n_merges`` BPE merges over the corpus — the
    tokenizer-induction step of a training-data pipeline (Sennrich et al.
    2016, "Neural Machine Translation of Rare Words with Subword Units"):
    start from characters, repeatedly merge the globally most frequent
    adjacent symbol pair. Deterministic tie-break: (count desc, left asc,
    right asc) — textbook BPE breaks ties arbitrarily, which no exact
    check could reproduce.

    Pair-count semantics are the textbook reference implementation's:
    counts come from overlapping adjacent positions (zip; "aaa" counts
    (a,a) twice) while APPLY is greedy left-to-right non-overlapping —
    both mirrored by the independent single-process oracle.

    Scale shape: BPE state lives on the (word, count) VOCABULARY, not the
    corpus — one token exchange builds it (per-batch Arrow partials first)
    and it never leaves the cluster. Each merge round: per-block adjacent
    pair counts (combined in-block) → one tiny (l, r) exchange → per-block
    partial top-1, so the driver reads <= P rows per round and broadcasts
    back one pair (k rows total driver traffic for k merges — the
    irreducible sequential core of BPE; each merge depends on the last).
    The per-word Python in apply/count runs over vocab blocks, bounded by
    |vocab| x mean word length, not corpus size.

    Output: (rank, left, right, pair_count), rank 1-based in merge order.
    """
    import pandas as pd

    from ..exchange import reduce_blocks
    from .sampling import _doc_tokens

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    _empty = pa.table({"token": pa.array([], pa.string()),
                       "c": pa.array([], pa.int64())})

    def tok_partial(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return _empty
        _, flat = _doc_tokens(b)
        if flat is None:
            return _empty
        return (pa.table({"token": flat}).group_by(["token"])
                .aggregate([([], "count_all")])
                .rename_columns(["token", "c"]))

    def word_counts(df: pd.DataFrame) -> pd.DataFrame:
        if df.empty:
            return pd.DataFrame({"word": pd.Series(dtype="object"),
                                 "count": pd.Series(dtype="int64"),
                                 "syms": pd.Series(dtype="object")})
        g = df.groupby("token", sort=False)["c"].sum().reset_index()
        return pd.DataFrame({"word": g["token"],
                             "count": g["c"].astype("int64"),
                             "syms": [list(w) for w in g["token"]]})

    vocab = reduce_blocks(
        docs.map_batches(tok_partial, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["token"], word_counts, batch_format="pandas").materialize()

    def count_pairs(df: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame({"l": pd.Series(dtype="object"),
                              "r": pd.Series(dtype="object"),
                              "c": pd.Series(dtype="int64")})
        if df.empty:
            return empty
        acc: dict = {}
        for syms, cnt in zip(df["syms"], df["count"]):
            for i in range(len(syms) - 1):
                k = (syms[i], syms[i + 1])
                acc[k] = acc.get(k, 0) + int(cnt)
        if not acc:
            return empty
        ks = list(acc)
        return pd.DataFrame({"l": [k[0] for k in ks],
                             "r": [k[1] for k in ks],
                             "c": pd.Series([acc[k] for k in ks],
                                            dtype="int64")})

    def top1_partial(df: pd.DataFrame) -> pd.DataFrame:
        """Sum per (l, r) within the partition (the exchange contract makes
        that the GLOBAL count), keep this partition's best pair."""
        empty = pd.DataFrame({"l": pd.Series(dtype="object"),
                              "r": pd.Series(dtype="object"),
                              "c": pd.Series(dtype="int64")})
        if df.empty:
            return empty
        g = df.groupby(["l", "r"], sort=False)["c"].sum().reset_index()
        g = g.sort_values(["c", "l", "r"], ascending=[False, True, True],
                          kind="mergesort")
        return g.head(1).astype({"c": "int64"})

    def apply_merge(left: str, right: str):
        def fn(df: pd.DataFrame) -> pd.DataFrame:
            if df.empty:
                return df
            merged = left + right
            out = []
            for syms in df["syms"]:
                i, n, w = 0, len(syms), []
                while i < n:
                    if (i + 1 < n and syms[i] == left
                            and syms[i + 1] == right):
                        w.append(merged)
                        i += 2
                    else:
                        w.append(syms[i])
                        i += 1
                out.append(w)
            return pd.DataFrame({"word": df["word"], "count": df["count"],
                                 "syms": out})
        return fn

    merges = []
    for rank in range(1, n_merges + 1):
        partials = vocab.map_batches(count_pairs, batch_format="pandas",
                                     batch_size=None)
        tops = reduce_blocks(partials, ["l", "r"], top1_partial,
                             batch_format="pandas",
                             coalesce_rows=None).take_all()   # <= P rows
        if not tops:
            break
        best = sorted(tops, key=lambda t: (-t["c"], t["l"], t["r"]))[0]
        merges.append({"rank": rank, "left": best["l"], "right": best["r"],
                       "pair_count": int(best["c"])})
        vocab = vocab.map_batches(apply_merge(best["l"], best["r"]),
                                  batch_format="pandas",
                                  batch_size=None).materialize()

    schema = pa.schema([("rank", pa.int64()), ("left", pa.string()),
                        ("right", pa.string()), ("pair_count", pa.int64())])
    if not merges:
        return rd.from_arrow(schema.empty_table())
    return rd.from_arrow(pa.Table.from_pylist(merges, schema=schema))
