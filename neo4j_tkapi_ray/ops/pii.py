"""PII redaction: the scrub pass a web-scale training-data pipeline runs
before anything else ships (emails, IPv4 addresses, phone-number-shaped
digit runs replaced by typed placeholder tokens).

Map-only (no shuffle): one vectorized RE2 pass per pattern per batch via
``pyarrow.compute`` kernels. DuckDB's regexp functions are RE2 too, so the
oracle applies the IDENTICAL pattern strings in the IDENTICAL order — the
patterns below are the single source of truth for both sides (``pii_sql``
renders the oracle from the same tuples).

Redaction is sequential per pattern (each pattern sees the previous
pattern's output), and ``n_redactions`` counts matches at each step before
replacing — both deliberate, because a phone-shaped digit run inside an
already-redacted email must not double-count.

The synthetic ``documents`` corpus is word-soup (zero matches), which makes
the driver check a plumbing check only; the real semantics are pinned by
``tests/test_pii.py`` driving planted PII through BOTH the engine kernel
and DuckDB.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# (pattern, replacement) — order is the contract.
# Phone: 7-15 total digits with AT MOST ONE space/paren/dash between
# consecutive digits, ending on a word boundary (ADVICE r3: the earlier
# unbounded `\+?\d[\d\s()-]{7,}\d` swallowed year lists / table cells /
# long IDs into a single <PHONE> token — destructive over-redaction for a
# training-data scrub). 7-15 mirrors E.164's max-15-digit rule.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    (r"\+?\d(?:[\s()-]?\d){6,14}\b", "<PHONE>"),
)


def scrub_batch(text: pa.ChunkedArray | pa.Array):
    """Apply every pattern in order; returns (clean_text, n_redactions)."""
    import numpy as np
    n = pa.array(np.zeros(len(text), np.int64))
    for pat, repl in PII_PATTERNS:
        n = pc.add(n, pc.count_substring_regex(text, pat).cast(pa.int64()))
        text = pc.replace_substring_regex(text, pat, repl)
    return text, n


def pii_scrub(sf_dir: str) -> rd.Dataset:
    """(doc_id, clean_text, n_redactions) over the documents table."""
    docs = rd.read_parquet(f"{sf_dir}/documents.parquet",
                           columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "clean_text": pa.array([], pa.string()),
                             "n_redactions": pa.array([], pa.int64())})
        clean, n = scrub_batch(batch.column("text").combine_chunks())
        return pa.table({"doc_id": batch.column("doc_id"),
                         "clean_text": clean, "n_redactions": n})

    return docs.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def pii_sql(table: str = "documents") -> str:
    """DuckDB oracle rendered from the SAME pattern tuples: stepwise
    regexp_extract_all counts + regexp_replace(..., 'g'), one CTE per
    pattern so each step sees the previous step's output exactly like the
    engine kernel."""
    ctes = [f"s0 AS (SELECT doc_id, text AS t0 FROM {table})"]
    for i, (pat, repl) in enumerate(PII_PATTERNS, start=1):
        lit = pat.replace("'", "''")
        carry = "".join(f"c{j}, " for j in range(1, i))
        ctes.append(
            f"s{i} AS (SELECT doc_id, {carry}"
            f"len(regexp_extract_all(t{i - 1}, '{lit}')) AS c{i}, "
            f"regexp_replace(t{i - 1}, '{lit}', '{repl}', 'g') AS t{i} "
            f"FROM s{i - 1})")
    k = len(PII_PATTERNS)
    total = " + ".join(f"c{i}" for i in range(1, k + 1))
    return (f"WITH {', '.join(ctes)} SELECT doc_id, t{k} AS clean_text, "
            f"CAST({total} AS BIGINT) AS n_redactions FROM s{k}")


def pii_type_counts(sf_dir: str) -> rd.Dataset:
    """Corpus PII report: per pattern TYPE, how many documents contain it
    and how many total hits — the audit table a scrub run publishes.
    Counting is STEPWISE like ``scrub_batch`` (each pattern counts on the
    previous pattern's output), so the report agrees exactly with what
    the scrub redacted.

    Scale shape: per-batch vectorized counts per pattern (|patterns| rows
    per batch leave the worker), one tiny exchange on pii_type.

    Output: (pii_type, n_docs, n_hits); type names derive from the
    replacement tokens (single source of truth with the scrub)."""
    import numpy as np

    from ..exchange import reduce_blocks

    docs = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    names = [repl.strip("<>") for _, repl in PII_PATTERNS]

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"pii_type": pa.array([], pa.string()),
                             "n_docs": pa.array([], pa.int64()),
                             "n_hits": pa.array([], pa.int64())})
        text = batch.column("text").combine_chunks()
        n_docs, n_hits = [], []
        for pat, repl in PII_PATTERNS:
            c = pc.count_substring_regex(text, pat).cast(pa.int64())
            cn = c.to_numpy(zero_copy_only=False)
            n_docs.append(int((cn > 0).sum()))
            n_hits.append(int(cn.sum()))
            text = pc.replace_substring_regex(text, pat, repl)
        return pa.table({"pii_type": pa.array(names, pa.string()),
                         "n_docs": pa.array(np.array(n_docs, np.int64)),
                         "n_hits": pa.array(np.array(n_hits, np.int64))})

    def final(df):
        import pandas as pd
        if df.empty:
            return pd.DataFrame({"pii_type": pd.Series(dtype="object"),
                                 "n_docs": pd.Series(dtype="int64"),
                                 "n_hits": pd.Series(dtype="int64")})
        g = (df.groupby("pii_type", sort=True)[["n_docs", "n_hits"]].sum()
             .reset_index())
        return g.astype({"n_docs": "int64", "n_hits": "int64"})

    return reduce_blocks(docs.map_batches(partial, batch_format="pyarrow",
                                          zero_copy_batch=True),
                         ["pii_type"], final, batch_format="pandas")


def pii_type_counts_sql(table: str = "documents") -> str:
    """Rollup oracle rendered from the same stepwise CTE chain as
    ``pii_sql``: per type, docs-containing and total hits, unpivoted."""
    ctes = [f"s0 AS (SELECT doc_id, text AS t0 FROM {table})"]
    for i, (pat, repl) in enumerate(PII_PATTERNS, start=1):
        lit = pat.replace("'", "''")
        carry = "".join(f"c{j}, " for j in range(1, i))
        ctes.append(
            f"s{i} AS (SELECT doc_id, {carry}"
            f"len(regexp_extract_all(t{i - 1}, '{lit}')) AS c{i}, "
            f"regexp_replace(t{i - 1}, '{lit}', '{repl}', 'g') AS t{i} "
            f"FROM s{i - 1})")
    k = len(PII_PATTERNS)
    arms = " UNION ALL ".join(
        f"SELECT '{repl.strip('<>')}' AS pii_type, "
        f"CAST(COUNT(*) FILTER (c{i} > 0) AS BIGINT) AS n_docs, "
        f"CAST(COALESCE(SUM(c{i}), 0) AS BIGINT) AS n_hits FROM s{k}"
        for i, (_, repl) in enumerate(PII_PATTERNS, start=1))
    return f"WITH {', '.join(ctes)} {arms}"
