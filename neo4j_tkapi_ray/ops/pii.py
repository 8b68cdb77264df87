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
