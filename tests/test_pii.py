"""PII scrub: the engine kernel (pyarrow RE2) and the DuckDB oracle
(also RE2, rendered from the SAME pattern tuples) must agree byte-for-byte
on planted adversarial PII — the synthetic documents corpus has no PII, so
this fixture is where the semantics are actually pinned."""

import duckdb
import pyarrow as pa

from neo4j_tkapi_ray.ops.pii import PII_PATTERNS, pii_sql, scrub_batch

ADVERSARIAL = [
    "contact me at john.doe+spam@example.co.uk today",
    "server at 192.168.0.1 and 10.0.0.255.",
    "call +31 6 1234 5678 now",
    "mixed a@b.io then 8.8.8.8 then 020 555 123 4567 end",
    "no pii here at all",
    "",
    "999.999.999.999 borderline ip-shaped",
    "email@sub.domain.example.com. trailing dot",
    "+1-800-555-0100",
    "digits 1234567890123 run",
    "two mails a@x.org b@y.net and ip 1.2.3.4",
    "@not-an-email and 1.2.3 not an ip",
    # ADVICE r3 over-redaction probes for the bounded phone pattern
    "years 2020 2021 2022 follow",             # 12 digits, single seps
    "2020  2021 double-space is NOT one run",  # two+ seps break the run
    "id 12345678901234567890 too many digits",
    "short 123456 run",                        # 6 digits: below minimum
    "tel (020) 555-1234 ok",
]


def _duck_scrub():
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.executemany("INSERT INTO documents VALUES (?, ?)",
                    list(enumerate(ADVERSARIAL)))
    rows = con.execute(pii_sql() + " ORDER BY doc_id").fetchall()
    con.close()
    return rows


def test_engine_matches_duckdb_on_planted_pii():
    clean, n = scrub_batch(pa.array(ADVERSARIAL, pa.string()))
    got = list(zip(range(len(ADVERSARIAL)), clean.to_pylist(), n.to_pylist()))
    assert got == _duck_scrub()


def test_redactions_happen():
    clean, n = scrub_batch(pa.array(ADVERSARIAL, pa.string()))
    c = clean.to_pylist()
    assert "<EMAIL>" in c[0] and "john.doe" not in c[0]
    assert c[1].count("<IP>") == 2
    assert "<PHONE>" in c[2]
    # order contract: email redacted before phone-shaped digit runs
    assert c[3].count("<EMAIL>") == 1 and "<IP>" in c[3] and "<PHONE>" in c[3]
    assert c[4] == ADVERSARIAL[4] and n.to_pylist()[4] == 0
    assert n.to_pylist()[0] >= 1
    # bounded phone pattern (ADVICE r3): double separators break a run
    # (the old unbounded pattern swallowed the whole cell list); a long ID
    # redacts at most a 15-digit (E.164-max) window instead of the entire
    # run; 6 digits is below the minimum; real formatted numbers still hit
    assert c[13] == ADVERSARIAL[13]              # "2020  2021 ..." untouched
    assert c[14] == "id 12345<PHONE> too many digits"
    assert c[15] == ADVERSARIAL[15]              # 6-digit run untouched
    assert "<PHONE>" in c[16]


def test_pattern_table_is_the_single_source():
    sql = pii_sql()
    for pat, repl in PII_PATTERNS:
        assert repl in sql


def test_pii_type_counts_planted_vs_duckdb(ray_session, tmp_path):
    """Per-type rollup on planted PII, engine vs the rendered DuckDB SQL:
    stepwise semantics — the phone digits inside an already-redacted email
    must not double-count."""
    import duckdb
    import pandas as pd

    from neo4j_tkapi_ray.ops.pii import pii_type_counts, pii_type_counts_sql

    rows = [
        {"doc_id": 0, "text": "mail me at bob12345678@ex.com ok"},  # email only
        {"doc_id": 1, "text": "ip 10.0.0.1 and ip 10.0.0.2"},       # 2 ip hits
        {"doc_id": 2, "text": "call +31 6 1234 5678 now"},          # phone
        {"doc_id": 3, "text": "word soup only"},
    ]
    pd.DataFrame(rows).to_parquet(tmp_path / "documents.parquet")
    ours = (pii_type_counts(str(tmp_path)).to_pandas()
            .set_index("pii_type").sort_index())
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"read_parquet('{tmp_path}/documents.parquet')")
    theirs = (con.execute(pii_type_counts_sql()).df()
              .set_index("pii_type").sort_index())
    assert ours.equals(theirs.astype(ours.dtypes.to_dict())), (ours, theirs)
    assert ours.loc["EMAIL", "n_docs"] == 1
    assert ours.loc["IP"].tolist() == [1, 2]
    # doc 0's in-address digit run was consumed by <EMAIL>: phone counts
    # only doc 2
    assert ours.loc["PHONE", "n_docs"] == 1
