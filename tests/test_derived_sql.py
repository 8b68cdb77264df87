"""The derivational mention/analysis oracles must reproduce the ground-truth
expected tables EXACTLY (full multiset, all columns): the ranked join design
means any structural divergence between the SQL parse of the raw pages and
the single-process oracle run drops or mutates rows."""

import duckdb
import pandas as pd

import __ray_entry__ as entrymod
from neo4j_tkapi_ray.derived_sql import analysis_sql, mentions_sql

SF_DIR = "/root/testdata/sf0.001"


def _multiset(df: pd.DataFrame) -> pd.DataFrame:
    cols = sorted(df.columns)
    return df[cols].sort_values(cols).reset_index(drop=True)


def _check(sql: str, expected_parquet: str) -> None:
    con = duckdb.connect()
    got = con.execute(sql).df()
    exp = con.execute(
        f"SELECT * FROM read_parquet('{expected_parquet}')").df()
    assert len(got) == len(exp)
    pd.testing.assert_frame_equal(_multiset(got), _multiset(exp))


def test_mentions_sql_equals_ground_truth():
    cd = entrymod._corpus_dir(SF_DIR)
    entrymod._kg_corpus(SF_DIR)  # ensure corpus + expected tables exist
    _check(mentions_sql(cd), f"{cd}/expected_mentions.parquet")


def test_analysis_sql_equals_ground_truth():
    cd = entrymod._corpus_dir(SF_DIR)
    entrymod._kg_corpus(SF_DIR)
    _check(analysis_sql(cd), f"{cd}/expected_analysis.parquet")
