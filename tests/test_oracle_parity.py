"""Local replica of the driver's correctness gate: run each
__spark_entry__ query in Spark and its oracle SQL in DuckDB on the
same parquet tables; compare row multisets order-insensitively."""

import os

import duckdb
import pandas as pd
import pytest

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _duck(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con.execute(sql).fetchdf()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object or str(df[c].dtype) == "string":
            df[c] = df[c].astype("string")
    df = df.sort_values(by=list(df.columns),
                        na_position="first").reset_index(drop=True)
    return df


def _compare(spark, sf_dir, name):
    import __spark_entry__ as entry_mod
    q = entry_mod.queries()[name]
    sql = entry_mod.oracle_sql()[name]
    got = _normalize(q(spark, sf_dir).toPandas())
    want = _normalize(_duck(sf_dir, sql))
    assert list(got.columns) == list(want.columns), \
        f"{name}: columns {list(got.columns)} != {list(want.columns)}"
    assert len(got) == len(want), \
        f"{name}: rows {len(got)} != {len(want)}"
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)


def _all_query_names():
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __spark_entry__ as entry_mod
    return sorted(entry_mod.queries())


def test_every_query_has_an_oracle():
    """The driver records a weaker rows-only check for oracle-less
    queries; keep the contract fully oracled."""
    import __spark_entry__ as entry_mod
    assert set(entry_mod.queries()) == set(entry_mod.oracle_sql())


@pytest.mark.parametrize("name", _all_query_names())
def test_query_matches_oracle(spark, sf_dir, name):
    _compare(spark, sf_dir, name)


def test_entry_smoke(spark):
    import __spark_entry__ as entry_mod
    df = entry_mod.entry(spark)
    assert df.count() > 0
