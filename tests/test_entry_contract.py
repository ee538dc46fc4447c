"""Replicates the driver's correctness gate locally: run each queries()[name]
on Spark AND the matching oracle_sql()[name] on DuckDB over the same parquet
tables, compare row count, column names and (order-insensitively) values."""

import math
import os

import duckdb
import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def duck_con():
    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF_DIR}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in sorted(cols):
            v = row[c]
            if isinstance(v, float) and math.isnan(v):
                v = "NaN"  # exact fp equality otherwise — stricter than driver
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=repr)


@pytest.mark.parametrize("name", sorted(entry_mod.oracle_sql().keys()))
def test_query_matches_oracle(spark, name):
    q = entry_mod.queries()[name]
    sdf = q(spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [r.asDict() for r in sdf.collect()]

    con = duck_con()
    res = con.execute(entry_mod.oracle_sql()[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = [dict(zip(duck_cols, r)) for r in res.fetchall()]

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count mismatch"
    got, want = normalize(spark_rows, spark_cols), normalize(duck_rows, duck_cols)
    mism = [(g, w) for g, w in zip(got, want) if g != w][:5]
    assert got == want, f"{name}: value mismatch, first diffs: {mism}"


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.count() > 0
    assert len(df.schema.fields) > 0


def test_all_queries_have_callable(spark):
    qs = entry_mod.queries()
    assert set(entry_mod.oracle_sql().keys()) <= set(qs.keys())
