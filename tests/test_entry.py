"""Driver-contract smoke tests for __spark_entry__."""

import sys

sys.path.insert(0, "/root/repo")

import __spark_entry__ as E


def test_entry_returns_rows(spark):
    df = E.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_query_runs_at_smallest_sf(spark, sf_dir):
    # cheap structural check: every oracle key has a query impl
    qs = E.queries()
    for name in E.oracle_sql():
        assert name in qs, f"oracle without query: {name}"


def test_queries_have_unique_column_names(spark, sf_dir):
    # driver sorts columns by name before hashing — duplicates would break it
    for name, fn in E.queries().items():
        df = fn(spark, sf_dir)
        assert len(df.columns) == len(set(df.columns)), name
