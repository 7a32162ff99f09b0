"""Mimics the driver's correctness gate: every query in
``log_parser_project_spark.queries.QUERIES`` runs in Spark AND its
oracle SQL runs in DuckDB over the same parquet; row count, column
names, and order-insensitive values must match exactly.
"""

import math

import duckdb
import pytest

from log_parser_project_spark.contract import ordered_queries

QUERIES = ordered_queries()

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # kill -0.0 and float repr noise at the driver's hash precision
        return f"{v:.6f}"
    return str(v)


def _rows_multiset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.mark.parametrize("name", [n for n, (_, sql) in QUERIES.items() if sql])
def test_query_matches_duckdb(name, spark, duck, sf_dir):
    fn, sql = QUERIES[name]
    sdf = fn(spark, sf_dir)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(sql)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column names differ"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}"
    assert _rows_multiset(spark_cols, spark_rows) == _rows_multiset(duck_cols, duck_rows), (
        f"{name}: value mismatch"
    )
