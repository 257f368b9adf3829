"""Replicates the driver's correctness gate locally: every registered query
runs on Spark AND its DuckDB oracle on the same parquet tables; results must
match on row count, column names, and (order-insensitively) values.

Run at sf0.001 by default (fast); set SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01
to mirror the driver's scale.
"""

from __future__ import annotations

import math

import duckdb
import pytest

from eth_event_stream_spark.plans import QUERIES
from eth_event_stream_spark.plans.catalog import TABLES


def _duck(sf_dir: str):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


def _norm(v):
    """Normalize a cell for cross-engine comparison."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if hasattr(v, "isoformat"):  # datetime/date
        return v.isoformat()
    if isinstance(v, bytes):
        return v.hex()
    from decimal import Decimal

    if isinstance(v, Decimal):
        return float(v)
    return v


def _rows_to_multiset(cols, rows):
    """Sort columns by name (driver behavior), then rows — a canonical form."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    canon = [tuple(_norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(canon, key=repr)


ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, sf_dir, name):
    q = QUERIES[name]
    sdf = q.fn(spark, sf_dir)
    spark_rows = sdf.collect()
    spark_cols = sdf.columns

    con = _duck(sf_dir)
    res = con.execute(q.oracle)
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    s_cols, s_rows = _rows_to_multiset(spark_cols, [tuple(r) for r in spark_rows])
    d_cols, d_rows = _rows_to_multiset(duck_cols, duck_rows)

    assert s_cols == d_cols, f"{name}: column mismatch {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), (
        f"{name}: row count {len(s_rows)} vs {len(d_rows)}"
    )
    mismatches = [
        (a, b) for a, b in zip(s_rows, d_rows) if a != b
    ]
    assert not mismatches, f"{name}: {len(mismatches)} differing rows; first: {mismatches[0]}"


def test_all_queries_have_unique_columns(spark, sf_dir):
    """Guard: duplicate column names break the driver's sort-by-name hash."""
    for name, q in QUERIES.items():
        cols = q.fn(spark, sf_dir).columns
        assert len(cols) == len(set(cols)), f"{name}: duplicate columns {cols}"
