"""Registry-wide oracle result-TYPE gate.

The driver's correctness harness surfaces both engines' results through
pandas and hashes stringified values, so dtype drift that Python-level
value comparison forgives is a driver failure:

- DuckDB HUGEINT (e.g. SUM over INTEGER) -> pandas float64 -> "3549.0",
  while Spark bigint -> int64 -> "3549".  Identical values, red row.
  This killed ``mix_waterfill_allocation`` in round 6 and was latent in
  three more oracles (q12, both PQ searches).
- More generally, an oracle column whose DuckDB type family (integral vs
  floating/decimal) differs from the Spark column's family stringifies
  differently ("3" vs "3.0").

This module asserts, for every registered oracle, that no result column
is HUGEINT-family and that each column's DuckDB type family matches the
Spark schema family.  It needs no Spark session and no query execution:
DuckDB can type a relation lazily, and the Spark families are pinned by
the family check inside tests/test_oracle_parity.py (which has the live
DataFrame).  Here we ban the families that pandas CANNOT round-trip
losslessly regardless of what Spark returns.
"""

from __future__ import annotations

import duckdb
import pytest

from eth_event_stream_spark.plans import QUERIES
from eth_event_stream_spark.plans.catalog import TABLES

# DuckDB types that pandas widens to float64 (HUGEINT family) or uint64:
# any oracle column of these types will hash-mismatch an integral Spark
# column on the driver even when every value is identical.
BANNED_DUCK_TYPES = {"HUGEINT", "UHUGEINT", "UBIGINT"}


def _duck(sf_dir: str):
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{name}.parquet')"
        )
    return con


ORACLE_QUERIES = sorted(n for n, q in QUERIES.items() if q.oracle is not None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_has_no_hugeint_columns(sf_dir, name):
    con = _duck(sf_dir)
    rel = con.sql(QUERIES[name].oracle)
    bad = [
        (c, str(t))
        for c, t in zip(rel.columns, rel.types)
        if str(t) in BANNED_DUCK_TYPES
    ]
    assert not bad, (
        f"{name}: oracle columns {bad} are HUGEINT-family — pandas widens "
        f"them to float64 and the driver hash mismatches Spark's int64 "
        f"even on identical values; wrap in CAST(... AS BIGINT)"
    )
