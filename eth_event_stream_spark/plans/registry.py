"""Query registry shared by the engine and the driver contract.

A query is a named pair of (Spark DataFrame builder, DuckDB oracle SQL). The
oracle is ANSI SQL over the pre-registered views ``region nation customer
supplier part orders lineitem events documents embeddings``; queries whose
semantics are not SQL-expressible (approximate sketches, stateful streaming)
register ``oracle=None`` and get the driver's weaker rows-only check.

Numeric convention (driver hashes values order-insensitively, so results must
be bit-deterministic across engines):

- aggregates over DOUBLE columns go through ``DECIMAL(38,6)`` (exact, order-
  independent addition) and the *result* is cast back to DOUBLE — identical
  bits in Spark and DuckDB regardless of partial-aggregation order;
- averages are ``CAST(sum_decimal AS DOUBLE) / count`` — one IEEE division of
  identical operands;
- top-k always orders by a full deterministic key (ties broken by unique ids).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str = ""


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = ""):
    """Decorator: register a (spark, sf_dir) -> DataFrame query builder."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name: {name}")
        QUERIES[name] = Query(name=name, fn=fn, oracle=oracle, doc=doc or (fn.__doc__ or ""))
        return fn

    return deco


def queries_dict() -> dict[str, QueryFn]:
    return {q.name: q.fn for q in QUERIES.values()}


def oracle_sql_dict() -> dict[str, str]:
    return {q.name: q.oracle for q in QUERIES.values() if q.oracle is not None}
