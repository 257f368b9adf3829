"""Data contracts: declarative row-level expectations with quarantine.

The ingest-acceptance layer a production pipeline runs between "the data
arrived" and "the data is queryable" (the reference fails hard on protocol
violations — removed logs, out-of-order blocks; `sources/block_source.py`
mirrors those. This module is the CONTENT-level analog for the tables the
driver grades): each expectation is a named boolean SQL condition, and one
pass over the batch yields

- per-expectation violation counts (the audit row a dashboard tracks),
- a clean/quarantine row split (violating rows carry the list of failed
  expectation names, so triage never re-runs the checks).

NULL semantics: a row for which an expectation evaluates to UNKNOWN is a
VIOLATION (``NOT COALESCE(cond, FALSE)``). SQL's CHECK constraints pass on
UNKNOWN — the famous null loophole — but an ingest contract exists to
catch exactly the rows nobody reasoned about, so unknown fails closed.

Everything is a Catalyst column expression — counts come from one
partial-aggregating scan (`SUM(CASE)`), the split from one `filter` each
side, and the same stage runs unchanged under readStream (stateless), so
contracts hold at ingest time, not just in nightly audits.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import t
from .registry import register

# name -> SQL boolean the row must satisfy (shared by Spark and the oracle)
EVENT_CONTRACT: dict[str, str] = {
    "value_non_negative": "value >= 0",
    "known_event_type": "event_type IN ('click','view','purchase','signup','error')",
    "ts_in_range": "ts >= TIMESTAMP '2024-01-01 00:00:00' AND ts < TIMESTAMP '2024-02-01 00:00:00'",
    "user_id_present": "user_id IS NOT NULL AND user_id >= 0",
    "value_sane_magnitude": "value < 1000",
}


def contract_metrics(df: DataFrame, contract: dict[str, str]) -> DataFrame:
    """One-scan audit: rows checked, and per-expectation violation counts,
    as a long-form (expectation, n_rows, n_violations, violation_ppm) frame.
    All counts ride one partial-combining aggregate — adding expectations
    adds columns to the agg, never passes over the data."""
    agg = [F.count("*").alias("n_rows")] + [
        F.sum(
            F.when(~F.coalesce(F.expr(cond), F.lit(False)), 1).otherwise(0)
        ).alias(name)
        for name, cond in contract.items()
    ]
    wide = df.agg(*agg)
    names = list(contract)
    stack = ", ".join(f"'{n}', {n}" for n in names)
    return wide.selectExpr(
        "n_rows", f"stack({len(names)}, {stack}) AS (expectation, n_violations)"
    ).select(
        "expectation",
        "n_rows",
        "n_violations",
        F.expr("(n_violations * 1000000) div n_rows").alias("violation_ppm"),
    )


def contract_split(df: DataFrame, contract: dict[str, str]) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): quarantine rows carry ``failed`` — the array of
    violated expectation names — so triage reads the verdicts instead of
    re-deriving them. Pure row-local projection + filter: streams as-is."""
    failed = F.array_compact(
        F.array(
            *[
                F.when(~F.coalesce(F.expr(cond), F.lit(False)), F.lit(name))
                for name, cond in contract.items()
            ]
        )
    )
    tagged = df.withColumn("failed", failed)
    clean = tagged.filter(F.size("failed") == 0).drop("failed")
    quarantine = tagged.filter(F.size("failed") > 0)
    return clean, quarantine


def _sql_contract_metrics() -> str:
    rows = []
    for name, cond in EVENT_CONTRACT.items():
        rows.append(f"""
    SELECT '{name}' AS expectation,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN NOT COALESCE({cond}, FALSE) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_violations,
           CAST(SUM(CASE WHEN NOT COALESCE({cond}, FALSE) THEN 1 ELSE 0 END)
                * 1000000 // COUNT(*) AS BIGINT) AS violation_ppm
    FROM events""")
    return " UNION ALL ".join(rows)


@register(
    "contract_events_audit",
    oracle=_sql_contract_metrics(),
    doc="Declarative data-contract audit: per-expectation violation counts.",
)
def contract_events_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EVENT_CONTRACT audit over ``events``: five expectations, one
    scan, integer ppm rates (so the oracle hashes the rates, not just the
    counts). The per-column UNION in the oracle rescans a tiny view; the
    Spark plan is the single-pass form a 100 TB audit needs."""
    return contract_metrics(t(spark, sf_dir, "events"), EVENT_CONTRACT)


__all__ = [
    "EVENT_CONTRACT",
    "contract_metrics",
    "contract_split",
    "contract_events_audit",
]
