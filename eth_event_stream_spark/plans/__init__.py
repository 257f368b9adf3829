"""Query-plan layer: the engine's queryable surface.

Every query is registered once with (name, DataFrame builder, optional DuckDB
oracle SQL). The driver contract (``__spark_entry__.py``) simply re-exports the
registry. Modules:

- ``relational``  — stock relational surface (SURVEY §7.3 phase 5): joins,
  aggregations, windows, sorts, set ops, scalar functions, subqueries.
- ``eventflow``   — the reference's event-stream semantics over the driver's
  ``events`` table: flagship netflow, block-aligned sync/flush, time windows,
  sessionization, as-of.
- ``pipeline``    — large-scale training-data ops: dedup (exact/MinHash-LSH/
  SimHash/Jaccard), similarity search, text analysis.
"""

from . import (  # noqa: F401  (registration side effects)
    assembly,
    contracts,
    curation,
    eventflow,
    incremental,
    layout,
    ledger,
    lm,
    matview,
    modern,
    pipeline,
    profiling,
    relational,
    relational2,
    relational3,
    relational4,
    relational5,
    relational6,
    retrieval,
    vectors,
    warehouse,
    web,
)
from .registry import QUERIES, oracle_sql_dict, queries_dict

__all__ = ["QUERIES", "queries_dict", "oracle_sql_dict"]
