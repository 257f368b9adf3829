"""Modern Spark 4 SQL surface: recursive CTEs and the VARIANT type.

Two capabilities that arrived with Spark 4 round out the SQL front-end
(SURVEY §2.4 "subqueries / SQL interface"):

- ``WITH RECURSIVE`` — the hierarchical-query shape (org charts, BOM
  explosions, graph reachability). Exercised as a binary-heap ancestor
  walk seeded from real order keys: each step halves the key, so the
  recursion is provably acyclic with depth ⌈log2(max key)⌉ and the
  intermediate result is LINEAR in seeds × depth — the safe shape to
  recurse at scale (unbounded cyclic reachability belongs to the
  iterative operator, ``operators/graph.py``, which caps rounds and
  materializes per round).
- ``VARIANT`` — semi-structured JSON parsed once into Spark's binary
  variant encoding, then typed-path extraction (``variant_get``). Unlike
  ``get_json_object`` (string re-parse per access), variant parses once
  per row and extracts at binary speed; the oracle is DuckDB's JSON
  extraction producing the same typed values.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .catalog import t
from .registry import register


@register(
    "sql_recursive_ancestors",
    oracle="""
    WITH RECURSIVE anc(root, node, depth) AS (
      SELECT o_orderkey, o_orderkey, 0 FROM orders WHERE o_orderkey <= 200
      UNION ALL
      SELECT root, node // 2, depth + 1 FROM anc WHERE node // 2 >= 1
    )
    SELECT a.root,
           CAST(MAX(a.depth) AS BIGINT) AS chain_len,
           CAST(SUM(a.node) AS BIGINT) AS key_path_sum,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_real_ancestors
    FROM anc a LEFT JOIN orders o
      ON o.o_orderkey = a.node AND a.depth > 0
    GROUP BY a.root
    """,
)
def sql_recursive_ancestors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical recursion in pure SQL: walk each seed order key up its
    binary-heap ancestor chain (node -> node div 2) to the root, then
    aggregate the chain and count which ancestors are themselves real
    orders. Acyclic by construction (the key strictly halves), depth
    bounded at log2(max key) — recursion whose intermediate size is known
    in advance, which is the only recursion worth running on 100 TB.
    """
    t(spark, sf_dir, "orders").createOrReplaceTempView("orders_rec_v")
    return spark.sql("""
      WITH RECURSIVE anc(root, node, depth) AS (
        SELECT o_orderkey, o_orderkey, 0 FROM orders_rec_v WHERE o_orderkey <= 200
        UNION ALL
        SELECT root, node DIV 2, depth + 1 FROM anc WHERE node DIV 2 >= 1
      )
      SELECT a.root,
             CAST(MAX(a.depth) AS BIGINT) AS chain_len,
             CAST(SUM(a.node) AS BIGINT) AS key_path_sum,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_real_ancestors
      FROM anc a LEFT JOIN orders_rec_v o
        ON o.o_orderkey = a.node AND a.depth > 0
      GROUP BY a.root
    """)


@register(
    "scalar_variant_json",
    oracle="""
    SELECT event_id,
           CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_typed,
           CAST(json_extract_string(props, '$.absent') AS INTEGER) AS missing_is_null,
           CAST(CAST(json_extract_string(props, '$.k') AS INTEGER) % 10 AS INTEGER)
             AS k_bucket
    FROM events
    WHERE event_id < 2000
    """,
)
def scalar_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VARIANT-typed JSON access: ``props`` parses ONCE into the binary
    variant encoding, then every path access is a typed binary extraction
    — the 100 TB answer to repeated ``get_json_object`` string re-parsing.
    A missing path extracts to NULL (not an error), matching JSON-lake
    semantics.
    """
    t(spark, sf_dir, "events").createOrReplaceTempView("events_var_v")
    return spark.sql("""
      SELECT event_id,
             variant_get(v, '$.k', 'int') AS k_typed,
             variant_get(v, '$.absent', 'int') AS missing_is_null,
             CAST(variant_get(v, '$.k', 'int') % 10 AS INT) AS k_bucket
      FROM (SELECT event_id, parse_json(props) AS v
            FROM events_var_v WHERE event_id < 2000)
    """)
