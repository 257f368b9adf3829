"""Vector/embedding operator surface beyond similarity search.

Determinism notes: per-dimension statistics go through integer micro-units
(round(x * 1e6)) so distributed sums are exact and order-independent; row-
local folds (norms) are sequential and identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import t
from .registry import register


@register(
    "vector_label_centroids",
    oracle="""
    SELECT label, (i - 1) AS dim,
           CAST(SUM(CAST(ROUND(CAST(embedding[i] AS DOUBLE) * 1000000, 0) AS BIGINT))
                AS DOUBLE) / COUNT(*) AS centroid_micro
    FROM embeddings, UNNEST(generate_series(1, 8)) AS t(i)
    GROUP BY label, i
    """,
)
def vector_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid of the first 8 dimensions.

    posexplode -> (label, dim) aggregation: the distributed shape for vector
    statistics (one shuffle keyed by (label, dim), exact integer sums). The
    array-shaped result is a groupBy(label).agg(sort+collect) away; kept
    row-granular here for exact comparison.
    """
    e = t(spark, sf_dir, "embeddings")
    exploded = e.select(
        "label",
        F.posexplode(F.slice(F.col("embedding").cast("array<double>"), 1, 8)).alias(
            "dim", "x"
        ),
    )
    micro = F.round(F.col("x") * 1000000, 0).cast("bigint")
    return exploded.groupBy("label", "dim").agg(
        (F.sum(micro).cast("double") / F.count("*")).alias("centroid_micro")
    )


@register(
    "vector_normalize",
    oracle="""
    SELECT vec_id,
           ROUND(CAST(embedding[1] AS DOUBLE) /
                 sqrt(list_sum(list_transform(generate_series(1, LEN(embedding)),
                      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))),
                 6) AS unit_first,
           ROUND(sqrt(list_sum(list_transform(generate_series(1, LEN(embedding)),
                      i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)))),
                 6) AS l2_norm
    FROM embeddings WHERE vec_id < 200
    """,
)
def vector_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """L2 normalization (first unit component + norm shown; the full unit
    vector is the same transform applied per element). Row-local sequential
    fold — identical IEEE sequence in both engines."""
    e = t(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
    norm2 = (
        "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), "
        "CAST(embedding AS ARRAY<DOUBLE>), (x, y) -> x * y), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )
    return e.select(
        "vec_id",
        F.round(
            F.element_at(F.col("embedding").cast("array<double>"), 1)
            / F.sqrt(F.expr(norm2)),
            6,
        ).alias("unit_first"),
        F.round(F.sqrt(F.expr(norm2)), 6).alias("l2_norm"),
    )


@register(
    "window_percent_rank_cume",
    oracle="""
    SELECT c_custkey,
           PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey) AS pct_rank,
           CUME_DIST()    OVER (ORDER BY c_acctbal, c_custkey) AS cume
    FROM customer WHERE c_custkey <= 600
    """,
)
def window_percent_rank_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank / cume_dist (rank arithmetic on a full deterministic key
    — the resulting divisions are of identical integers, hence identical
    doubles)."""
    from pyspark.sql import Window

    w = Window.orderBy("c_acctbal", "c_custkey")
    return (
        t(spark, sf_dir, "customer")
        .filter(F.col("c_custkey") <= 600)
        .select(
            "c_custkey",
            F.percent_rank().over(w).alias("pct_rank"),
            F.cume_dist().over(w).alias("cume"),
        )
    )


@register(
    "text_tokens_bpe_ish",
    oracle="""
    SELECT doc_id,
           LEN(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS n_bpe_tokens,
           LEN(string_split(text, ' ')) AS n_ws_tokens
    FROM documents
    """,
)
def text_tokens_bpe_ish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting two ways: whitespace and a BPE-ish lexer regex
    (letter runs | digit runs | single other-symbols) — the standard cheap
    proxy for tokenizer-based length filtering in pretraining pipelines."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(F.lower(F.col("text")), F.lit("[a-z]+|[0-9]+|[^a-z0-9 ]"), 0)
        ).alias("n_bpe_tokens"),
        F.size(F.split("text", " ", -1)).alias("n_ws_tokens"),
    )


@register(
    "array_set_ops",
    oracle="""
    SELECT doc_id,
           list_sort(list_distinct(string_split(lower(text), ' ')))[1:5] AS first_tokens,
           LEN(list_distinct(string_split(lower(text), ' '))) AS n_distinct_tokens,
           list_contains(string_split(lower(text), ' '), 'data') AS mentions_data
    FROM documents WHERE doc_id < 200
    """,
)
def array_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array set operations: distinct, sort, slice, membership."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    toks = F.split(F.lower(F.col("text")), " ", -1)
    return d.select(
        "doc_id",
        F.slice(F.sort_array(F.array_distinct(toks)), 1, 5).alias("first_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
        F.array_contains(toks, "data").alias("mentions_data"),
    )
