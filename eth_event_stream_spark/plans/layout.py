"""Storage-layout operators: multi-dimensional clustering for data skipping.

At 100 TB, partition pruning on ONE column is free (directory pruning), but
queries filtering on a second dimension still scan every file of a matching
partition. Z-order clustering — sort by the bit-interleaving of two (or
more) key columns — keeps BOTH dimensions locally dense in every file, so
parquet min/max footer stats prune files for either predicate (the layout
behind Delta's OPTIMIZE ZORDER; plain open-source Spark gets the same
effect with ``repartitionByRange(zvalue)`` + sortWithinPartitions before a
write).

Everything here is pure integer bit arithmetic (shifts, masks, exact
bigint sums), so DuckDB replays it bit-identically and the driver hash
covers the curve math — not just row counts.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import t
from .registry import register

ZBITS = 16  # bits per dimension interleaved (32-bit z-values)


def zorder2(x: str, y: str) -> Column:
    """Bit-interleave two non-negative int columns (< 2^ZBITS) into one
    z-value: bit i of x lands at position 2i, bit i of y at 2i+1. A sort by
    this single BIGINT is the 2-D Morton curve order. JVM-side fold over a
    constant 16-element sequence — whole-stage-codegen friendly, no UDF.
    Disjoint bit positions make + and | identical; + is used so no
    operator-precedence difference can creep in between engines.

    PREREQUISITE the layout job must honor: normalize each dimension to
    the full 2^ZBITS range first (rank or range scaling — what Delta's
    OPTIMIZE ZORDER does by range-bucketing each column). If one column
    occupies far fewer bits than the other, its high bits are constant
    zero and the curve degenerates into a plain sort on the wider column
    — tests/test_scale_ops.py::test_zorder_write_enables_footer_pruning
    measured exactly that (zero skipping on the narrow dimension) before
    normalizing."""
    return F.expr(
        f"aggregate(sequence(0, {ZBITS - 1}), CAST(0 AS BIGINT), (acc, i) -> "
        f"acc + shiftleft(shiftright({x}, i) & 1, 2 * i) "
        f"+ shiftleft(shiftright({y}, i) & 1, 2 * i + 1))"
    )


def _sql_z(x: str, y: str) -> str:
    """The identical interleave in DuckDB SQL (same fold, same bit ops)."""
    return (
        f"list_sum(list_transform(generate_series(0, {ZBITS - 1}), i -> "
        f"((({x} >> i) & 1) << (2 * i)) + ((({y} >> i) & 1) << (2 * i + 1))))"
    )


# bucket = top bits of the z-value: 2^(2*ZBITS - ZBUCKET_SHIFT) buckets;
# within a bucket BOTH dimensions are confined to a small aligned square —
# the property the locality report below proves per bucket
ZBUCKET_SHIFT = 16


@register(
    "zorder_cluster_ranges",
    oracle=f"""
    WITH src AS (
      SELECT o_orderkey,
             CAST(o_custkey % 65536 AS BIGINT) AS x,
             CAST(datediff('day', DATE '1992-01-01', o_orderdate) % 65536
                  AS BIGINT) AS y
      FROM orders),
    z AS (SELECT o_orderkey, x, y,
                 CAST({_sql_z("x", "y")} AS BIGINT) AS zval
          FROM src)
    SELECT zval >> {ZBUCKET_SHIFT} AS zbucket,
           COUNT(*) AS n_rows,
           MIN(x) AS x_lo, MAX(x) AS x_hi,
           MIN(y) AS y_lo, MAX(y) AS y_hi,
           MAX(x) - MIN(x) AS x_span,
           MAX(y) - MIN(y) AS y_span
    FROM z GROUP BY zval >> {ZBUCKET_SHIFT}
    """,
)
def zorder_cluster_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order locality report: orders keyed by (customer, order-day), each
    row's z-value computed by bit interleaving, rows grouped into z-buckets
    (the files a clustered write would produce), and per-bucket min/max of
    BOTH dimensions — the exact numbers parquet footers would carry.

    The payoff this proves: every bucket's x_span and y_span are bounded by
    the z-curve's aligned-square property (< 2^(ZBUCKET_SHIFT/2) = 256 each), so a
    predicate on EITHER dimension prunes most buckets; a single-column sort
    gives tight spans on one dimension and full-range spans on the other.
    At 100 TB the same plan is the `repartitionByRange(zval) +
    sortWithinPartitions + write` layout job; this query is its
    verification report. Pure integer bit math — the oracle replays the
    curve exactly, so the driver hash checks the interleave itself."""
    src = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).cast("long").alias("x"),
        (F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")) % 65536)
        .cast("long")
        .alias("y"),
    )
    z = src.select("o_orderkey", "x", "y", zorder2("x", "y").alias("zval"))
    b = F.shiftright(F.col("zval"), ZBUCKET_SHIFT).alias("zbucket")
    return z.groupBy(b).agg(
        F.count("*").alias("n_rows"),
        F.min("x").alias("x_lo"),
        F.max("x").alias("x_hi"),
        F.min("y").alias("y_lo"),
        F.max("y").alias("y_hi"),
        (F.max("x") - F.min("x")).alias("x_span"),
        (F.max("y") - F.min("y")).alias("y_span"),
    )


SHUFFLE_EPOCH = "epoch7"


@register(
    "layout_training_shuffle",
    oracle=f"""
    WITH keyed AS (
      SELECT doc_id,
             md5('{SHUFFLE_EPOCH}:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
             substring(md5('{SHUFFLE_EPOCH}:' || CAST(doc_id AS VARCHAR)), 1, 2)
               AS shard
      FROM documents)
    SELECT doc_id, shuffle_key, shard,
           CAST(ROW_NUMBER() OVER (PARTITION BY shard
                                   ORDER BY shuffle_key, doc_id) AS BIGINT)
             AS pos_in_shard
    FROM keyed
    """,
)
def layout_training_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-seeded DETERMINISTIC global shuffle — the training-order
    layout step every LLM data pipeline runs before writing shards: each
    document gets shuffle_key = md5(epoch || doc_id), its shard is the
    key's first byte (256 shards), and its position within the shard is
    the key order. Because the shard IS the key prefix, reading shards in
    shard order and rows in pos order replays one exact global permutation
    — reproducible across runs and engines (md5 is the permutation), and a
    new epoch string is a fresh permutation with zero source data
    movement.

    100 TB shape: this is `repartitionByRange(shuffle_key) +
    sortWithinPartitions + bucketed write` — NO global sort and no
    SinglePartition window; the rank here is partitioned by shard (~1/256
    of the corpus each), which Spark runs as per-shard local sorts after
    one hash shuffle. The md5 keys are uniform, so shards are balanced to
    within sampling noise regardless of doc_id skew (unlike sharding on
    raw ids)."""
    d = t(spark, sf_dir, "documents")
    key = F.md5(F.concat(F.lit(f"{SHUFFLE_EPOCH}:"), F.col("doc_id").cast("string")))
    keyed = d.select(
        "doc_id",
        key.alias("shuffle_key"),
        F.substring(key, 1, 2).alias("shard"),
    )
    from pyspark.sql.window import Window

    w = Window.partitionBy("shard").orderBy("shuffle_key", "doc_id")
    return keyed.withColumn(
        "pos_in_shard", F.row_number().over(w).cast("bigint")
    )


def compact_parquet_dir(
    spark: SparkSession,
    src_dir: str,
    dst_dir: str,
    target_bytes: int = 128 * 1024 * 1024,
    sort_cols: list[str] | None = None,
) -> dict:
    """Small-file compaction: bin-pack a parquet directory into ~target-sized
    output files (the lakehouse OPTIMIZE step, table-format-free).

    At 100 TB the small-file problem is the silent killer: a million 1 MB
    files cost a million footer reads, a million scheduler tasks, and a
    listing that dominates the query. Compaction here is one declarative
    pass: size the output file count from the ACTUAL byte total
    (ceil(total/target)), then either ``repartition(n)`` (pure bin-pack) or
    ``repartitionByRange(n, sort_cols) + sortWithinPartitions`` — the latter
    preserves/establishes clustering, so every output file owns a disjoint
    key range and parquet min/max footers prune like before compaction
    (the Z-order write path composes the same way; `zorder_cluster_ranges`).

    Returns {"n_files_in", "bytes_in", "n_files_out", "target_bytes"} for
    audit. Local-FS listing here; on HDFS/S3 the same numbers come from the
    FileSystem / object-listing API.
    """
    import math
    import os

    files = [
        os.path.join(src_dir, f)
        for f in os.listdir(src_dir)
        if f.endswith(".parquet")
    ]
    bytes_in = sum(os.path.getsize(f) for f in files)
    n_out = max(1, math.ceil(bytes_in / target_bytes))

    df = spark.read.parquet(src_dir)
    if sort_cols:
        out = df.repartitionByRange(n_out, *sort_cols).sortWithinPartitions(
            *sort_cols
        )
    else:
        out = df.repartition(n_out)
    out.write.mode("overwrite").parquet(dst_dir)
    return {
        "n_files_in": len(files),
        "bytes_in": bytes_in,
        "n_files_out": n_out,
        "target_bytes": target_bytes,
    }
