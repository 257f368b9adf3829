"""Sinks: partitioned, idempotently re-writable parquet output.

The reference's sink contract (sink.rs:13-21) is exactly-once delivery of
per-block batches. In Spark the equivalent for batch/files is dynamic
partition overwrite: re-running a block range replaces exactly that range's
partitions — idempotent re-ingest (B4) at the storage layer. Partition by
a derived block bucket, not raw block (1 dir per block = small-files death
at 100 TB; ~1000-block buckets keep partitions in the 100 MB–1 GB sweet
spot and prune range queries).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def bucket_aligned_range(lo: int, hi: int, bucket_blocks: int) -> tuple[int, int]:
    """Smallest bucket-aligned [lo', hi') covering [lo, hi) — re-ingest MUST
    use aligned ranges or the partial buckets at the edges are truncated by
    the overwrite (the same contract as the reference's panic on data from an
    already-published block, sink.rs:13-21)."""
    lo_a = (lo // bucket_blocks) * bucket_blocks
    hi_a = ((hi + bucket_blocks - 1) // bucket_blocks) * bucket_blocks
    return lo_a, hi_a


def write_block_partitioned(
    df: DataFrame,
    path: str,
    block_col: str = "block_number",
    bucket_blocks: int = 1000,
    mode: str = "overwrite",
    expect_range: tuple[int, int] | None = None,
) -> None:
    """Write with block-bucket partitioning and dynamic partition overwrite.

    Re-running a bounded range is exactly-once at file granularity: only the
    buckets present in ``df`` are replaced. Pass ``expect_range=(lo, hi)``
    (the range you believe ``df`` covers, hi exclusive) to fail fast when it
    is not bucket-aligned — an unaligned overwrite silently truncates the
    edge buckets.
    """
    if expect_range is not None:
        lo, hi = expect_range
        if (lo % bucket_blocks) or (hi % bucket_blocks):
            raise ValueError(
                f"re-ingest range [{lo}, {hi}) is not aligned to "
                f"bucket_blocks={bucket_blocks}; use bucket_aligned_range()"
            )
    spark = df.sparkSession
    prev = spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        out = df.withColumn(
            "block_bucket",
            (F.col(block_col) / bucket_blocks).cast("long") * bucket_blocks,
        )
        (
            out.repartition("block_bucket")  # one writer set per bucket
            .write.partitionBy("block_bucket")
            .mode(mode)
            .parquet(path)
        )
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", prev)


def read_block_partitioned(
    spark,
    path: str,
    block_range: tuple[int, int] | None = None,
    bucket_blocks: int = 1000,
) -> DataFrame:
    """Read back; ``block_range=(lo, hi)`` (hi exclusive) adds BOTH the exact
    row predicate and the derived ``block_bucket`` partition predicate —
    Spark prunes whole bucket directories only from predicates on the
    partition column itself, so the translation must happen here."""
    df = spark.read.parquet(path)
    if block_range is not None:
        lo, hi = block_range
        b_lo = (lo // bucket_blocks) * bucket_blocks
        df = df.filter(
            (F.col("block_bucket") >= b_lo)
            & (F.col("block_bucket") < hi)
            & (F.col("block_number") >= lo)
            & (F.col("block_number") < hi)
        )
    return df
