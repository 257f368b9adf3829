"""Table catalog over the driver's parquet testdata.

``t(spark, sf_dir, name)`` is a plain parquet scan — filters and projections
written against it reach the scan via Catalyst (PushedFilters / ReadSchema),
which is the 100 TB story: partition pruning + column pruning are free as long
as plans stay declarative.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}")
    if name == "events":
        return _events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.parquet stores ts as TIMESTAMP(NANOS), which Spark's reader
    rejects; read it as long (legacy conf) and truncate to microseconds —
    the same nanos->micros truncation DuckDB applies on read.

    The legacy conf stays set for the session (deliberate): it must hold at
    EXECUTION time, not just planning, so a scoped set/restore would break
    collect(). Side effect: other TIMESTAMP(NANOS) parquet columns in this
    session also read as LongType instead of erroring."""
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    if isinstance(df.schema["ts"].dataType, T.LongType):
        # integer division: epoch-nanos exceed 2^53, double '/' loses micros
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def t_parallel(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan + small-input parallelism guard, for CPU-heavy map work
    (shingle explodes, per-row hashing, Arrow-batched Python) that runs
    BEFORE the first shuffle.

    Parquet scan parallelism == file splits; tiny testdata tables are ONE
    split, which serializes all pre-shuffle map work onto one core no matter
    the cluster size. When the scan yields fewer splits than cores,
    redistribute once (round-robin, row-count-balanced) so the expensive map
    fans out. At real scale the scan has >= cores splits and this branch
    never triggers — crucially we do NOT pay a corpus-wide shuffle at 100 TB
    just to help the local small-file case."""
    df = t(spark, sf_dir, name)
    cores = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < cores:
        return df.repartition(cores)
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register all tables as temp views (for spark.sql-style queries)."""
    for name in TABLES:
        t(spark, sf_dir, name).createOrReplaceTempView(name)
