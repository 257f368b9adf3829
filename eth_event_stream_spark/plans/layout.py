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


# ---------------------------------------------------------------------------
# Release integrity manifest
# ---------------------------------------------------------------------------

MANIFEST_NAME = "_MANIFEST.json"


class ReleaseIntegrityError(RuntimeError):
    """A release's files do not match its manifest — name the damage loudly
    (the reference's fail-fast discipline: a reorged block panics rather
    than silently serving different bytes, `sink.rs:13-21`)."""


def _rel_file_expr(path_col, data_dir: str):
    """Shard key = path RELATIVE to ``data_dir`` (e.g. ``cell=3/part-0.parquet``),
    never the basename: on a partitioned or nested release layout, same-named
    part files in different subdirectories would otherwise silently collide in
    the manifest's ``files`` dict (last one wins) and a corrupted or missing
    shard could verify clean.

    Local-filesystem releases only (the same constraint as
    ``compact_parquet_dir``: the manifest itself is read/written with plain
    ``open()``).  Spark reports file paths in URI form
    (``file:/...``, percent-encoded), so the strip prefix matches BOTH the
    raw absolute path and its percent-encoded URI spelling — a release dir
    containing spaces or ``%`` still relativizes.  ``_manifest_key`` below
    fails loudly on any path this did not strip (e.g. an ``s3a://`` release)
    instead of letting full-URI keys slip into a manifest."""
    import os
    import re
    from urllib.parse import quote

    raw = os.path.abspath(data_dir).rstrip("/")
    alts = sorted({re.escape(raw), re.escape(quote(raw, safe="/"))})
    return F.regexp_replace(path_col, "^.*?(?:" + "|".join(alts) + ")/", "")


def _manifest_key(stripped: str) -> str:
    """Driver-side finish of ``_rel_file_expr``: refuse keys that were not
    actually relativized, and percent-decode the URI spelling Spark reports
    so manifest keys are the real on-disk relative paths."""
    from urllib.parse import unquote

    if ":/" in stripped:
        raise ReleaseIntegrityError(
            f"file path {stripped!r} was not relativized against the release "
            "dir — the manifest layer supports local-filesystem releases only"
        )
    return unquote(stripped)


def _byte_fingerprints(spark: SparkSession, data_dir: str) -> dict:
    """relative-path -> {n_bytes, md5} from ONE recursive ``binaryFile``
    scan — content md5 in the JVM, no driver reads, and robust to ARBITRARY
    corruption (the bytes are never parsed as parquet, so a truncated/garbled
    shard still gets a checksum instead of crashing the verifier)."""
    import os

    # files may have changed since Spark last listed this path (that is the
    # point of verifying) — drop the cached listing or reads see stale sizes
    spark.catalog.refreshByPath(data_dir)
    bin_df = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.parquet")
        .option("recursiveFileLookup", "true")
        .load(data_dir)
        .select(
            _rel_file_expr(F.col("path"), data_dir).alias("file"),
            F.col("length").alias("n_bytes"),
            F.md5("content").alias("md5"),
        )
    )
    return {
        _manifest_key(r["file"]): {"n_bytes": r["n_bytes"], "md5": r["md5"]}
        for r in bin_df.collect()
    }


def _row_counts(spark: SparkSession, data_dir: str) -> dict:
    """relative-path -> row count from one recursive parquet scan grouped
    by ``input_file_name()`` — only safe on a release whose bytes already
    verified (a corrupt footer would fail this scan). ``recursiveFileLookup``
    matches the byte pass's file set on nested layouts (it disables
    partition-column inference, which is irrelevant for counting rows)."""
    counts = (
        spark.read.option("recursiveFileLookup", "true")
        .parquet(data_dir)
        .groupBy(_rel_file_expr(F.input_file_name(), data_dir).alias("file"))
        .count()
    )
    return {_manifest_key(r["file"]): r["count"] for r in counts.collect()}


def _release_fingerprints(spark: SparkSession, data_dir: str) -> dict:
    """(file -> {n_bytes, md5, n_rows}) for a parquet dir — two distributed
    jobs total regardless of file count."""
    fps = _byte_fingerprints(spark, data_dir)
    for f, n in _row_counts(spark, data_dir).items():
        fps[f]["n_rows"] = n
    for v in fps.values():
        v.setdefault("n_rows", 0)  # zero-row files never appear in the scan
    return fps


def write_manifest(spark: SparkSession, data_dir: str) -> dict:
    """Publish the integrity manifest a dataset release ships with: one
    JSON file beside the data carrying every shard's byte size, content
    md5, and row count, plus the release totals. Both fingerprint passes
    are distributed (see ``_release_fingerprints``); the manifest itself
    is bounded driver metadata (one small dict per file)."""
    import json
    import os

    fps = _release_fingerprints(spark, data_dir)
    manifest = {
        "files": fps,
        "n_files": len(fps),
        "total_bytes": sum(v["n_bytes"] for v in fps.values()),
        "total_rows": sum(v["n_rows"] for v in fps.values()),
    }
    # tmp + rename: a crash mid-write must never leave a TORN manifest at
    # the final name — consumers would fail on unparseable JSON instead of
    # the honest "no manifest yet" refusal, and a torn-but-parseable
    # prefix could in principle verify a partial release clean. Same
    # publish discipline as the warehouse pointer swap (sink.rs:13-21).
    final = os.path.join(data_dir, MANIFEST_NAME)
    tmp = final + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f, sort_keys=True)
    os.replace(tmp, final)
    return manifest


def verify_release(spark: SparkSession, data_dir: str) -> dict:
    """Recompute the release fingerprints and compare against the shipped
    manifest — raising ``ReleaseIntegrityError`` that NAMES every missing,
    extra, or corrupted file. The check a consumer runs before training on
    a copied/mirrored release; cost is one binaryFile pass + one counting
    scan, both distributed."""
    import json
    import os

    path = os.path.join(data_dir, MANIFEST_NAME)
    if not os.path.exists(path):
        raise ReleaseIntegrityError(f"no {MANIFEST_NAME} at {data_dir}")
    with open(path) as f:
        try:
            manifest = json.load(f)
        except ValueError as exc:
            # a torn manifest (non-atomic mirror copy, partial download)
            # must refuse with the TYPED integrity error, never verify
            # clean and never surface as a bare JSON parse error
            raise ReleaseIntegrityError(
                f"manifest at {path} is torn/unparseable: {exc}"
            ) from exc
    want = manifest["files"]
    # pass 1: bytes only — robust even when a shard is unreadable parquet
    got = _byte_fingerprints(spark, data_dir)
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    corrupted = sorted(
        f
        for f in set(want) & set(got)
        if (want[f]["n_bytes"], want[f]["md5"])
        != (got[f]["n_bytes"], got[f]["md5"])
    )
    if missing or extra or corrupted:
        raise ReleaseIntegrityError(
            f"release at {data_dir} does not match its manifest — "
            f"missing: {missing}, extra: {extra}, corrupted: {corrupted}"
        )
    # pass 2: only on byte-verified releases — row counts must agree too
    # (catches a manifest written against different data)
    wrong_rows = sorted(
        f
        for f, n in _row_counts(spark, data_dir).items()
        if want[f]["n_rows"] != n
    )
    if wrong_rows:
        raise ReleaseIntegrityError(
            f"release at {data_dir}: row counts diverge from the manifest "
            f"in {wrong_rows}"
        )
    return manifest
