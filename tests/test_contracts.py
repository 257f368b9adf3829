"""Data contracts (plans/contracts.py): split semantics, audit consistency,
and the stateless streaming twin."""

from __future__ import annotations

from pyspark.sql import functions as F

from eth_event_stream_spark.plans.contracts import (
    EVENT_CONTRACT,
    contract_metrics,
    contract_split,
)


def test_contract_split_semantics(spark):
    contract = {
        "positive": "x > 0",
        "small": "x < 100",
        "named": "name IS NOT NULL",
    }
    df = spark.createDataFrame(
        [(5, "a"), (-1, "b"), (500, None), (50, None)], ["x", "name"]
    )
    clean, quarantine = contract_split(df, contract)
    assert sorted(tuple(r) for r in clean.collect()) == [(5, "a")]
    got = {
        (r.x, tuple(sorted(r.failed))) for r in quarantine.collect()
    }
    assert got == {
        (-1, ("positive",)),
        (500, ("named", "small")),
        (50, ("named",)),
    }
    # the split partitions the input
    assert clean.count() + quarantine.count() == df.count()


def test_null_fails_closed(spark):
    """SQL CHECK's null loophole is closed: a row whose expectation
    evaluates to UNKNOWN is a violation in both the audit and the split."""
    contract = {"positive": "x > 0"}
    df = spark.createDataFrame([(5,), (None,)], "x int")
    audit = contract_metrics(df, contract).collect()[0]
    assert audit.n_violations == 1 and audit.violation_ppm == 500000
    clean, quarantine = contract_split(df, contract)
    assert [r.x for r in clean.collect()] == [5]
    q = quarantine.collect()
    assert len(q) == 1 and q[0].x is None and q[0].failed == ["positive"]


def test_audit_counts_match_quarantine_tags(spark, sf_dir):
    """The one-scan audit and the row-split must tell the same story:
    per-expectation violation counts equal the exploded quarantine tags."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    audit = {
        r.expectation: r.n_violations
        for r in contract_metrics(events, EVENT_CONTRACT).collect()
    }
    _, quarantine = contract_split(events, EVENT_CONTRACT)
    tagged = {
        r.expectation: r["count"]
        for r in quarantine.select(
            F.explode("failed").alias("expectation")
        ).groupBy("expectation").count().collect()
    }
    assert set(audit) == set(EVENT_CONTRACT)
    for name, n in audit.items():
        assert tagged.get(name, 0) == n, name


def test_contract_split_streams_as_is(spark, sf_dir, tmp_path):
    """The split is a pure row-local stage: streamed file-by-file it emits
    exactly the batch quarantine set (append mode, no state)."""
    events = spark.read.parquet(f"{sf_dir}/events.parquet")
    # the driver's synthetic events satisfy the whole contract — inject
    # violations so the quarantine lane actually carries rows
    bad = spark.createDataFrame(
        [
            (10**9, "2025-06-01 00:00:00", -5, "teleport", -3.0, "{}"),
            (10**9 + 1, "2024-01-05 00:00:00", 7, "click", 5000.0, "{}"),
        ],
        "event_id long, ts string, user_id long, event_type string, value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp")).select(*events.columns)
    src = tmp_path / "events_stream"
    events.unionByName(bad).repartition(4).write.parquet(str(src))

    def quarantined(df):
        _, q = contract_split(df, EVENT_CONTRACT)
        return q.select("event_id", F.array_join(F.array_sort("failed"), ",").alias("why"))

    batch = {tuple(r) for r in quarantined(spark.read.parquet(str(src))).collect()}

    sdf = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        quarantined(sdf)
        .writeStream.format("memory")
        .queryName("contract_stream_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ck_contract"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = {tuple(r) for r in spark.table("contract_stream_sink").collect()}
    assert got == batch and len(batch) > 0
