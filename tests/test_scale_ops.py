"""Scale-path operators: skew joins equal their plain equivalents; the full
streaming pipeline (source -> decode -> windowed netflow) equals batch."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from eth_event_stream_spark.functions.decode import decode_event
from eth_event_stream_spark.operators.skew import salted_join, top_keys, two_path_join
from eth_event_stream_spark.operators.sync import netflow
from eth_event_stream_spark.sources.block_source import register as register_source
from eth_event_stream_spark.sources.fixtures import ADDR_A, TRANSFER_DECL


def _canon(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    plain = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
    salted = salted_join(orders, customer, "o_custkey", num_salts=5).select(
        "o_orderkey", "c_name"
    )
    assert _canon(plain) == _canon(salted)


def test_profile_guided_join_salts_hot_keys(spark):
    """profile_guided_join on a skewed fixture: the profiler flags the hot
    key, the join comes back salted (exploded build side in the physical
    plan), and the result equals the plain join exactly."""
    from eth_event_stream_spark.operators.skew import (
        key_skew_profile,
        profile_guided_join,
    )

    rows = [(f"u{i}", "hot") for i in range(900)] + [
        (f"u{i}", f"cold{i % 7}") for i in range(100)
    ]
    probe = spark.createDataFrame(rows, "uid string, k string")
    dim = spark.createDataFrame(
        [("hot", 1)] + [(f"cold{j}", 10 + j) for j in range(7)], "k string, attr int"
    )
    prof = {r["key"]: r for r in key_skew_profile(probe, "k", n_tasks=32).collect()}
    assert prof["hot"]["hot"] and prof["hot"]["recommended_salt"] > 1
    assert not prof["cold0"]["hot"]

    guided = profile_guided_join(probe, dim, "k", n_tasks=32)
    plain = probe.join(dim, "k")
    assert _canon(guided) == _canon(plain)
    p = guided._sc._jvm.PythonSQLUtils.explainString(
        guided._jdf.queryExecution(), "formatted"
    )
    assert "Generate" in p and "_salt" in p, p[:2000]


def test_profile_guided_join_stays_plain_when_uniform(spark):
    """No hot key -> no replication cost: the guided join of a uniform
    probe is the PLAIN join (no salt explode in the plan)."""
    from eth_event_stream_spark.operators.skew import profile_guided_join

    probe = spark.createDataFrame(
        [(f"u{i}", f"k{i % 32}") for i in range(640)], "uid string, k string"
    )
    dim = spark.createDataFrame([(f"k{j}", j) for j in range(32)], "k string, attr int")
    guided = profile_guided_join(probe, dim, "k", n_tasks=32)
    assert _canon(guided) == _canon(probe.join(dim, "k"))
    p = guided._sc._jvm.PythonSQLUtils.explainString(
        guided._jdf.queryExecution(), "formatted"
    )
    assert "_salt" not in p, p[:2000]


def test_two_path_join_equals_plain(spark, sf_dir):
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    hot = top_keys(orders, "o_custkey", k=5, min_count=1)
    assert hot  # some customers exist
    plain = orders.join(customer, "o_custkey").select("o_orderkey", "c_name")
    split = two_path_join(orders, customer, "o_custkey", hot).select(
        "o_orderkey", "c_name"
    )
    assert _canon(plain) == _canon(split)


def test_salted_left_join_preserves_unmatched(spark, sf_dir):
    """Left-join salting must keep probe rows whose key has no build match."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    rich = (
        spark.read.parquet(f"{sf_dir}/customer.parquet")
        .filter(F.col("c_acctbal") > 9000)
        .withColumnRenamed("c_custkey", "o_custkey")
    )
    plain = orders.join(rich, "o_custkey", "left").select("o_orderkey", "c_name")
    salted = salted_join(orders, rich, "o_custkey", num_salts=4, how="left").select(
        "o_orderkey", "c_name"
    )
    assert _canon(plain) == _canon(salted)


def test_streaming_decode_netflow_equals_batch(spark, eth_logs_fixture, tmp_path):
    """The reference's whole flagship path, streaming: source -> dedup ->
    decode -> netflow, equals the batch computation (stream_multi.rs as one
    Structured Streaming job)."""
    register_source(spark)
    fx, path = eth_logs_fixture

    batch_logs = (
        spark.read.format("eth_logs")
        .option("path", path)
        .option("from_block", fx.from_block)
        .option("to_block", fx.to_block)
        .option("fail_on_removed", "false")
        .load()
        .dropDuplicates(["block_number", "log_index"])
    )
    expected = _canon(
        netflow(decode_event(batch_logs, TRANSFER_DECL, address=ADDR_A)).filter(
            F.col("netflow") != 0
        )
    )

    stream_logs = (
        spark.readStream.format("eth_logs")
        .option("path", path)
        .option("from_block", fx.from_block)
        .option("to_block", fx.to_block)
        .option("block_step", 40)
        .option("confirmation_blocks", 0)
        .option("fail_on_removed", "false")
        .load()
        .dropDuplicates(["block_number", "log_index"])
    )
    decoded = decode_event(stream_logs, TRANSFER_DECL, address=ADDR_A)
    flows = netflow(decoded)
    q = (
        flows.writeStream.format("memory")
        .queryName("netflow_sink")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = _canon(
        spark.table("netflow_sink").filter(F.col("netflow") != 0)
    )
    assert got == expected
    assert len(got) > 0


def test_partitioned_sink_idempotent_rewrite(spark, eth_logs, tmp_path):
    """B4/B6 at the storage layer: re-writing a block range replaces exactly
    that range's partitions; other buckets are untouched; range filters prune
    bucket directories."""
    from eth_event_stream_spark.sources.sinks import (
        read_block_partitioned,
        write_block_partitioned,
    )

    out = str(tmp_path / "logs_out")
    logs = eth_logs.dropDuplicates(["block_number", "log_index"])
    lo = logs.agg(F.min("block_number")).collect()[0][0]

    write_block_partitioned(logs, out, bucket_blocks=50)
    n1 = read_block_partitioned(spark, out).count()
    assert n1 == logs.count()

    # re-ingest only the first bucket (simulating a re-fetch) — counts stable.
    # The range MUST be bucket-aligned: buckets are absolute floor(block/50)*50
    # boundaries, and overwriting with a partial bucket would truncate it.
    from eth_event_stream_spark.sources.sinks import bucket_aligned_range

    b_lo, b_hi = bucket_aligned_range(lo, lo + 50, 50)
    first_bucket = logs.filter(
        (F.col("block_number") >= b_lo) & (F.col("block_number") < b_hi)
    )
    write_block_partitioned(
        first_bucket, out, bucket_blocks=50, expect_range=(b_lo, b_hi)
    )
    n2 = read_block_partitioned(spark, out).count()
    assert n2 == n1  # idempotent: same rows, not duplicated

    # the guard fires on an unaligned range
    with pytest.raises(ValueError, match="not aligned"):
        write_block_partitioned(
            first_bucket, out, bucket_blocks=50, expect_range=(lo, lo + 50)
        )

    # partition pruning: the range-aware reader derives the partition
    # predicate (a bare block_number filter cannot prune bucket dirs)
    back = read_block_partitioned(
        spark, out, block_range=(lo, lo + 10), bucket_blocks=50
    )
    plan = back._sc._jvm.PythonSQLUtils.explainString(
        back._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    assert back.count() == logs.filter(
        (F.col("block_number") >= lo) & (F.col("block_number") < lo + 10)
    ).count()


def test_streaming_to_partitioned_sink(spark, eth_logs_fixture, tmp_path):
    """End-to-end exactly-once file pipeline: stream -> foreachBatch ->
    block-partitioned parquet. The source aligns micro-batch chunks to
    ABSOLUTE block_step multiples, so with bucket_blocks == block_step every
    batch covers whole buckets — replaying a batch overwrites exactly its
    own partitions (no partial-bucket truncation)."""
    from eth_event_stream_spark.sources.block_source import register as reg
    from eth_event_stream_spark.sources.sinks import write_block_partitioned

    reg(spark)
    fx, path = eth_logs_fixture
    out = str(tmp_path / "stream_out")

    stream = (
        spark.readStream.format("eth_logs")
        .option("path", path)
        .option("from_block", fx.from_block)
        .option("to_block", fx.to_block)
        .option("block_step", 25)
        .option("confirmation_blocks", 0)
        .option("fail_on_removed", "false")
        .load()
        .dropDuplicates(["block_number", "log_index"])
    )

    def write_batch(df, epoch_id):
        write_block_partitioned(df, out, bucket_blocks=25, mode="overwrite")

    q = (
        stream.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", str(tmp_path / "ck_file"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    written = spark.read.parquet(out)
    batch = (
        spark.read.format("eth_logs")
        .option("path", path)
        .option("from_block", fx.from_block)
        .option("to_block", fx.to_block)
        .option("fail_on_removed", "false")
        .load()
        .dropDuplicates(["block_number", "log_index"])
    )
    assert written.count() == batch.count()
    # same (block, log_index) key set
    a = {(r["block_number"], r["log_index"]) for r in written.select("block_number", "log_index").collect()}
    b = {(r["block_number"], r["log_index"]) for r in batch.select("block_number", "log_index").collect()}
    assert a == b


def test_parquet_schema_evolution(spark, eth_logs, tmp_path):
    """Lake reality at 100 TB: new columns appear over time. mergeSchema
    unions old and new file schemas; old files read the new column as NULL."""
    out = str(tmp_path / "evolving")
    v1 = eth_logs.select("block_number", "log_index", "address")
    v1.write.parquet(out + "/part=v1")
    v2 = eth_logs.select(
        "block_number", "log_index", "address",
        F.lit("mainnet").alias("chain"),  # the newly-added column
    )
    v2.write.parquet(out + "/part=v2")

    merged = spark.read.option("mergeSchema", "true").parquet(out)
    assert set(merged.columns) == {"block_number", "log_index", "address", "chain", "part"}
    n_total = merged.count()
    assert n_total == v1.count() + v2.count()
    # old files surface NULL for the new column; new files carry the value
    assert merged.filter(F.col("part") == "v1").filter(F.col("chain").isNull()).count() == v1.count()
    assert merged.filter(F.col("part") == "v2").filter(F.col("chain") == "mainnet").count() == v2.count()


def test_salted_join_rejects_build_preserving(spark, sf_dir):
    """right/full outer would duplicate unmatched build rows — fail fast."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    with pytest.raises(ValueError, match="probe-preserving"):
        salted_join(orders, customer, "o_custkey", how="full_outer")


def test_two_path_join_preserves_null_keys(spark, sf_dir):
    """NULL-key probe rows must survive a left two-path join."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").withColumn(
        "o_custkey",
        F.when(F.col("o_orderkey") % 97 == 0, None).otherwise(F.col("o_custkey")),
    )
    customer = spark.read.parquet(f"{sf_dir}/customer.parquet").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    hot = top_keys(orders, "o_custkey", k=3, min_count=1)
    plain = orders.join(customer, "o_custkey", "left").select("o_orderkey", "c_name")
    split = two_path_join(orders, customer, "o_custkey", hot, how="left").select(
        "o_orderkey", "c_name"
    )
    assert _canon(plain) == _canon(split)
    assert orders.filter(F.col("o_custkey").isNull()).count() > 0  # test is real


def test_min_label_propagation_chain(spark):
    """A diameter-9 chain must converge to the global min (one-hop would be
    wrong for every node past the second), plus a disjoint pair and an
    isolated node; early-exit happens at the sum fixpoint."""
    from eth_event_stream_spark.operators.graph import min_label_propagation

    chain = [(i, i + 1) for i in range(10, 19)]  # 10-11-...-19
    extra = [(30, 31)]
    all_edges = chain + extra
    nodes = spark.createDataFrame(
        [(i,) for i in list(range(10, 20)) + [30, 31, 99]], "id BIGINT"
    )
    edges = spark.createDataFrame(
        [(a, b) for a, b in all_edges] + [(b, a) for a, b in all_edges],
        "src BIGINT, dst BIGINT",
    )
    got = {r["id"]: r["label"] for r in min_label_propagation(nodes, edges).collect()}
    assert got == {**{i: 10 for i in range(10, 20)}, 30: 30, 31: 30, 99: 99}


def test_min_label_propagation_near_overflow_ids(spark):
    """Node ids near LONG max: the convergence probe sums labels, and a
    BIGINT sum of even two such ids overflows (ANSI would raise mid-job) —
    the decimal(38,0) probe must not. Three huge-id nodes in one component
    plus an isolated huge id; labels converge to the component min."""
    from eth_event_stream_spark.operators.graph import min_label_propagation

    top = 2**62
    ids = [top + 1, top + 2, top + 3, top + 7]
    pairs = [(top + 1, top + 2), (top + 2, top + 3)]
    nodes = spark.createDataFrame([(i,) for i in ids], "id BIGINT")
    edges = spark.createDataFrame(
        [(a, b) for a, b in pairs] + [(b, a) for a, b in pairs],
        "src BIGINT, dst BIGINT",
    )
    got = {r["id"]: r["label"] for r in min_label_propagation(nodes, edges).collect()}
    assert got == {
        top + 1: top + 1,
        top + 2: top + 1,
        top + 3: top + 1,
        top + 7: top + 7,
    }


def test_ivf_recall_vs_bruteforce(spark, sf_dir):
    """The iterated-Lloyd IVF must return a meaningful fraction of the TRUE
    top-10 (brute-force cosine) while probing only N_PROBE of K_CELLS cells.
    Measured: 5-6/10 at both test scales with 2 rounds / nprobe 2 of 8
    (~25% of the corpus scanned); 4/10 is the regression floor."""
    from eth_event_stream_spark.plans import QUERIES

    brute = [
        r["vec_id"]
        for r in QUERIES["similarity_topk_bruteforce"].fn(spark, sf_dir).collect()
    ][:10]
    ivf = [r["vec_id"] for r in QUERIES["similarity_topk_ivf"].fn(spark, sf_dir).collect()]
    assert len(set(brute) & set(ivf)) >= 4


def test_csv_json_source_roundtrip(spark, sf_dir, tmp_path):
    """Source-format breadth: the same relation read back from CSV and JSON
    matches the parquet source row-for-row (schema applied explicitly, as
    headerless interchange files have no embedded types)."""
    from eth_event_stream_spark.plans.catalog import t

    src = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    expected = sorted(tuple(r) for r in src.collect())
    schema = "c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE, c_mktsegment STRING"

    csv_path = str(tmp_path / "cust_csv")
    src.write.mode("overwrite").option("header", "true").csv(csv_path)
    got_csv = sorted(
        tuple(r)
        for r in spark.read.schema(schema).option("header", "true").csv(csv_path).collect()
    )
    assert got_csv == expected

    json_path = str(tmp_path / "cust_json")
    src.write.mode("overwrite").json(json_path)
    got_json = sorted(
        tuple(r) for r in spark.read.schema(schema).json(json_path).collect()
    )
    assert got_json == expected


def test_gzip_jsonl_with_corrupt_record_policy(spark, sf_dir, tmp_path):
    """The web-crawl ingest reality: gzipped JSONL with the occasional
    broken line. Three contracts pinned:

    - .jsonl.gz reads transparently (codec inferred from the extension) and
      matches the parquet relation row-for-row;
    - PERMISSIVE mode (the scale default — one bad line must not kill a
      100 TB ingest) lands the raw broken line in the designated corrupt
      column with every typed field NULL, and keeps all good rows;
    - FAILFAST raises, for pipelines that prefer loud schema drift.
    """
    import glob
    import gzip

    from eth_event_stream_spark.plans.catalog import t

    src = t(spark, sf_dir, "documents").select("doc_id", "lang", "source", "n_chars")
    expected = sorted(tuple(r) for r in src.collect())
    schema = "doc_id BIGINT, lang STRING, source STRING, n_chars BIGINT"

    plain = str(tmp_path / "docs_jsonl")
    src.coalesce(2).write.mode("overwrite").json(plain)
    gz_dir = tmp_path / "docs_jsonl_gz"
    gz_dir.mkdir()
    bad_line = '{"doc_id": 999999, "lang": "en", "n_chars": BROKEN'
    for i, part in enumerate(sorted(glob.glob(f"{plain}/part-*"))):
        with open(part, "rb") as fh:
            payload = fh.read()
        if i == 0:  # plant the broken line in the first shard
            payload += bad_line.encode() + b"\n"
        with gzip.open(gz_dir / f"part-{i}.jsonl.gz", "wb") as gz:
            gz.write(payload)

    got = sorted(
        tuple(r)
        for r in spark.read.schema(schema).json(str(gz_dir)).collect()
        if r["doc_id"] != 999999 and r["doc_id"] is not None
    )
    assert got == expected

    # cache() is REQUIRED, not an optimization: Spark refuses filters that
    # reference only the corrupt-record column on a raw JSON scan
    # (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — parse once, then query
    permissive = (
        spark.read.schema(schema + ", _corrupt_record STRING")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(str(gz_dir))
        .cache()
    )
    try:
        corrupt = permissive.filter(F.col("_corrupt_record").isNotNull()).collect()
        assert len(corrupt) == 1
        assert corrupt[0]["_corrupt_record"] == bad_line
        assert corrupt[0]["doc_id"] is None  # typed fields NULL on the bad row
        assert (
            permissive.filter(F.col("_corrupt_record").isNull()).count()
            == len(expected)
        )
    finally:
        permissive.unpersist()

    try:
        spark.read.schema(schema).option("mode", "FAILFAST").json(str(gz_dir)).collect()
        raise AssertionError("FAILFAST accepted a corrupt line")
    except Exception as exc:  # surfaces as a raw Py4J-wrapped SparkException
        assert "FAILED_READ_FILE" in str(exc) or "Malformed" in str(exc), exc


def test_min_label_propagation_random_graphs(spark):
    """Randomized cross-check: label propagation equals DuckDB's recursive-
    CTE connected components on seeded random graphs (sparse, dense, and
    with isolated nodes)."""
    import random

    import duckdb

    from eth_event_stream_spark.operators.graph import min_label_propagation

    for seed, n_nodes, n_edges in ((1, 20, 10), (2, 30, 45), (3, 25, 5)):
        rng = random.Random(seed)
        node_ids = list(range(n_nodes))
        edge_list = [
            (rng.randrange(n_nodes), rng.randrange(n_nodes)) for _ in range(n_edges)
        ]
        edge_list = [(a, b) for a, b in edge_list if a != b]

        con = duckdb.connect()
        con.execute("CREATE TABLE nodes(id BIGINT)")
        con.executemany("INSERT INTO nodes VALUES (?)", [(i,) for i in node_ids])
        con.execute("CREATE TABLE e(a BIGINT, b BIGINT)")
        if edge_list:
            con.executemany("INSERT INTO e VALUES (?, ?)", edge_list)
        expected = dict(
            con.execute(
                """
                WITH RECURSIVE sym AS (
                  SELECT a AS x, b AS y FROM e UNION ALL SELECT b, a FROM e),
                reach AS (
                  SELECT id AS node, id AS r FROM nodes
                  UNION
                  SELECT s.y, reach.r FROM sym s JOIN reach ON reach.node = s.x)
                SELECT node, MIN(r) FROM reach GROUP BY node
                """
            ).fetchall()
        )

        nodes = spark.createDataFrame([(i,) for i in node_ids], "id BIGINT")
        edges_rows = [(a, b) for a, b in edge_list] + [(b, a) for a, b in edge_list]
        edges = (
            spark.createDataFrame(edges_rows, "src BIGINT, dst BIGINT")
            if edges_rows
            else spark.createDataFrame([], "src BIGINT, dst BIGINT")
        )
        got = {
            r["id"]: r["label"] for r in min_label_propagation(nodes, edges).collect()
        }
        assert got == expected, f"seed {seed}"


def test_approx_distinct_error_bound(spark, sf_dir):
    """The HLL++ sketch (agg_approx_distinct) must land within 5% relative
    error of the exact per-group distinct count — the accuracy contract that
    justifies trading exactness for constant memory at 100 TB (the sketch is
    configured with rsd=0.01; 5% is 5 sigma of headroom)."""
    from eth_event_stream_spark.plans import QUERIES
    from eth_event_stream_spark.plans.catalog import t

    # independent recompute of the raw estimate (the registered query now
    # emits the CONTRACT — exact + within_bound — so the raw sketch value
    # is re-derived here)
    approx = {
        r["event_type"]: r["a"]
        for r in t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.approx_count_distinct("user_id", 0.01).alias("a"))
        .collect()
    }
    exact = {
        r["event_type"]: r["n"]
        for r in t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for k, n in exact.items():
        rel = abs(approx[k] - n) / n
        assert rel < 0.05, (k, approx[k], n, rel)
    # and the registered contract form agrees: exact values match, every
    # within_bound flag holds
    contract = QUERIES["agg_approx_distinct"].fn(spark, sf_dir).collect()
    assert {r["event_type"]: r["exact_users"] for r in contract} == exact
    assert all(r["within_bound"] for r in contract)


def test_prepare_corpus_reliable_checkpoint_matches_local(spark, sf_dir, tmp_path):
    """The cluster-mode materialization boundary for the composed prep
    pipeline (reliable checkpoint() into a checkpoint dir — survives
    executor loss) must produce identical rows to the local-mode default
    (localCheckpoint), and must actually write recovery state into the
    directory — the same A/B contract as PageRank's round boundary."""
    import pathlib

    from eth_event_stream_spark.plans.pipeline import prepare_corpus

    local = sorted(tuple(r) for r in prepare_corpus(spark, sf_dir).collect())
    ckdir = str(tmp_path / "corpus_ck")
    reliable = sorted(
        tuple(r)
        for r in prepare_corpus(spark, sf_dir, checkpoint_dir=ckdir).collect()
    )
    assert reliable == local and len(local) > 0
    written = list(pathlib.Path(ckdir).rglob("*"))
    assert any(p.is_file() for p in written), "no reliable checkpoint files"


def test_profile_approx_ndv_error_bound(spark, sf_dir):
    """The per-column HLL ndv estimates behind profile_table_stats_approx
    (rsd=0.05) must land within 15% (3 sigma) of the exact ndv for every
    orders column — the raw-estimate check the contract-shaped registered
    query no longer surfaces (it emits exact lanes + within_bound at the
    4-sigma regeneration-safe band, which this also re-verifies)."""
    from eth_event_stream_spark.plans import QUERIES
    from eth_event_stream_spark.plans.catalog import t
    from eth_event_stream_spark.plans.profiling import _ORDERS_COLS

    o = t(spark, sf_dir, "orders")
    row = o.agg(
        *[
            F.approx_count_distinct(c, rsd=0.05).alias(f"{c}__a")
            for c in _ORDERS_COLS
        ],
        *[F.countDistinct(c).alias(f"{c}__n") for c in _ORDERS_COLS],
    ).collect()[0]
    for c in _ORDERS_COLS:
        a, n = row[f"{c}__a"], row[f"{c}__n"]
        rel = abs(a - n) / max(n, 1)
        assert rel < 3 * 0.05, (c, a, n, rel)
    contract = QUERIES["profile_table_stats_approx"].fn(spark, sf_dir).collect()
    assert len(contract) == len(_ORDERS_COLS)
    assert all(r["within_bound"] for r in contract)
    assert {r["col"]: r["ndv_exact"] for r in contract} == {
        c: row[f"{c}__n"] for c in _ORDERS_COLS
    }


def test_approx_percentile_error_bound(spark, sf_dir):
    """The quantile sketch (sketch_approx_percentile, accuracy 10000) must
    sit within the exact value at rank +-0.1% of n for each requested
    percentile — the documented approx_percentile accuracy contract (error
    <= 1/accuracy of the rank), checked against the true sorted values."""
    import bisect

    from eth_event_stream_spark.plans import QUERIES
    from eth_event_stream_spark.plans.catalog import t

    # independent recompute of the raw sketch values (the registered query
    # now emits the CONTRACT — n_rows + within_bound per (group, p) — so
    # the raw estimates are re-derived here)
    approx = {
        r["event_type"]: r["a"]
        for r in t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("a"))
        .collect()
    }
    vals = {}
    for r in t(spark, sf_dir, "events").select("event_type", "value").collect():
        vals.setdefault(r["event_type"], []).append(r["value"])
    assert set(approx) == set(vals)
    for k, xs in vals.items():
        xs.sort()
        n = len(xs)
        for p, got in zip((0.5, 0.9, 0.99), approx[k]):
            # rank window: the sketch may return any value whose rank is
            # within n/accuracy of the target rank
            target = p * (n - 1)
            slack = max(1.0, n / 10000.0)
            lo = xs[max(0, int(target - slack) - 1)]
            hi = xs[min(n - 1, int(target + slack) + 1)]
            assert lo <= got <= hi, (k, p, got, lo, hi)
            # and the sketch value is an ACTUAL data value, not interpolated
            i = bisect.bisect_left(xs, got)
            assert i < n and xs[i] == got, (k, p, got)
    # and the registered contract form holds: right group sizes, all flags
    contract = QUERIES["sketch_approx_percentile"].fn(spark, sf_dir).collect()
    assert {(r["event_type"], r["p"]) for r in contract} == {
        (k, p) for k in vals for p in (0.5, 0.9, 0.99)
    }
    assert all(r["n_rows"] == len(vals[r["event_type"]]) for r in contract)
    assert all(r["within_bound"] for r in contract)


def test_asof_join_backward_matches_pandas(spark):
    """The generic as-of join equals pandas.merge_asof (backward, exact
    matches allowed) on seeded random data with ties, keys missing from one
    side, and left rows before any right row."""
    import random

    import pandas as pd

    from eth_event_stream_spark.operators.asof import asof_join_backward

    rng = random.Random(7)
    lrows = [
        (rng.choice(["a", "b", "c", "d"]), rng.randint(0, 50), i)
        for i in range(200)
    ]
    rrows = [
        (rng.choice(["a", "b", "c"]), rng.randint(0, 50), round(rng.random(), 3))
        for _ in range(80)
    ]
    left = spark.createDataFrame(lrows, "k STRING, ts BIGINT, lid BIGINT")
    right = spark.createDataFrame(rrows, "k STRING, ts BIGINT, px DOUBLE")
    # dedupe right per (k, ts): merge_asof picks the LAST among equal keys,
    # window last() does too, but make it unambiguous for the comparison
    right = right.groupBy("k", "ts").agg(F.max("px").alias("px"))

    lpdf = pd.DataFrame(lrows, columns=["k", "ts", "lid"]).sort_values("ts")
    rpdf = right.toPandas().sort_values("ts")
    for direction in ("backward", "forward", "nearest"):
        for tolerance in (None, 3):
            got = {
                (r["k"], r["lid"]): r["px"]
                for r in asof_join_backward(
                    left, right, by=["k"], left_on="ts", right_on="ts",
                    direction=direction, tolerance=tolerance,
                ).collect()
            }
            merged = pd.merge_asof(
                lpdf, rpdf, on="ts", by="k", direction=direction,
                allow_exact_matches=True, tolerance=tolerance,
            )
            expected = {
                (r.k, r.lid): (None if pd.isna(r.px) else r.px)
                for r in merged.itertuples()
            }
            assert got == expected, (direction, tolerance)


def test_asof_join_duplicate_ts_ties_are_deterministic(spark):
    """Duplicate right rows on (key, ts) must resolve to ONE deterministic
    row — greatest tiebreak for backward, least for forward — stable across
    repartitionings (previously the attached struct was whichever tied row
    the shuffle sorted last)."""
    from eth_event_stream_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame(
        [("k", 5, 1), ("k", 2, 2), ("j", 5, 3)], "k STRING, ts BIGINT, lid BIGINT"
    )
    dup_rows = [
        ("k", 2, 10.0, "r1"),
        ("k", 2, 30.0, "r3"),
        ("k", 2, 20.0, "r2"),
        ("j", 7, 1.0, "r4"),
        ("j", 7, 2.0, "r5"),
    ]
    for nparts in (1, 3, 7):
        right = spark.createDataFrame(
            dup_rows, "k STRING, ts BIGINT, px DOUBLE, rid STRING"
        ).repartition(nparts)
        # explicit unique tiebreak column
        back = {
            r["lid"]: (r["px"], r["rid"])
            for r in asof_join_backward(
                left, right, by=["k"], left_on="ts", right_on="ts", tiebreak="rid"
            ).collect()
        }
        assert back[1] == (30.0, "r3"), back  # greatest rid among ts=2 ties
        assert back[2] == (30.0, "r3"), back  # exact match included
        assert back[3] == (None, None), back  # no prior right row
        fwd = {
            r["lid"]: (r["px"], r["rid"])
            for r in asof_join_backward(
                left, right, by=["k"], left_on="ts", right_on="ts",
                direction="forward", tiebreak="rid",
            ).collect()
        }
        assert fwd[3] == (1.0, "r4"), fwd  # least rid among ts=7 ties
        # default tiebreak: the packed value struct (field order px, rid)
        back_default = {
            r["lid"]: (r["px"], r["rid"])
            for r in asof_join_backward(
                left, right, by=["k"], left_on="ts", right_on="ts"
            ).collect()
        }
        assert back_default[1] == (30.0, "r3"), back_default  # max struct


def test_asof_join_unorderable_payload_requires_tiebreak(spark):
    """A map-typed value column cannot be the implicit struct tiebreak; the
    operator must demand an explicit one instead of failing in Catalyst."""
    import pytest as _pytest

    from eth_event_stream_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([("k", 3, 1)], "k STRING, ts BIGINT, lid BIGINT")
    right = spark.createDataFrame(
        [("k", 1, {"a": 1.0}, "r1")],
        "k STRING, ts BIGINT, m MAP<STRING,DOUBLE>, rid STRING",
    )
    with _pytest.raises(ValueError, match="tiebreak"):
        asof_join_backward(left, right, by=["k"], left_on="ts", right_on="ts")
    [r] = asof_join_backward(
        left, right, by=["k"], left_on="ts", right_on="ts", tiebreak="rid"
    ).collect()
    assert r["m"] == {"a": 1.0} and r["rid"] == "r1"


def test_asof_join_null_right_values_row_atomic(spark):
    """The matched right row is picked ATOMICALLY: a NULL field in the
    latest right row stays NULL (no staler value substituted), and multiple
    value columns always come from the same right row."""
    from eth_event_stream_spark.operators.asof import asof_join_backward

    left = spark.createDataFrame([("k", 3, 1)], "k STRING, ts BIGINT, lid BIGINT")
    right = spark.createDataFrame(
        [("k", 1, 5.0, 10), ("k", 2, None, 7)],
        "k STRING, ts BIGINT, px DOUBLE, qty BIGINT",
    )
    [r] = asof_join_backward(
        left, right, by=["k"], left_on="ts", right_on="ts"
    ).collect()
    assert r["px"] is None and r["qty"] == 7, r


def test_leakage_safe_split_never_straddles_near_dup_pairs(spark, sf_dir):
    """The property the operator exists for: every verified near-dup pair
    lands in the SAME split (a per-document hash split provably violates
    this whenever a pair's ids hash to different buckets)."""
    from eth_event_stream_spark.plans.pipeline import (
        dedup_lsh_then_verify,
        split_hash_assign,
    )
    from eth_event_stream_spark.plans.pipeline import split_leakage_safe

    pairs = dedup_lsh_then_verify(spark, sf_dir).select("doc_a", "doc_b")
    safe = split_leakage_safe(spark, sf_dir)
    straddle = (
        pairs.join(
            safe.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")),
            "doc_a",
        )
        .join(
            safe.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")),
            "doc_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert straddle == 0

    # sanity: the naive per-document split DOES straddle on this data
    # (otherwise the test proves nothing)
    naive = split_hash_assign(spark, sf_dir)
    naive_straddle = (
        pairs.join(
            naive.select(F.col("doc_id").alias("doc_a"), F.col("split").alias("sa")),
            "doc_a",
        )
        .join(
            naive.select(F.col("doc_id").alias("doc_b"), F.col("split").alias("sb")),
            "doc_b",
        )
        .filter(F.col("sa") != F.col("sb"))
        .count()
    )
    assert naive_straddle > 0


def test_chunk_scrub_edge_shapes(spark):
    """Span-scrub semantics on constructed edge shapes the parquet fixtures
    can't guarantee: an empty text (one '' chunk), a verbatim duplicate
    document (all chunks scrubbed -> empty row, not a dropped row), and a
    doc sharing only its first chunk with an earlier doc."""
    from eth_event_stream_spark.plans.curation import SCRUB_CHUNK_TOKENS, chunk_scrub

    w = "tok"
    chunk_a = " ".join([w] * SCRUB_CHUNK_TOKENS)          # doc 1 chunk 0
    chunk_b = " ".join(["other"] * SCRUB_CHUNK_TOKENS)    # doc 1 chunk 1
    chunk_c = " ".join(["third"] * SCRUB_CHUNK_TOKENS)    # doc 3's own tail
    docs = spark.createDataFrame(
        [
            (0, ""),                                # empty text
            (1, f"{chunk_a} {chunk_b}"),            # the original
            (2, f"{chunk_a} {chunk_b}"),            # verbatim duplicate
            (3, f"{chunk_a} {chunk_c}"),            # shares only chunk 0
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in chunk_scrub(docs).collect()}

    assert set(rows) == {0, 1, 2, 3}, "every input doc must keep a row"
    # empty text tokenizes to [''] -> one unique chunk, kept
    assert rows[0]["n_kept"] == 1 and rows[0]["n_removed"] == 0
    # the original keeps both chunks in order
    assert rows[1]["scrubbed_text"] == f"{chunk_a} {chunk_b}"
    assert rows[1]["n_removed"] == 0
    # the verbatim duplicate loses everything but keeps its (empty) row
    assert rows[2]["n_kept"] == 0 and rows[2]["n_removed"] == 2
    assert rows[2]["scrubbed_text"] == ""
    # the partial overlap loses exactly the shared chunk
    assert rows[3]["scrubbed_text"] == chunk_c
    assert rows[3]["n_kept"] == 1 and rows[3]["n_removed"] == 1


def test_zorder_buckets_are_aligned_squares(spark, sf_dir):
    """The property data skipping rests on: every z-bucket confines BOTH
    dimensions to an aligned square of side 2^(ZBUCKET_SHIFT/2) — so the
    parquet min/max stats of a z-clustered file prune on either predicate.
    A single-column sort would show tight spans on one axis and near-full
    range on the other."""
    from eth_event_stream_spark.plans.layout import (
        ZBUCKET_SHIFT,
        zorder_cluster_ranges,
    )

    side = 1 << (ZBUCKET_SHIFT // 2)
    rows = zorder_cluster_ranges(spark, sf_dir).collect()
    assert len(rows) > 1
    for r in rows:
        assert r["x_span"] < side, (r["zbucket"], r["x_span"])
        assert r["y_span"] < side, (r["zbucket"], r["y_span"])
        # aligned: the whole bucket lives in one side-sized window per axis
        assert r["x_hi"] // side == r["x_lo"] // side
        assert r["y_hi"] // side == r["y_lo"] // side


def test_zorder_write_enables_footer_pruning(spark, sf_dir, tmp_path):
    """End-to-end proof of the layout claim: write orders z-clustered
    (repartitionByRange(zval) + sortWithinPartitions — the exact 100 TB
    layout job) and unclustered, then read BOTH sets of parquet footers
    with pyarrow and measure what fraction of row groups a 2-D predicate
    could skip on min/max stats alone. The clustered layout must let a
    narrow x-window OR y-window skip most row groups; the unclustered
    layout can skip (almost) none."""
    import glob

    import pyarrow.parquet as pq

    from eth_event_stream_spark.plans.layout import zorder2

    src = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey",
        (F.col("o_custkey") % 65536).cast("long").alias("x"),
        (F.datediff(F.col("o_orderdate"), F.lit("1992-01-01")) % 65536)
        .cast("long")
        .alias("y"),
    )
    # normalize both dims to the full 16-bit range before interleaving —
    # the step every production z-order runs (Delta range-buckets each
    # column first): with raw values the narrower dimension's high bits
    # are constant zero and the curve degenerates to a sort on the wider
    # one (measured: zero x-skipping without this)
    mx, my = src.agg(F.max("x"), F.max("y")).collect()[0]
    z = src.select(
        "*",
        F.expr(f"CAST(x * 65536 div {mx + 1} AS BIGINT)").alias("x16"),
        F.expr(f"CAST(y * 65536 div {my + 1} AS BIGINT)").alias("y16"),
    ).withColumn("zval", zorder2("x16", "y16"))

    clustered = str(tmp_path / "clustered")
    unclustered = str(tmp_path / "unclustered")
    # 64 range partitions ~ 6 top z-bits ~ 3 bits per dimension per file:
    # enough curve depth that EACH dimension is confined per file (8 files
    # would only constrain the topmost bits of one dimension)
    (
        z.repartitionByRange(64, "zval")
        .sortWithinPartitions("zval")
        .write.parquet(clustered)
    )
    # adversarial baseline: hash-scatter rows so every file sees the full range
    z.repartition(8, "o_orderkey").write.parquet(unclustered)

    def skippable_fraction(path: str, col: str, lo: int, hi: int) -> float:
        total = kept = 0
        for f in glob.glob(f"{path}/*.parquet"):
            md = pq.ParquetFile(f).metadata
            names = {md.schema.column(i).name: i for i in range(md.num_columns)}
            ci = names[col]
            for g in range(md.num_row_groups):
                st = md.row_group(g).column(ci).statistics
                total += 1
                if st.max < lo or st.min > hi:
                    continue  # row group skipped
                kept += 1
        assert total > 0
        return 1.0 - kept / total

    # a ~10%-of-range window around each dim's median
    qx = src.approxQuantile("x", [0.5], 0.01)[0]
    qy = src.approxQuantile("y", [0.5], 0.01)[0]
    for col, mid, rng in (("x", qx, mx), ("y", qy, my)):
        half = max(1, int(rng) // 20)
        lo, hi = int(mid) - half, int(mid) + half
        skip_c = skippable_fraction(clustered, col, lo, hi)
        skip_u = skippable_fraction(unclustered, col, lo, hi)
        assert skip_u < 0.01, (col, skip_u)  # scatter layout can't skip
        assert skip_c > 0.5, (col, skip_c)  # z-layout skips most groups


def test_orc_source_roundtrip_with_pushdown(spark, sf_dir, tmp_path):
    """ORC is Spark's other built-in columnar format: the same relation
    written to ORC reads back row-identical, and a predicate against the
    ORC scan is pushed down (PushedFilters in the scan node), so the lake
    can mix parquet and ORC without losing skipping."""
    from eth_event_stream_spark.plans.catalog import t

    src = t(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_acctbal", "c_mktsegment"
    )
    expected = sorted(tuple(r) for r in src.collect())

    orc_path = str(tmp_path / "cust_orc")
    src.write.mode("overwrite").orc(orc_path)
    back = spark.read.orc(orc_path)
    got = sorted(tuple(r) for r in back.collect())
    assert got == expected

    flt = back.filter(F.col("c_acctbal") > 0.0).select("c_custkey")
    plan = flt._sc._jvm.PythonSQLUtils.explainString(
        flt._jdf.queryExecution(), "formatted"
    )
    assert "PushedFilters" in plan and "c_acctbal" in plan.split("PushedFilters")[1][:200], plan[:1500]


def test_zorder_interleave_matches_python_reference(spark):
    """Pin the JVM-side Morton interleave bit-for-bit against an
    independent pure-Python implementation over seeded random points,
    including the extremes of the 16-bit domain."""
    import random

    from eth_event_stream_spark.plans.layout import ZBITS, zorder2

    def z_ref(x: int, y: int) -> int:
        z = 0
        for i in range(ZBITS):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    rng = random.Random(42)
    pts = [(rng.randrange(1 << ZBITS), rng.randrange(1 << ZBITS)) for _ in range(200)]
    pts += [(0, 0), (0, 65535), (65535, 0), (65535, 65535)]
    df = spark.createDataFrame(pts, "x long, y long")
    got = {
        (r["x"], r["y"]): r["z"]
        for r in df.select("x", "y", zorder2("x", "y").alias("z")).collect()
    }
    for x, y in pts:
        assert got[(x, y)] == z_ref(x, y), (x, y, got[(x, y)], z_ref(x, y))


def test_variant_malformed_input_policy(spark):
    """The VARIANT ingest contract mirrors the JSONL corrupt-record one:
    ``try_parse_json`` maps a malformed document to NULL (the PERMISSIVE
    analog — one bad blob must not kill a 100 TB parse), while
    ``parse_json`` raises (the FAILFAST analog). Pinned here because the
    registered ``scalar_variant_json`` query only sees well-formed props."""
    row = spark.sql(
        "SELECT variant_get(try_parse_json('not json'), '$.k', 'int') AS k, "
        "try_parse_json('not json') IS NULL AS is_null, "
        "variant_get(try_parse_json('{\"k\": 7}'), '$.k', 'int') AS good"
    ).collect()[0]
    assert row["k"] is None and row["is_null"] and row["good"] == 7

    try:
        spark.sql("SELECT parse_json('not json') AS v").collect()
        raise AssertionError("parse_json accepted malformed input")
    except Exception as exc:
        assert "MALFORMED_RECORD_IN_PARSING" in str(exc), exc


def test_streaming_observe_metrics(spark, sf_dir, tmp_path):
    """Production observability: ``observe()`` attaches named aggregate
    metrics to a streaming query, surfaced per micro-batch in the query
    progress — row counts and sums arrive WITHOUT a second job over the
    data. The observed totals must equal the batch ground truth."""
    src = tmp_path / "docs_observe"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.repartition(3).write.parquet(str(src))
    truth_rows = docs.count()
    truth_chars = docs.agg(F.sum("n_chars")).collect()[0][0]

    sdf = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .observe(
            "ingest_metrics",
            F.count(F.lit(1)).alias("rows"),
            F.sum("n_chars").alias("chars"),
        )
    )
    q = (
        sdf.writeStream.format("noop")
        .option("checkpointLocation", str(tmp_path / "ck_observe"))
        .start()
    )
    try:
        q.processAllAvailable()
        progress = q.recentProgress
    finally:
        q.stop()

    observed = [
        p["observedMetrics"]["ingest_metrics"]
        for p in progress
        if p.get("observedMetrics", {}).get("ingest_metrics")
    ]
    assert len(observed) >= 2  # one per non-empty micro-batch
    assert sum(m["rows"] for m in observed) == truth_rows
    assert sum(m["chars"] for m in observed) == truth_chars


def test_aqe_skew_join_splits_hot_partition(spark):
    """The runtime answer to key skew: with AQE skew-join on, a sort-merge
    join whose build of one key dwarfs the median is split at runtime —
    the final adaptive plan marks the join ``skew=true``. This is the
    mechanism the docs point moderate-skew users to BEFORE reaching for
    manual salting (operators/skew.py handles the degenerate cases)."""
    pad = "x" * 200
    # 30k rows of key 0 (the hot key) + keys 1..1999 one row each
    left = spark.range(0, 32_000).select(
        F.when(F.col("id") < 30_000, F.lit(0))
        .otherwise(F.col("id") - 30_000 + 1)
        .alias("k"),
        F.concat(F.lit(pad), F.col("id").cast("string")).alias("payload"),
    )
    right = spark.range(0, 2_000).select(
        F.col("id").alias("k"),
        F.concat(F.lit(pad), F.lit("r")).alias("rpayload"),
    )
    conf_keys = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    saved = {k: spark.conf.get(k, None) for k in conf_keys}
    try:
        for k, v in conf_keys.items():
            spark.conf.set(k, v)
        joined = left.join(right, "k")
        # collect() executes THIS DataFrame's plan (a .count() would build a
        # different query and leave this one's adaptive plan unfinalized)
        assert len(joined.collect()) == 30_000 + 1_999  # hot key + matched tail
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_incremental_cycle_against_persisted_artifacts(spark, sf_dir, tmp_path):
    """The incremental dedup/scrub cycle probing RELOADED on-disk artifacts
    (what production actually does) matches the recomputed path exactly,
    keeps the O(batch) plan shape, and the loader fails loudly on parameter
    or schema drift between the writing and reading cycle."""
    import json
    import os

    from eth_event_stream_spark.plans.curation import (
        corpus_chunk_index,
        scrub_against_index,
    )
    from eth_event_stream_spark.plans.incremental import (
        _ARTIFACT_META,
        _split,
        dedup_incremental_pairs,
        incremental_pairs_from_artifacts,
        load_corpus_artifacts,
        persist_corpus_artifacts,
    )

    corpus, batch = _split(spark, sf_dir)
    art_dir = str(tmp_path / "cycle_artifacts")
    persist_corpus_artifacts(corpus, art_dir)
    arts = load_corpus_artifacts(spark, art_dir)

    # 1. pair probe from artifacts == recomputed query (the driver-oracled one)
    from_arts = incremental_pairs_from_artifacts(batch, arts)
    got = sorted(map(tuple, from_arts.collect()))
    want = sorted(map(tuple, dedup_incremental_pairs(spark, sf_dir).collect()))
    assert got and got == want

    # 2. O(batch) plan gates hold with the parquet-backed index: the batch
    # side broadcasts (hash probe + guards), nothing falls back to a
    # shuffle join of the corpus index or a cartesian
    plan = from_arts._sc._jvm.PythonSQLUtils.explainString(
        from_arts._jdf.queryExecution(), "formatted"
    )
    assert "BroadcastHashJoin" in plan
    assert "BroadcastHashJoin LeftAnti" in plan  # hot-shingle guard on batch side
    assert "SortMergeJoin" not in plan
    assert "CartesianProduct" not in plan

    # 3. span scrub against the reloaded chunk index == recomputed index
    s_arts = sorted(
        map(tuple, scrub_against_index(batch, arts["chunk_index"]).collect())
    )
    s_rec = sorted(
        map(tuple, scrub_against_index(batch, corpus_chunk_index(corpus)).collect())
    )
    assert s_arts == s_rec

    # 4a. parameter drift: artifacts written under a different band count
    # must be refused, not probed
    meta_path = os.path.join(art_dir, _ARTIFACT_META)
    meta = json.load(open(meta_path))
    meta["n_bands"] += 1
    json.dump(meta, open(meta_path, "w"))
    with pytest.raises(ValueError, match="band-count or cap change"):
        load_corpus_artifacts(spark, art_dir)
    meta["n_bands"] -= 1
    json.dump(meta, open(meta_path, "w"))

    # 4b. schema drift: a missing column in a reloaded artifact is refused
    bi = os.path.join(art_dir, "band_index.parquet")
    spark.read.parquet(bi).drop("band_idx").write.mode("overwrite").parquet(
        bi + ".tmp"
    )
    import shutil

    shutil.rmtree(bi)
    os.rename(bi + ".tmp", bi)
    with pytest.raises(ValueError, match="schema drift"):
        load_corpus_artifacts(spark, art_dir)


def test_brute_cosine_arrow_twin_matches_jvm(spark, sf_dir):
    """The Arrow/numpy brute-force cosine twin returns the same rounded
    top-k as the registered JVM fold — the measured fast path
    (vectors.brute_cosine_topk_arrow docstring) without the oracle risk
    of registering a pairwise-summed float."""
    from eth_event_stream_spark.plans import QUERIES
    from eth_event_stream_spark.plans.vectors import brute_cosine_topk_arrow

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    got = [
        (r["vec_id"], r["label"], r["cosine"])
        for r in brute_cosine_topk_arrow(e, k=20).collect()
    ]
    want = [
        (r["vec_id"], r["label"], r["cosine"])
        for r in QUERIES["similarity_topk_bruteforce"].fn(spark, sf_dir).collect()
    ]
    assert got == want


def test_compact_parquet_dir_binpacks_and_preserves_clustering(spark, sf_dir, tmp_path):
    """Small-file compaction: 64 tiny files bin-pack to the byte-sized
    output count, content survives exactly, and the sort_cols form keeps
    every output file on a disjoint key range (footer-prunable)."""
    import glob

    import pyarrow.parquet as pq

    from eth_event_stream_spark.plans.layout import compact_parquet_dir

    src = str(tmp_path / "fragmented")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    orders.repartition(64).write.parquet(src)
    n_src = len(glob.glob(f"{src}/*.parquet"))
    assert n_src == 64

    total = sum(
        __import__("os").path.getsize(f) for f in glob.glob(f"{src}/*.parquet")
    )
    target = max(1, total // 4)  # aim for ~4 output files

    # pure bin-pack
    packed = str(tmp_path / "packed")
    stats = compact_parquet_dir(spark, src, packed, target_bytes=target)
    n_out = len(glob.glob(f"{packed}/*.parquet"))
    assert stats["n_files_in"] == 64
    assert n_out == stats["n_files_out"] <= 6
    a = sorted(tuple(r) for r in spark.read.parquet(packed).collect())
    b = sorted(tuple(r) for r in orders.collect())
    assert a == b

    # clustered compaction: disjoint o_orderkey ranges per output file
    clustered = str(tmp_path / "packed_sorted")
    compact_parquet_dir(
        spark, src, clustered, target_bytes=target, sort_cols=["o_orderkey"]
    )
    spans = []
    for f in sorted(glob.glob(f"{clustered}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        los, his = [], []
        for rg in range(md.num_row_groups):
            col = md.row_group(rg).column(0)  # o_orderkey is the first column
            assert col.path_in_schema == "o_orderkey"
            los.append(col.statistics.min)
            his.append(col.statistics.max)
        spans.append((min(los), max(his)))
    spans.sort()
    assert len(spans) >= 2
    for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
        assert hi1 <= lo2, (hi1, lo2)  # ranges do not overlap
    c = sorted(tuple(r) for r in spark.read.parquet(clustered).collect())
    assert c == b


def test_keep_best_picks_the_cluster_argmax(spark, sf_dir):
    """dedup_keep_best invariants, checked against the cluster labels and
    quality frames it composes (structure-free on the SELECTION step): the
    kept doc belongs to its cluster, n_members matches the true cluster
    size, and no other member beats the winner on the
    (quality_pass, n_tokens, -doc_id) ranking key."""
    from eth_event_stream_spark.plans.pipeline import (
        dedup_groups_connected,
        dedup_keep_best,
        quality_score_of,
    )
    from eth_event_stream_spark.plans.catalog import t as tbl

    groups = {
        r["doc_id"]: r["canonical_id"]
        for r in dedup_groups_connected(spark, sf_dir).collect()
    }
    quality = {
        r["doc_id"]: (r["quality_pass"], r["n_tokens"])
        for r in quality_score_of(tbl(spark, sf_dir, "documents")).collect()
    }
    from collections import defaultdict

    members = defaultdict(list)
    for d, c in groups.items():
        members[c].append(d)

    got = dedup_keep_best(spark, sf_dir).collect()
    assert len(got) > 0
    seen_clusters = set()
    for r in got:
        c, keep = r["canonical_id"], r["keep_doc_id"]
        seen_clusters.add(c)
        assert groups[keep] == c
        assert r["n_members"] == len(members[c]) > 1
        key = lambda d: (quality[d][0], quality[d][1], -d)
        assert max(members[c], key=key) == keep
        assert (r["kept_quality_pass"], r["kept_n_tokens"]) == quality[keep]
    # every multi-member cluster is reported, none invented
    assert seen_clusters == {c for c, m in members.items() if len(m) > 1}


@pytest.mark.slow  # full-recompute equivalence soak (~17 s) — full tier
def test_cc_merge_batch_equals_full_recompute(spark):
    """cc_merge_batch == full min-label propagation over the union edge
    set, across seeded random graphs and multi-batch arrival orders —
    including batches that introduce brand-new nodes and edges that
    bridge previously separate components."""
    import random

    from eth_event_stream_spark.operators.graph import (
        cc_merge_batch,
        min_label_propagation,
    )

    def full_cc(ids, edges):
        nodes = spark.createDataFrame([(i,) for i in ids], ["id"])
        if edges:
            e = spark.createDataFrame(edges, ["src", "dst"])
            e = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        else:
            e = spark.createDataFrame([], "src bigint, dst bigint")
        return {r["id"]: r["label"] for r in min_label_propagation(nodes, e).collect()}

    for seed in (1, 2):
        rnd = random.Random(seed)
        ids = list(range(30))
        all_edges = [(rnd.choice(ids), rnd.choice(ids)) for _ in range(35)]
        b1 = [e for e in all_edges[:15] if e[0] < 22 and e[1] < 22]
        rest = [e for e in all_edges[:15] if not (e[0] < 22 and e[1] < 22)] + all_edges[15:]
        labels = spark.createDataFrame(
            list(full_cc(ids[:22], b1).items()), ["id", "label"]
        )
        labels = cc_merge_batch(
            labels,
            spark.createDataFrame(rest[:10], ["src", "dst"]),
            new_nodes=spark.createDataFrame([(i,) for i in ids[22:]], ["id"]),
        )
        labels = cc_merge_batch(labels, spark.createDataFrame(rest[10:], ["src", "dst"]))
        got = {r["id"]: r["label"] for r in labels.collect()}
        assert got == full_cc(ids, all_edges), seed


def test_cc_maintainer_streaming_parity_and_replay(spark, tmp_path):
    """Stream near-dup edges in 3 chunks through CCMaintainer: the published
    labels equal a one-shot full propagation over all edges; replaying an
    applied epoch is a no-op; and because component merging is commutative,
    the SAME edges delivered in a different chunk order land on the same
    fixpoint (no order frontier needed, unlike the warehouse maintainers)."""
    import os
    import time as _time

    import pyarrow as pa
    import pyarrow.parquet as pq

    from eth_event_stream_spark.operators.graph import min_label_propagation
    from eth_event_stream_spark.plans.incremental import CCMaintainer

    ids = list(range(20))
    all_edges = [(0, 1), (1, 2), (5, 6), (6, 7), (2, 5), (10, 11), (12, 13), (11, 12), (3, 19)]
    chunk_orders = [
        [all_edges[:3], all_edges[3:6], all_edges[6:]],
        [all_edges[6:], all_edges[:3], all_edges[3:6]],  # commuted arrival
    ]
    nodes = spark.createDataFrame([(i,) for i in ids], ["id"])
    sym = spark.createDataFrame(all_edges, ["src", "dst"])
    sym = sym.union(sym.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    want = sorted((r.id, r.label) for r in min_label_propagation(nodes, sym).collect())

    arrow_schema = pa.schema([("src", pa.int64()), ("dst", pa.int64())])
    for oi, chunks in enumerate(chunk_orders):
        src_dir = tmp_path / f"edges_{oi}"
        src_dir.mkdir()
        now = _time.time()
        for i, rows in enumerate(chunks):
            f = src_dir / f"chunk-{i}.parquet"
            pq.write_table(
                pa.Table.from_pylist(
                    [{"src": a, "dst": b} for a, b in rows], schema=arrow_schema
                ),
                str(f),
            )
            os.utime(f, (now - 30 + i * 10, now - 30 + i * 10))

        m = CCMaintainer(str(tmp_path / f"cc_labels_{oi}"))
        m.bootstrap(nodes.select("id", F.col("id").alias("label")))
        sdf = (
            spark.readStream.schema("src bigint, dst bigint")
            .option("maxFilesPerTrigger", 1)
            .parquet(str(src_dir))
        )
        q = (
            sdf.writeStream.foreachBatch(m)
            .option("checkpointLocation", str(tmp_path / f"ck_cc_{oi}"))
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = sorted((r.id, r.label) for r in m.current(spark).collect())
        assert got == want, f"order {oi}"
        # epoch replay no-op
        m(spark.createDataFrame([(0, 19)], ["src", "dst"]), 0)
        assert sorted((r.id, r.label) for r in m.current(spark).collect()) == want


def test_cc_merge_batch_degenerate_batches(spark):
    """cc_merge_batch edge cases: an EMPTY batch is a label-preserving
    no-op, self-loops and duplicate edges change nothing, and a batch
    whose edges all land inside one existing component is also a no-op."""
    from eth_event_stream_spark.operators.graph import (
        cc_merge_batch,
        min_label_propagation,
    )

    nodes = spark.createDataFrame([(i,) for i in range(8)], ["id"])
    e = spark.createDataFrame([(0, 1), (1, 2), (4, 5)], ["src", "dst"])
    sym = e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = min_label_propagation(nodes, sym)
    want = sorted(tuple(r) for r in labels.collect())

    empty = spark.createDataFrame([], "src bigint, dst bigint")
    assert sorted(tuple(r) for r in cc_merge_batch(labels, empty).collect()) == want

    noise = spark.createDataFrame(
        [(3, 3), (0, 1), (1, 0), (2, 0), (4, 5), (5, 4)], ["src", "dst"]
    )
    assert sorted(tuple(r) for r in cc_merge_batch(labels, noise).collect()) == want


def test_release_manifest_write_and_verify(spark, sf_dir, tmp_path):
    """Release integrity cycle: manifest a written release, verify clean;
    then corrupt one shard, delete another, add a stray file — verify must
    raise naming exactly the damaged files."""
    import os
    import shutil

    from eth_event_stream_spark.plans.layout import (
        ReleaseIntegrityError,
        write_manifest,
        verify_release,
    )

    out = str(tmp_path / "release")
    spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(4).write.parquet(out)
    m = write_manifest(spark, out)
    docs_n = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    assert m["total_rows"] == docs_n and m["n_files"] == 4
    assert verify_release(spark, out)["total_rows"] == docs_n

    parts = sorted(f for f in os.listdir(out) if f.endswith(".parquet"))
    # corrupt shard 0 (append a byte), delete shard 1, add a stray file.
    # Drop Hadoop's local-FS .crc sidecar for the corrupted shard — a real
    # damaged mirror copy carries no matching sidecar either, and Hadoop's
    # own crc check would otherwise fire before OUR manifest check can
    with open(os.path.join(out, parts[0]), "ab") as f:
        f.write(b"\x00")
    crc = os.path.join(out, f".{parts[0]}.crc")
    if os.path.exists(crc):
        os.remove(crc)
    os.remove(os.path.join(out, parts[1]))
    shutil.copy(os.path.join(out, parts[2]), os.path.join(out, "stray.parquet"))

    import pytest as _pytest

    with _pytest.raises(ReleaseIntegrityError) as ei:
        verify_release(spark, out)
    msg = str(ei.value)
    assert parts[1] in msg and "missing" in msg
    assert "stray.parquet" in msg and "extra" in msg
    # the appended byte changes length+md5 -> corrupted names shard 0;
    # note parquet readers may still read it, the CHECKSUM is the contract
    assert parts[0] in msg and "corrupted" in msg


def test_release_manifest_nested_layout_no_basename_collision(spark, sf_dir, tmp_path):
    """Regression: manifest keys are paths RELATIVE to the release dir, not
    basenames. On a partitioned/nested layout (e.g. the cell-partitioned ANN
    store) every subdirectory ships a same-named part-00000 shard — keyed by
    basename they collide in the manifest dict (last wins) and corrupting one
    of them verifies clean. Build a two-subdir release with identical shard
    basenames, corrupt ONE nested shard, and demand the verifier name it."""
    import os
    import shutil

    from eth_event_stream_spark.plans.layout import (
        ReleaseIntegrityError,
        write_manifest,
        verify_release,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "release")
    # partitioned layout: lang=XX/ subdirs, one shard each — same basenames
    docs.repartition(1).write.partitionBy("lang").parquet(out)

    m = write_manifest(spark, out)
    assert m["total_rows"] == docs.count()
    langs = sorted(d for d in os.listdir(out) if d.startswith("lang="))
    assert len(langs) >= 2
    basenames = {
        f
        for d in langs
        for f in os.listdir(os.path.join(out, d))
        if f.endswith(".parquet")
    }
    # every manifest key is dir-qualified, and the shard set is NOT collapsed
    assert all("/" in k for k in m["files"]), sorted(m["files"])
    assert m["n_files"] == len(langs) and len(basenames) < m["n_files"]
    verify_release(spark, out)

    # corrupt exactly one nested shard (drop the Hadoop .crc sidecar so OUR
    # check fires, not the local-FS checksum layer)
    victim_dir = os.path.join(out, langs[0])
    shard = next(f for f in os.listdir(victim_dir) if f.endswith(".parquet"))
    with open(os.path.join(victim_dir, shard), "ab") as f:
        f.write(b"\x00")
    crc = os.path.join(victim_dir, f".{shard}.crc")
    if os.path.exists(crc):
        os.remove(crc)

    import pytest as _pytest

    with _pytest.raises(ReleaseIntegrityError) as ei:
        verify_release(spark, out)
    assert f"{langs[0]}/{shard}" in str(ei.value) and "corrupted" in str(ei.value)


def test_release_manifest_uri_hostile_dir_and_nonlocal_guard(spark, sf_dir, tmp_path):
    """Regression (ADVICE r9): Spark reports file paths in percent-encoded
    URI form, so a release dir containing a space and a literal '%' used to
    fail the prefix strip and keys silently became full URIs. Keys must be
    the REAL on-disk relative paths, and a key that was never relativized
    (non-local release) must fail loudly."""
    import os

    import pytest as _pytest

    from eth_event_stream_spark.plans.layout import (
        ReleaseIntegrityError,
        _manifest_key,
        write_manifest,
        verify_release,
    )

    out = str(tmp_path / "rel 100% final")  # space + percent in the dir name
    spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(2).write.parquet(out)
    m = write_manifest(spark, out)
    assert m["n_files"] == 2
    for k in m["files"]:
        assert ":/" not in k and "%2" not in k, k  # relativized AND decoded
        assert os.path.exists(os.path.join(out, k)), k
    verify_release(spark, out)

    # an unstripped key (e.g. an s3a:// release) fails loudly, never a
    # silent full-URI manifest key
    with _pytest.raises(ReleaseIntegrityError):
        _manifest_key("s3a://bucket/release/part-0.parquet")
