"""Incremental corpus curation: dedup a NEW document batch against an
already-curated corpus without recomputing corpus-side pair work.

The production problem at 100 TB: the corpus is petabytes and already
deduped; every ingest cycle brings a small new batch. Re-running all-corpus
near-dup (even the capped composition) per cycle re-pays the full corpus
cost. The incremental shape pays it once: the corpus's LSH band index and
hot-shingle document-frequency statistics are PERSISTED ARTIFACTS of the
previous run, and each cycle only (a) computes signatures for the new batch
(small), (b) probes the corpus band index with the batch side BROADCAST —
the corpus index streams past, it is never shuffled or re-hashed, and
(c) verifies only the probed candidates with the capped Jaccard.

In this testbed there is no persisted state, so the queries recompute the
corpus artifacts from the table — but the PLAN keeps the corpus on the
stream-past side of every join (gated), which is the property that makes
the cycle cost O(batch), not O(corpus).

Split convention: ``doc_id % 5 == 0`` is the new batch (1 in 5 documents),
the rest is the curated corpus — deterministic, scale-independent, and it
interleaves new docs across the id range so probes hit real candidates.
Batch-internal duplicates are out of scope here (the standard
``dedup_collapse_then_lsh_verify`` composition runs on the batch first);
this operator answers only "does the new doc duplicate the CORPUS".

All caps follow the production dedup path (``plans/pipeline.py``): corpus
LSH buckets above LSH_BUCKET_CAP are dropped from the probe index, and the
shingle df-cap is computed over the CORPUS ONLY (the persisted statistic —
a new batch never updates it mid-cycle), applied to both sides' shingle
sets, so the Jaccard is exact over the capped universe. The oracles apply
identical cuts.

Reference has no dedup surface at all; this extends the training-data
pipeline operators (driver brief) to the incremental-ingest regime.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import t_parallel
from .pipeline import (
    JACCARD_THRESHOLD,
    LSH_BUCKET_CAP,
    N_BANDS,
    SHINGLE_DF_CAP,
    _distinct_shingles,
    _minhash_prep_spark,
    _SPARK_SHINGLES,
    _sql_minhash,
    _SQL_SHINGLES,
)
from .registry import register

# -- shared SQL fragments (corpus/batch parameterized) -----------------------

_SQL_SPLIT = """
    corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 0),
    batch  AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0)"""


def _sql_shingle_prep(src: str, alias: str) -> str:
    return f"""
    {alias} AS (
      SELECT doc_id, {_SQL_SHINGLES} AS shingles
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM {src})
      WHERE LEN(toks) >= 3)"""


def _sql_bands_of(sh: str, alias: str) -> str:
    mh = ", ".join(f"{_sql_minhash(j)} AS h{j}" for j in range(8))
    bands = ", ".join(f"h{2 * b} || h{2 * b + 1} AS band{b}" for b in range(N_BANDS))
    return f"""
    {alias} AS (
      SELECT doc_id, {bands}
      FROM (SELECT doc_id, {mh} FROM {sh}))"""


def _sql_long(bands: str, alias: str) -> str:
    return f"""
    {alias} AS (
      {" UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, band{b} AS key FROM {bands}"
        for b in range(N_BANDS)
      )})"""


_SQL_INCREMENTAL_BODY = f"""
    WITH {_SQL_SPLIT},
    {_sql_shingle_prep("corpus", "csh")},
    {_sql_shingle_prep("batch", "bsh")},
    {_sql_bands_of("csh", "cbands")},
    {_sql_bands_of("bsh", "bbands")},
    {_sql_long("cbands", "clong")},
    {_sql_long("bbands", "blong")},
    okbucket AS (
      SELECT band_idx, key FROM clong
      GROUP BY band_idx, key HAVING COUNT(*) <= {LSH_BUCKET_CAP}),
    cands AS (
      SELECT DISTINCT b.doc_id AS doc_new, c.doc_id AS doc_corpus
      FROM blong b
      JOIN clong c ON b.band_idx = c.band_idx AND b.key = c.key
      JOIN okbucket ok ON ok.band_idx = c.band_idx AND ok.key = c.key),
    cex AS (SELECT DISTINCT doc_id, UNNEST(shingles) AS s FROM csh),
    -- the persisted artifact is the (tiny) HOT list, not a corpus-sized
    -- keep list: batch shingles absent from the corpus are real differences
    -- and must stay in the Jaccard denominator
    hot AS (SELECT s FROM (SELECT s, COUNT(*) AS df FROM cex GROUP BY s)
            WHERE df > {SHINGLE_DF_CAP}),
    cexk AS (SELECT doc_id, s FROM cex WHERE s NOT IN (SELECT s FROM hot)),
    bexd AS (SELECT DISTINCT doc_id, UNNEST(shingles) AS s FROM bsh),
    bexk AS (SELECT doc_id, s FROM bexd WHERE s NOT IN (SELECT s FROM hot)),
    csizes AS (SELECT doc_id, COUNT(*) AS n FROM cexk GROUP BY doc_id),
    bsizes AS (SELECT doc_id, COUNT(*) AS n FROM bexk GROUP BY doc_id),
    inter AS (
      SELECT ca.doc_new, ca.doc_corpus, COUNT(*) AS n_common
      FROM cands ca
      JOIN bexk nb ON nb.doc_id = ca.doc_new
      JOIN cexk cc ON cc.doc_id = ca.doc_corpus AND cc.s = nb.s
      GROUP BY ca.doc_new, ca.doc_corpus),
    verified AS (
      SELECT i.doc_new, i.doc_corpus,
             CAST(n_common AS DOUBLE) / (sb.n + sc.n - n_common) AS jaccard
      FROM inter i
      JOIN bsizes sb ON sb.doc_id = i.doc_new
      JOIN csizes sc ON sc.doc_id = i.doc_corpus
      WHERE CAST(n_common AS DOUBLE) / (sb.n + sc.n - n_common)
            >= {JACCARD_THRESHOLD})"""


def _split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    d = t_parallel(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        d.filter(F.col("doc_id") % 5 != 0),
        d.filter(F.col("doc_id") % 5 == 0),
    )


def _unpivot_bands(bands: DataFrame) -> DataFrame:
    return bands.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(b).alias("band_idx"), F.col(f"band{b}").alias("key"))
                    for b in range(N_BANDS)
                ]
            )
        ).alias("b"),
    ).select("doc_id", "b.band_idx", "b.key")


def corpus_band_index(corpus: DataFrame) -> DataFrame:
    """(doc_id, band_idx, key) LSH index of the curated corpus with the
    hot-bucket guard applied — the artifact a production cycle PERSISTS
    (here recomputed from the corpus table). The hot set is tiny by
    construction, so the guard is a broadcast LEFT ANTI; the index itself
    is never shuffled by the probe."""
    clong = _unpivot_bands(_minhash_prep_spark(corpus))
    hot_buckets = (
        clong.groupBy("band_idx", "key")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > LSH_BUCKET_CAP)
        .select("band_idx", "key")
    )
    return clong.join(F.broadcast(hot_buckets), ["band_idx", "key"], "left_anti")


def batch_band_rows(new_docs: DataFrame) -> DataFrame:
    """(doc_id, band_idx, key) band rows of a NEW batch, computed as a pure
    per-row PROJECTION (no explode/groupBy): each salt's md5 digests are
    materialized once per document as an array column, then each minhash
    lane is an array_min over 8-hex slices. Identical signatures to the
    corpus side's explode+aggregate form (same strings, same min), but
    STATELESS — which is what lets the nomination run on an unbounded
    stream with zero streaming state (see dedup_incremental_nominate_stream).
    The explode form remains the corpus-side choice because it bounds
    per-row memory by shingle count for pathological documents."""
    toks = new_docs.select(
        "doc_id", F.split(F.lower(F.col("text")), " ", -1).alias("toks")
    ).filter(F.size("toks") >= 3)
    sh = toks.select("doc_id", F.expr(_SPARK_SHINGLES).alias("shingles"))
    digs = sh.select(
        "doc_id",
        *[
            F.expr(f"transform(shingles, s -> md5(concat('{d}:', s)))").alias(f"d{d}")
            for d in range(2)
        ],
    )
    lanes = digs.select(
        "doc_id",
        *[
            F.expr(
                f"array_min(transform(d{j // 4}, "
                f"x -> substring(x, {8 * (j % 4) + 1}, 8)))"
            ).alias(f"h{j}")
            for j in range(8)
        ],
    )
    bands = lanes.select(
        "doc_id",
        *[
            F.concat(F.col(f"h{2 * b}"), F.col(f"h{2 * b + 1}")).alias(f"band{b}")
            for b in range(N_BANDS)
        ],
    )
    return _unpivot_bands(bands)


def _nominate(corpus: DataFrame, batch: DataFrame) -> DataFrame:
    """Distinct (doc_new, doc_corpus) candidates: the batch band rows
    (small, broadcast) probe the guarded corpus index (streams past)."""
    probe = batch_band_rows(batch).select(
        "band_idx", "key", F.col("doc_id").alias("doc_new")
    )
    return (
        corpus_band_index(corpus)
        .join(F.broadcast(probe), ["band_idx", "key"])
        .select("doc_new", F.col("doc_id").alias("doc_corpus"))
        .distinct()
    )


def _corpus_hot_shingles(cex: DataFrame) -> DataFrame:
    """Shingles whose corpus document frequency exceeds the df cap — the
    (tiny) persisted statistic both sides' shingle sets are cut by."""
    return (
        cex.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
        .select("s")
    )


def verify_pairs(cands: DataFrame, corpus: DataFrame, batch: DataFrame) -> DataFrame:
    """Capped-Jaccard verify of nominated (doc_new, doc_corpus) pairs.

    The df-cap statistic comes from the CORPUS only (the persisted artifact
    of the previous cycle — a new batch never updates it mid-cycle), is
    applied to BOTH sides' shingle sets, and the corpus shingle index is
    semi-joined down to the probed candidates before the intersection join.
    Shared by the batch query and the per-micro-batch verify of the
    streaming cycle (``foreachBatch`` in the parity test)."""
    cex = _distinct_shingles(corpus)
    hot_shingles = _corpus_hot_shingles(cex)
    cexk = cex.join(F.broadcast(hot_shingles), "s", "left_anti")
    return _verify_with_index(cands, cexk, hot_shingles, batch)


def _verify_with_index(
    cands: DataFrame, cexk: DataFrame, hot_shingles: DataFrame, batch: DataFrame
) -> DataFrame:
    """Verify body over a PREBUILT capped corpus shingle index ``cexk``
    (doc_id, s) and hot-shingle list — the form the persisted-artifact
    cycle calls with RELOADED frames, and ``verify_pairs`` calls with
    recomputed ones; one body, so the two regimes cannot drift."""
    bex = _distinct_shingles(batch)
    bexk = bex.join(F.broadcast(hot_shingles), "s", "left_anti")
    bsizes = bexk.groupBy("doc_id").agg(F.count("*").alias("nb"))

    cand_corpus = cands.select(F.col("doc_corpus").alias("doc_id")).distinct()
    cexc = cexk.join(F.broadcast(cand_corpus), "doc_id", "left_semi")
    # corpus-side sizes AFTER the candidate semi-join: the semi-join keeps
    # every shingle row of a retained doc, so the counts are identical to
    # full-corpus sizes for the only docs whose size is ever consumed — and
    # the broadcast below ships O(candidates), never O(corpus)
    csizes = cexc.groupBy("doc_id").agg(F.count("*").alias("nc"))

    a = bexk.select(F.col("doc_id").alias("doc_new"), "s")
    b = cexc.select(F.col("doc_id").alias("doc_corpus"), "s")
    inter = (
        F.broadcast(cands)
        .join(a, "doc_new")
        .join(b, ["doc_corpus", "s"])
        .groupBy("doc_new", "doc_corpus")
        .agg(F.count("*").alias("n_common"))
    )
    sb = bsizes.select(F.col("doc_id").alias("doc_new"), "nb")
    sc = csizes.select(F.col("doc_id").alias("doc_corpus"), "nc")
    j = (
        inter.join(F.broadcast(sb), "doc_new")
        .join(F.broadcast(sc), "doc_corpus")
        .withColumn(
            "jaccard",
            F.col("n_common").cast("double")
            / (F.col("nb") + F.col("nc") - F.col("n_common")),
        )
    )
    return j.filter(F.col("jaccard") >= F.lit(JACCARD_THRESHOLD)).select(
        "doc_new", "doc_corpus", "jaccard"
    )


def _incremental_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, batch = _split(spark, sf_dir)
    # probe: batch signatures (small, broadcast) against the corpus band
    # index (streams past — at scale this is a stored table, not recomputed)
    cands = _nominate(corpus, batch)
    return verify_pairs(cands, corpus, batch)


@register(
    "dedup_incremental_pairs",
    oracle=f"""{_SQL_INCREMENTAL_BODY}
    SELECT doc_new, doc_corpus, jaccard FROM verified
    """,
)
def dedup_incremental_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs between a NEW batch (doc_id % 5 == 0) and the curated
    CORPUS (the rest) — the incremental-ingest dedup cycle. Cost is
    O(batch): the batch side broadcasts into both the band probe and the
    candidate/intersection joins; the corpus band index and shingle index
    stream past (at 100 TB they are persisted artifacts of the previous
    cycle, scanned not recomputed); the corpus-side hot-bucket cap and the
    corpus-df shingle cap bound every join group exactly like the full
    production composition."""
    return _incremental_pairs(spark, sf_dir)


@register(
    "dedup_incremental_accept",
    oracle=f"""{_SQL_INCREMENTAL_BODY}
    SELECT doc_id FROM batch
    WHERE doc_id NOT IN (SELECT doc_new FROM verified)
    """,
)
def dedup_incremental_accept(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ingest decision: new-batch documents with NO corpus near-dup —
    the rows an incremental curation cycle appends to the corpus. The
    NOT-IN over verified pairs plans as a LEFT ANTI hash join of the (tiny)
    rejected-id set against the batch; everything upstream is
    ``dedup_incremental_pairs``' probe/verify plan."""
    _, batch = _split(spark, sf_dir)
    rejected = _incremental_pairs(spark, sf_dir).select(
        F.col("doc_new").alias("doc_id")
    )
    return batch.select("doc_id").join(rejected, "doc_id", "left_anti")


# ---------------------------------------------------------------------------
# Persisted artifacts: the production ingest cycle's on-disk state
# ---------------------------------------------------------------------------

# name -> {column: spark dtype}; the loader validates NAMES AND TYPES — a
# dtype drift (e.g. a future writer re-encoding band keys) would make the
# probe join silently match nothing, which is worse than a schema error
_ARTIFACT_SCHEMAS = {
    "band_index": {"doc_id": "bigint", "band_idx": "int", "key": "string"},
    "hot_shingles": {"s": "string"},
    "shingle_index": {"doc_id": "bigint", "s": "string"},
    "chunk_index": {"h": "string"},
}
_ARTIFACT_META = "artifact_meta.json"


def _artifact_meta() -> dict:
    from .curation import SCRUB_CHUNK_TOKENS

    return {
        "n_bands": N_BANDS,
        "lsh_bucket_cap": LSH_BUCKET_CAP,
        "shingle_df_cap": SHINGLE_DF_CAP,
        "scrub_chunk_tokens": SCRUB_CHUNK_TOKENS,
    }


def persist_corpus_artifacts(corpus: DataFrame, out_dir: str) -> None:
    """Write the artifacts an incremental ingest cycle probes — the state
    this module's docstring promises production persists instead of
    recomputing per cycle:

    - ``band_index``: the hot-bucket-guarded LSH band index (doc_id,
      band_idx, key);
    - ``hot_shingles``: the corpus-df cap statistic (the tiny hot list);
    - ``shingle_index``: the df-capped corpus shingle inverted index
      (doc_id, s) the Jaccard verify intersects against;
    - ``chunk_index``: distinct md5 of every corpus span chunk
      (plans/curation.py scrub);
    - ``artifact_meta.json``: the parameters the artifacts were built
      under (band count, caps, chunk size) — ``load_corpus_artifacts``
      refuses a mismatch, so a parameter change between cycles fails
      loudly instead of silently probing an incompatible index.

    At 100 TB these writes are partitioned parquet on object storage
    (band/shingle index bucketed by their probe keys); the meta sidecar is
    one tiny JSON."""
    import json
    import os

    from .curation import corpus_chunk_index

    # materialize the shingle index and hot list once: cex feeds the hot
    # aggregate AND the anti-joined shingle_index write, and hot feeds its
    # own write AND that anti-join — without the checkpoint the corpus
    # scan + shingle explode would re-run per consumer (this function IS
    # the timed incremental_build bench row)
    cex = _distinct_shingles(corpus).localCheckpoint(eager=True)
    hot = _corpus_hot_shingles(cex).localCheckpoint(eager=True)
    frames = {
        "band_index": corpus_band_index(corpus),
        "hot_shingles": hot,
        "shingle_index": cex.join(F.broadcast(hot), "s", "left_anti"),
        "chunk_index": corpus_chunk_index(corpus),
    }
    for name, df in frames.items():
        df.write.mode("overwrite").parquet(os.path.join(out_dir, f"{name}.parquet"))
    with open(os.path.join(out_dir, _ARTIFACT_META), "w") as f:
        json.dump(_artifact_meta(), f)


def load_corpus_artifacts(spark: SparkSession, art_dir: str) -> dict[str, DataFrame]:
    """Reload a previous cycle's artifacts, validating build parameters and
    schemas — band-count or cap drift between the writer and this reader
    raises instead of producing silently-wrong probes."""
    import json
    import os

    with open(os.path.join(art_dir, _ARTIFACT_META)) as f:
        meta = json.load(f)
    want = _artifact_meta()
    if meta != want:
        raise ValueError(
            f"corpus artifacts at {art_dir} were built under {meta}, but this "
            f"build expects {want} — rebuild the artifacts (a band-count or "
            "cap change invalidates the persisted index)"
        )
    arts: dict[str, DataFrame] = {}
    for name, cols in _ARTIFACT_SCHEMAS.items():
        df = spark.read.parquet(os.path.join(art_dir, f"{name}.parquet"))
        if dict(df.dtypes) != cols:
            raise ValueError(
                f"artifact {name} at {art_dir} has schema {sorted(df.dtypes)}, "
                f"expected {sorted(cols.items())} — schema drift between cycles"
            )
        arts[name] = df
    return arts


def incremental_pairs_from_artifacts(
    batch: DataFrame, arts: dict[str, DataFrame]
) -> DataFrame:
    """``dedup_incremental_pairs`` probing RELOADED on-disk artifacts — the
    real production cycle shape: only the batch is hashed this cycle; the
    corpus-side band index and shingle index are parquet scans that stream
    past the broadcast batch (same O(batch) plan as the recomputed path,
    gated in tests/test_scale_ops.py)."""
    probe = batch_band_rows(batch).select(
        "band_idx", "key", F.col("doc_id").alias("doc_new")
    )
    cands = (
        arts["band_index"]
        .join(F.broadcast(probe), ["band_idx", "key"])
        .select("doc_new", F.col("doc_id").alias("doc_corpus"))
        .distinct()
    )
    return _verify_with_index(cands, arts["shingle_index"], arts["hot_shingles"], batch)


def dedup_incremental_nominate_stream(
    new_docs: DataFrame, corpus_index: DataFrame
) -> DataFrame:
    """Streaming twin of the nomination stage: an UNBOUNDED stream of new
    documents probes the static corpus band index with ZERO streaming state.

    The per-row projection signature (``batch_band_rows``) has no
    aggregation, so the whole nomination is a stateless stream-static inner
    join — append mode, no watermark, no state store; Spark re-plans the
    static side per micro-batch. Emits one row per (new doc, corpus doc,
    band) agreement; the downstream verify (per micro-batch via
    ``foreachBatch``, where it is plain batch work over the nominated pairs
    only) dedupes band multiplicity. At 100 TB the static index is a
    bucketed table on (band_idx, key) so the per-trigger join prunes to
    matching buckets; a micro-batch of new docs is small, so the join is a
    broadcast of the stream side in practice.

    Stream==batch parity:
    tests/test_streaming.py::test_incremental_nominate_stream_parity.
    """
    probe = batch_band_rows(new_docs).select(
        F.col("doc_id").alias("doc_new"), "band_idx", "key"
    )
    return probe.join(
        corpus_index.withColumnRenamed("doc_id", "doc_corpus"),
        ["band_idx", "key"],
    ).select("doc_new", "doc_corpus", "band_idx")


class CCMaintainer:
    """Streaming maintainer for canonical-grouping labels: a ``foreachBatch``
    sink that folds each micro-batch of near-dup EDGES into the persisted
    component labels via ``operators.graph.cc_merge_batch`` and publishes
    copy-on-write through the versioned CURRENT pointer
    (``warehouse._VersionedTable`` semantics).

    Unlike ``SnapshotMaintainer``/``SCD2Maintainer``, NO order frontier is
    needed: component merging is COMMUTATIVE (any arrival order of edges
    reaches the same fixpoint) and IDEMPOTENT (re-merging edges whose
    endpoints already share a label is a no-op by the ``la != lb`` cut), so
    out-of-order delivery is semantically harmless. The exactly-once guard
    is only the applied-batch-id check in the pointer, which makes epoch
    REPLAYS cheap no-ops rather than wrong.

    Batch cost: O(batch) iteration on the quotient graph + one broadcast
    remap over the label table (see ``cc_merge_batch``); the publish is the
    label-table rewrite every copy-on-write dimension maintainer pays."""

    def __init__(self, path: str, retain: int = 1):
        from .warehouse import _VersionedTable

        self._vt = _VersionedTable(path, retain=retain)

    def bootstrap(self, labels: DataFrame) -> None:
        """Publish the initial labeling (e.g. a full min_label_propagation
        over the corpus at release time, or bare self-labels)."""
        self._vt._publish(labels, batch_id=-1)

    def current(self, spark: SparkSession) -> DataFrame:
        return self._vt.current(spark)

    def versions(self) -> list[int]:
        return self._vt.versions()

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        from ..operators.graph import cc_merge_batch

        ptr = self._vt._read_pointer()
        if ptr is None:
            raise RuntimeError("CCMaintainer not bootstrapped — publish initial labels first")
        if batch_id <= ptr[1]:
            return  # epoch replay: already folded in
        spark = batch_df.sparkSession
        labels = self._vt.current(spark)
        merged = cc_merge_batch(labels, batch_df.select("src", "dst"))
        self._vt._publish(merged, batch_id=batch_id)
