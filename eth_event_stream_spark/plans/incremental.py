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


def _incremental_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, batch = _split(spark, sf_dir)

    # probe: batch signatures (small, broadcast) against the corpus band
    # index (streams past — at scale this is a stored table, not recomputed)
    clong = _unpivot_bands(_minhash_prep_spark(corpus))
    blong = _unpivot_bands(_minhash_prep_spark(batch))
    hot_buckets = (
        clong.groupBy("band_idx", "key")
        .agg(F.count("*").alias("n"))
        .filter(F.col("n") > LSH_BUCKET_CAP)
        .select("band_idx", "key")
    )
    probe = blong.select(
        "band_idx", "key", F.col("doc_id").alias("doc_new")
    )
    cands = (
        clong.join(F.broadcast(hot_buckets), ["band_idx", "key"], "left_anti")
        .join(F.broadcast(probe), ["band_idx", "key"])
        .select("doc_new", F.col("doc_id").alias("doc_corpus"))
        .distinct()
    )

    # verify: df-cap statistic from the CORPUS only (the persisted artifact),
    # applied to both sides; corpus shingle index semi-joined down to probed
    # candidates before the intersection join
    cex = _distinct_shingles(corpus)
    bex = _distinct_shingles(batch)
    hot_shingles = (
        cex.groupBy("s")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") > SHINGLE_DF_CAP)
        .select("s")
    )
    cexk = cex.join(F.broadcast(hot_shingles), "s", "left_anti")
    bexk = bex.join(F.broadcast(hot_shingles), "s", "left_anti")
    csizes = cexk.groupBy("doc_id").agg(F.count("*").alias("nc"))
    bsizes = bexk.groupBy("doc_id").agg(F.count("*").alias("nb"))

    cand_corpus = cands.select(F.col("doc_corpus").alias("doc_id")).distinct()
    cexc = cexk.join(F.broadcast(cand_corpus), "doc_id", "left_semi")

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
