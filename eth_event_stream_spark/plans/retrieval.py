"""Retrieval operators (round 6): the query-time half of a RAG / search
stack over the curated corpus — keyword scoring, and hybrid fusion of the
keyword lane with the embedding lane.

- ``search_keyword_topk``: integer tf-idf keyword search (tf * a scaled
  integer idf), the BM25-shaped lane with every compared value integral so
  both engines rank identically (log-based BM25 idf would hang the ranking
  on cross-engine float ulps).
- ``search_hybrid_rrf``: Reciprocal Rank Fusion of the keyword lane and
  the brute-force cosine lane — the standard hybrid-search combiner
  (score = sum over lanes of 1/(k + rank)); computed as SCALE div
  (k + rank) so the fusion is integer-exact. ``vec_id`` aligns with
  ``doc_id`` in the testdata, which is the usual "one embedding per
  document" layout.

Rank positions are assigned WITHOUT a global window (the registry gate
bans SinglePartition windows over fact lineage): each lane is first cut to
its top-K by TakeOrdered, and ranks are computed on that constant-size
frame by a broadcast self-join (rank = 1 + count of strictly-better rows,
ties broken by id — exactly ROW_NUMBER's semantics under the same order).

The reference has no search surface; this extends the similarity family
(SURVEY §7.3 phase 7) to the retrieval shapes a training/eval pipeline
runs (hard-negative mining, contamination lookup, RAG serving).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import t
from .registry import register

QUERY_TERMS = ("vector", "merge", "filter")
IDF_SCALE = 1000
RRF_K = 60
RRF_SCALE = 1_000_000
TOPK_LANE = 20
TOPK_FUSED = 10

_TERMS_SQL = ", ".join(f"'{w}'" for w in QUERY_TERMS)


_SQL_KEYWORD_SCORED = f"""
    tf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS tok
            FROM documents)
      WHERE tok IN ({_TERMS_SQL})
      GROUP BY doc_id, tok),
    dfreq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY tok),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
    kscored AS (
      SELECT tf.doc_id,
             CAST(SUM(tf.tf * ((nd.n_docs * {IDF_SCALE}) // dfreq.df)) AS BIGINT)
               AS score
      FROM tf JOIN dfreq USING (tok), nd
      GROUP BY tf.doc_id),
    kw AS (
      SELECT doc_id, score, rnk FROM (
        SELECT doc_id, score,
               ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rnk
        FROM kscored) r
      WHERE rnk <= {TOPK_LANE})"""


@register(
    "search_keyword_topk",
    oracle=f"""
    WITH {_SQL_KEYWORD_SCORED}
    SELECT doc_id, score, rnk FROM kw
    """,
)
def search_keyword_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword top-{TOPK_LANE} for the fixed query {QUERY_TERMS}: score =
    sum over query terms of tf * ((N * {IDF_SCALE}) div df) — tf-idf with
    the idf as a scaled INTEGER, so the ranking is bit-stable across
    engines (and monotone in the real idf for any fixed df ordering).

    100 TB shape: term postings are one filtered explode + groupBy (the
    inverted-index build, term-keyed — query terms only, so the explode is
    pre-filtered at the scan); df is a {len(QUERY_TERMS)}-row broadcast;
    the cut is TakeOrdered ({TOPK_LANE}-row heaps per partition); rank
    assignment is a broadcast self-join on the {TOPK_LANE}-row result,
    never a global window."""
    return _keyword_lane(spark, sf_dir).select("doc_id", "score", "rnk")


def _rank_topk(
    scored: DataFrame,
    id_col: str,
    score_col: str,
    k: int,
    materialize: bool = False,
) -> DataFrame:
    """TakeOrdered top-k by (score desc, id asc), then ROW_NUMBER-equal
    ranks via broadcast self-join on the k-row frame.

    ``materialize=True`` (round 16): the k-row ``top`` frame is consumed
    TWICE by the rank self-join (left side + the broadcast projection),
    and Spark plans each copy independently — the whole scoring tower
    (keyword postings build, brute cosine cross join, IVF probe) executed
    once per copy. A lazy ``localCheckpoint`` of the k-row cut runs the
    tower once and rank-joins the cached rows — the guide's "decide with
    small rows" shape (k rows of 2 narrow columns). Opt-in
    because cheap towers lose by it (the ``web_robots_refetch``
    constant-folding lesson): ``search_keyword_topk``'s single-lane row
    keeps its stacked plan (its gate pins the visible TakeOrdered cut),
    the hybrid rows' expensive lanes opt in.

    Fault-tolerance trade (same as ledger.py's localCheckpoint sites):
    the k-row cut lives in executor-local blocks with no lineage — on a
    real cluster a lost executor fails the query instead of recomputing.
    Acceptable for a k-row intermediate inside one interactive query;
    a long pipeline would use reliable checkpoint() or a staged table."""
    top = scored.orderBy(F.desc(score_col), F.asc(id_col)).limit(k)
    if materialize:
        top = top.localCheckpoint(eager=False)
    o = top.select(
        F.col(id_col).alias("_id2"), F.col(score_col).alias("_score2")
    )
    better = (F.col("_score2") > F.col(score_col)) | (
        (F.col("_score2") == F.col(score_col)) & (F.col("_id2") < F.col(id_col))
    )
    return (
        top.join(F.broadcast(o), better, "left")
        .groupBy(id_col, score_col)
        .agg((F.count("_id2") + 1).cast("bigint").alias("rnk"))
    )


def _keyword_lane(spark: SparkSession, sf_dir: str, materialize: bool = False):
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("tok")
    ).filter(F.col("tok").isin(*QUERY_TERMS))
    tf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).cast("bigint").alias("tf"))
    dfreq = tf.groupBy("tok").agg(F.count(F.lit(1)).cast("bigint").alias("df"))
    nd = d.agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    scored = (
        tf.join(F.broadcast(dfreq), "tok")
        .crossJoin(F.broadcast(nd))
        .groupBy("doc_id")
        .agg(
            F.sum(F.expr(f"tf * ((n_docs * {IDF_SCALE}) div df)"))
            .cast("bigint")
            .alias("score")
        )
    )
    return _rank_topk(scored, "doc_id", "score", TOPK_LANE, materialize)


# cosine fragments shared with the similarity family (pipeline.py's
# brute-force query: query vector = vec_id 0, 6-decimal rounding for
# cross-engine float stability)
_DOT = (
    "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>),"
    " (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NA = (
    "aggregate(zip_with(CAST(embedding AS ARRAY<DOUBLE>), CAST(embedding AS ARRAY<DOUBLE>),"
    " (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_NB = (
    "aggregate(zip_with(CAST(b AS ARRAY<DOUBLE>), CAST(b AS ARRAY<DOUBLE>),"
    " (x, y) -> x * y), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)

_SQL_COS = (
    "list_sum(list_transform(generate_series(1, LEN(e.embedding)), i -> "
    "CAST(e.embedding[i] AS DOUBLE) * CAST(q.b[i] AS DOUBLE))) / "
    "(sqrt(list_sum(list_transform(generate_series(1, LEN(e.embedding)), i -> "
    "CAST(e.embedding[i] AS DOUBLE) * CAST(e.embedding[i] AS DOUBLE)))) * "
    "sqrt(list_sum(list_transform(generate_series(1, LEN(q.b)), i -> "
    "CAST(q.b[i] AS DOUBLE) * CAST(q.b[i] AS DOUBLE)))))"
)


def _vector_lane(
    spark: SparkSession, sf_dir: str, materialize: bool = False
) -> DataFrame:
    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("b"))
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            F.col("vec_id").alias("doc_id"),
            F.round(F.expr(f"({_DOT}) / (sqrt({_NA}) * sqrt({_NB}))"), 6).alias(
                "cosine"
            ),
        )
    )
    return _rank_topk(scored, "doc_id", "cosine", TOPK_LANE, materialize)


@register(
    "search_hybrid_rrf",
    oracle=f"""
    WITH {_SQL_KEYWORD_SCORED},
    q AS (SELECT embedding AS b FROM embeddings WHERE vec_id = 0),
    vscored AS (
      SELECT e.vec_id AS doc_id, ROUND({_SQL_COS}, 6) AS cosine
      FROM embeddings e, q
      WHERE e.vec_id != 0),
    vec AS (
      SELECT doc_id, cosine, rnk FROM (
        SELECT doc_id, cosine,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS rnk
        FROM vscored) r
      WHERE rnk <= {TOPK_LANE}),
    fused AS (
      SELECT COALESCE(kw.doc_id, vec.doc_id) AS doc_id,
             kw.rnk AS rank_kw, vec.rnk AS rank_vec,
             CAST(COALESCE({RRF_SCALE} // ({RRF_K} + kw.rnk), 0)
                  + COALESCE({RRF_SCALE} // ({RRF_K} + vec.rnk), 0) AS BIGINT)
               AS rrf_score
      FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id)
    SELECT doc_id, rank_kw, rank_vec, rrf_score FROM fused
    ORDER BY rrf_score DESC, doc_id LIMIT {TOPK_FUSED}
    """,
)
def search_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: Reciprocal Rank Fusion of the keyword lane and
    the embedding-cosine lane — rrf = sum over lanes of {RRF_SCALE} div
    ({RRF_K} + rank), integer-exact, rank-only (score scales never mix,
    which is RRF's whole point). A document missing from one lane simply
    contributes nothing for it.

    100 TB shape: each lane independently cuts to top-{TOPK_LANE} with
    TakeOrdered heaps; the fusion is a full outer join of two
    {TOPK_LANE}-row frames — constant work after the lane scans, and the
    lanes themselves are the already-benched keyword and brute-cosine
    shapes (swap in the IVF/PQ lane for the corpus-scale path)."""
    # NOT materialized (round 16, measured): both of this row's lane
    # towers are single parallel scans (postings explode / brute cosine),
    # so their duplicated copies run as parallel stages of one job and
    # wall-clock tracks the critical path — the k-row checkpoint
    # SERIALIZES the query and read a repeated ~1.10x at the 10x
    # rehearsal (clean A/B mins, two sessions) against ~0.90-noise at
    # sf0.1. The IVF twin keeps materialize=True: its lane is a
    # SEQUENTIAL Lloyd-build chain, where deduplication shortens the
    # critical path (measured 0.93-0.99 at both scales, plan 39 KB ->
    # 5.9 KB). Numbers in OPTIMIZATION_r16.md.
    return _rrf_fuse(_keyword_lane(spark, sf_dir), _vector_lane(spark, sf_dir))


def _rrf_fuse(kw: DataFrame, vec: DataFrame) -> DataFrame:
    """RRF fusion of two ranked lanes (doc_id, ..., rnk) — shared by the
    brute-cosine and IVF hybrid registrations.

    Lane alignment as UNION + max-aggregate instead of a FULL OUTER join:
    full outer cannot broadcast either side, so Spark plans a
    SortMergeJoin even for two 20-row frames; the union form is one hash
    aggregate (each lane contributes at most one row per doc, so max()
    recovers exactly the outer join's rank columns)."""
    k = kw.select(
        "doc_id", F.col("rnk").alias("rank_kw"), F.lit(None).cast("bigint").alias("rank_vec")
    )
    v = vec.select(
        "doc_id", F.lit(None).cast("bigint").alias("rank_kw"), F.col("rnk").alias("rank_vec")
    )
    fused = (
        k.unionByName(v)
        .groupBy("doc_id")
        .agg(F.max("rank_kw").alias("rank_kw"), F.max("rank_vec").alias("rank_vec"))
        .select(
            "doc_id",
            "rank_kw",
            "rank_vec",
            (
                F.coalesce(F.expr(f"{RRF_SCALE} div ({RRF_K} + rank_kw)"), F.lit(0))
                + F.coalesce(F.expr(f"{RRF_SCALE} div ({RRF_K} + rank_vec)"), F.lit(0))
            )
            .cast("bigint")
            .alias("rrf_score"),
        )
    )
    return fused.orderBy(F.desc("rrf_score"), F.asc("doc_id")).limit(TOPK_FUSED)


def _sql_hybrid_ivf() -> str:
    from .vectors import LLOYD_ROUNDS, _ivf_ctes

    ivf = ",\n    ".join(_ivf_ctes(LLOYD_ROUNDS))
    return f"""
    WITH {_SQL_KEYWORD_SCORED},
    {ivf},
    vec AS (
      SELECT doc_id, cosine, rnk FROM (
        SELECT vec_id AS doc_id, cosine,
               ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id) AS rnk
        FROM scored) r
      WHERE rnk <= {TOPK_LANE}),
    fused AS (
      SELECT COALESCE(kw.doc_id, vec.doc_id) AS doc_id,
             kw.rnk AS rank_kw, vec.rnk AS rank_vec,
             CAST(COALESCE({RRF_SCALE} // ({RRF_K} + kw.rnk), 0)
                  + COALESCE({RRF_SCALE} // ({RRF_K} + vec.rnk), 0) AS BIGINT)
               AS rrf_score
      FROM kw FULL OUTER JOIN vec ON kw.doc_id = vec.doc_id)
    SELECT doc_id, rank_kw, rank_vec, rrf_score FROM fused
    ORDER BY rrf_score DESC, doc_id LIMIT {TOPK_FUSED}
    """


@register("search_hybrid_rrf_ivf", oracle=_sql_hybrid_ivf())
def search_hybrid_rrf_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The PRODUCTION-lane hybrid search promised by ``search_hybrid_rrf``'s
    docstring: the same integer-exact RRF fusion, but with the embedding
    lane served by the learned-IVF index (build + probe, exactly
    ``similarity_topk_ivf``'s machinery) instead of the brute-force scan.

    100 TB shape: the keyword lane is the benched inverted-index build +
    TakeOrdered cut; the vector lane probes N_PROBE of K cells against the
    broadcast centroid table (candidate set ~ N_PROBE*N/K, never the full
    corpus — in production the centroid table is the persisted index and
    the Lloyd build amortizes across queries; bench.py's ivf_build /
    ivf_search split measures that amortization); the fusion is a hash
    aggregate of two {TOPK_LANE}-row frames. The DuckDB oracle splices the
    generated IVF CTE chain (identical Lloyd rounds and tie-breaks) into
    the keyword + fusion SQL, so the driver hash-checks the full composed
    production path."""
    from .vectors import ivf_build_centroids, ivf_candidates_scored

    # materialize the Lloyd build once: the K-row centroid table is
    # consumed by BOTH the cell assignment and the probe-cell ranking,
    # and each re-runs the whole iterative refinement tower otherwise
    cent = ivf_build_centroids(spark, sf_dir).localCheckpoint(eager=False)
    scored = ivf_candidates_scored(spark, sf_dir, cent).select(
        F.col("vec_id").alias("doc_id"), "cosine"
    )
    vec = _rank_topk(scored, "doc_id", "cosine", TOPK_LANE, materialize=True)
    return _rrf_fuse(_keyword_lane(spark, sf_dir, materialize=True), vec)


# per-process memo: sf_dir -> work dir holding the persisted serving state
# (ANN cell store + centroids, keyword top-k serving table). Temp dirs die
# with the process, so a regenerated testdata round can never probe a stale
# index; within one process (a bench session, the driver's two timed runs)
# the build amortizes exactly as production's once-per-release build does.
_SERVED_WORK: dict[str, str] = {}


def _served_state(spark: SparkSession, sf_dir: str) -> str:
    """Build-once serving state for ``search_hybrid_rrf_served``: persist
    the ANN index (Lloyd centroids + cell-partitioned store) and publish
    the k-row keyword serving table via one KeywordTopKServer fold."""
    import os
    import tempfile

    from .ann_index import persist_ann_index

    key = os.path.abspath(sf_dir)
    work = _SERVED_WORK.get(key)
    if work is None:
        work = tempfile.mkdtemp(prefix="rrf_served_")
        persist_ann_index(spark, sf_dir, os.path.join(work, "ann"))
        docs = t(spark, sf_dir, "documents")
        server = KeywordTopKServer(os.path.join(work, "kw_topk"), k=TOPK_LANE)
        server(score_keywords_pinned(docs, keyword_idf_weights(docs)), 0)
        _SERVED_WORK[key] = work
    return work


@register("search_hybrid_rrf_served", oracle=_sql_hybrid_ivf())
def search_hybrid_rrf_served(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SERVED twin of ``search_hybrid_rrf_ivf``: the same integer RRF
    fusion and the same answer, but every lane reads PERSISTED state the
    way a query at serving time does — the vector lane probes the
    cell-partitioned ANN store (N_PROBE pruned directories,
    plans/ann_index.py) instead of running the Lloyd build inline, and the
    keyword lane reads the k-row KeywordTopKServer serving table instead
    of rescanning the corpus. The build happens once per process
    (``_served_state``), exactly the once-per-release amortization
    production pays; the per-query cost is two bounded reads + a hash
    aggregate of two {TOPK_LANE}-row frames (the bench row records it next
    to the inline-build ``search_hybrid_rrf_ivf`` row).

    Oracle: identical to the inline row's spliced IVF CTE chain — the
    persisted probe shares ``cosine_to_qe``/centroid arithmetic with the
    inline build (plans/vectors.py), and the serving table is the monoid
    fold of the same pinned-idf scores, so the served answer hash-matches
    the from-scratch computation. That equality IS the check: serving
    state that drifted from the corpus would fail the driver hash."""
    import os

    from .ann_index import ann_probe_topk, load_ann_index

    work = _served_state(spark, sf_dir)
    idx = load_ann_index(spark, os.path.join(work, "ann"))
    qv = (
        t(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == 0)
        .select("embedding")
    )
    scored = ann_probe_topk(spark, idx, qv, k=TOPK_LANE).select(
        F.col("vec_id").alias("doc_id"), "cosine"
    )
    vec = _rank_topk(scored, "doc_id", "cosine", TOPK_LANE)
    kw = KeywordTopKServer(os.path.join(work, "kw_topk"), k=TOPK_LANE).current(
        spark
    )
    return _rrf_fuse(kw, vec)


@register(
    "similarity_topk_per_label",
    oracle=f"""
    WITH q AS (SELECT embedding AS b FROM embeddings WHERE vec_id = 0),
    vscored AS (
      SELECT e.vec_id, e.label, ROUND({_SQL_COS}, 6) AS cosine
      FROM embeddings e, q
      WHERE e.vec_id != 0)
    SELECT vec_id, label, cosine, rnk FROM (
      SELECT vec_id, label, cosine,
             ROW_NUMBER() OVER (PARTITION BY label
                                ORDER BY cosine DESC, vec_id) AS rnk
      FROM vscored) r
    WHERE rnk <= 5
    """,
)
def similarity_topk_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPED nearest-neighbor retrieval: top-5 most-similar vectors per
    label for the fixed query (vec_id 0) — the "diverse candidates" shape
    (stratified hard-negative mining, one result block per class) that a
    single global top-k cannot produce.

    Plan: one broadcast of the query vector, one scored scan, then a
    label-partitioned rank that Spark executes as WindowGroupLimit —
    per-partition 5-row heaps per label BELOW the shuffle, so no
    partition ever sorts its full score list. Never a SinglePartition
    window (registry gate)."""
    from pyspark.sql.window import Window

    e = t(spark, sf_dir, "embeddings")
    q = e.filter(F.col("vec_id") == 0).select(F.col("embedding").alias("b"))
    scored = (
        e.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select(
            "vec_id",
            "label",
            F.round(F.expr(f"({_DOT}) / (sqrt({_NA}) * sqrt({_NB}))"), 6).alias(
                "cosine"
            ),
        )
    )
    w = Window.partitionBy("label").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rnk") <= 5)
        .select("vec_id", "label", "cosine", "rnk")
    )


# ---------------------------------------------------------------------------
# Streaming body of the keyword lane
# ---------------------------------------------------------------------------


def keyword_idf_weights(docs: DataFrame) -> dict[str, int]:
    """Per-term integer idf weights ((N * IDF_SCALE) div df) for the fixed
    QUERY_TERMS, computed once per corpus release and pinned — the
    driver-side-scalar pattern of ``length_threshold``: a live scorer needs
    the weights as literals, and with them the scoring is a pure per-row
    projection (stateless, append-mode streamable)."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("tok")
    ).filter(F.col("tok").isin(*QUERY_TERMS))
    rows = (
        toks.distinct()
        .groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("df"))
        .collect()
    )
    n_docs = docs.count()
    return {r["tok"]: (n_docs * IDF_SCALE) // r["df"] for r in rows if r["df"]}


def score_keywords_pinned(df: DataFrame, idf: dict[str, int]) -> DataFrame:
    """Stateless keyword scoring against PINNED idf weights: score =
    sum over terms of tf * idf_term, with tf computed per row by a pure
    array expression (no explode, no aggregation) — which is exactly what
    makes this the STREAMING body of ``search_keyword_topk``'s scoring
    stage (per-doc score depends only on the row and the pinned weights;
    the top-k cut stays a batch/serving concern). Emits only matching
    docs (score > 0)."""
    if not idf:
        raise ValueError(
            "score_keywords_pinned: empty idf weights — no query term "
            "occurs in the corpus release these weights were pinned from; "
            "re-pin against a corpus that contains the query vocabulary"
        )
    toks = F.split(F.lower(F.col("text")), " ", -1)
    score = None
    for term, w in sorted(idf.items()):
        tf = F.size(F.filter(toks, lambda x: x == F.lit(term)))  # noqa: B023
        part = tf.cast("bigint") * F.lit(int(w))
        score = part if score is None else score + part
    return (
        df.select("doc_id", score.cast("bigint").alias("score"))
        .filter(F.col("score") > 0)
    )


class KeywordTopKServer:
    """The SERVING half of the streaming keyword lane: a ``foreachBatch``
    sink that maintains the running global top-k of a streamed
    (doc_id, score) feed in a k-row parquet serving table.

    Per micro-batch: cut the batch to its own top-k (TakeOrdered heap),
    merge with the current k-row table, dedup by doc_id (max score), keep
    the best k by (score desc, doc_id asc) — the exact tie-break of
    ``_rank_topk`` — and publish. State is O(k) regardless of stream
    length, and because the max-k merge is a commutative, idempotent
    monoid, neither batching, arrival order, nor an epoch replay after a
    failure can change the final table (the doc_id dedup absorbs replayed
    rows). The k-row collect is bounded driver metadata, same as the
    pinned-threshold pattern.

    Publication is ATOMIC via a versioned-pointer layout (a plain
    ``mode("overwrite")`` deletes the directory before writing, so a
    crash mid-write — or a concurrent reader — would lose the
    accumulated state, which epoch replay cannot restore): each update
    writes a fresh ``v-<epoch>-<n>`` parquet directory, then swaps the
    one-line ``CURRENT`` pointer file with ``os.replace`` (atomic on
    POSIX). Readers resolve the pointer first, so they only ever see a
    fully-written version; superseded versions are garbage-collected,
    keeping the previous one as the reader-in-flight grace copy.

    Closes the stream==batch story for the retrieval family:
    ``score_keywords_pinned`` streams the scoring, this streams the cut;
    parity with the batch ``search_keyword_topk`` is pinned in
    tests/test_streaming.py."""

    _POINTER = "CURRENT"

    def __init__(self, path: str, k: int = TOPK_LANE):
        self.path = path
        self.k = k

    def _current_dir(self) -> str | None:
        import os

        pointer = os.path.join(self.path, self._POINTER)
        if not os.path.exists(pointer):
            return None
        with open(pointer) as f:
            return os.path.join(self.path, f.read().strip())

    def __call__(self, batch_df: DataFrame, epoch_id: int) -> None:
        import os
        import shutil

        spark = batch_df.sparkSession
        batch_top = batch_df.select("doc_id", "score").orderBy(
            F.desc("score"), F.asc("doc_id")
        ).limit(self.k)
        cur = self._current_dir()
        if cur is not None:
            merged = spark.read.parquet(cur).unionByName(batch_top)
        else:  # first epoch: no serving table yet
            merged = batch_top
        top = (
            merged.groupBy("doc_id")
            .agg(F.max("score").alias("score"))
            .orderBy(F.desc("score"), F.asc("doc_id"))
            .limit(self.k)
        )
        rows = top.collect()  # k rows — materialized BEFORE any swap
        os.makedirs(self.path, exist_ok=True)
        # MONOTONIC version suffix (max existing + 1), never the directory
        # entry COUNT: GC shrinks the count, so a replayed epoch after a
        # mid-publish crash could recompute a name that already exists on
        # disk and fail PATH_ALREADY_EXISTS — found by the composed crash
        # soak (tests/test_crash_soak.py), the same bug family as the r9
        # AnnIndexManager GC-collision fix. A crashed attempt's UNPOINTED
        # leftover of this same epoch is scrubbed first — it was never
        # visible to a reader, and left in place it would survive GC as a
        # bogus grace copy.
        cur_base = os.path.basename(cur) if cur is not None else None
        highest = -1
        for entry in os.listdir(self.path):
            if not entry.startswith("v-"):
                continue
            try:
                highest = max(highest, int(entry.rsplit("-", 1)[1]))
            except ValueError:
                continue
            if entry.startswith(f"v-{epoch_id}-") and entry != cur_base:
                shutil.rmtree(os.path.join(self.path, entry), ignore_errors=True)
        version = f"v-{epoch_id}-{highest + 1}"
        if os.path.exists(os.path.join(self.path, version)):
            raise FileExistsError(
                f"refusing to overwrite existing version {version}"
            )
        spark.createDataFrame(rows, top.schema).write.parquet(
            os.path.join(self.path, version)
        )
        tmp = os.path.join(self.path, self._POINTER + ".tmp")
        with open(tmp, "w") as f:
            f.write(version)
        os.replace(tmp, os.path.join(self.path, self._POINTER))
        # GC everything except the new version and its predecessor (the
        # grace copy for a reader that resolved the old pointer)
        keep = {version, self._POINTER}
        if cur is not None:
            keep.add(os.path.basename(cur))
        for entry in os.listdir(self.path):
            if entry not in keep:
                shutil.rmtree(os.path.join(self.path, entry), ignore_errors=True)

    def current(self, spark: SparkSession) -> DataFrame:
        """The served top-k with ROW_NUMBER-equal ranks — same output
        shape as ``search_keyword_topk``."""
        cur = self._current_dir()
        if cur is None:
            raise FileNotFoundError(
                f"no serving table published yet at {self.path}"
            )
        return _rank_topk(spark.read.parquet(cur), "doc_id", "score", self.k)
