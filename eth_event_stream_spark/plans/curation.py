"""Corpus-curation operators, round-5 continuation of ``pipeline.py``.

Shapes every production pretraining-data pipeline runs that the round-4
surface still lacked:

- **span scrub** (``dedup_chunk_scrub``): C4-style removal of globally
  repeated spans — every fixed-size token chunk that occurs elsewhere in
  the corpus is dropped except its first occurrence, and the surviving
  chunks are reassembled per document. Unlike document-level dedup (which
  keeps or kills whole docs) this rewrites document *content*, which is
  what boilerplate/footer removal actually needs.
- **sampled global quantile filter** (``quality_quantile_filter``): the
  scale-honest way to apply a "drop the bottom decile" rule — an exact
  global quantile needs a global sort, so production derives the threshold
  from a bounded deterministic sample and broadcast-filters the corpus.
- **co-occurrence lift** (``text_cooccur_lift``): PMI-ordered token-pair
  association over a capped vocabulary — the standard corpus-analysis /
  phrase-mining primitive. All arithmetic is integer (lift in ppm via
  integer division), so the ordering is exactly PMI's without a single
  float op crossing engines.
- **incremental span scrub** (``dedup_chunk_scrub_incremental``): the
  ingest-cycle twin of the span scrub — a new batch scrubbed against the
  corpus chunk index in O(batch) (broadcast batch-hash probe, anti-join
  against the small hit list).
- streaming body of the quantile filter (``length_threshold`` /
  ``filter_min_tokens``): the threshold as a corpus-release-time scalar,
  the live filter stateless (parity-tested in test_streaming.py).
- streaming body of the scrub (``scrub_against_index`` over
  ``corpus_chunk_index``): per-document corpus-hit removal — chunk explode
  + stream-static LEFT ANTI are stateless, reassembly per micro-batch,
  parity with batch exact because documents are independent.

Same determinism conventions as ``pipeline.py``: md5 for hashing, integer
arithmetic on every compared lane, ties broken by unique ids.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import t, t_parallel
from .registry import register

# ---------------------------------------------------------------------------
# C4-style span scrub
# ---------------------------------------------------------------------------

SCRUB_CHUNK_TOKENS = 16


_SQL_CHUNK_SCRUB = f"""
    WITH toks AS (
      SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents
    ),
    ch AS (
      SELECT doc_id, i AS chunk_idx,
             list_aggregate(
               toks[i * {SCRUB_CHUNK_TOKENS} + 1 : (i + 1) * {SCRUB_CHUNK_TOKENS}],
               'string_agg', ' ') AS chunk
      FROM toks,
           UNNEST(generate_series(0,
             CAST(CEIL(LEN(toks) / {SCRUB_CHUNK_TOKENS}.0) AS INT) - 1)) AS u(i)
    ),
    kept AS (
      SELECT doc_id, chunk_idx, chunk FROM (
        SELECT doc_id, chunk_idx, chunk,
               ROW_NUMBER() OVER (PARTITION BY md5(chunk)
                                  ORDER BY doc_id, chunk_idx) AS rn
        FROM ch) r
      WHERE rn = 1
    ),
    tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM ch GROUP BY doc_id),
    kg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(chunk, ' ' ORDER BY chunk_idx) AS scrubbed_text
      FROM kept GROUP BY doc_id
    )
    SELECT t.doc_id,
           COALESCE(kg.scrubbed_text, '') AS scrubbed_text,
           COALESCE(kg.n_kept, 0) AS n_kept,
           t.n_chunks - COALESCE(kg.n_kept, 0) AS n_removed
    FROM tot t LEFT JOIN kg USING (doc_id)
    """


@register("dedup_chunk_scrub", oracle=_SQL_CHUNK_SCRUB)
def dedup_chunk_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style span scrub: drop every 16-token chunk that repeats anywhere
    in the corpus except its FIRST occurrence (min (doc_id, chunk_idx)),
    then reassemble each document from its surviving chunks in order.

    100 TB shape: chunks are keyed by md5 (fixed-width shuffle key — the
    chunk text never travels to the aggregate); the first-occurrence table
    is one partial-aggregated ``min(struct(doc_id, chunk_idx))`` per hash
    (map-side combine keeps a corpus-wide boilerplate chunk from funneling
    its billion copies to one task — the reason this is an agg + join, not
    a window over the chunk key); the keep decision is a same-key shuffle
    join; reassembly groups by doc_id. Three shuffles total, each on a
    uniform key.

    The reference has no corpus surface at all; this extends the
    training-data pipeline family (SURVEY §7.3 phase 7).
    """
    return chunk_scrub(t(spark, sf_dir, "documents"))


def chunk_scrub(docs: DataFrame) -> DataFrame:
    """The dedup_chunk_scrub core as a DataFrame-in/DataFrame-out transform
    (the split_assign pattern): scrub any (doc_id, text) frame."""
    chunks = _chunks(docs)
    # first occurrence = min over a DECIMAL-encoded (doc_id, chunk_idx) key:
    # min(struct(...)) only SortAggregates (struct has no mutable agg
    # buffer), which would sort the full chunk stream per partition at
    # scale; the monotone encoding doc_id * 10^10 + chunk_idx (chunk_idx
    # can't reach 10^10 within one document) keeps the same order and
    # HashAggregates with map-side combine
    enc = F.expr(_ENC_FIRST)
    firsts = chunks.groupBy("h").agg(F.min(enc).alias("first_key"))
    kept = (
        chunks.join(firsts, "h")
        .filter(enc == F.col("first_key"))
        .select("doc_id", "chunk_idx", "chunk")
    )
    return _reassemble(chunks, kept)


def _reassemble(all_chunks: DataFrame, kept: DataFrame) -> DataFrame:
    """(doc_id, scrubbed_text, n_kept, n_removed): rebuild each document
    from its surviving chunks in order; docs whose every chunk was
    scrubbed keep a row with empty text."""
    tot = all_chunks.groupBy("doc_id").agg(F.count("*").alias("n_chunks"))
    kg = kept.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk"))),
                lambda s: s.chunk,
            ),
            " ",
        ).alias("scrubbed_text"),
    )
    return tot.join(kg, "doc_id", "left").select(
        "doc_id",
        F.coalesce("scrubbed_text", F.lit("")).alias("scrubbed_text"),
        F.coalesce("n_kept", F.lit(0).cast("long")).alias("n_kept"),
        (F.col("n_chunks") - F.coalesce("n_kept", F.lit(0).cast("long"))).alias(
            "n_removed"
        ),
    )


# ---------------------------------------------------------------------------
# Sampled global quantile filter
# ---------------------------------------------------------------------------

QUANTILE_SAMPLE = 100  # bounded sample size; production: ~100k rows, still one task
QUANTILE_K = 10  # threshold = K-th smallest metric in the sample (P10 of 100)


_SQL_QUANTILE_FILTER = f"""
    WITH s AS (
      SELECT doc_id,
             CAST(LEN(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    samp AS (
      SELECT doc_id, n_tokens FROM s
      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id LIMIT {QUANTILE_SAMPLE}
    ),
    thr AS (
      SELECT MAX(n_tokens) AS thr FROM (
        SELECT n_tokens FROM samp ORDER BY n_tokens, doc_id LIMIT {QUANTILE_K}
      )
    )
    SELECT s.doc_id, s.n_tokens, thr.thr
    FROM s, thr WHERE s.n_tokens >= thr.thr
    """


@register("quality_quantile_filter", oracle=_SQL_QUANTILE_FILTER)
def quality_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-quantile length filter, the scale-honest way: an exact corpus
    quantile needs a global sort, so the P10 threshold is computed from a
    bounded deterministic sample (the QUANTILE_SAMPLE docs with smallest
    md5(doc_id) — a seeded uniform draw both engines replay bit-identically)
    and the corpus is filtered against the broadcast scalar.

    Plan: TakeOrderedAndProject (sample) -> TakeOrdered (K smallest) ->
    1-row max -> broadcast nested loop against the corpus scan. No global
    sort, no quantile state over N rows; the only full pass is the filter
    itself. The metric lane is pure BIGINT — no float crosses engines.
    """
    d = t(spark, sf_dir, "documents")
    s = d.select(
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), " ", -1)).cast("bigint").alias("n_tokens"),
    )
    samp = s.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id").limit(
        QUANTILE_SAMPLE
    )
    thr = (
        samp.orderBy("n_tokens", "doc_id")
        .limit(QUANTILE_K)
        .agg(F.max("n_tokens").alias("thr"))
    )
    return s.crossJoin(F.broadcast(thr)).filter(
        F.col("n_tokens") >= F.col("thr")
    )


# ---------------------------------------------------------------------------
# Co-occurrence lift (integer-exact PMI ordering)
# ---------------------------------------------------------------------------

COOCCUR_VOCAB = 20  # pair generation capped to the top-V tokens by doc freq
COOCCUR_TOPK = 50


_SQL_COOCCUR_LIFT = f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, tok
      FROM (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS tok
            FROM documents)
    ),
    vocab AS (
      SELECT tok, COUNT(*) AS df FROM dt GROUP BY tok
      ORDER BY df DESC, tok LIMIT {COOCCUR_VOCAB}
    ),
    vt AS (SELECT dt.doc_id, dt.tok, v.df FROM dt JOIN vocab v USING (tok)),
    n AS (SELECT COUNT(DISTINCT doc_id) AS n_docs FROM documents),
    pairs AS (
      SELECT a.tok AS t1, b.tok AS t2, COUNT(*) AS c_xy,
             MIN(a.df) AS c_x, MIN(b.df) AS c_y
      FROM vt a JOIN vt b ON a.doc_id = b.doc_id AND a.tok < b.tok
      GROUP BY a.tok, b.tok
    )
    SELECT t1, t2, c_xy, c_x, c_y,
           CAST((CAST(c_xy AS HUGEINT) * n.n_docs * 1000000)
                // (CAST(c_x AS HUGEINT) * c_y) AS BIGINT) AS lift_ppm
    FROM pairs, n
    ORDER BY lift_ppm DESC, t1, t2 LIMIT {COOCCUR_TOPK}
    """


@register("text_cooccur_lift", oracle=_SQL_COOCCUR_LIFT)
def text_cooccur_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-pair association by lift (= PMI without the log, so the
    ordering is identical): top pairs of the COOCCUR_VOCAB most document-
    frequent tokens ranked by ``P(x,y) / (P(x) P(y))`` in parts-per-million
    via pure integer division — no float ever crosses engines.

    100 TB shape: the vocabulary cap is the scale guard — pair generation
    is a self-join of the (doc, vocab-token) incidence list, so each doc
    contributes at most V(V-1)/2 pairs regardless of corpus size, and the
    vocab itself is a TakeOrdered top-V broadcast. Doc frequencies ride
    along the broadcast (no second join against the counts). lift in ppm
    overflows BIGINT only past ~9e12 doc-pair mass; production would lift
    the multiply into DECIMAL(38,0) limbs (same trick as sum_uint256).
    """
    d = t(spark, sf_dir, "documents")
    dt = d.select(
        "doc_id", F.explode(F.array_distinct(F.split(F.lower(F.col("text")), " ", -1))).alias("tok")
    )
    # materialize the V-row vocab once (localCheckpoint, same pattern as
    # operators/graph.py): it feeds three places (the incidence semi-join,
    # c_x, c_y) and without materialization each reference would re-run
    # the full corpus scan + aggregation behind it
    vocab = (
        dt.groupBy("tok")
        .agg(F.count("*").alias("df"))
        .orderBy(F.desc("df"), "tok")
        .limit(COOCCUR_VOCAB)
        .localCheckpoint()
    )
    # single corpus pass: per-doc sorted vocab-token set, pairs generated
    # in-row (<= V(V-1)/2 per doc, V a constant) — a vt-self-join would
    # re-scan the corpus AND re-run the vocab aggregation for each side
    vt = (
        dt.join(F.broadcast(vocab.select("tok")), "tok")
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("tok")).alias("vts"))
    )
    pair_structs = F.flatten(
        F.transform(
            "vts",
            lambda x, i: F.transform(
                F.slice(F.col("vts"), i + F.lit(2), F.size("vts")),
                lambda y: F.struct(x.alias("t1"), y.alias("t2")),
            ),
        )
    )
    pairs = (
        vt.select(F.explode(pair_structs).alias("p"))
        .select("p.t1", "p.t2")
        .groupBy("t1", "t2")
        .agg(F.count("*").alias("c_xy"))
    )
    n = d.agg(F.count_distinct("doc_id").alias("n_docs"))
    vx = vocab.select(F.col("tok").alias("t1"), F.col("df").alias("c_x"))
    vy = vocab.select(F.col("tok").alias("t2"), F.col("df").alias("c_y"))
    return (
        pairs.join(F.broadcast(vx), "t1")
        .join(F.broadcast(vy), "t2")
        .crossJoin(F.broadcast(n))
        .select(
            "t1",
            "t2",
            "c_xy",
            "c_x",
            "c_y",
            # the numerator is computed in DECIMAL(38,0) limbs (the
            # sum_uint256 pattern): c_xy * n_docs * 1e6 passes ~9e12
            # doc-pair mass at real corpus sizes, where a BIGINT product
            # would make ANSI mode fail the job; the quotient is a ratio
            # of counts, always back in LONG range
            F.expr(
                "CAST((CAST(c_xy AS DECIMAL(38,0)) * n_docs * 1000000)"
                " div (CAST(c_x AS DECIMAL(38,0)) * c_y) AS BIGINT)"
            ).alias("lift_ppm"),
        )
        .orderBy(F.desc("lift_ppm"), "t1", "t2")
        .limit(COOCCUR_TOPK)
    )


def length_threshold(docs: DataFrame) -> int:
    """Driver-side scalar twin of quality_quantile_filter's in-plan
    threshold: the K-th smallest token count among the QUANTILE_SAMPLE docs
    with smallest md5(doc_id). Bounded work (two heap top-ks over a
    fixed-size sample), so collecting the single scalar is driver metadata
    in the same sense as skew hot keys (operators/skew.py) — a production
    pipeline computes it once per corpus release and pins it in config.

    Exists for the STREAMING twin: a live ingest filter needs the threshold
    as a literal (stream-static cross joins of unbounded streams against
    1-row frames are not a supported stream shape), and a pure filter on a
    literal is stateless — trivially append-mode streamable."""
    s = docs.select(
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), " ", -1)).cast("bigint").alias("n_tokens"),
    )
    samp = s.orderBy(F.md5(F.col("doc_id").cast("string")), "doc_id").limit(
        QUANTILE_SAMPLE
    )
    row = (
        samp.orderBy("n_tokens", "doc_id")
        .limit(QUANTILE_K)
        .agg(F.max("n_tokens").alias("thr"))
        .collect()
    )
    if row[0]["thr"] is None:
        raise ValueError(
            "length_threshold: empty corpus — the quantile sample has no "
            "rows, so no threshold exists; pin one explicitly for ingest"
        )
    return int(row[0]["thr"])


def filter_min_tokens(df: DataFrame, thr: int) -> DataFrame:
    """Stateless length filter against a pinned threshold — the streaming
    body of quality_quantile_filter (same output schema, thr as literal)."""
    return df.select(
        "doc_id",
        F.size(F.split(F.lower(F.col("text")), " ", -1)).cast("bigint").alias("n_tokens"),
        F.lit(thr).cast("bigint").alias("thr"),
    ).filter(F.col("n_tokens") >= thr)


# ---------------------------------------------------------------------------
# Incremental span scrub (ingest-cycle regime)
# ---------------------------------------------------------------------------

_SQL_CHUNKS_OF = """
    SELECT doc_id, i AS chunk_idx,
           list_aggregate(
             toks[i * {n} + 1 : (i + 1) * {n}],
             'string_agg', ' ') AS chunk
    FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM {src}),
         UNNEST(generate_series(0,
           CAST(CEIL(LEN(toks) / {n}.0) AS INT) - 1)) AS u(i)
"""

_SQL_CHUNK_SCRUB_INCR = f"""
    WITH corpus AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 != 0),
    batch AS (SELECT doc_id, text FROM documents WHERE doc_id % 5 = 0),
    cch AS ({_SQL_CHUNKS_OF.format(n=SCRUB_CHUNK_TOKENS, src="corpus")}),
    bch AS ({_SQL_CHUNKS_OF.format(n=SCRUB_CHUNK_TOKENS, src="batch")}),
    cidx AS (SELECT DISTINCT md5(chunk) AS h FROM cch),
    fresh AS (
      SELECT b.doc_id, b.chunk_idx, b.chunk
      FROM bch b LEFT JOIN cidx ON md5(b.chunk) = cidx.h
      WHERE cidx.h IS NULL),
    kept AS (
      SELECT doc_id, chunk_idx, chunk FROM (
        SELECT doc_id, chunk_idx, chunk,
               ROW_NUMBER() OVER (PARTITION BY md5(chunk)
                                  ORDER BY doc_id, chunk_idx) AS rn
        FROM fresh) r
      WHERE rn = 1),
    tot AS (SELECT doc_id, COUNT(*) AS n_chunks FROM bch GROUP BY doc_id),
    kg AS (
      SELECT doc_id, COUNT(*) AS n_kept,
             string_agg(chunk, ' ' ORDER BY chunk_idx) AS scrubbed_text
      FROM kept GROUP BY doc_id)
    SELECT t.doc_id,
           COALESCE(kg.scrubbed_text, '') AS scrubbed_text,
           COALESCE(kg.n_kept, 0) AS n_kept,
           t.n_chunks - COALESCE(kg.n_kept, 0) AS n_removed
    FROM tot t LEFT JOIN kg USING (doc_id)
    """


def _chunks(d: DataFrame) -> DataFrame:
    """(doc_id, chunk_idx, chunk, h): fixed-size token chunks of every doc."""
    toks = d.select(
        "doc_id", F.split(F.lower(F.col("text")), " ", -1).alias("toks")
    )
    n_chunks = F.ceil(F.size("toks") / F.lit(float(SCRUB_CHUNK_TOKENS))).cast("int")
    ex = toks.select(
        "doc_id",
        "toks",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    piece = F.slice(
        F.col("toks"), F.col("chunk_idx") * SCRUB_CHUNK_TOKENS + 1, SCRUB_CHUNK_TOKENS
    )
    return ex.select(
        "doc_id",
        "chunk_idx",
        F.array_join(piece, " ").alias("chunk"),
        F.md5(F.array_join(piece, " ")).alias("h"),
    )


_ENC_FIRST = "CAST(doc_id AS DECIMAL(28,0)) * 10000000000 + chunk_idx"


@register("dedup_chunk_scrub_incremental", oracle=_SQL_CHUNK_SCRUB_INCR)
def dedup_chunk_scrub_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ingest-cycle span scrub: a NEW batch (doc_id % 5 == 0, the
    incremental.py convention) has every chunk already present in the
    curated corpus's chunk index removed, plus within-batch first-occurrence
    dedup, then reassembles — boilerplate removal at ingest time without
    re-scrubbing the corpus.

    O(batch) against an O(corpus) index, same trick as
    plans/incremental.py: an anti-join of the small batch against the huge
    index can't build-broadcast (LeftAnti builds right), so the corpus
    index STREAMS past a broadcast of the batch's distinct chunk hashes
    (inner join — output is at most |batch| hit hashes), and the actual
    anti-join runs against that SMALL broadcast hit list. The corpus chunk
    index is recomputed here for the oracle; production persists it and
    appends accepted batches' chunks each cycle."""
    docs = t(spark, sf_dir, "documents")
    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    bch = _chunks(batch)
    cidx = _chunks(corpus).select("h").distinct()
    hits = cidx.join(F.broadcast(bch.select("h").distinct()), "h")
    fresh = bch.join(F.broadcast(hits), "h", "left_anti")
    enc = F.expr(_ENC_FIRST)
    firsts = fresh.groupBy("h").agg(F.min(enc).alias("first_key"))
    kept = (
        fresh.join(firsts, "h")
        .filter(enc == F.col("first_key"))
        .select("doc_id", "chunk_idx", "chunk")
    )
    return _reassemble(bch, kept)


def scrub_against_index(new_docs: DataFrame, corpus_index: DataFrame) -> DataFrame:
    """Per-document scrub against a STATIC corpus chunk index (column
    ``h``): drop every chunk whose hash the index contains, reassemble.
    No within-batch cross-document dedup — each document's result depends
    only on itself and the index, which is what makes this the STREAMING
    body of the incremental scrub: the chunk explode and the anti-join are
    stateless (append mode, stream-static left anti), and the per-document
    reassembly runs inside each micro-batch (foreachBatch), never across
    batches. Parity with a batch run of the same function is exact because
    documents are independent (tested in test_streaming.py)."""
    ch = _chunks(new_docs)
    kept = ch.join(corpus_index.select("h"), "h", "left_anti").select(
        "doc_id", "chunk_idx", "chunk"
    )
    return _reassemble(ch, kept)


def corpus_chunk_index(corpus: DataFrame) -> DataFrame:
    """The persisted artifact the incremental/streaming scrub probes:
    distinct md5 of every corpus chunk, one column ``h``."""
    return _chunks(corpus).select("h").distinct()


# ---------------------------------------------------------------------------
# Stratified fractional sampling
# ---------------------------------------------------------------------------

# per-stratum keep fractions in sixteenths (md5 first hex digit < bound):
# 'en' keeps 8/16 = 50%, every other language 4/16 = 25%
STRAT_BOUND_EN = "8"
STRAT_BOUND_OTHER = "4"


@register(
    "sample_stratified_fraction",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE substring(md5('strat:' || CAST(doc_id AS VARCHAR)), 1, 1)
          < CASE WHEN lang = 'en' THEN '{STRAT_BOUND_EN}'
                 ELSE '{STRAT_BOUND_OTHER}' END
    """,
)
def sample_stratified_fraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified downsampling with per-stratum fractions (the language-
    rebalancing step of corpus assembly: keep 50% of English, 25% of
    everything else) — deterministic hash thresholds instead of RNG, so
    the sample is reproducible across runs, engines, and cluster sizes,
    and adding data never reassigns an existing id (same contract as
    split_hash_assign). Pure map-side filter: no shuffle, no sampling
    state, trivially streamable."""
    d = t(spark, sf_dir, "documents")
    digit = F.substring(
        F.md5(F.concat(F.lit("strat:"), F.col("doc_id").cast("string"))), 1, 1
    )
    bound = F.when(F.col("lang") == "en", STRAT_BOUND_EN).otherwise(
        STRAT_BOUND_OTHER
    )
    return d.filter(digit < bound).select("doc_id", "lang")


# ---------------------------------------------------------------------------
# Count-Min sketch heavy hitters (deterministic, oracle-checkable)
# ---------------------------------------------------------------------------

CM_LANES = 4
CM_HEX = 2  # bucket id = first 2 md5 hex chars -> 256 buckets per lane


def _cm_bucket_sql(lane: str, expr: str) -> str:
    return f"substring(md5({lane} || ':' || {expr}), 1, {CM_HEX})"


def countmin_sketch(docs: DataFrame) -> DataFrame:
    """(lane, bucket, c): the constant-size Count-Min sketch of a (doc_id,
    text) frame's token stream — the build body shared by the registered
    heavy-hitter query and its STREAMING twin. The whole build is one
    partial-aggregating count over md5-prefix buckets: a commutative
    algebraic aggregate, so an update-mode streaming build over the same
    frame converges to the identical sketch (parity-tested in
    tests/test_streaming.py); at 100 TB the stream form maintains the
    sketch incrementally — (CM_LANES x 256) rows of state, independent of
    corpus size."""
    toks = docs.select(
        F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("tok")
    )
    stack_args = ", ".join(
        f"{j}, substring(md5(concat('{j}:', tok)), 1, {CM_HEX})"
        for j in range(CM_LANES)
    )
    lanes = toks.selectExpr(f"stack({CM_LANES}, {stack_args}) AS (lane, bucket)")
    return lanes.groupBy("lane", "bucket").agg(
        F.count(F.lit(1)).cast("bigint").alias("c")
    )


@register(
    "sketch_countmin_heavyhitters",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(string_split(lower(text), ' ')) AS tok FROM documents
    ),
    lanes AS (
      {" UNION ALL ".join(
          f"SELECT {j} AS lane, {_cm_bucket_sql(repr(str(j)), 'tok')} AS bucket FROM toks"
          for j in range(CM_LANES)
      )}
    ),
    sketch AS (
      SELECT lane, bucket, CAST(COUNT(*) AS BIGINT) AS c
      FROM lanes GROUP BY lane, bucket
    ),
    topk AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_count
      FROM toks GROUP BY tok
      ORDER BY exact_count DESC, tok LIMIT 20
    ),
    probes AS (
      {" UNION ALL ".join(
          f"SELECT tok, exact_count, {j} AS lane, "
          f"{_cm_bucket_sql(repr(str(j)), 'tok')} AS bucket FROM topk"
          for j in range(CM_LANES)
      )}
    )
    SELECT p.tok, p.exact_count, CAST(MIN(s.c) AS BIGINT) AS cm_estimate
    FROM probes p JOIN sketch s ON s.lane = p.lane AND s.bucket = p.bucket
    GROUP BY p.tok, p.exact_count
    """,
)
def sketch_countmin_heavyhitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch as a DataFrame composition: estimate the corpus's
    top-20 token frequencies from a {CM_LANES}x256 sketch and report them
    against the exact counts (``cm_estimate >= exact_count`` always; the
    gap IS the sketch's collision error, visible in the result).

    Why it matters at 100 TB: the sketch is a CONSTANT-size (lanes x 256)
    table produced by one partial-aggregating shuffle over the token
    stream — heavy-hitter frequency queries then cost a broadcast probe,
    never a second corpus pass. Determinism: bucket ids are md5-hex
    prefixes (identical strings in Spark and DuckDB), no modulo, no
    integer-conversion divergence; lane fan-out is a ``stack``, never a
    cartesian join.
    """
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("tok")
    )

    def bucket(j: int, col: str) -> str:
        return f"substring(md5(concat('{j}:', {col})), 1, {CM_HEX})"

    sketch = countmin_sketch(d)

    topk = (
        toks.groupBy("tok")
        .agg(F.count(F.lit(1)).cast("bigint").alias("exact_count"))
        .orderBy(F.col("exact_count").desc(), F.col("tok"))
        .limit(20)
    )
    probe_stack = ", ".join(f"{j}, {bucket(j, 'tok')}" for j in range(CM_LANES))
    probes = topk.selectExpr(
        "tok", "exact_count", f"stack({CM_LANES}, {probe_stack}) AS (lane, bucket)"
    )
    return (
        probes.join(F.broadcast(sketch), ["lane", "bucket"])
        .groupBy("tok", "exact_count")
        .agg(F.min("c").cast("bigint").alias("cm_estimate"))
    )


# ---------------------------------------------------------------------------
# Prefix-filtering set-similarity join (round 6): the LOSSLESS alternative
# to LSH nomination
# ---------------------------------------------------------------------------

_SQL_PREFIX_FILTER_PAIRS = """
    WITH sh AS (
      SELECT doc_id, list_transform(generate_series(1, LEN(toks) - 2),
               i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2]) AS shingles
      FROM (SELECT doc_id, string_split(lower(text), ' ') AS toks FROM documents)
      WHERE LEN(toks) >= 3),
    ex AS (SELECT DISTINCT doc_id, UNNEST(shingles) AS s FROM sh),
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM ex GROUP BY doc_id),
    inter AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS n_common
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY a.doc_id, b.doc_id)
    SELECT i.doc_a, i.doc_b,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM inter i
    JOIN sizes sa ON sa.doc_id = i.doc_a
    JOIN sizes sb ON sb.doc_id = i.doc_b
    WHERE CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) >= 0.8
    """


@register("dedup_prefix_filter_pairs", oracle=_SQL_PREFIX_FILTER_PAIRS)
def dedup_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact near-dup pairs via PREFIX FILTERING (the AllPairs/PPJoin
    family, published in the set-similarity-join literature): order every
    document's shingles by (global document frequency asc, shingle), keep
    only the prefix a qualifying pair MUST intersect in, and join on those
    prefix shingles.

    Why the oracle is GROUND TRUTH (exact all-pairs Jaccard >= 0.8), not a
    filter simulation: prefix filtering is lossless. For overlap threshold
    a = ceil(t*n) (valid since J >= t implies |A^B| >= t*|AuB| >= t*n for
    both docs), two qualifying sets' prefixes of length n - a + 1 under a
    common total order must share an element — so join-on-prefix loses no
    pair, and the driver's hash match against exact SQL proves it on data.

    100 TB shape vs LSH: candidates are generated from each doc's RAREST
    shingles (df-ascending order), so join groups are small by construction
    — no bucket caps, no recall loss, no band tuning; the price is the df
    table shuffle + per-doc sort. The t=4/5 prefix arithmetic is pure
    integer: ceil(4n/5) = (4n+4) div 5. The length filter
    (5*min >= 4*max) prunes cross-size candidates before the distinct.

    SCALE WARNING (measured, BENCH_SF1.md): rarity pruning assumes a
    collapsed corpus. Under 10x VERBATIM duplication every shingle's df
    grows 10x — prefix tokens stop being rare, join groups grow with the
    clique, and the lossless output itself is clique-quadratic: 4.3 s ->
    53.7 s (12.5x) at the 10x rehearsal. The production entry is
    ``dedup_collapse_then_prefix_verify`` (exact-collapse first — the same
    shield every composition here uses); this raw form stays registered as
    the ground-truth-complete reference.
    """
    d = t_parallel(spark, sf_dir, "documents").select("doc_id", "text")
    return prefix_filter_pairs(d)


@register(
    "dedup_collapse_then_prefix_verify",
    oracle=f"""
    WITH documents AS (
      -- shadows the base view (the collapse-composition pattern from
      -- plans/pipeline.py): every reference below sees only the reps
      SELECT MIN(doc_id) AS doc_id, MIN(text) AS text, COUNT(*) AS n_copies
      FROM main.documents GROUP BY md5(text)),
    pairs AS (SELECT * FROM ({_SQL_PREFIX_FILTER_PAIRS}))
    SELECT p.doc_a, p.doc_b, p.jaccard,
           ra.n_copies AS copies_a, rb.n_copies AS copies_b
    FROM pairs p
    JOIN documents ra ON ra.doc_id = p.doc_a
    JOIN documents rb ON rb.doc_id = p.doc_b
    """,
)
def dedup_collapse_then_prefix_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The production prefix-filtering composition: exact-collapse verbatim
    copies to min-id representatives, THEN the lossless prefix-filter join
    on unique texts. Collapsing first restores the rarity assumption prefix
    filtering lives on (verbatim copies inflate every shingle's df by the
    clique size, measured 12.5x at the 10x rehearsal — see
    ``dedup_prefix_filter_pairs``), and the result is COMPLETE over
    representatives: every near-dup pair of distinct texts, no caps, no
    recall loss — the exactness LSH cannot offer, at a cost the collapse
    keeps flat under duplication."""
    d = t_parallel(spark, sf_dir, "documents")
    # materialize the collapse once (localCheckpoint, the cooccur-vocab
    # pattern): reps feeds FOUR consumers (prefix shingles, verify
    # shingles, both copy-count lookups) and each would otherwise re-run
    # the full-corpus collapse — measured 7.1 s -> 6.7 s at sf0.1
    reps = (
        d.groupBy(F.md5("text").alias("content_hash"))
        .agg(
            F.min("doc_id").alias("doc_id"),
            F.min("text").alias("text"),
            F.count("*").alias("n_copies"),
        )
        .localCheckpoint(eager=True)
    )
    pairs = prefix_filter_pairs(reps.select("doc_id", "text"))
    ca = reps.select(F.col("doc_id").alias("doc_a"), F.col("n_copies").alias("copies_a"))
    cb = reps.select(F.col("doc_id").alias("doc_b"), F.col("n_copies").alias("copies_b"))
    return (
        pairs.join(F.broadcast(ca), "doc_a")
        .join(F.broadcast(cb), "doc_b")
        .select("doc_a", "doc_b", "jaccard", "copies_a", "copies_b")
    )


def prefix_filter_pairs(docs: DataFrame) -> DataFrame:
    """df-in/df-out core of dedup_prefix_filter_pairs (threshold 0.8)."""
    from pyspark.sql.window import Window

    from .pipeline import _distinct_shingles, _verify_candidates_spark

    # one shingle index feeds the df table, the prefix window, AND the
    # verify intersection — materialize it once (at 100 TB this is the
    # persisted shingle-index artifact, not an in-memory checkpoint)
    ex = _distinct_shingles(docs).localCheckpoint(eager=True)
    dfreq = ex.groupBy("s").agg(F.count("*").alias("df"))
    by_rarity = Window.partitionBy("doc_id").orderBy("df", "s")
    whole_doc = Window.partitionBy("doc_id")
    sized = (
        ex.join(dfreq, "s")
        .withColumn("pos", F.row_number().over(by_rarity))
        .withColumn("n", F.count(F.lit(1)).over(whole_doc))
    )
    # prefix length n - ceil(4n/5) + 1, all-integer ceil
    prefix = sized.filter(F.col("pos") <= F.col("n") - F.expr("(4 * n + 4) div 5") + 1)
    a = prefix.select(F.col("doc_id").alias("doc_a"), "s", F.col("n").alias("na"))
    b = prefix.select(F.col("doc_id").alias("doc_b"), "s", F.col("n").alias("nb"))
    cands = (
        a.join(b, "s")
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.least("na", "nb") * 5 >= F.greatest("na", "nb") * 4)
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    return _verify_candidates_spark(cands, docs, df_cap=None, ex=ex)


# ---------------------------------------------------------------------------
# Histogram quantile sketch (round 6): constant-size percentile estimation
# ---------------------------------------------------------------------------

HIST_BUCKET_TOKENS = 16
HIST_QS = (50, 90, 99)


_SQL_HIST_QUANTILES = f"""
    WITH s AS (
      SELECT CAST(LEN(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
      FROM documents),
    hist AS (
      SELECT n_tokens // {HIST_BUCKET_TOKENS} AS b, COUNT(*) AS c
      FROM s GROUP BY b),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_docs FROM hist),
    cum AS (
      SELECT h1.b, CAST(SUM(h2.c) AS BIGINT) AS cum
      FROM hist h1 JOIN hist h2 ON h2.b <= h1.b
      GROUP BY h1.b),
    qs AS (SELECT UNNEST([{", ".join(str(q) for q in HIST_QS)}]) AS q)
    SELECT qs.q,
           tot.n_docs,
           CAST(MIN((cum.b + 1) * {HIST_BUCKET_TOKENS} - 1) AS BIGINT)
             AS est_tokens_le
    FROM qs, tot, cum
    WHERE cum.cum >= (qs.q * tot.n_docs + 99) // 100
    GROUP BY qs.q, tot.n_docs
    """


@register("sketch_histogram_quantiles", oracle=_SQL_HIST_QUANTILES)
def sketch_histogram_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile estimation from a CONSTANT-size histogram sketch: P50/
    P90/P99 of document token length as the upper edge of the first
    {HIST_BUCKET_TOKENS}-token bucket whose cumulative count reaches
    ceil(q*N/100) — all-integer, so both engines agree bit-for-bit.

    100 TB shape: an exact percentile needs a global sort; the histogram
    is one partial-aggregating shuffle into ~(max_len / bucket) rows —
    constant-size state like the Count-Min sketch, mergeable across
    corpora by adding cells. The cumulative sum is a self-join of the
    TINY histogram against itself (broadcast nested loop over <=10^2
    rows), NOT a global window — the registry gate bans SinglePartition
    windows over fact-table lineage, and this plan never needs one."""
    d = t(spark, sf_dir, "documents")
    s = d.select(
        F.size(F.split(F.lower(F.col("text")), " ", -1)).cast("bigint").alias("n_tokens")
    )
    hist = s.groupBy(F.expr(f"n_tokens div {HIST_BUCKET_TOKENS}").alias("b")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = hist.agg(F.sum("c").cast("bigint").alias("n_docs"))
    h2 = hist.select(F.col("b").alias("b2"), F.col("c").alias("c2"))
    cum = (
        hist.join(F.broadcast(h2), F.col("b2") <= F.col("b"))
        .groupBy("b")
        .agg(F.sum("c2").cast("bigint").alias("cum"))
    )
    expanded = (
        cum.crossJoin(F.broadcast(tot))
        .select("*", F.explode(F.array(*[F.lit(q) for q in HIST_QS])).alias("q"))
        .filter(F.col("cum") >= F.expr("(q * n_docs + 99) div 100"))
    )
    return expanded.groupBy("q", "n_docs").agg(
        F.min(F.expr(f"(b + 1) * {HIST_BUCKET_TOKENS} - 1"))
        .cast("bigint")
        .alias("est_tokens_le")
    )


# ---------------------------------------------------------------------------
# duplicated-window span marking (substring-level dedup)
# ---------------------------------------------------------------------------

DUP_WINDOW = 8  # token-window length (the "min duplicated substring" knob;
# Lee et al.'s suffix-array dedup uses 50 BPE tokens at web scale — 8 fits
# this corpus' 30-80-token documents while exercising the same machinery)
DUP_KEEP_PERMILLE = 300  # drop docs with > 30% of tokens inside dup spans


_SQL_DUP_SPANS = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS tk,
         CAST(LEN(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
win AS (
  SELECT doc_id, n_tokens, CAST(i AS BIGINT) AS j,
         list_aggregate(tk[CAST(i AS INT):CAST(i + {DUP_WINDOW} - 1 AS INT)],
                        'string_agg', ' ') AS g
  FROM toks, UNNEST(range(1, len(tk) - {DUP_WINDOW} + 2)) AS r(i)
),
dup AS (
  SELECT doc_id, j
  FROM (SELECT doc_id, j, COUNT(*) OVER (PARTITION BY g) AS c FROM win)
  WHERE c > 1
),
isl AS (
  SELECT doc_id, j,
         CASE WHEN prev_end IS NULL OR j > prev_end THEN 1 ELSE 0 END AS new_isl
  FROM (
    SELECT doc_id, j,
           MAX(j + {DUP_WINDOW} - 1) OVER (
             PARTITION BY doc_id ORDER BY j
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_end
    FROM dup)
),
grp AS (
  SELECT doc_id, j,
         SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY j
                            ROWS UNBOUNDED PRECEDING) AS island
  FROM isl
),
cov AS (
  SELECT doc_id,
         CAST(SUM(nw) AS BIGINT) AS n_dup_windows,
         CAST(SUM(ilen) AS BIGINT) AS covered_tokens
  FROM (SELECT doc_id, island, MAX(j) - MIN(j) + {DUP_WINDOW} AS ilen,
               COUNT(*) AS nw
        FROM grp GROUP BY doc_id, island)
       per_island
  GROUP BY doc_id
),
perdoc AS (
  SELECT t.doc_id, t.n_tokens,
         CAST(GREATEST(t.n_tokens - {DUP_WINDOW} + 1, 0) AS BIGINT) AS n_windows,
         COALESCE(c.n_dup_windows, 0) AS n_dup_windows,
         COALESCE(c.covered_tokens, 0) AS covered_tokens
  FROM toks t LEFT JOIN cov c ON c.doc_id = t.doc_id
)
SELECT doc_id, n_tokens, n_windows,
       CAST(n_dup_windows AS BIGINT) AS n_dup_windows,
       CAST(covered_tokens AS BIGINT) AS covered_tokens,
       CAST(covered_tokens * 1000 // n_tokens AS BIGINT) AS dup_permille,
       CAST(CASE WHEN covered_tokens * 1000 <= n_tokens * {DUP_KEEP_PERMILLE}
                 THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM perdoc
"""


@register(
    "dedup_window_spans",
    oracle=_SQL_DUP_SPANS,
    doc="Substring-level dedup: mark tokens covered by globally duplicated "
    f"{DUP_WINDOW}-token windows (interval-union per doc) and gate on the "
    "duplicated fraction.",
)
def dedup_window_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level duplication marking — the exact-substring dedup of
    Lee et al. ("Deduplicating Training Data Makes Language Models
    Better") re-expressed relationally: every ``DUP_WINDOW``-token window
    that occurs more than once ANYWHERE in the corpus marks its token span
    as duplicated; per document the marked spans are interval-unioned
    (gaps-and-islands, exact integer arithmetic) into a covered-token
    count, a per-mille duplication score, and a keep/drop gate.  This
    rewrites the unit of dedup from documents/chunks down to substrings —
    catching boilerplate that neither whole-doc hashing nor fixed-chunk
    scrubbing sees (a duplicated span straddling chunk boundaries).

    100 TB shape: Lee et al. build a suffix array; the Spark-native
    equivalent is ONE shuffle by window hash — duplication flags come from
    a count-over-window partitioned BY GRAM (no self-join of the window
    table), and the interval union is a per-document window over only the
    DUPLICATED windows (bounded by doc length).  Corpus is scanned once;
    the final per-doc stats LEFT-join back to the (doc_id, n_tokens)
    projection, a doc-keyed shuffle of two doc-cardinality tables.  The
    window hash could shuffle raw gram STRINGS; hashing to xxhash64 first
    would shrink shuffle bytes ~W× at a negligible collision risk — kept
    as strings here so the oracle replays bit-for-bit.
    """
    from pyspark.sql.window import Window

    toks = _span_toks(t(spark, sf_dir, "documents"))
    win = _span_windows(toks)
    dup = (
        win.withColumn("c", F.count("*").over(Window.partitionBy("g")))
        .filter(F.col("c") > 1)
        .select("doc_id", "j")
    )
    return _span_coverage(toks, dup)


def _span_toks(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id",
        F.split(F.lower(F.col("text")), " ", -1).alias("tk"),
    ).select("doc_id", "tk", F.size("tk").cast("long").alias("n_tokens"))


def _span_windows(toks: DataFrame) -> DataFrame:
    """All ``DUP_WINDOW``-token windows: (doc_id, j, g)."""
    return (
        toks.select(
            "doc_id",
            "tk",
            "n_tokens",
            F.explode(
                F.expr(
                    f"CASE WHEN size(tk) >= {DUP_WINDOW} THEN "
                    f"sequence(1, size(tk) - {DUP_WINDOW} + 1) "
                    "ELSE array() END"
                )
            ).alias("j"),
        )
        .select(
            "doc_id",
            F.col("j").cast("long").alias("j"),
            F.array_join(F.expr(f"slice(tk, j, {DUP_WINDOW})"), " ").alias("g"),
        )
    )


def _span_coverage(toks: DataFrame, dup: DataFrame) -> DataFrame:
    """Per-doc interval union of the duplicated windows ``dup = (doc_id, j)``
    (gaps-and-islands) -> the (doc_id, n_tokens, n_windows, n_dup_windows,
    covered_tokens, dup_permille, keep) stats frame."""
    from pyspark.sql.window import Window

    by_doc = Window.partitionBy("doc_id").orderBy("j")
    isl = (
        dup.withColumn(
            "prev_end",
            F.max(F.col("j") + F.lit(DUP_WINDOW - 1)).over(
                by_doc.rowsBetween(Window.unboundedPreceding, -1)
            ),
        )
        .withColumn(
            "new_isl",
            F.when(
                F.col("prev_end").isNull() | (F.col("j") > F.col("prev_end")), 1
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("new_isl").over(by_doc.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    per_island = isl.groupBy("doc_id", "island").agg(
        (F.max("j") - F.min("j") + F.lit(DUP_WINDOW)).alias("ilen"),
        F.count("*").alias("nw"),
    )
    cov = per_island.groupBy("doc_id").agg(
        F.sum("nw").cast("long").alias("n_dup_windows"),
        F.sum("ilen").cast("long").alias("covered_tokens"),
    )
    out = (
        toks.select("doc_id", "n_tokens")
        .join(cov, ["doc_id"], "left")
        .select(
            "doc_id",
            "n_tokens",
            F.greatest(F.col("n_tokens") - F.lit(DUP_WINDOW - 1), F.lit(0))
            .cast("long")
            .alias("n_windows"),
            F.coalesce(F.col("n_dup_windows"), F.lit(0)).cast("long").alias("n_dup_windows"),
            F.coalesce(F.col("covered_tokens"), F.lit(0))
            .cast("long")
            .alias("covered_tokens"),
        )
    )
    return out.select(
        "*",
        F.expr("CAST(covered_tokens * 1000 DIV n_tokens AS BIGINT)").alias(
            "dup_permille"
        ),
        F.when(
            F.col("covered_tokens") * 1000 <= F.col("n_tokens") * DUP_KEEP_PERMILLE, 1
        )
        .otherwise(0)
        .cast("long")
        .alias("keep"),
    )


def corpus_gram_index(corpus: DataFrame) -> DataFrame:
    """The frozen corpus artifact for ingest-time span marking: the distinct
    ``DUP_WINDOW``-token grams of the released corpus (one checkpointed
    distinct over the window stream — membership is all the probe needs, so
    counts are not stored)."""
    return _span_windows(_span_toks(corpus)).select("g").distinct().localCheckpoint()


def mark_spans_against_index(new_docs: DataFrame, gram_index: DataFrame) -> DataFrame:
    """Ingest-cycle twin of ``dedup_window_spans`` (the
    ``scrub_against_index`` contract): mark each NEW document's windows
    whose gram already exists in the FROZEN corpus gram index, then run the
    same interval-union coverage stats.  A new doc's verdict depends only
    on itself and the frozen index, so per-micro-batch evaluation unions to
    the one-batch run exactly (streaming parity pinned in tests); batch
    cost is O(batch windows) — a semi-join probe against the index, no
    corpus rescan.  (Deliberate semantic difference from the batch query:
    batch-INTERNAL duplication is not counted — it belongs to the next
    corpus release's index fold.)"""
    toks = _span_toks(new_docs)
    dup = _span_windows(toks).join(gram_index, ["g"], "left_semi").select("doc_id", "j")
    return _span_coverage(toks, dup)


# ---------------------------------------------------------------------------
# span-corruption data prep (T5-style denoising objectives)
# ---------------------------------------------------------------------------

MASK_SEED = "mask"  # seed namespace for the deterministic span draw
MASK_SPAN = 3  # tokens per drawn span (T5 uses Poisson mean 3; fixed here)
# a position STARTS a span iff the first hex digit of its seeded md5 is
# < '1' (1/16 = 6.25% of positions; with 3-token spans that corrupts
# ~15-18% of tokens — the T5 operating point)
MASK_HEX_LT = "1"


_SQL_SPAN_CORRUPTION = f"""
WITH toks AS (
  SELECT doc_id, string_split(lower(text), ' ') AS tk,
         CAST(LEN(string_split(lower(text), ' ')) AS BIGINT) AS n_tokens
  FROM documents
),
pos AS (
  SELECT doc_id, n_tokens, CAST(i AS BIGINT) AS p, tk[CAST(i AS INT)] AS tok
  FROM toks, UNNEST(range(1, len(tk) + 1)) AS r(i)
),
cand AS (
  SELECT doc_id, p AS s, LEAST(p + {MASK_SPAN} - 1, n_tokens) AS e
  FROM pos
  WHERE substring(md5('{MASK_SEED}:' || CAST(doc_id AS VARCHAR) || ':'
                      || CAST(p AS VARCHAR)), 1, 1) < '{MASK_HEX_LT}'
),
mk AS (
  SELECT doc_id, s, e,
         CASE WHEN prev_end IS NULL OR s > prev_end THEN 1 ELSE 0 END AS new_isl
  FROM (
    SELECT doc_id, s, e,
           MAX(e) OVER (PARTITION BY doc_id ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
             AS prev_end
    FROM cand)
),
mg AS (
  SELECT doc_id, s, e,
         SUM(new_isl) OVER (PARTITION BY doc_id ORDER BY s
                            ROWS UNBOUNDED PRECEDING) AS island
  FROM mk
),
isl AS (
  SELECT doc_id, MIN(s) AS istart, MAX(e) AS iend FROM mg GROUP BY doc_id, island
),
ki AS (
  SELECT doc_id, istart, iend,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY istart) - 1 AS k
  FROM isl
),
j AS (
  SELECT p.doc_id, p.n_tokens, p.p, p.tok, ki.k, ki.istart
  FROM pos p
  LEFT JOIN ki ON ki.doc_id = p.doc_id AND p.p BETWEEN ki.istart AND ki.iend
),
inp AS (
  SELECT doc_id, n_tokens,
         string_agg(CASE WHEN k IS NULL THEN tok
                         WHEN p = istart THEN '<extra_id_' || CAST(k AS VARCHAR) || '>'
                         END, ' ' ORDER BY p) AS input_text,
         CAST(COUNT(CASE WHEN k IS NOT NULL THEN 1 END) AS BIGINT) AS n_masked
  FROM j GROUP BY doc_id, n_tokens
),
spans AS (
  SELECT doc_id, k, string_agg(tok, ' ' ORDER BY p) AS stext
  FROM j WHERE k IS NOT NULL GROUP BY doc_id, k
),
tgt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_spans,
         string_agg('<extra_id_' || CAST(k AS VARCHAR) || '> ' || stext,
                    ' ' ORDER BY k) AS target_text
  FROM spans GROUP BY doc_id
)
SELECT i.doc_id, i.n_tokens, COALESCE(t.n_spans, 0) AS n_spans, i.n_masked,
       i.input_text, COALESCE(t.target_text, '') AS target_text
FROM inp i LEFT JOIN tgt t ON t.doc_id = i.doc_id
"""


@register(
    "prepare_span_corruption",
    oracle=_SQL_SPAN_CORRUPTION,
    doc="T5-style span corruption: deterministic masked-span draw, sentinel "
    "input/target pair per document.",
)
def prepare_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Denoising-objective data prep (the T5/UL2 span-corruption recipe):
    draw mask spans over each document, replace every span with a numbered
    sentinel in the INPUT, and emit the masked content after its sentinel
    as the TARGET — the (input, target) pair a seq-to-seq denoiser trains
    on.

    The span draw is engine-portable DETERMINISM, not RNG (the
    ``split_hash_assign`` convention): position ``p`` of document ``d``
    starts a ``MASK_SPAN``-token span iff the first hex digit of
    ``md5('mask:d:p')`` is < '1' (6.25% of positions — ~15-18% token
    corruption, T5's operating point).  Overlapping/adjacent draws resolve
    set-wise by interval union (the ``dedup_window_spans`` gaps-and-islands
    pass) rather than a sequential greedy scan, so the result is identical
    under any evaluation order and replays exactly in the oracle.

    100 TB shape: everything is doc-local — one corpus scan explodes
    positions, the span draw is a pure map, islands are a per-doc window
    over only the DRAWN positions (~6%), and both assemblies are per-doc
    aggregations (`array_join(transform(array_sort(collect_list(...))))`,
    null pieces skipped).  The positions-to-islands attach is a doc-keyed
    join whose right side is the sparse island list.  No corpus-global
    state of any kind: the transform streams (every row's output depends
    only on its own document), shards embarrassingly, and a new mask epoch
    is a new seed string with zero data movement.
    """
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.split(F.lower(F.col("text")), " ", -1).alias("tk")
    ).select("doc_id", "tk", F.size("tk").cast("long").alias("n_tokens"))
    pos = toks.select(
        "doc_id",
        "n_tokens",
        F.posexplode("tk").alias("p0", "tok"),
    ).select("doc_id", "n_tokens", (F.col("p0") + 1).cast("long").alias("p"), "tok")
    trigger = F.substring(
        F.md5(
            F.concat(
                F.lit(f"{MASK_SEED}:"),
                F.col("doc_id").cast("string"),
                F.lit(":"),
                F.col("p").cast("string"),
            )
        ),
        1,
        1,
    )
    cand = pos.filter(trigger < MASK_HEX_LT).select(
        "doc_id",
        F.col("p").alias("s"),
        F.least(F.col("p") + F.lit(MASK_SPAN - 1), F.col("n_tokens")).alias("e"),
    )
    by_doc = Window.partitionBy("doc_id").orderBy("s")
    mg = (
        cand.withColumn(
            "prev_end",
            F.max("e").over(by_doc.rowsBetween(Window.unboundedPreceding, -1)),
        )
        .withColumn(
            "new_isl",
            F.when(F.col("prev_end").isNull() | (F.col("s") > F.col("prev_end")), 1)
            .otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("new_isl").over(by_doc.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    isl = mg.groupBy("doc_id", "island").agg(
        F.min("s").alias("istart"), F.max("e").alias("iend")
    )
    ki = isl.withColumn(
        "k",
        F.row_number().over(Window.partitionBy("doc_id").orderBy("istart")) - 1,
    ).select("doc_id", "istart", "iend", "k")
    # lazy checkpoint (round 16): the island list is SPARSE (~6% of
    # positions merged into spans); its tower — candidate draw over the
    # full position explode + two windows — materializes once here (and
    # with the single-aggregation assembly below the cut also keeps the
    # optimizer from inlining the window tower into the join)
    ki = ki.localCheckpoint(eager=False)
    j = (
        pos.alias("P")
        .join(
            ki.alias("K"),
            (F.col("P.doc_id") == F.col("K.doc_id"))
            & (F.col("P.p") >= F.col("K.istart"))
            & (F.col("P.p") <= F.col("K.iend")),
            "left",
        )
        .select(
            F.col("P.doc_id").alias("doc_id"), "n_tokens", "p", "tok", "k", "istart"
        )
    )
    piece = (
        F.when(F.col("k").isNull(), F.col("tok"))
        .when(
            F.col("p") == F.col("istart"),
            F.concat(F.lit("<extra_id_"), F.col("k").cast("string"), F.lit(">")),
        )
    )
    # SINGLE per-doc aggregation (round 16 restructure): the input and the
    # target assemble from ONE groupBy — the masked (k, p, tok) rows are
    # collected alongside the input pieces (collect_list drops the NULL
    # the CASE yields for unmasked positions), and the target string is
    # rebuilt from the (k, p)-sorted array with an index-aware transform
    # that emits the sentinel exactly where k changes. Provably the same
    # string the old spans/tgt two-level aggregation produced: per k
    # ascending, tokens p ascending, single-space joined, sentinel
    # prefixed to each span's first token. This removes the second
    # consumer of the positions join (the explode + join ran twice), the
    # (doc_id, k) shuffle, and the final inp-tgt join — one explode, one
    # join, one doc-keyed aggregation. Before/after plans and A/B numbers
    # in OPTIMIZATION_r16.md; byte-equivalence held by the DuckDB oracle
    # (which still computes the two-level form) and the round-trip test.
    agg = j.withColumn("piece", piece).groupBy("doc_id", "n_tokens").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(p, piece))),"
            " s -> s.piece), ' ')"
        ).alias("input_text"),
        F.count("k").cast("long").alias("n_masked"),
        F.expr(
            "array_sort(collect_list(CASE WHEN k IS NOT NULL"
            " THEN struct(k, p, tok) END))"
        ).alias("__m"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        F.expr(
            "cast(size(array_distinct(transform(__m, x -> x.k))) as bigint)"
        ).alias("n_spans"),
        "n_masked",
        "input_text",
        F.expr(
            # the i=0 guard is an explicit IF, not an OR short-circuit:
            # under ANSI mode __m[-1] would be INVALID_ARRAY_INDEX if any
            # evaluation path stopped short-circuiting the OR
            "array_join(transform(__m, (x, i) -> concat("
            "IF(IF(i = 0, true, __m[i - 1].k != x.k),"
            " concat('<extra_id_', cast(x.k as string), '> '), ''),"
            " x.tok)), ' ')"
        ).alias("target_text"),
    )


# PII patterns, deliberately RE2-safe (no backrefs, no lookaround) so the
# SAME pattern text runs in Catalyst (Java regex) and any RE2-family
# engine a curation team might audit with. Swappable DATA, not code —
# callers pass their own table; these are the defaults.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    (
        "phone",
        r"\+?[0-9]{1,2}-[0-9]{3}-[0-9]{3}-[0-9]{4}",
        "[PHONE]",
    ),
    (
        "ipv4",
        r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
        "[IP]",
    ),
]


def redact_pii(
    df: DataFrame, text_col: str = "text", patterns=None
) -> DataFrame:
    """Training-data PII scrub, pure Catalyst: for each (name, regex,
    token) rule count the matches (``regexp_extract_all`` size — the
    release-audit number) and replace them with the placeholder token,
    applied in rule order over one projection. Counts are computed on
    the ORIGINAL text per rule (a count computed after an earlier rule's
    replacement would undercount overlapping classes — the email rule
    never overlaps the phone rule here, but the contract must not
    depend on it). Adds ``n_<name>`` per rule and ``clean_<text_col>``.

    This is pattern-based redaction: it catches FORMATTED identifiers
    (emails, phone shapes, bare IPv4s), not free-text names — the
    documented scope every regex-based scrub has. At 100 TB: codegen
    string work fused into the scan, no shuffle, no Python."""
    patterns = PII_PATTERNS if patterns is None else patterns
    out = df
    cleaned = F.col(text_col)
    for name, rx, token in patterns:
        out = out.withColumn(
            f"n_{name}",
            F.size(
                F.regexp_extract_all(F.col(text_col), F.lit(rx), F.lit(0))
            ).cast("bigint"),
        )
        cleaned = F.regexp_replace(cleaned, rx, token)
    return out.withColumn(f"clean_{text_col}", cleaned)


@register(
    "curation_pii_redaction",
    oracle=r"""
    WITH planted AS (
      SELECT doc_id AS d, text,
             text
             || CASE WHEN doc_id % 3 = 0
                  THEN ' contact bob' || doc_id || '@mail'
                       || (doc_id % 7) || '.example' ELSE '' END
             || CASE WHEN doc_id % 4 = 1
                  THEN ' call +1-555-100-'
                       || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  ELSE '' END
             || CASE WHEN doc_id % 5 = 2
                  THEN ' from 10.0.' || (doc_id % 256) || '.'
                       || (doc_id % 100) ELSE '' END AS dirty
      FROM documents)
    SELECT d AS doc_id,
           CAST(CASE WHEN d % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
             AS n_email,
           CAST(CASE WHEN d % 4 = 1 THEN 1 ELSE 0 END AS BIGINT)
             AS n_phone,
           CAST(CASE WHEN d % 5 = 2 THEN 1 ELSE 0 END AS BIGINT)
             AS n_ipv4,
           text
             || CASE WHEN d % 3 = 0 THEN ' contact [EMAIL]' ELSE '' END
             || CASE WHEN d % 4 = 1 THEN ' call [PHONE]' ELSE '' END
             || CASE WHEN d % 5 = 2 THEN ' from [IP]' ELSE '' END
             AS clean_text
    FROM planted
    """,
    doc="Regex PII scrub (emails, phone shapes, IPv4) with per-class "
    "audit counts, pure Catalyst; the oracle replays every count and "
    "the full redacted text from the planting schedules.",
)
def curation_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The release-blocking scrub, end to end and oracle-checked: every
    document's text gains a planted email (``d % 3 == 0``), a formatted
    phone number (``d % 4 == 1``), and a bare IPv4 (``d % 5 == 2``) on
    independent schedules (so rows carry 0-3 findings in every
    combination), ``redact_pii`` counts and replaces them, and the
    DuckDB oracle replays the counts AND the full redacted text — a
    pattern that over-matches into the surrounding prose (the corpus
    words must survive untouched) or under-matches a planted identifier
    breaks the hash. The base corpus text itself contains no PII shapes
    (token words only), which the zero-count rows verify.

    At 100 TB: codegen string work fused into the scan; the audit
    counts aggregate map-side wherever the caller rolls them up."""
    docs = t(spark, sf_dir, "documents").select("doc_id", "text")
    d = F.col("doc_id")
    dirty = F.concat(
        F.col("text"),
        F.when(
            d % 3 == 0,
            F.concat(
                F.lit(" contact bob"), d.cast("string"), F.lit("@mail"),
                (d % 7).cast("string"), F.lit(".example"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 4 == 1,
            F.concat(
                F.lit(" call +1-555-100-"),
                F.lpad((d % 10000).cast("string"), 4, "0"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            d % 5 == 2,
            F.concat(
                F.lit(" from 10.0."), (d % 256).cast("string"), F.lit("."),
                (d % 100).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    staged = docs.select("doc_id", dirty.alias("text"))
    return redact_pii(staged, "text").select(
        "doc_id", "n_email", "n_phone", "n_ipv4",
        F.col("clean_text"),
    )
