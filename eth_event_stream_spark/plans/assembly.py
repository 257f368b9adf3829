"""Corpus-assembly operators (round 6): the decisions a training-data
pipeline makes AFTER curation — how much of each source to take, exact-count
stratified draws, and cheap cardinality estimates over the result.

- **data-mixing waterfill** (``mix_waterfill_allocation``): allocate a token
  budget across language strata proportionally UP TO each stratum's
  availability — the corpus-assembly step behind every published data-mixture
  table (small sources get everything they have, the dominant source absorbs
  the rest at a common water level). Pure integer arithmetic; the water
  level is a closed-form prefix computation over the TINY per-stratum
  aggregate, done as broadcast self-joins (never a global window over fact
  lineage — registry gate).
- **exact-N stratified draw** (``sample_stratified_exact_n``): the
  fixed-quota companion to the fractional sampler — N documents per
  stratum, chosen by deterministic md5 order so the draw is reproducible
  across runs, engines, and cluster sizes, and adding data never evicts a
  previously-drawn id unless it hashes earlier.
- **KMV distinct sketch** (``sketch_kmv_distinct``): K-minimum-values
  estimate of corpus vocabulary size — keep the K smallest md5-derived
  hash values of the token universe; est = (K-1) * H / h_(K) with all
  arithmetic in integer limbs. Constant state (K values), mergeable by
  keeping the K smallest of a union — the distinct-count analog of the
  Count-Min sketch, against exact count visible in the same row.

The reference has no corpus surface (SURVEY §2.4); these extend the
training-data family (driver brief) on the ``documents`` table. Same
conventions as ``pipeline.py``: md5 hashing, integer compared lanes,
lexicographic tie-breaks.
"""

from __future__ import annotations

import sys

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import t
from .registry import register

# ---------------------------------------------------------------------------
# Data-mixing waterfill
# ---------------------------------------------------------------------------

# budget = 3/4 of total corpus tokens (production passes the budget in; a
# corpus-derived constant keeps the query self-contained, and 3/4 sits in
# the regime where small strata are taken WHOLE and the dominant one is
# capped — both branches of the waterfill exercised on the test data)
MIX_BUDGET_NUM = 3
MIX_BUDGET_DEN = 4


_SQL_WATERFILL = f"""
    WITH per AS (
      SELECT lang,
             CAST(SUM(LEN(string_split(lower(text), ' '))) AS BIGINT) AS avail
      FROM documents GROUP BY lang),
    tot AS (
      SELECT CAST(SUM(avail) AS BIGINT) AS total,
             CAST(SUM(avail) * {MIX_BUDGET_NUM} // {MIX_BUDGET_DEN} AS BIGINT)
               AS budget,
             COUNT(*) AS n
      FROM per),
    ranked AS (
      SELECT lang, avail,
             ROW_NUMBER() OVER (ORDER BY avail, lang) AS i,
             COALESCE(SUM(avail) OVER (ORDER BY avail, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_before
      FROM per),
    -- a stratum is fully allocated iff granting every stratum at least its
    -- own availability as the water level still fits the budget
    flagged AS (
      SELECT r.*, tot.budget, tot.n,
             CASE WHEN r.cum_before + r.avail * (tot.n - r.i + 1) <= tot.budget
                  THEN 1 ELSE 0 END AS fully
      FROM ranked r, tot),
    full_tot AS (
      SELECT COALESCE(SUM(CASE WHEN fully = 1 THEN avail END), 0) AS sum_full,
             COALESCE(SUM(fully), 0) AS n_full
      FROM flagged)
    -- CAST to BIGINT: full_tot's SUM promotes to HUGEINT in DuckDB, which
    -- the driver surfaces as float64 and hash-mismatches Spark's int64
    -- (the one red row in CORRECTNESS_r06 — values were identical).
    SELECT f.lang, f.avail AS avail_tokens,
           CAST(CASE WHEN f.fully = 1 THEN f.avail
                ELSE (f.budget - ft.sum_full) // (f.n - ft.n_full)
           END AS BIGINT) AS alloc_tokens,
           CAST(1 - f.fully AS INT) AS capped
    FROM flagged f, full_tot ft
    """


@register("mix_waterfill_allocation", oracle=_SQL_WATERFILL)
def mix_waterfill_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget waterfilling across language strata: every stratum gets
    min(its availability, the water level L), with L the integer level that
    spends the budget — small sources are taken whole, the dominant ones
    are capped at a common level. This is the corpus-assembly "data
    mixture" step; determinism is total (integer arithmetic, (avail, lang)
    ordering), so the allocation is reproducible bit-for-bit.

    Closed form instead of iteration: sorted by availability ascending, a
    stratum is FULLY allocated iff cum_before + avail * (n - i + 1) <=
    budget (granting its own availability as the level to every remaining
    stratum still fits); the capped strata share L = (budget - sum_full)
    div (n - n_full). 100 TB shape: the per-stratum aggregate is one
    partial-agg shuffle to ~|langs| rows; everything after runs on that
    constant-size frame via broadcast joins — the rank/prefix-sum self-join
    replaces a SinglePartition window (registry gate) and touches n^2 ~ 25
    rows."""
    d = t(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.sum(F.size(F.split(F.lower(F.col("text")), " ", -1)))
        .cast("bigint")
        .alias("avail")
    )
    tot = per.agg(
        F.sum("avail").cast("bigint").alias("total"),
        F.expr(
            f"CAST(SUM(avail) * {MIX_BUDGET_NUM} div {MIX_BUDGET_DEN} AS BIGINT)"
        ).alias("budget"),
        F.count(F.lit(1)).alias("n"),
    ).select("budget", "n")
    other = per.select(F.col("lang").alias("lang2"), F.col("avail").alias("avail2"))
    before = (F.col("avail2") < F.col("avail")) | (
        (F.col("avail2") == F.col("avail")) & (F.col("lang2") < F.col("lang"))
    )
    ranked = (
        per.join(F.broadcast(other), before, "left")
        .groupBy("lang", "avail")
        .agg(
            (F.count("lang2") + 1).alias("i"),
            F.coalesce(F.sum("avail2"), F.lit(0)).cast("bigint").alias("cum_before"),
        )
    )
    flagged = ranked.crossJoin(F.broadcast(tot)).withColumn(
        "fully",
        F.when(
            F.col("cum_before") + F.col("avail") * (F.col("n") - F.col("i") + 1)
            <= F.col("budget"),
            1,
        ).otherwise(0),
    )
    full_tot = flagged.agg(
        F.coalesce(F.sum(F.when(F.col("fully") == 1, F.col("avail"))), F.lit(0))
        .cast("bigint")
        .alias("sum_full"),
        F.coalesce(F.sum("fully"), F.lit(0)).alias("n_full"),
    )
    return flagged.crossJoin(F.broadcast(full_tot)).select(
        "lang",
        F.col("avail").alias("avail_tokens"),
        F.when(F.col("fully") == 1, F.col("avail"))
        .otherwise(F.expr("(budget - sum_full) div (n - n_full)"))
        .cast("bigint")
        .alias("alloc_tokens"),
        (F.lit(1) - F.col("fully")).cast("int").alias("capped"),
    )


# ---------------------------------------------------------------------------
# Temperature-weighted mixing
# ---------------------------------------------------------------------------

_SQL_TEMPERATURE = f"""
    WITH per AS (
      SELECT lang,
             CAST(SUM(LEN(string_split(lower(text), ' '))) AS BIGINT) AS avail
      FROM documents GROUP BY lang),
    -- alpha = 0.5 temperature: weight = floor(sqrt(avail)); sqrt of an
    -- exactly-representable BIGINT (< 2^53) is correctly rounded IEEE in
    -- both engines, so the floor is bit-stable
    w AS (SELECT lang, avail, CAST(FLOOR(SQRT(avail)) AS BIGINT) AS weight
          FROM per),
    tot AS (
      SELECT CAST(SUM(avail) AS BIGINT) AS total,
             CAST(SUM(avail) * {MIX_BUDGET_NUM} // {MIX_BUDGET_DEN} AS BIGINT)
               AS budget,
             CAST(SUM(weight) AS BIGINT) AS sum_w
      FROM w)
    SELECT w.lang, w.avail AS avail_tokens, w.weight,
           CAST((t.budget * w.weight) // t.sum_w AS BIGINT) AS alloc_tokens,
           CAST((w.avail * 1000000) // t.total AS BIGINT) AS prop_ppm,
           CAST((w.weight * 1000000) // t.sum_w AS BIGINT) AS temp_ppm
    FROM w, tot t
    """


@register("mix_temperature_allocation", oracle=_SQL_TEMPERATURE)
def mix_temperature_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based data mixing (alpha = 0.5): each language stratum's
    sampling weight is avail^alpha instead of avail, the standard
    multilingual flattening that upweights low-resource strata without the
    hard cap of waterfilling — temp_ppm vs prop_ppm makes the flattening
    visible per stratum (high-resource shares shrink, low-resource grow).

    Integer-exact cross-engine: weight = floor(sqrt(avail)) — the IEEE
    sqrt of an exactly-representable BIGINT is correctly rounded in both
    engines, so the floor is bit-stable — and the allocation is
    budget * w div sum_w (document the DECIMAL(38,0) promotion when
    budget * w approaches 2^63; at any test SF it is < 2^40).

    100 TB shape: identical to waterfill — ONE partial-agg shuffle to
    ~|langs| rows, then constant-size broadcast arithmetic; no windows,
    no second scan. Complements ``mix_waterfill_allocation``: waterfill
    answers "spend the budget, cap the giants", temperature answers
    "rebalance toward the tail" — a pipeline typically waterfills within
    a source and temperature-mixes across sources."""
    d = t(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.sum(F.size(F.split(F.lower(F.col("text")), " ", -1)))
        .cast("bigint")
        .alias("avail")
    )
    w = per.select(
        "lang",
        F.col("avail").alias("avail_tokens"),
        F.floor(F.sqrt(F.col("avail"))).cast("bigint").alias("weight"),
    )
    tot = w.agg(
        F.sum("avail_tokens").cast("bigint").alias("total"),
        F.expr(
            f"CAST(SUM(avail_tokens) * {MIX_BUDGET_NUM} div {MIX_BUDGET_DEN}"
            " AS BIGINT)"
        ).alias("budget"),
        F.sum("weight").cast("bigint").alias("sum_w"),
    )
    return w.crossJoin(F.broadcast(tot)).select(
        "lang",
        "avail_tokens",
        "weight",
        F.expr("CAST((budget * weight) div sum_w AS BIGINT)").alias("alloc_tokens"),
        F.expr("CAST((avail_tokens * 1000000) div total AS BIGINT)").alias(
            "prop_ppm"
        ),
        F.expr("CAST((weight * 1000000) div sum_w AS BIGINT)").alias("temp_ppm"),
    )


# ---------------------------------------------------------------------------
# Exact-N stratified draw
# ---------------------------------------------------------------------------

PRIORITY_SAMPLE_N = 100


@register(
    "sample_topk_priority",
    oracle=f"""
    SELECT doc_id, lang,
           md5('prio:' || CAST(doc_id AS VARCHAR)) AS priority
    FROM documents
    ORDER BY priority, doc_id LIMIT {PRIORITY_SAMPLE_N}
    """,
)
def sample_topk_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global uniform exact-N draw as a PRIORITY SAMPLE: the
    {PRIORITY_SAMPLE_N} documents with the smallest md5('prio:' || doc_id)
    — a uniform sample (md5 is uniform over ids) that is (a) exactly N,
    unlike Bernoulli sampling, (b) deterministic and engine-independent,
    and (c) a MONOID: the global top-N of per-partition top-Ns, so it
    composes across shards, across corpus releases, and across a stream
    (the same merge KeywordTopKServer runs). Complements the stratified
    draws: this is the unconditioned corpus-wide sample an eval or
    inspection job starts from.

    Plan: TakeOrderedAndProject — per-partition {PRIORITY_SAMPLE_N}-row
    heaps merged on the driver; no global sort, no window, no shuffle of
    the corpus (gate in test_plan_quality)."""
    d = t(spark, sf_dir, "documents")
    prio = F.md5(F.concat(F.lit("prio:"), F.col("doc_id").cast("string")))
    return (
        d.select("doc_id", "lang", prio.alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(PRIORITY_SAMPLE_N)
    )


STRAT_EXACT_N = 25


@register(
    "sample_stratified_exact_n",
    oracle=f"""
    SELECT doc_id, lang FROM (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (
               PARTITION BY lang
               ORDER BY md5('exact:' || CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM documents) r
    WHERE rn <= {STRAT_EXACT_N}
    """,
)
def sample_stratified_exact_n(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-quota stratified draw: the {STRAT_EXACT_N} documents per
    language with the smallest md5('exact:' || doc_id) — the fixed-count
    companion to the fractional ``sample_stratified_fraction`` (eval-set
    construction wants "exactly N per class", not "about p%"). The md5
    order makes the draw a deterministic function of ids: reproducible
    everywhere, stable under appends except where a new id genuinely
    hashes earlier.

    Plan shape: one hash partition by lang + per-partition top-N — Spark
    plans the rank filter as WindowGroupLimit, so each partition keeps a
    {STRAT_EXACT_N}-row heap per stratum below the shuffle instead of
    sorting whole partitions (same mechanism the top-k gates pin)."""
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        F.md5(F.concat(F.lit("exact:"), F.col("doc_id").cast("string"))), "doc_id"
    )
    return (
        d.select("doc_id", "lang")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= STRAT_EXACT_N)
        .select("doc_id", "lang")
    )


# ---------------------------------------------------------------------------
# KMV distinct sketch
# ---------------------------------------------------------------------------

KMV_K = 64
_KMV_H = 16**15  # hash space: 15 md5 hex chars -> [0, 16^15)


@register(
    "sketch_kmv_distinct",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT unnest(string_split(lower(text), ' ')) AS tok
      FROM documents),
    hs AS (
      SELECT DISTINCT ('0x' || substring(md5(tok), 1, 15))::BIGINT AS h
      FROM toks),
    kth AS (
      SELECT MAX(h) AS kth, COUNT(*) AS k_actual
      FROM (SELECT h FROM hs ORDER BY h LIMIT {KMV_K})),
    exact AS (SELECT CAST(COUNT(*) AS BIGINT) AS exact_distinct FROM toks)
    SELECT k_actual,
           kth AS kth_hash,
           CASE WHEN k_actual < {KMV_K} THEN exact_distinct
                ELSE CAST((CAST(k_actual - 1 AS HUGEINT) * {_KMV_H}) // kth
                          AS BIGINT)
           END AS est_distinct,
           exact_distinct
    FROM kth, exact
    """,
)
def sketch_kmv_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-size estimate from a K-minimum-values sketch: keep the
    {KMV_K} smallest 60-bit md5-derived hash values of the distinct-token
    universe; the K-th smallest h_(K) estimates distinct count as
    (K-1) * H / h_(K) (uniform order statistics). The division runs in
    DECIMAL(38,0)/HUGEINT limbs, so both engines produce the identical
    integer; when the universe is smaller than K the sketch IS the
    universe and the exact count is returned. Exact distinct rides along
    so the sketch error is visible in the result (same convention as the
    Count-Min row).

    100 TB shape: the sketch is a TakeOrdered top-K over hash values —
    per-partition K-row heaps, one K-row reduction, constant state; and
    it MERGES (K smallest of a union of sketches), unlike exact distinct
    whose state is the universe itself. The deliberate second lane
    computing exact count_distinct is the visible cost contrast."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("tok")
    ).distinct()
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("bigint")
    hs = toks.select(h.alias("h")).distinct()
    kth = (
        hs.orderBy("h")
        .limit(KMV_K)
        .agg(F.max("h").alias("kth"), F.count(F.lit(1)).alias("k_actual"))
    )
    exact = toks.agg(F.count(F.lit(1)).cast("bigint").alias("exact_distinct"))
    return kth.crossJoin(F.broadcast(exact)).select(
        "k_actual",
        F.col("kth").alias("kth_hash"),
        F.when(F.col("k_actual") < KMV_K, F.col("exact_distinct"))
        .otherwise(
            F.expr(
                f"CAST((CAST(k_actual - 1 AS DECIMAL(38,0)) * {_KMV_H}) div kth"
                " AS BIGINT)"
            )
        )
        .alias("est_distinct"),
        "exact_distinct",
    )


# ---------------------------------------------------------------------------
# k-center diversity sampling (round 8)
# ---------------------------------------------------------------------------

KCENTER_K = 8  # selections; bounded iterative loop like PageRank/BPE

# squared L2 between two double arrays, folded in index order on both
# engines (the established convention of _SPARK_DOT/_SQL_DOT in
# pipeline.py: Spark `aggregate` and DuckDB `list_sum` fold left-to-right)
_SPARK_D2 = (
    "aggregate(zip_with(CAST({a} AS ARRAY<DOUBLE>), CAST({b} AS ARRAY<DOUBLE>), "
    "(x, y) -> (x - y) * (x - y)), CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
)
_SQL_D2 = (
    "list_sum(list_transform(generate_series(1, LEN({a})), "
    "i -> (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))"
    " * (CAST({a}[i] AS DOUBLE) - CAST({b}[i] AS DOUBLE))))"
)


def _kcenter_oracle() -> str:
    d2 = _SQL_D2.format(a="v.embedding", b="c.embedding")
    head = """
WITH e AS (SELECT vec_id, embedding FROM embeddings),
seed AS (SELECT MIN(vec_id) AS vid FROM e),
st1 AS (
  SELECT v.vec_id, v.embedding, ROUND({d2}, 6) AS mind
  FROM e v JOIN e c ON c.vec_id = (SELECT vid FROM seed)
  WHERE v.vec_id != (SELECT vid FROM seed)
)""".format(d2=d2)
    rounds = []
    for r in range(2, KCENTER_K + 1):
        rounds.append(f"""
b{r} AS (SELECT vec_id, mind FROM st{r - 1} ORDER BY mind DESC, vec_id LIMIT 1),
st{r} AS (
  SELECT v.vec_id, v.embedding, LEAST(v.mind, ROUND({d2}, 6)) AS mind
  FROM st{r - 1} v JOIN e c ON c.vec_id = (SELECT vec_id FROM b{r})
  WHERE v.vec_id != (SELECT vec_id FROM b{r})
)""")
    finals = "\nUNION ALL\n".join(
        ["SELECT CAST(1 AS BIGINT) AS sel_rank, (SELECT vid FROM seed) AS vec_id,"
         " CAST(0.0 AS DOUBLE) AS min_d2"]
        + [
            f"SELECT CAST({r} AS BIGINT), vec_id, mind FROM b{r}"
            for r in range(2, KCENTER_K + 1)
        ]
    )
    return head + "," + ",".join(rounds) + "\n" + finals


@register(
    "sample_kcenter_diverse",
    oracle=_kcenter_oracle(),
    doc="Greedy k-center (farthest-point) diversity draw over the embedding corpus.",
)
def sample_kcenter_diverse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center (farthest-point-first) selection of ``KCENTER_K``
    maximally diverse embeddings — the classic coreset / diversity-sampling
    pass a curation pipeline runs to cover the embedding space instead of
    sampling it iid (Gonzalez's 2-approximation to the k-center objective).

    Determinism: seed = smallest ``vec_id``; each round picks the point
    with the LARGEST min-squared-L2 distance to the selected set (distance
    rounded to 6 places before comparison, ties by ``vec_id``) — the same
    index-order fold both engines use for the cosine lanes, replayed
    round-for-round by the spliced oracle.

    100 TB shape: this is the canonical k-pass streaming implementation —
    the state is one row per corpus vector carrying ``mind`` (distance to
    the nearest selected center), each round is ONE map over that state
    against the single broadcast-literal new center plus a
    ``TakeOrderedAndProject(1)`` argmax (never a global sort), and the
    state is ``localCheckpoint``-materialized so round r+1 reads a
    cached RDD instead of replaying rounds 1..r lineage. Cost: K linear
    passes, K bounded 1-row driver probes. For k in the thousands,
    production swaps the exact argmax for over-sampled batched selection
    (k-center++-style); the per-pass plan shape is identical.
    """
    emb = t(spark, sf_dir, "embeddings").select(
        "vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("e")
    )
    seed = emb.orderBy("vec_id").limit(1).collect()[0]
    selected: list[tuple[int, int, float]] = [(1, seed["vec_id"], 0.0)]

    def lit_center(vals: list[float]):
        return F.array(*[F.lit(float(x)) for x in vals])

    state = (
        emb.filter(F.col("vec_id") != seed["vec_id"])
        .withColumn("c", lit_center(seed["e"]))
        .withColumn("mind", F.round(F.expr(_SPARK_D2.format(a="e", b="c")), 6))
        .drop("c")
        # LAZY checkpoint (round 17): the round's argmax probe is the
        # materializing action, so distance fold + cache write + top-1
        # run as ONE job per round instead of an eager write job followed
        # by a cached-read probe job — same blocks cached, half the jobs
        # (guide §8 decide-with-small-rows: the probe IS the decision)
        .localCheckpoint(eager=False)
    )
    for r in range(2, KCENTER_K + 1):
        # one probe per round: the argmax row carries the center embedding
        top = state.orderBy(F.desc("mind"), "vec_id").limit(1).collect()
        if not top:
            break  # corpus smaller than K: the oracle's b{r} CTEs are
            # empty from here on, yielding the same truncated selection
        nxt = top[0]
        selected.append((r, nxt["vec_id"], nxt["mind"]))
        state = (
            state.filter(F.col("vec_id") != nxt["vec_id"])
            .withColumn("c", lit_center(nxt["e"]))
            .withColumn(
                "mind",
                F.least("mind", F.round(F.expr(_SPARK_D2.format(a="e", b="c")), 6)),
            )
            .drop("c")
            # lazy: materialized by the NEXT round's argmax probe (one job
            # per round); the final round's state is never read, so its
            # eager write was pure waste
            .localCheckpoint(eager=False)
        )
    return spark.createDataFrame(selected, "sel_rank long, vec_id long, min_d2 double")


def sample_kcenter_batched(
    spark: SparkSession,
    sf_dir: str,
    k: int = KCENTER_K,
    batch: int = 1,
    oversample: int = 4,
    e: DataFrame | None = None,
    stats_out: dict | None = None,
    exact: bool = False,
) -> DataFrame:
    """Large-k k-center: over-sampled BATCHED greedy selection — the
    production path ``sample_kcenter_diverse``'s docstring promises for k
    in the thousands, where K exact-argmax passes over the corpus are the
    bottleneck (k-center++ / scalable-k-means||-style batching).

    Per pass: (1) ONE ``TakeOrderedAndProject`` pulls the
    ``oversample * batch`` farthest-from-selected candidates (bounded
    driver metadata, like the exact path's 1-row probe); (2) the driver
    runs EXACT greedy farthest-point among those candidates — against the
    running selection AND the picks already made this pass — choosing
    ``batch`` centers (cost O((oversample*batch)^2 * dim), trivial);
    (3) one map over the state folds all ``batch`` new centers into
    ``mind`` at once. Passes = ceil((k-1)/batch) instead of k-1 — for
    k=4096, batch=64 that is 64 corpus passes instead of 4095, the whole
    point. The per-pass plan shape is identical to the exact path
    (localCheckpoint'd state, no global sort, no shuffle).

    Exactness: ``batch=1`` IS Gonzalez — pick 1 of a pass is always the
    global argmax, so the selection equals ``sample_kcenter_diverse``
    row-for-row (pinned in tests/test_kcenter.py). For ``batch > 1``,
    within-pass picks are greedy among the oversampled candidates, so the
    result is an approximation whose first two selections still match the
    exact path; the k-center objective stays within a small constant of
    exact greedy (measured in BENCH_SF1.md: within 0.7% of the exact
    cover radius at k=256 across all three rehearsal scales).

    ``exact=True`` upgrades batch > 1 to EXACT Gonzalez semantics via a
    cutoff rule: a within-pass pick is provably the GLOBAL argmax while
    its locally-updated ``mind`` stays strictly above the fetch cutoff
    (the smallest fetched candidate's pre-pass ``mind`` — every
    non-fetched point is at or below it, and ``mind`` only decreases), so
    the pass stops early and refetches the moment that proof lapses. The
    first pick of every pass is always the global argmax (fetch order is
    the argmax order), so each pass selects >= 1 and the loop terminates;
    passes stay ~ceil((k-1)/batch) when the corpus is spread and degrade
    toward k-1 only where the selection frontier is tie-dense (measured
    in BENCH_SF1.md). Row-for-row equality with ``batch=1`` is pinned in
    tests/test_kcenter.py.

    Determinism matches the exact path: distances rounded to 6 places,
    ties by ``vec_id``, seed = smallest ``vec_id``.
    """
    emb = (
        e
        if e is not None
        else t(spark, sf_dir, "embeddings").select(
            "vec_id", F.expr("CAST(embedding AS ARRAY<DOUBLE>)").alias("e")
        )
    )
    seed = emb.orderBy("vec_id").limit(1).collect()[0]
    selected: list[tuple[int, int, float]] = [(1, seed["vec_id"], 0.0)]
    sel_embs: list[list[float]] = [list(seed["e"])]

    def lit_center(vals: list[float]):
        return F.array(*[F.lit(float(x)) for x in vals])

    def d2(a: list[float], b: list[float]) -> float:
        return round(sum((x - y) * (x - y) for x, y in zip(a, b)), 6)

    state = (
        emb.filter(F.col("vec_id") != seed["vec_id"])
        .withColumn("c", lit_center(seed["e"]))
        .withColumn("mind", F.round(F.expr(_SPARK_D2.format(a="e", b="c")), 6))
        .drop("c")
        # LAZY checkpoint (round 17): the pass's candidate fetch is the
        # materializing action — fold + cache write + top-n_fetch run as
        # ONE job per pass instead of an eager write job plus a
        # cached-read probe job (measured: jobs per pass 2 -> 1, numbers
        # in OPTIMIZATION_r17.md)
        .localCheckpoint(eager=False)
    )
    passes = 0
    while len(selected) < k:
        want = min(batch, k - len(selected))
        n_fetch = max(want, oversample * want)
        cands = state.orderBy(F.desc("mind"), "vec_id").limit(n_fetch).collect()
        if not cands:
            break  # corpus smaller than k: truncated selection, like exact
        # driver-side exact greedy among the candidates: each pick maximizes
        # the min distance to selected ∪ picks-so-far (candidate `mind` is
        # its distance to the pre-pass selection; picks update it locally)
        pool = [
            {"vec_id": c["vec_id"], "e": list(c["e"]), "mind": c["mind"]}
            for c in cands
        ]
        # exact mode: if the fetch truncated the corpus, a pick is provably
        # the global argmax only while its updated mind stays STRICTLY
        # above the smallest fetched pre-pass mind (non-fetched points all
        # sit at or below it and only ever decrease)
        cutoff = min(c["mind"] for c in cands) if len(cands) == n_fetch else None
        picks = []
        for _ in range(want):
            if not pool:
                break
            best = max(pool, key=lambda p: (p["mind"], -p["vec_id"]))
            if exact and picks and cutoff is not None and best["mind"] <= cutoff:
                break  # proof lapsed: stop the pass, refetch from the corpus
            picks.append(best)
            pool.remove(best)
            for p in pool:
                p["mind"] = min(p["mind"], d2(p["e"], best["e"]))
        passes += 1
        for p in picks:
            selected.append((len(selected) + 1, p["vec_id"], p["mind"]))
            sel_embs.append(p["e"])
        picked_ids = [p["vec_id"] for p in picks]
        # fold ALL new centers into the state in ONE pass — shipped as a
        # broadcast 1-row frame rather than a batch x dim literal expression
        # tree (plan compilation dominates the literal form; measured in the
        # certificate pass at k=64)
        cdf = spark.createDataFrame(
            [([list(map(float, p["e"])) for p in picks],)],
            "cs array<array<double>>",
        )
        state = (
            state.filter(~F.col("vec_id").isin(picked_ids))
            .crossJoin(F.broadcast(cdf))
            .withColumn(
                "mind",
                F.least(
                    "mind",
                    F.expr(
                        "array_min(transform(cs, c -> round("
                        + _SPARK_D2.format(a="e", b="c")
                        + ", 6)))"
                    ),
                ),
            )
            .drop("cs")
        )
        # materialize on a cadence, not every pass: an unmaterialized pass
        # costs one extra fold recompute on the next action, a materialized
        # pass costs a full state write — 3 jobs per 2 passes instead of 4
        # (the r7 PageRank cadence decision, applied here numbers-first:
        # sf0.1 and sf1 A/B in BENCH_SF1.md round-13 notes). The LAST pass
        # always checkpoints: the post-loop R^2 aggregate reads the state.
        # Lazy (round 17): the next pass's fetch — or the post-loop R^2
        # aggregate — is the materializing action; when neither ever runs
        # (exact path without stats_out), the final write is skipped.
        if passes % KCENTER_CKPT_CADENCE == 0 or len(selected) >= k:
            state = state.localCheckpoint(eager=False)
    if stats_out is not None:
        stats_out["passes"] = passes
        stats_out["sel_embs"] = sel_embs
        # Cover radius squared FOR FREE: the final state's `mind` already
        # holds every non-selected vector's min squared distance to ALL
        # selected centers (the last pass's fold ran before the loop
        # exited), so R^2 is one tiny aggregate over the checkpointed
        # state — no fresh corpus pass, no re-broadcast centers.
        row = state.agg(F.max("mind").alias("r2")).collect()[0]
        stats_out["r2"] = row["r2"]
    return spark.createDataFrame(selected, "sel_rank long, vec_id long, min_d2 double")


# Production-shaped config for the REGISTERED batched k-center entry:
# k = 64 centers drawn in batches of 8 -> ceil(63/8) = 8 corpus passes
# instead of 63 (the "passes << k" contract, pinned by the oracle).
KCENTER_BATCH_K = 64
KCENTER_BATCH = 8

# Checkpoint the batched draw's state every N passes (1 = every pass).
# Lineage between checkpoints is a bounded chain of at most N-1 distance
# folds, so correctness is cadence-independent (pinned by the row-for-row
# tests); the cadence trades one state write for one fold recompute.
# MEASURED AND REJECTED at >1 (round 13, interleaved min-of-3 A/B):
# cadence 2 read 5.87 s vs 4.88 s at sf0.1 and 17.2 s vs 14.2 s at the
# 10x rehearsal — the 128-dim distance fold costs more to recompute than
# the in-memory state write it would save, the OPPOSITE trade from
# PageRank's cheap join-agg rounds. Stays 1; the knob stays for corpora
# where the fold is cheaper than the write (low-dim embeddings).
KCENTER_CKPT_CADENCE = 1

# Process-lifetime count of approx-certificate failures that escalated to
# the exact draw (the contract entry's self-heal). Observability only —
# bench.py records it in the detail sidecar so a corpus that silently
# flips every run onto the 2x-cost exact path shows up in the records.
KCENTER_ESCALATIONS = {"count": 0}

_SQL_KCENTER_BATCHED = f"""
WITH e AS (SELECT vec_id, embedding FROM embeddings),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM e),
seed AS (SELECT MIN(vec_id) AS vid FROM e),
snd AS (
  SELECT v.vec_id
  FROM e v JOIN e c ON c.vec_id = (SELECT vid FROM seed)
  WHERE v.vec_id != (SELECT vid FROM seed)
  ORDER BY ROUND({_SQL_D2.format(a="v.embedding", b="c.embedding")}, 6) DESC,
           v.vec_id
  LIMIT 1
)
SELECT CAST({KCENTER_BATCH_K} AS BIGINT) AS k,
       LEAST(CAST({KCENTER_BATCH_K} AS BIGINT), n.n) AS n_selected,
       LEAST(CAST({KCENTER_BATCH_K} AS BIGINT), n.n) AS n_distinct_vec,
       TRUE AS dense_ranks,
       CAST((SELECT vid FROM seed) AS BIGINT) AS first_vec,
       CAST((SELECT vec_id FROM snd) AS BIGINT) AS second_vec,
       CAST(CEIL((LEAST(CAST({KCENTER_BATCH_K} AS BIGINT), n.n) - 1)
                 / CAST({KCENTER_BATCH} AS DOUBLE)) AS BIGINT) AS passes,
       TRUE AS cover_certificate_4x
FROM n
"""


def kcenter_cover_certificate(
    emb: DataFrame, ids: list[int], embs: list[list[float]], factor: float = 4.0
) -> bool:
    """A-posteriori k-center approximation certificate for a selection
    (``ids``/``embs``) over the corpus ``emb`` (columns ``vec_id``,
    ``e: array<double>``): TRUE proves the selection's cover radius R is
    within ``factor`` of the OPTIMAL k-center radius on this corpus.

    By pigeonhole, any k+1 points force OPT_k >= (their min pairwise
    metric distance)/2; taking the k centers plus the farthest point w
    (d(w, S) = R) gives ``lower = min(minpair(S), R)/2 <= OPT_k``, so
    ``R <= factor * lower`` implies ``R <= factor * OPT_k``. Cost: ONE
    corpus pass for R (max over non-selected of min squared distance to
    the broadcast-literal centers) + k(k-1)/2 driver pairs for
    minpair(S) — bounded metadata, like the selection itself."""
    import math

    minpair = (
        min(
            sum((x - y) * (x - y) for x, y in zip(a, b))
            for i, a in enumerate(embs)
            for b in embs[i + 1 :]
        )
        if len(embs) > 1
        else 0.0
    )
    # centers ride a broadcast 1-row frame, not a literal expression tree:
    # k x dim float literals (4096 at k=64) cost more in plan compilation
    # than the whole corpus pass (measured 5.5 s literal vs 3.9 s broadcast
    # at sf0.1) and the join is a broadcast nested loop over ONE row
    cdf = emb.sparkSession.createDataFrame(
        [([list(map(float, c)) for c in embs],)], "cs array<array<double>>"
    )
    rad = (
        emb.filter(~F.col("vec_id").isin(list(ids)))
        .crossJoin(F.broadcast(cdf))
        .select(
            F.expr(
                "array_min(transform(cs, c -> "
                + _SPARK_D2.format(a="e", b="c")
                + "))"
            ).alias("mind")
        )
        .agg(F.max("mind").alias("r2"))
        .collect()[0]["r2"]
    )
    if rad is None or rad <= 0.0:
        return True  # every point is a center: cover radius 0
    r_m = math.sqrt(rad)
    lower_m = math.sqrt(min(minpair, rad)) / 2.0
    return r_m <= factor * lower_m


def kcenter_certificate_from_r2(
    r2: float | None, embs: list[list[float]], factor: float = 4.0
) -> bool:
    """The same pigeonhole certificate as ``kcenter_cover_certificate``,
    but taking R^2 directly — the selection loop's final ``state`` frame
    already holds ``mind`` = min squared distance to ALL selected centers
    for every non-selected vector, so its max IS the cover radius squared
    and the second broadcast corpus pass is redundant (``stats_out["r2"]``
    from ``sample_kcenter_batched``). minpair(S) stays k(k-1)/2 driver
    pairs. Keep ``kcenter_cover_certificate`` for ARBITRARY selections
    (e.g. the clustered-selection negative control), which have no
    selection state to reuse."""
    import math

    if r2 is None or r2 <= 0.0:
        return True  # every point is a center: cover radius 0
    minpair = (
        min(
            sum((x - y) * (x - y) for x, y in zip(a, b))
            for i, a in enumerate(embs)
            for b in embs[i + 1 :]
        )
        if len(embs) > 1
        else 0.0
    )
    return math.sqrt(r2) <= factor * (math.sqrt(min(minpair, r2)) / 2.0)


@register(
    "sample_kcenter_batched_exact",
    oracle=_kcenter_oracle(),
    doc="Exact-mode batched k-center: Gonzalez row-for-row in fewer passes, "
    "VALUE-oracled by the same spliced replay as sample_kcenter_diverse.",
)
def sample_kcenter_batched_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ``exact=True`` batched draw at the exact path's k
    (``KCENTER_K``): the cutoff rule only permits a within-pass pick while
    it is PROVABLY the global argmax, so the selection — ids, ranks, AND
    ``min_d2`` values — equals ``sample_kcenter_diverse`` row-for-row and
    the SAME full-value DuckDB oracle (the spliced round-by-round greedy
    replay) checks it. What changes is the cost: up to ``batch`` picks per
    corpus pass instead of one, the large-k production shape measured at
    k=256 in BENCH_SF1.md (10-16 passes instead of 255)."""
    return sample_kcenter_batched(
        spark, sf_dir, k=KCENTER_K, batch=4, exact=True
    )


@register(
    "sample_kcenter_batched",
    oracle=_SQL_KCENTER_BATCHED,
    doc="Batched k-center draw at a production-shaped k, contract-oracled.",
)
def sample_kcenter_batched_contract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Registered entry for the large-k batched k-center path: runs
    ``sample_kcenter_batched`` at k=64, batch=8 (8 corpus passes instead of
    63) and returns the CONTRACT row the oracle pins — the
    ``profile_table_stats_approx`` pattern for results a second engine
    cannot cheaply replay.

    Oracle-checked fields: the selection is exactly k distinct vectors with
    dense ranks; the first pick equals the exact-greedy seed (smallest
    ``vec_id``) and the second pick equals the exact-greedy second pick
    (farthest from the seed, 6-place rounding, vec_id tie-break) — the
    batched algorithm's first pass IS exact for its first selection; and
    ``passes`` equals ceil((k-1)/batch), the "passes << k" scaling claim
    made checkable.

    ``cover_certificate_4x`` is an a-posteriori APPROXIMATION CERTIFICATE,
    computed honestly on the Spark side and pinned TRUE by the oracle: by
    pigeonhole, any k+1 points force OPT_k >= (their min pairwise
    distance)/2, so with S the selection, R its cover radius (the max of
    the selection state's final ``mind`` — min distance to a center over
    non-selected vectors, already computed by the loop's last fold) and w
    the farthest point, ``lower = min(minpair(S), R)/2 <= OPT_k``; the
    flag asserts ``R <= 4*lower``, i.e. the certified draw is PROVEN
    within 4x of the optimal k-center cover on this corpus. Distances
    compare in the metric (sqrt of the squared-L2 lanes). minpair(S) is
    k(k-1)/2 driver pairs — bounded metadata, like the selection itself.

    SELF-HEALING: the approximate draw's certificate is empirical — it
    CAN fail when near-duplicate vectors enter the late selection
    (observed at sf1/k=256, BENCH_SF1.md), with no code change and no
    invalid selection. The documented policy ("a failed certificate means
    escalate to exact mode") is enforced HERE: on a failed approx
    certificate the entry re-draws with ``exact=True``, whose certificate
    is STRUCTURAL — exact Gonzalez picks each center at distance >= the
    final cover radius R from every earlier center, so minpair(S) >= R^2,
    lower = R/2, and ``R <= 4*lower`` holds identically. The reported
    ``passes`` always describes the approx batched draw (the
    deterministic ceil((k-1)/batch) scaling claim the oracle pins);
    ``first_vec``/``second_vec`` are identical across both draws (the
    first pass's first two picks are exact in both modes).
    """
    return _kcenter_contract_row(
        spark, sf_dir, k=KCENTER_BATCH_K, batch=KCENTER_BATCH
    )


def _kcenter_contract_row(
    spark: SparkSession,
    sf_dir: str,
    k: int,
    batch: int,
    e: DataFrame | None = None,
    escalation_out: dict | None = None,
) -> DataFrame:
    """Contract-row engine behind ``sample_kcenter_batched``'s registered
    entry, parameterized so tests can drive it on adversarial corpora
    (``e``) at small k. ``escalation_out`` (tests only) records whether
    the approx certificate failed and the exact escalation ran."""
    stats: dict = {}
    sel = sample_kcenter_batched(
        spark, sf_dir, k=k, batch=batch, e=e, stats_out=stats
    ).collect()  # k rows — the selection is driver-bounded metadata already
    ids = [r["vec_id"] for r in sel]
    ranks = [r["sel_rank"] for r in sel]
    cert = kcenter_certificate_from_r2(stats["r2"], stats["sel_embs"], factor=4.0)
    escalated = False
    if not cert:
        # escalate-to-exact: the exact draw's certificate is structural
        # (see the registered entry's docstring) — self-healing TRUE.
        # The self-heal must be OBSERVABLE in production (not only via the
        # tests' escalation_out hook): a corpus regeneration that silently
        # flips every run onto the 2x-cost exact path would otherwise be
        # invisible in the records. One stderr line + a process-lifetime
        # counter that bench.py copies into its detail sidecar.
        escalated = True
        KCENTER_ESCALATIONS["count"] += 1
        print(
            f"kcenter: approx certificate FAILED (k={k}, batch={batch}) — "
            f"escalated to exact draw "
            f"(escalations this process: {KCENTER_ESCALATIONS['count']})",
            file=sys.stderr,
        )
        xstats: dict = {}
        sample_kcenter_batched(
            spark, sf_dir, k=k, batch=batch, e=e, exact=True, stats_out=xstats
        ).collect()
        cert = kcenter_certificate_from_r2(
            xstats["r2"], xstats["sel_embs"], factor=4.0
        )
    if escalation_out is not None:
        escalation_out["escalated"] = escalated
    row = (
        k,
        len(sel),
        len(set(ids)),
        ranks == list(range(1, len(sel) + 1)),
        ids[0] if ids else None,
        ids[1] if len(ids) > 1 else None,
        stats["passes"],
        cert,
    )
    return spark.createDataFrame(
        [row],
        "k long, n_selected long, n_distinct_vec long, dense_ranks boolean, "
        "first_vec long, second_vec long, passes long, cover_certificate_4x boolean",
    )


# ---------------------------------------------------------------------------
# Epoch planning under a multi-epoch token budget
# ---------------------------------------------------------------------------

# train-for-3x-the-corpus: the regime where epoch accounting matters
EPOCH_BUDGET_MULT = 3

_SQL_EPOCHS = f"""
    WITH per AS (
      SELECT lang,
             CAST(SUM(LEN(string_split(lower(text), ' '))) AS BIGINT) AS avail
      FROM documents GROUP BY lang),
    w AS (SELECT lang, avail, CAST(FLOOR(SQRT(avail)) AS BIGINT) AS weight
          FROM per),
    tot AS (
      SELECT CAST(SUM(avail) * {EPOCH_BUDGET_MULT} AS BIGINT) AS budget,
             CAST(SUM(weight) AS BIGINT) AS sum_w
      FROM w),
    alloc AS (
      SELECT w.lang, w.avail AS avail_tokens,
             CAST((t.budget * w.weight) // t.sum_w AS BIGINT) AS alloc_tokens
      FROM w, tot t)
    SELECT lang, avail_tokens, alloc_tokens,
           CAST((alloc_tokens * 100 + avail_tokens - 1) // avail_tokens
             AS BIGINT) AS epochs_centi,
           CAST(CASE WHEN alloc_tokens * 100 > avail_tokens * 400
                     THEN 1 ELSE 0 END AS INT) AS over_4_epochs
    FROM alloc
    """


@register(
    "mix_epochs_plan",
    oracle=_SQL_EPOCHS,
    doc="Epoch plan for a multi-epoch token budget: per-stratum epochs "
    "(ceil, centi-epoch precision) under temperature weights, flagging "
    "strata pushed past 4 epochs of repetition.",
)
def mix_epochs_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-constrained mixture planning: when the training budget exceeds
    the corpus (here budget = 3x total tokens), temperature flattening
    forces low-resource strata through MULTIPLE epochs — this query makes
    that cost explicit per stratum: epochs_centi = ceil(100 * alloc /
    avail) (integer ceiling division, bit-stable in both engines), with a
    flag on strata pushed past 4 epochs — the repetition level where
    returns measurably decay (data-constrained scaling guidance), i.e.
    the signal to cap the temperature or find more data.

    100 TB shape: identical to the other mixing rows — one partial-agg
    shuffle to ~|langs| rows, constant-size broadcast arithmetic, no
    second corpus scan."""
    d = t(spark, sf_dir, "documents")
    per = d.groupBy("lang").agg(
        F.sum(F.size(F.split(F.lower(F.col("text")), " ", -1)))
        .cast("bigint")
        .alias("avail")
    )
    w = per.select(
        "lang",
        F.col("avail").alias("avail_tokens"),
        F.floor(F.sqrt(F.col("avail"))).cast("bigint").alias("weight"),
    )
    tot = w.agg(
        F.expr(f"CAST(SUM(avail_tokens) * {EPOCH_BUDGET_MULT} AS BIGINT)").alias(
            "budget"
        ),
        F.sum("weight").cast("bigint").alias("sum_w"),
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "lang",
            "avail_tokens",
            F.expr("CAST((budget * weight) div sum_w AS BIGINT)").alias(
                "alloc_tokens"
            ),
        )
        .select(
            "lang",
            "avail_tokens",
            "alloc_tokens",
            F.expr(
                "CAST((alloc_tokens * 100 + avail_tokens - 1) div avail_tokens"
                " AS BIGINT)"
            ).alias("epochs_centi"),
            F.expr(
                "CAST(CASE WHEN alloc_tokens * 100 > avail_tokens * 400"
                " THEN 1 ELSE 0 END AS INT)"
            ).alias("over_4_epochs"),
        )
    )
