"""Count-based language-model operators over the ``documents`` corpus.

Round-8 additions to the training-data surface:

- **LM quality scoring** (``quality_lm_surprise``): the CCNet-style
  pipeline stage — train a smoothed bigram LM on a trusted reference
  slice, score every document by its cross-entropy under that LM, keep
  the low-perplexity (in-domain, fluent) mass.  Float cross-entropy is
  not reproducible across engines (sum order changes low bits, ``ln``
  differs by libm), so the scoring here is **integer surprise bits**:
  ``floor(log2(denominator)) - floor(log2(numerator))`` of the add-one
  smoothed bigram probability, computed exactly in both engines as
  ``length(bin(n)) - 1``.  The bit score is within 1 bit per bigram of
  the true ``-log2 p`` and ranks documents the way the float filter
  would, while hashing bit-identically.

- **BPE vocabulary induction** (``tokenizer_bpe_learn``): the iterative
  byte-pair-encoding merge loop every tokenizer build runs — the raw
  corpus is touched once (word-frequency aggregation) and the merge loop
  runs driver-side on the capped table, Sennrich's learn_bpe design.  See
  the function docstring for the exact greedy-merge semantics and how the
  oracle replays them.

- **BPE corpus encoding** (``tokenizer_bpe_apply`` +
  ``bpe_encode_against_vocab``): the token-budget pass — merges applied
  to the distinct-word VOCABULARY, one broadcast token-map join over the
  corpus; the frozen-vocab serving twin char-falls-back on OOV.

- **Naive Bayes classification** (``classify_nb_lang`` + ``nb_train`` /
  ``nb_score`` / ``NBModelServer``): the fasttext-analog language/domain
  gate trained with pure aggregations and scored in exact integer bit
  costs; the streaming maintainer folds per-batch count deltas into the
  persisted sufficient statistics exactly-once.

- **Composed quality gate** (``quality_ensemble_gate`` +
  ``ensemble_gate_against_lm``): five signals + the LM lane from one
  corpus projection, integer cross-multiplied comparisons, per-signal
  attribution flags.

- **Curriculum layout** (``layout_curriculum_order``): difficulty stages
  as centibit bands of the surprise score (no global sort), epoch-seeded
  shards within each stage.

Reference parity note: the reference engine (Rust) has no LM layer — this
module is part of the beyond-reference training-data surface the project
brief calls for.  Determinism conventions follow ``plans/pipeline.py``:
integer arithmetic on every compared lane, ties broken by total keys.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .catalog import t
from .registry import register

# reference slice the bigram LM is trained on: the corpus' dominant
# language — CCNet trains the filtering LM on a trusted (Wikipedia)
# slice and scores the crawl against it; 'en' is this corpus' stand-in
LM_REF_LANG = "en"

# Broadcast bound for the bigram table, BY CONSTRUCTION: the LM keeps only
# the top-N bigrams by count (ties broken by (w1, w2) so the kept set is
# deterministic), and every pruned bigram scores through the existing
# unseen-continuation fallback (c2 -> 0, the 1/(c1+V) charge) — pruning can
# only RAISE a bigram's surprise, never lower it. 2M rows ≈ tens of MB
# broadcast; at any corpus size the map-join side stays executor-resident
# (the COOCCUR_VOCAB pattern). The unigram table c1 is derived from the
# UNCAPPED counts (an aggregate of the bigram aggregation, never a second
# corpus scan), so denominators — and every un-pruned bigram's score — are
# unchanged by the cap; c1 is |reference vocab|-bounded and takes the same
# top-N treatment if a corpus ever needs it.
LM_MAX_BIGRAMS = 2_000_000


def _cap_bigrams(c2: DataFrame, max_bigrams: int | None) -> DataFrame:
    """Top-``max_bigrams`` rows of the bigram-count table by (count desc,
    w1, w2) — a bounded TakeOrdered, the count-pruning step that makes the
    broadcast safe by construction. ``None`` disables (test hook)."""
    if max_bigrams is None:
        return c2
    return c2.orderBy(F.desc("c2"), F.asc("w1"), F.asc("w2")).limit(max_bigrams)


def _bits(n):  # floor(log2(n)) for n >= 1, exact in integer ops
    return (F.length(F.bin(n)) - F.lit(1)).cast("long")


_SQL_LM_SURPRISE = f"""
WITH toks AS (
  SELECT doc_id, lang, string_split(lower(text), ' ') AS tk FROM documents
),
big AS (
  SELECT doc_id, lang, tk[CAST(i AS INT)] AS w1, tk[CAST(i AS INT) + 1] AS w2
  FROM toks, UNNEST(range(1, len(tk))) AS r(i)
),
c2_full AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
  FROM big WHERE lang = '{LM_REF_LANG}' GROUP BY w1, w2
),
c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2_full GROUP BY w1),
c2 AS (
  -- mirror the Spark side's LM_MAX_BIGRAMS count-pruning exactly: the
  -- capped bigram table is the top-N by (count desc, w1, w2); c1 above is
  -- derived from the UNCAPPED counts, so denominators never shift.
  SELECT * FROM c2_full ORDER BY c2 DESC, w1, w2 LIMIT {LM_MAX_BIGRAMS}
),
v AS (
  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
  FROM (SELECT UNNEST(tk) AS w FROM toks WHERE lang = '{LM_REF_LANG}')
),
scored AS (
  SELECT b.doc_id, b.lang,
         (length(bin(COALESCE(c1.c1, 0) + v.v)) - 1)
           - (length(bin(COALESCE(c2.c2, 0) + 1)) - 1) AS bits
  FROM big b
  LEFT JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
  LEFT JOIN c1 ON c1.w1 = b.w1
  CROSS JOIN v
)
SELECT doc_id, lang,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(bits) AS BIGINT) AS total_bits,
       CAST(SUM(bits) * 100 // COUNT(*) AS BIGINT) AS avg_centibits
FROM scored GROUP BY doc_id, lang
"""


@register(
    "quality_lm_surprise",
    oracle=_SQL_LM_SURPRISE,
    doc="Bigram-LM quality score (integer surprise bits) for every document.",
)
def quality_lm_surprise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Score every document's fluency under an add-one-smoothed bigram LM
    trained on the trusted reference slice (``lang = 'en'``), in exact
    integer **surprise bits** — the reproducible stand-in for the CCNet
    perplexity filter.

    Per bigram ``(w1, w2)``:  ``p = (c2 + 1) / (c1 + V)`` (add-one), and
    the charged surprise is ``floor(log2(c1 + V)) - floor(log2(c2 + 1))``
    — within 1 bit of ``-log2 p``, and exact integer arithmetic on both
    engines (``length(bin(n)) - 1``).  Unseen continuations fall back to
    ``c2 = 0``; unseen left contexts to ``c1 = 0`` (the pure 1/V charge).
    Output per doc: bigram count, total bits, and average centibits
    (integer division) — the filter threshold quantity.

    100 TB shape: the LM tables are aggregates of the reference slice —
    ``c2`` one hash-agg over reference bigrams, ``c1`` an agg OF ``c2``
    (never a second corpus scan), ``V`` a 1-row distinct count.  Scoring
    is the corpus bigram stream map-joined against them: both LM tables
    are explicitly ``broadcast``, and the bigram table is bounded BY
    CONSTRUCTION — count-pruned to the top ``LM_MAX_BIGRAMS`` rows, with
    pruned bigrams absorbed by the unseen-continuation fallback (exactly
    how CCNet ships a pruned few-GB filtering LM).  No shuffle touches
    the corpus except the final per-doc aggregation, which
    partial-aggregates map-side.
    """
    return lm_surprise_of(t(spark, sf_dir, "documents"))


def lm_surprise_of(d: DataFrame, max_bigrams: int | None = LM_MAX_BIGRAMS) -> DataFrame:
    """df-level core of ``quality_lm_surprise`` — train the reference-slice
    LM inline and score every document of ``d`` (shared with the
    curriculum layout, which orders by this score).

    The broadcast bigram table is count-pruned to ``max_bigrams`` rows
    (see ``LM_MAX_BIGRAMS``): un-pruned bigrams score identically to the
    uncapped LM (``c1`` keeps the full counts), pruned ones degrade to the
    unseen-continuation charge — monotone, never under-charging."""
    toks = _doc_toks(d)
    big = _doc_bigrams(toks)
    ref = big.filter(F.col("lang") == LM_REF_LANG)
    # materialize the (small) bigram table once: c1 is an aggregate OF c2,
    # and without the boundary Catalyst re-derives c2 from a second scan
    # of the reference slice (same pattern as the cooccur vocab)
    c2_full = ref.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c2")).localCheckpoint()
    c1 = c2_full.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    c2 = _cap_bigrams(c2_full, max_bigrams)
    v = (
        toks.filter(F.col("lang") == LM_REF_LANG)
        .select(F.explode("tk").alias("w"))
        .agg(F.count_distinct("w").cast("long").alias("v"))
    )
    scored = (
        big.join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(c1), ["w1"], "left")
        .crossJoin(F.broadcast(v))
        .select("doc_id", "lang", _bits_charged(F.col("v")).alias("bits"))
    )
    return _per_doc_bits(scored)


def _doc_toks(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", "lang", F.split(F.lower(F.col("text")), " ", -1).alias("tk")
    )


def _doc_bigrams(toks: DataFrame) -> DataFrame:
    return (
        toks.withColumn("w1s", F.expr("slice(tk, 1, size(tk) - 1)"))
        .withColumn("w2s", F.expr("slice(tk, 2, size(tk) - 1)"))
        .select("doc_id", "lang", F.explode(F.arrays_zip("w1s", "w2s")).alias("p"))
        .select("doc_id", "lang", F.col("p.w1s").alias("w1"), F.col("p.w2s").alias("w2"))
    )


def _bits_charged(v_col) -> F.Column:
    """Surprise bits of one joined bigram row (columns c1, c2 nullable)."""
    return _bits(F.coalesce(F.col("c1"), F.lit(0)) + v_col) - _bits(
        F.coalesce(F.col("c2"), F.lit(0)) + F.lit(1)
    )


def _per_doc_bits(scored: DataFrame) -> DataFrame:
    return scored.groupBy("doc_id", "lang").agg(
        F.count("*").cast("long").alias("n_bigrams"),
        F.sum("bits").cast("long").alias("total_bits"),
        F.expr("CAST(sum(bits) * 100 DIV count(*) AS BIGINT)").alias("avg_centibits"),
    )


def lm_train(docs: DataFrame, max_bigrams: int | None = LM_MAX_BIGRAMS) -> tuple[DataFrame, DataFrame, int]:
    """Train the filtering LM on the reference slice of ``docs`` — the
    once-per-release artifact build of the serving cycle.  Returns
    ``(c2, c1, v)``: the count-pruned bigram table (top ``max_bigrams``
    rows — the broadcast-safe artifact, see ``LM_MAX_BIGRAMS``), the
    unigram table derived from the UNCAPPED counts (no second corpus
    scan; denominators exact), and the reference vocabulary size as a
    plain int (a release-time scalar, like the quantile-filter
    threshold)."""
    toks = _doc_toks(docs)
    ref = _doc_bigrams(toks).filter(F.col("lang") == LM_REF_LANG)
    c2_full = ref.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c2")).localCheckpoint()
    c1 = c2_full.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1")).localCheckpoint()
    c2 = _cap_bigrams(c2_full, max_bigrams).localCheckpoint()
    v = (
        toks.filter(F.col("lang") == LM_REF_LANG)
        .select(F.explode("tk").alias("w"))
        .distinct()
        .count()
    )
    return c2, c1, int(v)


def score_against_lm(new_docs: DataFrame, c2: DataFrame, c1: DataFrame, v: int) -> DataFrame:
    """Score a batch of new documents against a FROZEN LM — the STREAMING
    body of the quality filter: the bigram explode and the two broadcast
    left joins are stateless, and the per-document aggregation runs inside
    each micro-batch (``foreachBatch``), never across batches.  Because a
    document's score depends only on itself and the frozen LM tables, the
    union over micro-batches equals one batch run exactly (parity-tested
    in test_lm.py, the ``scrub_against_index`` contract)."""
    scored = (
        _doc_bigrams(_doc_toks(new_docs))
        .join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(c1), ["w1"], "left")
        .select("doc_id", "lang", _bits_charged(F.lit(v)).alias("bits"))
    )
    return _per_doc_bits(scored)


# ---------------------------------------------------------------------------
# BPE vocabulary induction
# ---------------------------------------------------------------------------

BPE_WORDS = 64  # word-frequency table cap (scale guard, like COOCCUR_VOCAB)
BPE_MERGES = 6  # fixed merge rounds (bounded iterative loop, like PageRank)


def _bpe_round_sql(r: int) -> str:
    """One spliced BPE round: pair counts -> best pair -> greedy merge.

    Greedy-merge semantics (identical in the Spark builder): occurrences
    merge left-to-right without overlap.  Overlap is only possible when
    left == right (a run of the same symbol); there the even offsets
    within each run merge — exactly leftmost-first greedy.
    """
    return f"""
arr{r} AS (SELECT word, wfreq, string_split(seq, ' ') AS arr FROM wtab{r}),
pc{r} AS (
  SELECT arr[CAST(i AS INT)] AS w1, arr[CAST(i AS INT) + 1] AS w2,
         CAST(SUM(wfreq) AS BIGINT) AS cnt
  FROM arr{r}, UNNEST(range(1, len(arr))) AS r(i)
  GROUP BY 1, 2
),
best{r} AS (SELECT w1, w2, cnt FROM pc{r} ORDER BY cnt DESC, w1, w2 LIMIT 1),
pos{r} AS (
  SELECT word, wfreq, CAST(i AS BIGINT) AS j,
         arr[CAST(i AS INT)] AS tok, arr[CAST(i AS INT) + 1] AS nxt
  FROM arr{r}, UNNEST(range(1, len(arr) + 1)) AS r(i)
),
cand{r} AS (
  SELECT p.word, p.wfreq, p.j, p.tok, p.nxt,
         (p.tok = b.w1 AND p.nxt IS NOT NULL AND p.nxt = b.w2) AS is_cand
  FROM pos{r} p CROSS JOIN best{r} b
),
grp{r} AS (
  SELECT *, CASE WHEN is_cand THEN j - SUM(CASE WHEN is_cand THEN 1 ELSE 0 END)
    OVER (PARTITION BY word ORDER BY j ROWS UNBOUNDED PRECEDING) END AS grp
  FROM cand{r}
),
sel{r} AS (
  SELECT *, COALESCE(is_cand AND (j - MIN(CASE WHEN is_cand THEN j END)
    OVER (PARTITION BY word, grp)) % 2 = 0, FALSE) AS selected
  FROM grp{r}
),
tag{r} AS (
  SELECT *, COALESCE(LAG(selected) OVER (PARTITION BY word ORDER BY j), FALSE)
    AS consumed
  FROM sel{r}
),
wtab{r + 1} AS (
  SELECT word, wfreq,
         string_agg(CASE WHEN selected THEN tok || nxt ELSE tok END, ' '
                    ORDER BY j) AS seq
  FROM tag{r} WHERE NOT consumed GROUP BY word, wfreq
)"""


def _bpe_oracle() -> str:
    head = f"""
WITH wf AS (
  SELECT w AS word, CAST(COUNT(*) AS BIGINT) AS wfreq
  FROM (SELECT UNNEST(string_split(lower(text), ' ')) AS w FROM documents)
  WHERE w <> '' GROUP BY w
  ORDER BY wfreq DESC, word LIMIT {BPE_WORDS}
),
wtab1 AS (
  SELECT word, wfreq,
         array_to_string(string_split(word, ''), ' ') || ' </w>' AS seq
  FROM wf
)"""
    rounds = ",".join(_bpe_round_sql(r) for r in range(1, BPE_MERGES + 1))
    finals = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_rank, w1 AS left_sym, w2 AS right_sym,"
        f" w1 || w2 AS merged, cnt AS pair_count FROM best{r}"
        for r in range(1, BPE_MERGES + 1)
    )
    return head + "," + rounds + "\n" + finals


def _capped_word_table(docs: DataFrame) -> DataFrame:
    """The checkpointed ``BPE_WORDS``-row word-frequency table the merge
    rounds run on: one map-side-combining hash agg over the corpus, then a
    ``TakeOrdered`` cap — the only raw-corpus touch of the whole trainer."""
    wf = (
        docs.select(F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wfreq"))
        .orderBy(F.desc("wfreq"), "word")
        .limit(BPE_WORDS)
    )
    return wf.select(
        "word",
        "wfreq",
        F.concat(F.array_join(F.split(F.col("word"), ""), " "), F.lit(" </w>")).alias("seq"),
    ).localCheckpoint()


def _apply_merge(words: DataFrame, bw1: str, bw2: str, keys: tuple[str, ...]) -> DataFrame:
    """Apply ONE merge rule ``(bw1, bw2) -> bw1+bw2`` to every ``seq`` in
    ``words`` with greedy leftmost-first non-overlapping semantics (the
    windowed selection documented on ``tokenizer_bpe_learn`` — run grouping
    by cumulative candidate count, offset-parity selection, LAG-consumed
    suppression).  ``keys`` are the carried grouping columns; ``word`` must
    be among them (the window partitions on it, so partitions are one
    word's symbol positions — bounded by word length at any corpus size)."""
    from pyspark.sql.window import Window

    win = Window.partitionBy("word").orderBy("j")
    arr = words.select(*keys, F.split(F.col("seq"), " ", -1).alias("arr"))
    pos = (
        arr.select(*keys, F.posexplode("arr").alias("j", "tok"))
        .withColumn("nxt", F.lead("tok").over(win))
        .withColumn(
            "is_cand",
            (F.col("tok") == F.lit(bw1))
            & F.col("nxt").isNotNull()
            & (F.col("nxt") == F.lit(bw2)),
        )
    )
    cum = F.sum(F.when(F.col("is_cand"), 1).otherwise(0)).over(
        win.rowsBetween(Window.unboundedPreceding, 0)
    )
    pos = pos.withColumn("grp", F.when(F.col("is_cand"), F.col("j") - cum))
    min_j = F.min(F.when(F.col("is_cand"), F.col("j"))).over(
        Window.partitionBy("word", "grp")
    )
    pos = pos.withColumn(
        "selected",
        F.coalesce(F.col("is_cand") & (((F.col("j") - min_j) % 2) == 0), F.lit(False)),
    ).withColumn("consumed", F.coalesce(F.lag("selected").over(win), F.lit(False)))
    return (
        pos.filter(~F.col("consumed"))
        .withColumn(
            "out", F.when(F.col("selected"), F.concat("tok", "nxt")).otherwise(F.col("tok"))
        )
        .groupBy(*keys)
        .agg(
            F.expr(
                "array_join(transform(array_sort(collect_list(struct(j, out))),"
                " s -> s.out), ' ')"
            ).alias("seq")
        )
    )


def _learn_merges(words: DataFrame) -> list[tuple[int, str, str, str, int]]:
    """Run the ``BPE_MERGES`` greedy rounds over the capped word-frequency
    table and return the learned merge rules.

    The table is ≤ ``BPE_WORDS`` rows by construction — bounded driver
    metadata (the pinned-threshold pattern), so the merge loop itself runs
    DRIVER-SIDE, exactly like Sennrich's ``learn_bpe`` operates on an
    in-memory word-frequency dict; only the corpus-scale word COUNTING is
    distributed.  (The previous all-DataFrame loop spent ~18 sequential
    job launches moving a 64-row table — measured 3.3 s of pure scheduling
    at sf0.1.)  Semantics are bit-identical to the spliced oracle rounds:
    pair counts include overlapping adjacencies weighted by word frequency,
    ties break (count desc, pair lexicographic), and occurrences merge
    greedy leftmost-first non-overlapping — the sequential scan here IS
    leftmost-first, which the oracle's windowed run-parity selection
    reproduces set-wise (pinned by the adversarial-corpus symmetry tests).
    """
    rows: list[tuple[int, list[str]]] = [
        (r["wfreq"], r["seq"].split(" ")) for r in words.collect()
    ]
    merges: list[tuple[int, str, str, str, int]] = []
    for rnd in range(1, BPE_MERGES + 1):
        cnt: dict[tuple[str, str], int] = {}
        for wf, seq in rows:
            for a, b in zip(seq, seq[1:]):
                cnt[(a, b)] = cnt.get((a, b), 0) + wf
        if not cnt:
            break  # pairs exhausted before BPE_MERGES rounds (tiny corpus);
            # the oracle agrees: its best{r} CTEs are empty from here on
        (bw1, bw2), bcnt = min(
            cnt.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        merges.append((rnd, bw1, bw2, bw1 + bw2, bcnt))
        for i, (wf, seq) in enumerate(rows):
            out: list[str] = []
            j = 0
            while j < len(seq):
                if j + 1 < len(seq) and seq[j] == bw1 and seq[j + 1] == bw2:
                    out.append(bw1 + bw2)
                    j += 2
                else:
                    out.append(seq[j])
                    j += 1
            rows[i] = (wf, out)
    return merges


@register(
    "tokenizer_bpe_learn",
    oracle=_bpe_oracle(),
    doc="BPE merge-rule induction: 6 greedy merge rounds over the word-frequency table.",
)
def tokenizer_bpe_learn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn the first ``BPE_MERGES`` byte-pair-encoding merge rules from
    the corpus — the iterative loop every tokenizer build runs (count all
    adjacent symbol pairs weighted by word frequency, merge the most
    frequent pair, repeat), with deterministic tie-breaks (count desc,
    then pair lexicographic).

    Greedy-merge semantics, replayed exactly by the oracle: occurrences of
    the chosen pair merge left-to-right without overlap.  Overlap only
    arises when ``left == right`` (a run ``a a a a``); there the even
    offsets within each run merge — leftmost-first greedy, the standard
    BPE behavior.  Selection is windowed (cumulative-candidate-count run
    grouping + min-position offset parity), not string ``replace`` —
    ``replace`` consumes the boundary separator and silently skips
    adjacent occurrences, and regex lookarounds are not portable to the
    oracle's regex engine.

    100 TB shape: the raw corpus is touched ONCE (the word-frequency
    aggregation — map-side combining hash agg); every merge round runs on
    the ``BPE_WORDS``-row word table, so round cost is corpus-size-FREE.
    This is the classic BPE trainer design (Sennrich's learn_bpe operates
    on a word-frequency dict, not the corpus).  Each round issues one
    bounded 1-row driver probe (the argmax pair — same pattern as the
    PageRank convergence probes) and a ``localCheckpoint`` lineage cut so
    round r+1 does not replay rounds 1..r.
    """
    d = t(spark, sf_dir, "documents")
    merges = _learn_merges(_capped_word_table(d))
    return spark.createDataFrame(
        merges,
        "merge_rank long, left_sym string, right_sym string, merged string, pair_count long",
    )


# ---------------------------------------------------------------------------
# BPE corpus encoding (token-budget counting)
# ---------------------------------------------------------------------------


def _bpe_apply_round_sql(r: int) -> str:
    """One spliced ENCODE round: apply the learn chain's ``best{r}`` rule to
    every vocabulary word — the same windowed greedy-merge machinery as
    ``_bpe_round_sql`` minus the pair-count/argmax CTEs, and with a ``LEFT
    JOIN ... ON TRUE`` against ``best{r}`` so an exhausted (empty) rule row
    leaves every sequence unchanged instead of deleting it."""
    return f"""
earr{r} AS (SELECT word, string_split(seq, ' ') AS arr FROM etab{r}),
epos{r} AS (
  SELECT word, CAST(i AS BIGINT) AS j,
         arr[CAST(i AS INT)] AS tok, arr[CAST(i AS INT) + 1] AS nxt
  FROM earr{r}, UNNEST(range(1, len(arr) + 1)) AS r(i)
),
ecand{r} AS (
  SELECT p.word, p.j, p.tok, p.nxt,
         COALESCE(p.tok = b.w1 AND p.nxt IS NOT NULL AND p.nxt = b.w2, FALSE)
           AS is_cand
  FROM epos{r} p LEFT JOIN best{r} b ON TRUE
),
egrp{r} AS (
  SELECT *, CASE WHEN is_cand THEN j - SUM(CASE WHEN is_cand THEN 1 ELSE 0 END)
    OVER (PARTITION BY word ORDER BY j ROWS UNBOUNDED PRECEDING) END AS grp
  FROM ecand{r}
),
esel{r} AS (
  SELECT *, COALESCE(is_cand AND (j - MIN(CASE WHEN is_cand THEN j END)
    OVER (PARTITION BY word, grp)) % 2 = 0, FALSE) AS selected
  FROM egrp{r}
),
etag{r} AS (
  SELECT *, COALESCE(LAG(selected) OVER (PARTITION BY word ORDER BY j), FALSE)
    AS consumed
  FROM esel{r}
),
etab{r + 1} AS (
  SELECT word, string_agg(CASE WHEN selected THEN tok || nxt ELSE tok END, ' '
                          ORDER BY j) AS seq
  FROM etag{r} WHERE NOT consumed GROUP BY word
)"""


def _bpe_apply_oracle() -> str:
    # keep only the CTE chain of the learn oracle (drop its final UNION of
    # best{r} SELECTs); the encode CTEs reference best{1..N} directly
    learn_ctes = _bpe_oracle()
    cut = learn_ctes.index("\nSELECT CAST(1 AS BIGINT) AS merge_rank")
    learn_ctes = learn_ctes[:cut]
    encode = f""",
corpusw AS (
  SELECT doc_id, w
  FROM (SELECT doc_id, UNNEST(string_split(lower(text), ' ')) AS w FROM documents)
  WHERE w <> ''
),
etab1 AS (
  SELECT word, array_to_string(string_split(word, ''), ' ') || ' </w>' AS seq
  FROM (SELECT DISTINCT w AS word FROM corpusw)
),{",".join(_bpe_apply_round_sql(r) for r in range(1, BPE_MERGES + 1))},
wtok AS (
  SELECT word, CAST(len(string_split(seq, ' ')) AS BIGINT) AS ntok
  FROM etab{BPE_MERGES + 1}
)
SELECT c.doc_id, CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(w.ntok) AS BIGINT) AS n_tokens
FROM corpusw c JOIN wtok w ON c.w = w.word
GROUP BY c.doc_id
"""
    return learn_ctes + encode


@register(
    "tokenizer_bpe_apply",
    oracle=_bpe_apply_oracle(),
    doc="Encode the corpus with the learned BPE merges: per-document token counts.",
)
def tokenizer_bpe_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE merge rules to the corpus and report each
    document's post-tokenization token count — the token-budget pass every
    training-data pipeline runs before mixing/packing (budgets are set in
    TOKENS, not characters, so nothing downstream of the tokenizer can be
    planned without this number).

    Encoding semantics: the learned rules apply **in merge-rank order**,
    each with the same greedy leftmost-first non-overlapping pass the
    trainer used (HuggingFace-style "apply merges in learned order"); the
    oracle replays both the learn chain and the encode chain CTE-for-CTE.

    100 TB shape — encode the VOCABULARY, not the corpus: merges apply to
    the distinct-word table (sublinear in corpus size; Heaps' law), so the
    per-round window machinery never touches a corpus-sized row set and
    partitions by ``word`` (bounded by word length).  The raw corpus is
    touched exactly twice: the capped word-frequency aggregation that
    trains the rules, and the final stream that joins each word occurrence
    against the broadcast ``word -> token_count`` map (the serialized
    tokenizer — exactly the artifact a real pipeline broadcasts) and
    partial-aggregates per document.  If the vocabulary outgrows broadcast
    (100 TB web text: ~10^7-10^8 distinct words), drop the hint and the
    same plan becomes a shuffled hash join on ``w`` — no other change.
    """
    d = t(spark, sf_dir, "documents")
    merges = _learn_merges(_capped_word_table(d))
    corpusw = (
        d.select("doc_id", F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("w"))
        .filter(F.col("w") != "")
    )
    vocab = (
        corpusw.select(F.col("w").alias("word"))
        .distinct()
        .select(
            "word",
            F.concat(F.array_join(F.split(F.col("word"), ""), " "), F.lit(" </w>")).alias("seq"),
        )
        .localCheckpoint()
    )
    for _, bw1, bw2, _, _ in merges:
        vocab = _apply_merge(vocab, bw1, bw2, ("word",)).localCheckpoint()
    wtok = vocab.select(
        "word", F.size(F.split(F.col("seq"), " ", -1)).cast("long").alias("ntok")
    )
    return (
        corpusw.join(F.broadcast(wtok), corpusw.w == wtok.word)
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("ntok").cast("long").alias("n_tokens"),
        )
    )


def bpe_encode_against_vocab(new_docs: DataFrame, wtok: DataFrame) -> DataFrame:
    """Score a batch of NEW documents against a FROZEN ``word -> token_count``
    map — the streaming/serving twin of ``tokenizer_bpe_apply`` (the same
    contract as ``score_against_lm``): the tokenizer artifact is built once
    at release time; each micro-batch explodes its words, broadcast-joins
    the frozen map, and aggregates within the batch.  Out-of-vocabulary
    words fall back to character-level encoding (``len(word) + 1`` symbols
    — the untrained char-split with ``</w>``), the standard BPE behavior
    for unseen byte sequences under a rule set that never merged them."""
    corpusw = (
        new_docs.select(
            "doc_id", F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("w")
        )
        .filter(F.col("w") != "")
    )
    return (
        corpusw.join(F.broadcast(wtok), corpusw.w == wtok.word, "left")
        .select(
            "doc_id",
            F.coalesce(F.col("ntok"), F.length("w").cast("long") + F.lit(1)).alias("ntok"),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("ntok").cast("long").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# Naive Bayes document classifier (fasttext-analog quality/domain gate)
# ---------------------------------------------------------------------------

_SQL_NB_LANG = """
WITH toks AS (
  SELECT doc_id, lang, w
  FROM (SELECT doc_id, lang, UNNEST(string_split(lower(text), ' ')) AS w
        FROM documents)
  WHERE w <> ''
),
cwc AS (
  SELECT lang AS cls, w, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM toks GROUP BY 1, 2
),
ctot AS (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS tot FROM cwc GROUP BY 1),
vv AS (SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v FROM toks),
classes AS (
  SELECT lang AS cls, CAST(COUNT(*) AS BIGINT) AS ndocs FROM documents GROUP BY 1
),
nn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(COUNT(DISTINCT lang) AS BIGINT) AS k
  FROM documents
),
model AS (
  SELECT g.w, g.cls,
         (length(bin(ct.tot + vv.v)) - 1)
           - (length(bin(COALESCE(c.cnt, 0) + 1)) - 1) AS bits
  FROM (SELECT dw.w, cl.cls
        FROM (SELECT DISTINCT w FROM toks) dw
        CROSS JOIN (SELECT cls FROM classes) cl) g
  LEFT JOIN cwc c ON c.w = g.w AND c.cls = g.cls
  JOIN ctot ct ON ct.cls = g.cls
  CROSS JOIN vv
),
priors AS (
  SELECT cls, (length(bin(nn.n + nn.k)) - 1)
              - (length(bin(classes.ndocs + 1)) - 1) AS pbits
  FROM classes CROSS JOIN nn
),
per AS (
  SELECT t.doc_id, t.lang, m.cls, CAST(SUM(m.bits) AS BIGINT) AS tok_bits
  FROM toks t JOIN model m ON t.w = m.w
  GROUP BY 1, 2, 3
),
tot AS (
  SELECT p.doc_id, p.lang, p.cls, p.tok_bits + pr.pbits AS bits
  FROM per p JOIN priors pr ON pr.cls = p.cls
),
pick AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY bits, cls) AS rn
  FROM tot
)
SELECT doc_id, lang AS actual_lang, cls AS predicted_lang,
       CAST(bits AS BIGINT) AS total_bits
FROM pick WHERE rn = 1
"""


@register(
    "classify_nb_lang",
    oracle=_SQL_NB_LANG,
    doc="In-engine multinomial Naive Bayes: predict each document's language "
    "from its tokens with exact integer bit-cost scoring.",
)
def classify_nb_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train a multinomial Naive Bayes classifier IN the engine (pure
    aggregations — no ML library) and classify every document, the
    fasttext-analog labeling stage of a curation pipeline (CCNet's language
    gate, quality-classifier gates trained on curated-vs-crawl labels).

    Scoring is exact integer **bit costs** (the ``quality_lm_surprise``
    convention): token ``w`` under class ``c`` costs
    ``floor_log2(tot_c + V) - floor_log2(cnt(w,c) + 1)`` bits (add-one
    smoothing), the class prior costs
    ``floor_log2(N + K) - floor_log2(ndocs_c + 1)``, and the prediction is
    the bit-minimal class with a lexicographic tie-break — bit-identical
    across engines where float log-likelihoods cannot be.

    100 TB shape: the MODEL is small — ``(vocab x K)`` bit-cost rows built
    from one corpus token-count aggregation (``cwc``), with the class
    totals an agg OF ``cwc`` (never a second corpus scan); it broadcasts
    like any served classifier artifact.  Scoring streams the corpus token
    stream through the broadcast model (map-side join, K rows out per
    token occurrence, K = #classes is a small constant), partial-aggregates
    per (doc, class), and picks the argmin with a per-doc window over K
    rows.  No corpus-sized shuffle except the per-doc aggregation.
    """
    d = t(spark, sf_dir, "documents")
    toks = (
        d.select(
            "doc_id", "lang", F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("w")
        )
        .filter(F.col("w") != "")
    )
    # token-count model table: one corpus pass; class totals derive FROM it
    cwc = (
        toks.groupBy(F.col("lang").alias("cls"), "w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint()
    )
    ctot = cwc.groupBy("cls").agg(F.sum("cnt").cast("long").alias("tot"))
    # V derives from the checkpointed model table, NOT a second corpus scan
    # (every distinct corpus token has a cwc row)
    vv = cwc.agg(F.count_distinct("w").cast("long").alias("v"))
    # one column-pruned lang scan, checkpointed (it feeds both the model
    # grid and the priors); the corpus totals derive FROM it
    classes = (
        d.groupBy(F.col("lang").alias("cls"))
        .agg(F.count("*").cast("long").alias("ndocs"))
        .localCheckpoint()
    )
    nn = classes.agg(
        F.sum("ndocs").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    grid = (
        cwc.select("w").distinct()
        .crossJoin(F.broadcast(classes.select("cls")))
    )
    model = (
        grid.join(cwc, ["w", "cls"], "left")
        .join(F.broadcast(ctot), ["cls"])
        .crossJoin(F.broadcast(vv))
        .select(
            "w",
            "cls",
            (
                _bits(F.col("tot") + F.col("v"))
                - _bits(F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1))
            ).alias("bits"),
        )
    )
    priors = classes.crossJoin(F.broadcast(nn)).select(
        "cls",
        (_bits(F.col("n") + F.col("k")) - _bits(F.col("ndocs") + F.lit(1))).alias("pbits"),
    )
    per = (
        toks.join(F.broadcast(model), ["w"])
        .groupBy("doc_id", "lang", "cls")
        .agg(F.sum("bits").cast("long").alias("tok_bits"))
    )
    total = per.join(F.broadcast(priors), ["cls"]).select(
        "doc_id", "lang", "cls", (F.col("tok_bits") + F.col("pbits")).alias("bits")
    )
    from pyspark.sql.window import Window

    pick = total.withColumn(
        "rn", F.row_number().over(Window.partitionBy("doc_id").orderBy("bits", "cls"))
    )
    return pick.filter(F.col("rn") == 1).select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        F.col("cls").alias("predicted_lang"),
        F.col("bits").cast("long").alias("total_bits"),
    )


def _nb_counts(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """The NB sufficient statistics — ``cwc = (cls, w, cnt)`` token counts
    and ``classes = (cls, ndocs)`` document counts — both checkpointed.
    Counts are a commutative monoid (sum-mergeable across document
    batches), which is what makes the model incrementally maintainable
    (``NBModelServer``)."""
    toks = (
        docs.select(
            "doc_id", "lang", F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("w")
        )
        .filter(F.col("w") != "")
    )
    cwc = (
        toks.groupBy(F.col("lang").alias("cls"), "w")
        .agg(F.count("*").cast("long").alias("cnt"))
        .localCheckpoint()
    )
    classes = (
        docs.groupBy(F.col("lang").alias("cls"))
        .agg(F.count("*").cast("long").alias("ndocs"))
        .localCheckpoint()
    )
    return cwc, classes


def nb_train(docs: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Train the NB model as FROZEN artifacts — ``(model, priors)`` with
    ``model = (w, cls, bits)`` and ``priors = (cls, pbits)`` — the
    once-per-release build of the serving cycle (the ``lm_train``
    contract).  Both are checkpointed so serving never replays training
    lineage."""
    return _nb_model_from_counts(*_nb_counts(docs))


def _nb_model_from_counts(
    cwc: DataFrame, classes: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Derive the ``(model, priors)`` bit-cost artifacts from the NB
    sufficient statistics — shared by ``nb_train`` (one-shot) and
    ``NBModelServer`` (incremental), so a served model is IDENTICAL to a
    from-scratch retrain on the same documents (parity-pinned)."""
    ctot = cwc.groupBy("cls").agg(F.sum("cnt").cast("long").alias("tot"))
    vv = cwc.agg(F.count_distinct("w").cast("long").alias("v"))
    nn = classes.agg(
        F.sum("ndocs").cast("long").alias("n"),
        F.count("*").cast("long").alias("k"),
    )
    model = (
        cwc.select("w").distinct()
        .crossJoin(F.broadcast(classes.select("cls")))
        .join(cwc, ["w", "cls"], "left")
        .join(F.broadcast(ctot), ["cls"])
        .crossJoin(F.broadcast(vv))
        .select(
            "w",
            "cls",
            (
                _bits(F.col("tot") + F.col("v"))
                - _bits(F.coalesce(F.col("cnt"), F.lit(0)) + F.lit(1))
            ).alias("bits"),
        )
        .localCheckpoint()
    )
    priors = (
        classes.crossJoin(F.broadcast(nn))
        .select(
            "cls",
            (_bits(F.col("n") + F.col("k")) - _bits(F.col("ndocs") + F.lit(1))).alias(
                "pbits"
            ),
        )
        .localCheckpoint()
    )
    return model, priors


def nb_score(new_docs: DataFrame, model: DataFrame, priors: DataFrame) -> DataFrame:
    """Classify a batch of NEW documents against the frozen NB artifacts —
    the streaming/serving twin of ``classify_nb_lang`` (same contract as
    ``score_against_lm``): stateless per micro-batch, broadcast model join,
    per-doc argmin inside the batch.  Out-of-vocabulary tokens are dropped
    (the model has no row for them — equivalently a uniform charge every
    class shares, which cancels in the argmin)."""
    from pyspark.sql.window import Window

    toks = (
        new_docs.select(
            "doc_id", "lang", F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("w")
        )
        .filter(F.col("w") != "")
    )
    per = (
        toks.join(F.broadcast(model), ["w"])
        .groupBy("doc_id", "lang", "cls")
        .agg(F.sum("bits").cast("long").alias("tok_bits"))
    )
    total = per.join(F.broadcast(priors), ["cls"]).select(
        "doc_id", "lang", "cls", (F.col("tok_bits") + F.col("pbits")).alias("bits")
    )
    pick = total.withColumn(
        "rn", F.row_number().over(Window.partitionBy("doc_id").orderBy("bits", "cls"))
    )
    return pick.filter(F.col("rn") == 1).select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        F.col("cls").alias("predicted_lang"),
        F.col("bits").cast("long").alias("total_bits"),
    )


# ---------------------------------------------------------------------------
# Composed quality gate (the FineWeb/Gopher-style keep/drop decision)
# ---------------------------------------------------------------------------

# LM gate threshold, in centibits per bigram: sits between the reference
# language's surprise distribution and everything else's on this corpus
LM_GATE_CENTIBITS = 485


def _sw_sql() -> str:
    from .pipeline import _SW_SQL

    return _SW_SQL


_SQL_ENSEMBLE = f"""
WITH base AS (
  SELECT doc_id, lang, text, string_split(lower(text), ' ') AS toks
  FROM documents
),
sig AS (
  SELECT doc_id,
         CAST(LEN(toks) AS BIGINT) AS n_tokens,
         CAST(LEN(list_filter(toks, w -> w IN ({{SW}}))) AS BIGINT) AS n_stop,
         CAST(GREATEST(LEN(toks) - 2, 0) AS BIGINT) AS n_grams,
         CAST(LEN(list_distinct(list_transform(
             generate_series(1, LEN(toks) - 2),
             i -> toks[i] || ' ' || toks[i + 1] || ' ' || toks[i + 2])))
           AS BIGINT) AS n_dist3,
         CAST(LEN(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_numbers
  FROM base
),
big AS (
  SELECT doc_id, toks[CAST(i AS INT)] AS w1, toks[CAST(i AS INT) + 1] AS w2
  FROM base, UNNEST(range(1, LEN(toks))) AS r(i)
),
c2 AS (
  SELECT b.w1, b.w2, CAST(COUNT(*) AS BIGINT) AS c2
  FROM big b JOIN base d ON d.doc_id = b.doc_id
  WHERE d.lang = '{LM_REF_LANG}' GROUP BY b.w1, b.w2
),
c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
v AS (
  SELECT CAST(COUNT(DISTINCT w) AS BIGINT) AS v
  FROM (SELECT UNNEST(toks) AS w FROM base WHERE lang = '{LM_REF_LANG}')
),
perlm AS (
  SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM((length(bin(COALESCE(c1.c1, 0) + v.v)) - 1)
                - (length(bin(COALESCE(c2.c2, 0) + 1)) - 1)) AS BIGINT)
           AS total_bits
  FROM big b
  LEFT JOIN c2 ON c2.w1 = b.w1 AND c2.w2 = b.w2
  LEFT JOIN c1 ON c1.w1 = b.w1
  CROSS JOIN v
  GROUP BY b.doc_id
),
flags AS (
  SELECT s.doc_id, s.n_tokens, COALESCE(p.n_bigrams, 0) AS n_bigrams,
         COALESCE(p.total_bits, 0) AS total_bits,
         CASE WHEN s.n_tokens BETWEEN 5 AND 10000 THEN 1 ELSE 0 END AS len_pass,
         CASE WHEN s.n_stop * 20 > s.n_tokens THEN 1 ELSE 0 END AS stop_pass,
         CASE WHEN s.n_grams = 0 OR (s.n_grams - s.n_dist3) * 5 <= s.n_grams
              THEN 1 ELSE 0 END AS rep_pass,
         CASE WHEN s.n_numbers * 5 <= s.n_tokens THEN 1 ELSE 0 END AS digit_pass,
         CASE WHEN COALESCE(p.n_bigrams, 0) > 0
                   AND COALESCE(p.total_bits, 0) * 100
                       <= COALESCE(p.n_bigrams, 0) * {LM_GATE_CENTIBITS}
              THEN 1 ELSE 0 END AS lm_pass
  FROM sig s LEFT JOIN perlm p ON p.doc_id = s.doc_id
)
SELECT doc_id, n_tokens, n_bigrams, total_bits,
       CAST(len_pass AS BIGINT) AS len_pass,
       CAST(stop_pass AS BIGINT) AS stop_pass,
       CAST(rep_pass AS BIGINT) AS rep_pass,
       CAST(digit_pass AS BIGINT) AS digit_pass,
       CAST(lm_pass AS BIGINT) AS lm_pass,
       CAST(len_pass * stop_pass * rep_pass * digit_pass * lm_pass AS BIGINT)
         AS keep
FROM flags
"""


def _ensemble_oracle() -> str:
    return _SQL_ENSEMBLE.replace("{SW}", _sw_sql())


@register(
    "quality_ensemble_gate",
    oracle=_ensemble_oracle(),
    doc="Composed quality gate: length, stopword, repetition, digit, and "
    "bigram-LM checks folded into one keep/drop decision per document.",
)
def quality_ensemble_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed keep/drop decision a curation pipeline actually ships —
    every per-signal filter in this registry folded into one verdict per
    document (the FineWeb/Gopher recipe): token-count bounds, stopword
    density, duplicate-3-gram repetition, digit density, and the bigram-LM
    surprise gate, with per-signal pass flags so rejected documents are
    attributable (the audit trail reviewers ask for).

    Every comparison is INTEGER cross-multiplication (``n_stop * 20 >
    n_tokens`` instead of ``n_stop / n_tokens > 0.05``), so the verdict —
    not just the score — is bit-reproducible across engines.

    100 TB shape: the surface signals and the bigram stream come out of ONE
    corpus projection — the bigram lane explodes from the same row set
    (``explode_outer`` keeps bigram-less documents alive), joins the
    broadcast LM tables, and the per-document fold carries the (functionally
    doc_id-dependent) signal columns in its grouping key, so the whole gate
    is one corpus scan + one map-side-combining aggregation, no doc-level
    self-join.  The LM training lanes reuse the ``quality_lm_surprise``
    build: c2 one checkpointed hash-agg of the reference slice, c1 an agg
    OF it, V one column-pruned vocab count.
    """
    d = t(spark, sf_dir, "documents")
    # LM build (the quality_lm_surprise lanes): reference-slice bigrams
    ref_big = _doc_bigrams(_doc_toks(d)).filter(F.col("lang") == LM_REF_LANG)
    c2 = (
        ref_big.groupBy("w1", "w2")
        .agg(F.count("*").cast("long").alias("c2"))
        .localCheckpoint()
    )
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
    v = (
        _doc_toks(d)
        .filter(F.col("lang") == LM_REF_LANG)
        .select(F.explode("tk").alias("w"))
        .agg(F.count_distinct("w").cast("long").alias("v"))
    )
    return ensemble_gate_against_lm(d, c2, c1, v)


def ensemble_gate_against_lm(
    docs: DataFrame, c2: DataFrame, c1: DataFrame, v: DataFrame | int
) -> DataFrame:
    """The gate body against a (possibly FROZEN) bigram LM — the streaming
    twin of ``quality_ensemble_gate`` (the ``score_against_lm`` contract):
    every signal is a function of one document plus the frozen LM tables,
    so per-micro-batch evaluation unions to exactly the one-batch run.
    ``v`` accepts the 1-row aggregate DataFrame (inline build) or the
    plain int that ``lm_train`` returns (release-time scalar)."""
    from .pipeline import STOPWORDS

    toks_col = F.split(F.lower(F.col("text")), " ", -1)
    sw = F.array(*[F.lit(w) for w in STOPWORDS])
    # guard: sequence(1, 0) is DESCENDING in Spark, so a <3-token doc must
    # take the empty-array branch, not an empty sequence
    grams = F.expr(
        "CASE WHEN size(toks) >= 3 THEN "
        "transform(sequence(1, size(toks) - 2), "
        "i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1),"
        " ' ', element_at(toks, i + 2))) "
        "ELSE array() END"
    )
    if not isinstance(v, DataFrame):
        v = docs.sparkSession.range(1).select(F.lit(int(v)).cast("long").alias("v"))
    sig = (
        docs.select("doc_id", "lang", "text", toks_col.alias("toks"))
        .select(
            "doc_id",
            "lang",
            "toks",
            F.size("toks").cast("long").alias("n_tokens"),
            F.size(F.filter(F.col("toks"), lambda w: F.array_contains(sw, w)))
            .cast("long")
            .alias("n_stop"),
            F.greatest(F.size("toks") - F.lit(2), F.lit(0)).cast("long").alias("n_grams"),
            F.size(F.array_distinct(grams)).cast("long").alias("n_dist3"),
            F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9]+"), 0))
            .cast("long")
            .alias("n_numbers"),
        )
    )
    # bigram lane from the SAME projection; explode_outer keeps short docs
    big = (
        sig.withColumn("w1s", F.expr("slice(toks, 1, size(toks) - 1)"))
        .withColumn("w2s", F.expr("slice(toks, 2, size(toks) - 1)"))
        .select(
            "doc_id", "n_tokens", "n_stop", "n_grams", "n_dist3", "n_numbers",
            F.explode_outer(F.arrays_zip("w1s", "w2s")).alias("p"),
        )
        .select(
            "doc_id", "n_tokens", "n_stop", "n_grams", "n_dist3", "n_numbers",
            F.col("p.w1s").alias("w1"), F.col("p.w2s").alias("w2"),
        )
    )
    scored = (
        big.join(F.broadcast(c2), ["w1", "w2"], "left")
        .join(F.broadcast(c1), ["w1"], "left")
        .crossJoin(F.broadcast(v))
        .select(
            "doc_id", "n_tokens", "n_stop", "n_grams", "n_dist3", "n_numbers", "w1",
            F.when(F.col("w1").isNotNull(), _bits_charged(F.col("v"))).alias("bits"),
        )
    )
    per = scored.groupBy(
        "doc_id", "n_tokens", "n_stop", "n_grams", "n_dist3", "n_numbers"
    ).agg(
        F.count("w1").cast("long").alias("n_bigrams"),
        F.coalesce(F.sum("bits"), F.lit(0)).cast("long").alias("total_bits"),
    )
    flag = lambda c: F.when(c, 1).otherwise(0).cast("long")  # noqa: E731
    out = per.select(
        "doc_id",
        "n_tokens",
        "n_bigrams",
        "total_bits",
        flag(F.col("n_tokens").between(5, 10000)).alias("len_pass"),
        flag(F.col("n_stop") * 20 > F.col("n_tokens")).alias("stop_pass"),
        flag(
            (F.col("n_grams") == 0)
            | ((F.col("n_grams") - F.col("n_dist3")) * 5 <= F.col("n_grams"))
        ).alias("rep_pass"),
        flag(F.col("n_numbers") * 5 <= F.col("n_tokens")).alias("digit_pass"),
        flag(
            (F.col("n_bigrams") > 0)
            & (F.col("total_bits") * 100 <= F.col("n_bigrams") * LM_GATE_CENTIBITS)
        ).alias("lm_pass"),
    )
    return out.withColumn(
        "keep",
        (
            F.col("len_pass") * F.col("stop_pass") * F.col("rep_pass")
            * F.col("digit_pass") * F.col("lm_pass")
        ).cast("long"),
    )


class NBModelServer:
    """Streaming maintainer for the NB classifier's sufficient statistics —
    the model-update half of a live curation gate: document batches arrive,
    their ``(cls, w, cnt)`` / ``(cls, ndocs)`` deltas fold into the
    persisted count tables, and fresh ``(model, priors)`` artifacts derive
    on demand from the served counts.

    Counts form a commutative monoid, so ARRIVAL ORDER cannot change the
    maintained state — unlike the warehouse maintainers there is no
    order-frontier to enforce.  They are NOT idempotent, though: an epoch
    replay would double-count, so exactly-once rides the
    ``_VersionedTable`` discipline (applied batch id in the atomic pointer;
    a replayed epoch sees its id already applied and no-ops — the
    ``SnapshotMaintainer`` contract).

    State is model-sized (vocab × classes + K rows), never corpus-sized,
    and each update is O(batch + model): the batch aggregates map-side,
    unions with the current count table, and re-folds — no corpus rescan.
    The two lanes live in ONE versioned table with a ``kind`` discriminator
    ('tok' rows carry (cls, w, cnt); 'doc' rows carry (cls, ndocs) with a
    NULL w) so a version is a single consistent snapshot of both.
    """

    def __init__(self, path: str, retain: int = 1):
        from .warehouse import _VersionedTable

        self._table = _VersionedTable(path, retain=retain)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        ptr = self._table._read_pointer()
        if ptr is not None and batch_id <= ptr[1]:
            return  # epoch replay: already folded into the served counts
        cwc, classes = _nb_counts(batch_df)
        delta = cwc.select(
            F.lit("tok").alias("kind"), "cls", "w", F.col("cnt").alias("n")
        ).unionByName(
            classes.select(
                F.lit("doc").alias("kind"),
                "cls",
                F.lit(None).cast("string").alias("w"),
                F.col("ndocs").alias("n"),
            )
        )
        if ptr is not None:
            import os

            cur = spark.read.parquet(os.path.join(self._table.path, ptr[0]))
            delta = cur.unionByName(delta)
        merged = delta.groupBy("kind", "cls", "w").agg(
            F.sum("n").cast("long").alias("n")
        )
        self._table._publish(merged, batch_id)

    def counts(self, spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        """The served sufficient statistics ``(cwc, classes)``."""
        cur = self._table.current(spark)
        cwc = cur.filter(F.col("kind") == "tok").select(
            "cls", "w", F.col("n").alias("cnt")
        )
        classes = cur.filter(F.col("kind") == "doc").select(
            "cls", F.col("n").alias("ndocs")
        )
        return cwc, classes

    def model(self, spark: SparkSession) -> tuple[DataFrame, DataFrame]:
        """Fresh ``(model, priors)`` artifacts derived from the served
        counts — identical to ``nb_train`` over every document folded so
        far (the shared ``_nb_model_from_counts`` derivation)."""
        cwc, classes = self.counts(spark)
        return _nb_model_from_counts(cwc.localCheckpoint(), classes.localCheckpoint())


# ---------------------------------------------------------------------------
# curriculum layout
# ---------------------------------------------------------------------------

CURRICULUM_BAND = 50  # centibits per difficulty stage (content-defined band)
CURRICULUM_EPOCH = "curr1"  # seed for the within-stage shard permutation


_SQL_CURRICULUM = f"""
WITH scored AS (
  SELECT * FROM ({_SQL_LM_SURPRISE}) s
),
staged AS (
  SELECT doc_id, avg_centibits,
         CAST(avg_centibits // {CURRICULUM_BAND} AS BIGINT) AS stage,
         substring(md5('{CURRICULUM_EPOCH}:' || CAST(doc_id AS VARCHAR)), 1, 2)
           AS shard
  FROM scored
)
SELECT doc_id, avg_centibits, stage, shard,
       CAST(ROW_NUMBER() OVER (PARTITION BY stage, shard
                               ORDER BY avg_centibits, doc_id) AS BIGINT)
         AS pos_in_shard
FROM staged
"""


@register(
    "layout_curriculum_order",
    oracle=_SQL_CURRICULUM,
    doc="Curriculum training layout: difficulty stages from the LM surprise "
    "score, epoch-seeded shards within each stage.",
)
def layout_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum ordering — the easy-to-hard training layout: every
    document's difficulty is its bigram-LM surprise score
    (``quality_lm_surprise``), its STAGE is a fixed centibit band of that
    score, and within a stage it lands in an epoch-seeded md5 shard with a
    deterministic position.  Reading stages in order and shards within a
    stage replays an exact easy-first curriculum; a new epoch string
    reshuffles within stages with zero source-data movement (the
    ``layout_training_shuffle`` contract, with difficulty as the outer
    key).

    100 TB shape: the stage is a content-defined integer band — NO global
    sort ranks the corpus by difficulty — and the position rank partitions
    by ``(stage, shard)`` (~1/256 of a stage per partition, md5-uniform),
    so the plan is the scored stream + one hash shuffle + per-partition
    local sorts, exactly the sharded-layout shape.  A dominant stage
    cannot funnel to one task: its shards split it 256 ways regardless of
    the score distribution.
    """
    from pyspark.sql.window import Window

    scored = lm_surprise_of(t(spark, sf_dir, "documents"))
    key = F.md5(
        F.concat(F.lit(f"{CURRICULUM_EPOCH}:"), F.col("doc_id").cast("string"))
    )
    staged = scored.select(
        "doc_id",
        "avg_centibits",
        F.expr(f"CAST(avg_centibits DIV {CURRICULUM_BAND} AS BIGINT)").alias("stage"),
        F.substring(key, 1, 2).alias("shard"),
    )
    w = Window.partitionBy("stage", "shard").orderBy("avg_centibits", "doc_id")
    return staged.withColumn("pos_in_shard", F.row_number().over(w).cast("bigint"))


def _ablation_oracle() -> str:
    gate = _ensemble_oracle()
    per_sig = " UNION ALL ".join(
        f"""
        SELECT '{s}' AS signal,
               CAST(SUM(1 - {s}_pass) AS BIGINT) AS n_fail,
               CAST(SUM(CASE WHEN {s}_pass = 0 AND n_failed = 1
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_unique_kill
        FROM flagged"""
        for s in ("len", "stop", "rep", "digit", "lm")
    )
    return f"""
    WITH gate AS ({gate}),
    flagged AS (
      SELECT *, (5 - len_pass - stop_pass - rep_pass - digit_pass - lm_pass)
               AS n_failed
      FROM gate)
    {per_sig}
    UNION ALL
    SELECT 'ALL' AS signal,
           CAST(SUM(1 - keep) AS BIGINT) AS n_fail,
           CAST(SUM(1 - keep) AS BIGINT) AS n_unique_kill
    FROM flagged
    """


@register(
    "quality_ablation_report",
    oracle=_ablation_oracle(),
    doc="Filter ablation: per quality signal, how many documents it fails "
    "and how many it UNIQUELY kills (no other signal fires).",
)
def quality_ablation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The curation diagnostic that decides which filters earn their keep:
    for each of the five ensemble signals, the number of documents it
    fails and the number it UNIQUELY kills (the doc passes every other
    signal) — a filter with zero unique kills is redundant with the rest
    of the gate and can be dropped without changing the corpus; one with a
    huge unique-kill count deserves a threshold review before it deletes a
    slice of the distribution. The 'ALL' row is the gate's total kill
    count.

    One aggregation over the already-one-scan gate output: per-doc
    failed-signal count, then conditional integer sums unpivoted to one
    row per signal — no per-signal rescan of the corpus."""
    gate = quality_ensemble_gate(spark, sf_dir)
    flagged = gate.withColumn(
        "n_failed",
        F.lit(5)
        - F.col("len_pass") - F.col("stop_pass") - F.col("rep_pass")
        - F.col("digit_pass") - F.col("lm_pass"),
    )
    agg = flagged.agg(
        *[
            x
            for s in ("len", "stop", "rep", "digit", "lm")
            for x in (
                F.sum(1 - F.col(f"{s}_pass")).cast("bigint").alias(f"{s}_fail"),
                F.sum(
                    F.when((F.col(f"{s}_pass") == 0) & (F.col("n_failed") == 1), 1)
                    .otherwise(0)
                ).cast("bigint").alias(f"{s}_uniq"),
            )
        ],
        F.sum(1 - F.col("keep")).cast("bigint").alias("all_fail"),
    )
    stack = ", ".join(
        f"'{s}', {s}_fail, {s}_uniq" for s in ("len", "stop", "rep", "digit", "lm")
    )
    return agg.select(
        F.expr(
            f"stack(6, {stack}, 'ALL', all_fail, all_fail) "
            "AS (signal, n_fail, n_unique_kill)"
        )
    )
