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
  byte-pair-encoding merge loop every tokenizer build runs, expressed as
  bounded dataframe rounds over the word-frequency table (never the raw
  corpus — the classic scale shape).  See the function docstring for the
  exact greedy-merge semantics and how the oracle replays them.

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
c2 AS (
  SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c2
  FROM big WHERE lang = '{LM_REF_LANG}' GROUP BY w1, w2
),
c1 AS (SELECT w1, CAST(SUM(c2) AS BIGINT) AS c1 FROM c2 GROUP BY w1),
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
    are explicitly ``broadcast`` (a production bigram LM used for
    filtering is count-pruned to fit memory — CCNet ships ~a few GB; if
    it does not fit, drop the hints and the same plan becomes a shuffled
    hash join).  No shuffle touches the corpus except the final per-doc
    aggregation, which partial-aggregates map-side.
    """
    d = t(spark, sf_dir, "documents")
    toks = _doc_toks(d)
    big = _doc_bigrams(toks)
    ref = big.filter(F.col("lang") == LM_REF_LANG)
    # materialize the (small) bigram table once: c1 is an aggregate OF c2,
    # and without the boundary Catalyst re-derives c2 from a second scan
    # of the reference slice (same pattern as the cooccur vocab)
    c2 = ref.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c2")).localCheckpoint()
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1"))
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


def lm_train(docs: DataFrame) -> tuple[DataFrame, DataFrame, int]:
    """Train the filtering LM on the reference slice of ``docs`` — the
    once-per-release artifact build of the serving cycle.  Returns
    ``(c2, c1, v)``: the materialized bigram-count table, the unigram
    table derived FROM it (no second corpus scan), and the reference
    vocabulary size as a plain int (a release-time scalar, like the
    quantile-filter threshold)."""
    toks = _doc_toks(docs)
    ref = _doc_bigrams(toks).filter(F.col("lang") == LM_REF_LANG)
    c2 = ref.groupBy("w1", "w2").agg(F.count("*").cast("long").alias("c2")).localCheckpoint()
    c1 = c2.groupBy("w1").agg(F.sum("c2").cast("long").alias("c1")).localCheckpoint()
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
    from pyspark.sql.window import Window

    d = t(spark, sf_dir, "documents")
    wf = (
        d.select(F.explode(F.split(F.lower(F.col("text")), " ", -1)).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("wfreq"))
        .orderBy(F.desc("wfreq"), "word")
        .limit(BPE_WORDS)
    )
    words = wf.select(
        "word",
        "wfreq",
        F.concat(F.array_join(F.split(F.col("word"), ""), " "), F.lit(" </w>")).alias("seq"),
    ).localCheckpoint()

    win = Window.partitionBy("word").orderBy("j")
    merges: list[tuple[int, str, str, str, int]] = []
    for rnd in range(1, BPE_MERGES + 1):
        arr = words.select("word", "wfreq", F.split(F.col("seq"), " ", -1).alias("arr"))
        pairs = (
            arr.withColumn("w1s", F.expr("slice(arr, 1, size(arr) - 1)"))
            .withColumn("w2s", F.expr("slice(arr, 2, size(arr) - 1)"))
            .select("wfreq", F.explode(F.arrays_zip("w1s", "w2s")).alias("p"))
            .groupBy(F.col("p.w1s").alias("w1"), F.col("p.w2s").alias("w2"))
            .agg(F.sum("wfreq").cast("long").alias("cnt"))
        )
        top = pairs.orderBy(F.desc("cnt"), "w1", "w2").limit(1).collect()
        if not top:
            break  # pairs exhausted before BPE_MERGES rounds (tiny corpus);
            # the oracle agrees: its best{r} CTEs are empty from here on,
            # so the UNION ALL yields the same truncated merge table
        bw1, bw2, bcnt = top[0]
        merges.append((rnd, bw1, bw2, bw1 + bw2, bcnt))

        pos = (
            arr.select("word", "wfreq", F.posexplode("arr").alias("j", "tok"))
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
            F.coalesce(
                F.col("is_cand") & (((F.col("j") - min_j) % 2) == 0), F.lit(False)
            ),
        ).withColumn("consumed", F.coalesce(F.lag("selected").over(win), F.lit(False)))
        words = (
            pos.filter(~F.col("consumed"))
            .withColumn(
                "out", F.when(F.col("selected"), F.concat("tok", "nxt")).otherwise(F.col("tok"))
            )
            .groupBy("word", "wfreq")
            .agg(
                F.expr(
                    "array_join(transform(array_sort(collect_list(struct(j, out))),"
                    " s -> s.out), ' ')"
                ).alias("seq")
            )
            .localCheckpoint()
        )

    return spark.createDataFrame(
        merges,
        "merge_rank long, left_sym string, right_sym string, merged string, pair_count long",
    )
