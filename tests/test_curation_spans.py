"""dedup_window_spans (plans/curation.py): substring-level duplication
marking. Interval-union semantics pinned on crafted corpora where every
covered-token count is hand-checkable, plus engine symmetry and the
one-shuffle-by-gram plan gate."""

from __future__ import annotations

import duckdb
import pandas as pd

from eth_event_stream_spark.plans import QUERIES


def _docs_dir(tmp_path_factory, rows: list[tuple[int, str]]) -> str:
    d = str(tmp_path_factory.mktemp("spandocs"))
    pd.DataFrame(
        [
            {"doc_id": i, "text": txt, "lang": "en", "source": "s", "n_chars": len(txt)}
            for i, txt in rows
        ]
    ).to_parquet(f"{d}/documents.parquet")
    return d


def _oracle(sf_dir: str, sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf_dir}/documents.parquet')"
    )
    return con.execute(sql).df()


CORPUS = [
    # doc1/doc2 share exactly one 8-gram ('a..h') at j=1 -> 8 covered of 11
    (1, "a b c d e f g h x y z"),
    (2, "a b c d e f g h q r s"),
    # doc3: internal repetition — 'p..w' at j=1 and j=9 (count 2 within ONE
    # doc); adjacent islands [1..8] + [9..16] -> 16 of 16 covered
    (3, "p q r s t u v w p q r s t u v w"),
    # doc4: dup windows j=1 ('a..h', shared with 1/2) and j=3 ('c..j',
    # shared with doc5) OVERLAP -> one island [1..10], covered 10 not 16
    (4, "a b c d e f g h i j"),
    (5, "c d e f g h i j z9 z9"),
    # doc6: all-unique tokens -> zero duplication, keep
    (6, "k1 k2 k3 k4 k5 k6 k7 k8 k9 k10 k11 k12"),
    # doc7: shorter than the window -> zero windows, keep
    (7, "x y"),
]


def test_window_spans_interval_union_hand_checked(spark, tmp_path_factory):
    d = _docs_dir(tmp_path_factory, CORPUS)
    out = {
        r["doc_id"]: r.asDict()
        for r in QUERIES["dedup_window_spans"].fn(spark, d).collect()
    }
    assert out[1] == {
        "doc_id": 1, "n_tokens": 11, "n_windows": 4, "n_dup_windows": 1,
        "covered_tokens": 8, "dup_permille": 727, "keep": 0,
    }
    assert out[3]["covered_tokens"] == 16 and out[3]["n_dup_windows"] == 2
    assert out[3]["dup_permille"] == 1000
    # the overlap case: two dup windows, ONE island of 10 (not 8+8)
    assert out[4] == {
        "doc_id": 4, "n_tokens": 10, "n_windows": 3, "n_dup_windows": 2,
        "covered_tokens": 10, "dup_permille": 1000, "keep": 0,
    }
    assert out[5]["covered_tokens"] == 8 and out[5]["dup_permille"] == 800
    assert out[6] == {
        "doc_id": 6, "n_tokens": 12, "n_windows": 5, "n_dup_windows": 0,
        "covered_tokens": 0, "dup_permille": 0, "keep": 1,
    }
    assert out[7] == {
        "doc_id": 7, "n_tokens": 2, "n_windows": 0, "n_dup_windows": 0,
        "covered_tokens": 0, "dup_permille": 0, "keep": 1,
    }


def test_window_spans_engine_symmetry_on_crafted_corpus(spark, tmp_path_factory):
    d = _docs_dir(tmp_path_factory, CORPUS)
    q = QUERIES["dedup_window_spans"]
    sdf = q.fn(spark, d).toPandas()
    odf = _oracle(d, q.oracle)
    cols = sorted(sdf.columns)
    a = sdf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    b = odf[cols].sort_values(cols).reset_index(drop=True).astype(str)
    assert a.equals(b), f"\nspark:\n{a}\noracle:\n{b}"


def test_window_spans_one_shuffle_by_gram_no_self_join(spark, sf_dir):
    """Scale gate: duplication flags come from count-over-window partitioned
    by gram — NOT a self-join of the corpus-sized window table — and the
    per-doc interval union runs over only the duplicated windows. The plan
    scans documents exactly twice (window lane + per-doc stats lane) and
    contains no SortMergeJoin of two corpus-window subtrees."""
    df = QUERIES["dedup_window_spans"].fn(spark, sf_dir)
    p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert p.count("documents.parquet") == 2, p[:3000]
    assert "Window" in p, p[:3000]


# ---------------------------------------------------------------------------
# prepare_span_corruption
# ---------------------------------------------------------------------------


def test_span_corruption_round_trips_and_is_deterministic(spark, sf_dir):
    """Reconstruction invariant: substituting every input sentinel with its
    target span must reproduce the original (lowered) document exactly —
    nothing lost, nothing reordered, sentinels numbered 0..n_spans-1 in
    order. And the hash-seeded draw is deterministic: a second run is
    bit-identical."""
    import re

    q = QUERIES["prepare_span_corruption"]
    out = q.fn(spark, sf_dir).toPandas().set_index("doc_id")
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .toPandas()
        .set_index("doc_id")
    )
    assert len(out) == len(docs)
    masked_total = 0
    for doc_id, r in out.iterrows():
        # parse target into {k: span_text}
        spans = {}
        if r["target_text"]:
            parts = re.split(r"<extra_id_(\d+)> ", r["target_text"])
            # parts = ['', k0, span0(+trailing space), k1, span1, ...]
            for i in range(1, len(parts), 2):
                spans[int(parts[i])] = parts[i + 1].strip()
        assert sorted(spans) == list(range(r["n_spans"]))
        rebuilt = re.sub(
            r"<extra_id_(\d+)>", lambda m: spans[int(m.group(1))], r["input_text"]
        )
        assert rebuilt == docs.loc[doc_id, "text"].lower(), doc_id
        masked_total += r["n_masked"]
    # the draw corrupts ~15-18% of tokens (the T5 operating point)
    frac = masked_total / out["n_tokens"].sum()
    assert 0.10 < frac < 0.25, frac
    again = q.fn(spark, sf_dir).toPandas().set_index("doc_id").sort_index()
    assert again.equals(out.sort_index())


def test_span_corruption_single_aggregation(spark, sf_dir):
    """Round-16 restructure gate: the input and target assemble from ONE
    per-doc aggregation — the corpus is scanned once (the positions
    explode + islands join used to run twice, once per assembly) and the
    final inp-to-tgt SortMergeJoin is gone."""
    df = QUERIES["prepare_span_corruption"].fn(spark, sf_dir)
    p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert p.count("documents.parquet") == 1, p[:3000]
    assert "SortMergeJoin" not in p, p[:3000]


def test_span_corruption_is_doc_local(spark, sf_dir):
    """Scale gate: the transform is document-local — no corpus-global
    window (no SinglePartition Window), no CartesianProduct; the
    positions-to-islands attach is a doc-keyed join."""
    df = QUERIES["prepare_span_corruption"].fn(spark, sf_dir)
    p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert "CartesianProduct" not in p, p[:3000]
    import re

    for m in re.finditer(r"Window .*", p):
        assert "SinglePartition" not in m.group(0), m.group(0)


# ---------------------------------------------------------------------------
# frozen-index ingest twin
# ---------------------------------------------------------------------------


def test_span_marking_against_frozen_index(spark, tmp_path_factory):
    """A new doc repeating a corpus 8-gram is marked against the FROZEN
    index; a new doc with fresh content is clean — even if it duplicates
    ANOTHER new doc (batch-internal dup belongs to the next release)."""
    from eth_event_stream_spark.plans.curation import (
        corpus_gram_index,
        mark_spans_against_index,
    )

    corpus_dir = _docs_dir(tmp_path_factory, [(1, "a b c d e f g h x y z")])
    corpus = spark.read.parquet(f"{corpus_dir}/documents.parquet")
    idx = corpus_gram_index(corpus)

    new_dir = _docs_dir(
        tmp_path_factory,
        [
            (10, "a b c d e f g h q r s"),   # repeats the corpus 8-gram
            (11, "n1 n2 n3 n4 n5 n6 n7 n8 n9"),  # fresh
            (12, "n1 n2 n3 n4 n5 n6 n7 n8 n9"),  # dup of 11 — batch-internal
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in mark_spans_against_index(
            spark.read.parquet(f"{new_dir}/documents.parquet"), idx
        ).collect()
    }
    assert out[10]["covered_tokens"] == 8 and out[10]["keep"] == 0
    assert out[11]["covered_tokens"] == 0 and out[11]["keep"] == 1
    assert out[12]["covered_tokens"] == 0 and out[12]["keep"] == 1


def test_span_marking_streaming_parity(spark, sf_dir, tmp_path):
    """Micro-batched marking against the frozen index unions to the
    one-batch run (verdicts are doc-local given the index)."""
    from pyspark.sql import functions as F

    from eth_event_stream_spark.plans.curation import (
        corpus_gram_index,
        mark_spans_against_index,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") % 4 != 0)
    batch_docs = docs.filter(F.col("doc_id") % 4 == 0)
    idx = corpus_gram_index(corpus)

    src = tmp_path / "docs_span_stream"
    batch_docs.repartition(4).write.parquet(str(src))

    expected = {
        tuple(r)
        for r in mark_spans_against_index(
            spark.read.parquet(str(src)), idx
        ).collect()
    }
    assert expected

    got = set()

    def handle(mb_df, _epoch):
        got.update(
            tuple(r) for r in mark_spans_against_index(mb_df, idx).collect()
        )

    sdf = (
        spark.readStream.schema(docs.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        sdf.writeStream.foreachBatch(handle)
        .option("checkpointLocation", str(tmp_path / "ck_span"))
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert got == expected
