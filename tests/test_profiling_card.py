"""profile_data_card: the dataset release card (plans/profiling.py)."""

from __future__ import annotations

from eth_event_stream_spark.plans import QUERIES


def test_data_card_metrics_are_complete_and_consistent(spark, sf_dir):
    """Card invariants on the sf corpus: every corpus-level metric present,
    per-language lanes sum to the totals, dup count = docs - distinct."""
    rows = {r["metric"]: r["value"] for r in QUERIES["profile_data_card"].fn(spark, sf_dir).collect()}
    for m in [
        "docs_total", "chars_total", "ws_tokens_total", "tokens_avg_per_doc",
        "text_distinct", "docs_exact_dup", "sources_distinct", "langs_distinct",
    ]:
        assert m in rows, m
    lang_docs = {m: v for m, v in rows.items() if m.startswith("docs_lang_")}
    lang_toks = {m: v for m, v in rows.items() if m.startswith("tokens_lang_")}
    assert len(lang_docs) == rows["langs_distinct"]
    assert sum(lang_docs.values()) == rows["docs_total"]
    assert sum(lang_toks.values()) == rows["ws_tokens_total"]
    assert rows["docs_exact_dup"] == rows["docs_total"] - rows["text_distinct"]
    assert rows["tokens_avg_per_doc"] == rows["ws_tokens_total"] // rows["docs_total"]


def test_data_card_two_scans_one_wide_aggregate(spark, sf_dir):
    """Scale gate: the corpus-level lane is ONE wide aggregation (the three
    count-distincts share a single Expand pass) and the per-language lanes
    read a checkpointed projection — documents.parquet appears at most
    twice in the plan, and document TEXT never shuffles (dedup detection
    hashes md5 first)."""
    df = QUERIES["profile_data_card"].fn(spark, sf_dir)
    p = df._sc._jvm.PythonSQLUtils.explainString(df._jdf.queryExecution(), "formatted")
    assert p.count("documents.parquet") <= 2, p[:3000]
    assert "Expand" in p, p[:3000]
