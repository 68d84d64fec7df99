"""Corpus-curation operators: repetition signals, cross-doc n-gram
duplication, PII redaction (operators/curation.py). Registered-query
oracle parity is covered by test_oracle_parity; these tests pin edge
cases and plan shape."""

from __future__ import annotations

from pyspark.sql import functions as F

from dataprofiler_spark.operators import curation as cu


def test_repetition_edge_cases(spark):
    df = spark.createDataFrame(
        [(1, ""),                       # empty → all zeros
         (2, "one"),                    # single token → no bigrams
         (3, "a a a a"),                # fully repeated
         (4, "w x y z")],               # fully distinct
        ["id", "text"])
    rows = {r["id"]: r for r in
            cu.repetition_signals(df, "id", "text").collect()}
    assert rows[1]["n_tokens"] == 0 and rows[1]["dup_word_fraction"] == 0.0
    assert rows[2]["top_bigram_count"] == 0
    assert rows[2]["top_bigram_fraction"] == 0.0
    # "a a a a": 1 distinct of 4 tokens; bigram "a a" fills all 3 slots
    assert rows[3]["dup_word_fraction"] == 0.75
    assert rows[3]["top_bigram_count"] == 3
    assert rows[3]["top_bigram_fraction"] == 1.0
    assert rows[4]["dup_word_fraction"] == 0.0
    assert rows[4]["top_bigram_count"] == 1


def test_crossdoc_ngram_dup_counts(spark):
    # doc1 and doc2 share exactly one 3-gram ("b c d"); doc3 too short.
    df = spark.createDataFrame(
        [(1, "a b c d"), (2, "b c d e"), (3, "x y")], ["id", "text"])
    row = cu.crossdoc_ngram_dup_summary(df, "id", "text", n=3).collect()[0]
    # distinct 3-grams: {a b c, b c d, c d e} → 3; shared: {b c d} → 1
    assert row["n_distinct_ngrams"] == 3
    assert row["n_shared_ngrams"] == 1
    assert row["max_docs_per_ngram"] == 2


def test_crossdoc_ngram_within_doc_repeat_not_shared(spark):
    # the same 2-gram repeated WITHIN one doc must not count as shared
    # (per-doc distinct before the corpus groupBy)
    df = spark.createDataFrame([(1, "p q p q")], ["id", "text"])
    row = cu.crossdoc_ngram_dup_summary(df, "id", "text", n=2).collect()[0]
    assert row["n_shared_ngrams"] == 0
    assert row["max_docs_per_ngram"] == 1


def test_pii_redact_handcrafted(spark):
    df = spark.createDataFrame(
        [(1, "call 12-345-678-9012 or mail a.b+c@ex-ample.org now"),
         (2, "ssn 123-45-6789 twice 987-65-4321"),
         (3, "clean text")],
        ["id", "text"])
    rows = {r["id"]: r for r in cu.pii_redact(df, "id", "text").collect()}
    assert rows[1]["redacted"] == "call [PHONE] or mail [EMAIL] now"
    assert rows[1]["n_phone"] == 1 and rows[1]["n_email"] == 1
    assert rows[2]["redacted"] == "ssn [SSN] twice [SSN]"
    assert rows[2]["n_ssn"] == 2
    assert rows[3]["redacted"] == "clean text"
    assert (rows[3]["n_email"], rows[3]["n_phone"], rows[3]["n_ssn"]) == (0, 0, 0)


def test_pii_redact_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "x")], ["id", "text"])
    plan = cu.pii_redact(df, "id", "text")._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan


def test_repetition_no_unpartitioned_window(spark, sf_dir):
    import os
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    plan = cu.repetition_signals(docs, "doc_id", "text")._jdf \
        .queryExecution().executedPlan().toString()
    assert "Window" not in plan  # pure groupBy aggregation, no windows


# ---------------------------------------------------------------------------
# Property tests (hypothesis): invariants that must hold for ANY corpus
# ---------------------------------------------------------------------------

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_words = st.lists(st.sampled_from(["a", "bb", "ccc", "dd", "e"]),
                  min_size=0, max_size=12)


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_words, min_size=1, max_size=6))
def test_repetition_signal_bounds(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], ["id", "text"])
    for r in cu.repetition_signals(df, "id", "text").collect():
        assert 0.0 <= r["dup_word_fraction"] <= 1.0
        assert 0.0 <= r["top_bigram_fraction"] <= 1.0
        assert r["top_bigram_count"] >= 0
        ws = docs[r["id"]]
        assert r["n_tokens"] == len(ws)
        if len(ws) >= 2:
            assert r["top_bigram_count"] >= 1


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(st.lists(_words, min_size=1, max_size=5))
def test_crossdoc_shared_never_exceeds_distinct(spark, docs):
    df = spark.createDataFrame(
        [(i, " ".join(ws)) for i, ws in enumerate(docs)], ["id", "text"])
    row = cu.crossdoc_ngram_dup_summary(df, "id", "text", n=2).collect()[0]
    assert 0 <= row["n_shared_ngrams"] <= row["n_distinct_ngrams"]
    assert row["max_docs_per_ngram"] is None or \
        row["max_docs_per_ngram"] <= len(docs)
