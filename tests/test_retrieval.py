"""BM25 retrieval: ranking semantics, NULL/empty-text handling, and
cross-engine parity on a hand-built corpus."""

import math

import duckdb
import pytest
from pyspark.sql import types as T

from dataprofiler_spark.operators import retrieval as rtv
from tests.oracle_utils import assert_frames_match

_SCHEMA = T.StructType([
    T.StructField("doc_id", T.LongType()),
    T.StructField("text", T.StringType()),
])


def _mk(spark, rows):
    return spark.createDataFrame(rows, _SCHEMA)


def test_bm25_ranks_matching_docs_first(spark):
    df = _mk(spark, [
        (1, "spark spark spark engine"),
        (2, "spark engine"),
        (3, "completely unrelated words here"),
        (4, None),
        (5, ""),
    ])
    out = rtv.bm25_topk(df, "doc_id", "text", "spark", k=10).collect()
    # Only docs containing the term appear.
    assert [r["id"] for r in out] == [1, 2]
    assert out[0]["score"] > out[1]["score"] > 0
    assert [r["rank"] for r in out] == [1, 2]
    assert all(r["n_hit_terms"] == 1 for r in out)


def test_bm25_idf_weights_rare_terms_higher(spark):
    # "rare" appears in 1 doc, "common" in all 4 — same tf, same dl.
    df = _mk(spark, [
        (1, "common rare"),
        (2, "common zzz"),
        (3, "common yyy"),
        (4, "common xxx"),
    ])
    out = {r["id"]: r for r in
           rtv.bm25_topk(df, "doc_id", "text", "common rare", k=10).collect()}
    assert out[1]["n_hit_terms"] == 2
    # Doc 1 gets both terms; its score must exceed any common-only doc.
    assert out[1]["score"] > out[2]["score"]
    # idf of "common" (df=4/4) is ln(0.5/4.5 + 1) > 0 — never negative.
    assert out[2]["score"] > 0


def test_bm25_empty_query_raises(spark):
    df = _mk(spark, [(1, "a")])
    with pytest.raises(ValueError):
        rtv.bm25_topk(df, "doc_id", "text", "   ")


def test_bm25_query_dedup_and_case(spark):
    # Repeated/uppercased query terms collapse to one term.
    df = _mk(spark, [(1, "spark rules"), (2, "no match")])
    out = rtv.bm25_topk(df, "doc_id", "text", "SPARK Spark spark", k=5).collect()
    assert len(out) == 1 and out[0]["id"] == 1
    assert out[0]["n_hit_terms"] == 1


def test_bm25_known_value_single_doc(spark):
    # One doc, one term, tf=2, dl=3, N=1, df=1, avgdl=3.
    df = _mk(spark, [(1, "a b a")])
    out = rtv.bm25_topk(df, "doc_id", "text", "a", k=1).collect()[0]
    k1, b = 1.2, 0.75
    idf = math.log((1 - 1 + 0.5) / (1 + 0.5) + 1.0)
    expect = round(round(idf * 2 * (k1 + 1) / (2 + k1 * (1 - b + b * 1.0)), 9), 6)
    assert out["score"] == pytest.approx(expect, abs=1e-9)


def test_hashed_query_vector_matches_spark_hashing(spark):
    # The driver-side md5 hashing must reproduce hashed_doc_vectors
    # exactly: hash one doc both ways and compare.
    from dataprofiler_spark.operators.textanalysis import hashed_doc_vectors
    text = "spark merge window spark unicode söze"
    df = _mk(spark, [(1, text)])
    spark_vec = {r["dpos"]: r["value"]
                 for r in hashed_doc_vectors(df, "doc_id", "text",
                                             dim=16).collect()
                 if r["value"] != 0}
    assert rtv._hash_query_vector(text, 16, "dps-hashvec-v1") == spark_vec


def test_query_cosine_identical_doc_ranks_first(spark):
    df = _mk(spark, [
        (1, "spark merge window"),
        (2, "spark merge window spark merge window"),  # same direction
        (3, "totally different tokens here"),
        (4, None),
    ])
    out = rtv.hashed_query_cosine_topk(df, "doc_id", "text",
                                       "spark merge window", k=10).collect()
    # Docs 1 and 2 are scalar multiples of the query vector → cosine 1.0.
    top = [r["id"] for r in out if r["cosine"] == 1.0]
    assert top == [1, 2]


def test_query_cosine_zero_query_raises(spark):
    df = _mk(spark, [(1, "a")])
    with pytest.raises(ValueError):
        rtv.hashed_query_cosine_topk(df, "doc_id", "text", "   ")


def test_hybrid_rrf_fuses_both_legs(spark):
    df = _mk(spark, [
        (1, "spark merge window"),       # strong on both legs
        (2, "spark spark spark spark"),  # lexical-leaning
        (3, "no overlap at all"),        # neither leg
        (4, None),
    ])
    out = {r["id"]: r for r in
           rtv.hybrid_rrf_topk(df, "doc_id", "text", "spark merge window",
                               k=10, n_cand=5).collect()}
    assert 3 not in out and 4 not in out
    r1 = out[1]
    assert r1["bm25_rank"] is not None and r1["cos_rank"] is not None
    # Both-legs doc beats any single-leg-dominant doc on fused score.
    assert r1["rrf"] == max(r["rrf"] for r in out.values())
    expect = round(1.0 / (60 + r1["bm25_rank"])
                   + 1.0 / (60 + r1["cos_rank"]), 9)
    assert r1["rrf"] == pytest.approx(expect, abs=1e-12)


def test_hybrid_rrf_single_leg_doc_scores_partial(spark):
    # A doc inside the cosine candidates but outside BM25's (or vice
    # versa) still ranks, with the missing leg contributing 0.
    df = _mk(spark, [(1, "spark"), (2, "merge"), (3, "spark merge")])
    out = {r["id"]: r for r in
           rtv.hybrid_rrf_topk(df, "doc_id", "text", "spark", k=10,
                               n_cand=5).collect()}
    assert out[1]["bm25_rank"] is not None
    assert out[3]["bm25_rank"] is not None
    assert 2 not in out  # matches neither leg for the query "spark"


def test_bm25_oracle_parity_dirty_corpus(spark, tmp_path):
    rows = [
        (1, "spark merge window spark"),
        (2, None),
        (3, ""),
        (4, "   "),
        (5, "SPARK MERGE"),
        (6, "spark " * 50),
        (7, "unicode söze spark"),
        (8, "punct!spark, merge."),
    ]
    df = _mk(spark, rows)
    p = str(tmp_path / "docs.parquet")
    df.write.mode("overwrite").parquet(p)
    got = rtv.bm25_topk(spark.read.parquet(p), "doc_id", "text",
                        "spark merge", k=10).toPandas()
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs AS SELECT * FROM '{p}/*.parquet'")
    want = con.execute(rtv.oracle_bm25_topk_sql(
        "docs", "doc_id", "text", "spark merge", k=10)).fetchdf()
    assert_frames_match(got, want, "bm25_dirty")
