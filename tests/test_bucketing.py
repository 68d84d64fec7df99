"""Bucketed co-located joins: the join on the bucket key must plan with
ZERO shuffles (the 100 TB repeated-join strategy, SCALE.md)."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.sources.bucketing import (bucketed_join,
                                                  exchange_count,
                                                  write_bucketed)


def test_bucketed_join_no_shuffle(spark, sf_dir):
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    lineitem = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    write_bucketed(orders, "orders_b", ["o_orderkey"], num_buckets=8)
    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], num_buckets=8)

    j = bucketed_join(spark, "orders_b", "lineitem_b",
                      "o_orderkey", "l_orderkey")
    # disable broadcast so the join strategy is the bucketed SMJ
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        n_exchanges = exchange_count(j)
        assert n_exchanges == 0, f"expected shuffle-free join, got {n_exchanges}"
        # and it is still correct
        expected = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
        assert j.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_key_skew_summary_and_hot_keys(spark):
    """A planted hot key dominates both the ratio and the hot-key list;
    NULL keys group as their own key rather than disappearing."""
    from dataprofiler_spark.operators import skew as sk

    rows = ([(1, "x")] * 90 + [(2, "y")] * 5 + [(3, "z")] * 5
            + [(None, "n")] * 20)
    df = spark.createDataFrame(rows, "k int, v string")
    row = sk.key_skew_summary(df, ["k"]).collect()[0]
    assert row["n_rows"] == 120 and row["n_keys"] == 4
    assert row["max_count"] == 90
    assert row["skew_ratio"] == 3.0  # 90 / (120/4)

    hot = sk.hot_keys(df, ["k"], k=2).collect()
    assert [(r["rank"], r["k"], r["cnt"]) for r in hot] \
        == [(1, 1, 90), (2, None, 20)]


def test_skew_join_result_identical_and_broadcasts(spark):
    """skew_join == plain join row-for-row (inner AND left, incl. NULL
    keys), and the hot branch is a BroadcastHashJoin."""
    from pyspark.sql import functions as F

    from dataprofiler_spark.operators.skew import skew_join

    left = spark.createDataFrame(
        [(1, f"hot{i}") for i in range(500)]
        + [(k, f"cold{k}") for k in range(2, 50)]
        + [(None, "nullkey")],
        "k int, lv string")
    right = spark.createDataFrame(
        [(1, "dim1"), (2, "dim2"), (3, "dim3"), (None, "dimnull")],
        "k int, rv string")

    def norm(df):
        return sorted((tuple(-1 if v is None else v if not
                             isinstance(v, str) else v for v in r))
                      for r in map(tuple, df.collect()))

    for how in ("inner", "left"):
        plain = left.join(right, "k", how)
        split = skew_join(left, right, "k", hot_threshold=100, how=how)
        assert norm(plain) == norm(split), how

    plan = skew_join(left, right, "k", hot_threshold=100)._sc._jvm \
        .PythonSQLUtils.explainString(
            skew_join(left, right, "k", hot_threshold=100)
            ._jdf.queryExecution(), "formatted")
    assert "BroadcastHashJoin" in plan
    # no hot keys -> falls through to the plain join
    same = skew_join(left, right, "k", hot_threshold=10_000)
    assert norm(same) == norm(left.join(right, "k"))


def test_skew_join_fallback_when_everything_is_hot(spark):
    """A uniform key space clearing the threshold is NOT mega-key skew:
    past max_hot_keys the operator falls back to the plain join (same
    results) instead of building an unbounded broadcast."""
    from dataprofiler_spark.operators.skew import skew_join

    left = spark.createDataFrame(
        [(k, i) for k in range(20) for i in range(10)], "k int, lv int")
    right = spark.createDataFrame([(k, k * 10) for k in range(20)],
                                  "k int, rv int")
    out = skew_join(left, right, "k", hot_threshold=5, max_hot_keys=3)
    assert sorted(map(tuple, out.collect())) == \
        sorted(map(tuple, left.join(right, "k").collect()))
    # fallback plan is the ONE plain join — no union branches
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Union" not in plan


def test_lsh_bucket_profile_semantics(spark):
    """lsh_bucket_profile: integer identities hold — Σs = n_docs·bands,
    capped work is monotone in the cap, suggested_cap is the largest
    ladder cap within budget."""
    from dataprofiler_spark.operators.dedup import lsh_bucket_profile

    rows = ([(i, "identical boilerplate text shared by many documents")
             for i in range(30)]
            + [(100 + i, f"unique doc {i} " + "x" * i) for i in range(20)])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = lsh_bucket_profile(df, "doc_id", "text", k=3, num_hashes=12,
                             bands=6, pair_budget_per_doc=10).collect()[0]
    assert out["n_docs"] == 50
    # the 30-clone boilerplate group makes one >=30 bucket per band
    assert out["max_bucket"] >= 30
    w16, w64 = out["pair_work_cap16"], out["pair_work_cap64"]
    assert 0 <= w16 <= w64 <= out["cand_pair_work"]
    # budget 500: the clone group alone is 6 bands * 435 pairs = 2610,
    # so cap 64 blows the budget and 16 must win (clones excluded)
    assert out["suggested_cap"] == 16
    # generous budget: the largest ladder cap wins
    out2 = lsh_bucket_profile(df, "doc_id", "text", k=3, num_hashes=12,
                              bands=6,
                              pair_budget_per_doc=10**6).collect()[0]
    assert out2["suggested_cap"] == 1024


def test_minhash_autocap_equals_two_step(spark):
    """max_bucket_size="auto" produces exactly the pairs of the
    two-step flow (suggested_bucket_cap → fixed cap), and the helper
    returns the ladder's pick."""
    from dataprofiler_spark.operators.dedup import (minhash_lsh_pairs,
                                                    suggested_bucket_cap)

    rows = ([(i, "identical boilerplate text shared by many documents")
             for i in range(30)]
            + [(100 + i, f"doc number {i} with some shared phrasing here")
               for i in range(20)]
            + [(200 + i, f"doc number {i} with some shared phrasing too")
               for i in range(20)])
    df = spark.createDataFrame(rows, "doc_id long, text string")
    cap = suggested_bucket_cap(df, "doc_id", "text", k=3, num_hashes=12,
                               bands=6, pair_budget_per_doc=10)
    assert cap == 16  # the 30-clone group blows any larger cap's budget
    fixed = minhash_lsh_pairs(df, "doc_id", "text", k=3, num_hashes=12,
                              bands=6, threshold=0.5,
                              max_bucket_size=cap).collect()
    auto = minhash_lsh_pairs(df, "doc_id", "text", k=3, num_hashes=12,
                             bands=6, threshold=0.5,
                             max_bucket_size="auto",
                             pair_budget_per_doc=10).collect()
    key = lambda r: (r["id1"], r["id2"])  # noqa: E731
    assert sorted(map(key, auto)) == sorted(map(key, fixed))
    # the clone clique is capped out; cross-template pairs survive
    assert all(not (r["id1"] < 100 and r["id2"] < 100) for r in auto)
