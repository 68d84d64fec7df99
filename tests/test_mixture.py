"""Mixture construction semantics (operators/mixture.py): keep-rate
math, determinism, nested splits, and the collect guard."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators import mixture as mx
from dataprofiler_spark.operators.textanalysis import tokens_expr

WEIGHTS = {"src0": 0.5, "src1": 0.2, "src2": 0.2, "src3": 0.1}
BUDGET = 5_000


@pytest.fixture(scope="module")
def docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def test_mixture_rows_agree_with_summary(docs):
    """The row-level sample and the audit summary are two views of the
    same decision: per-group kept doc/token counts must agree."""
    sampled = mx.data_mixture(docs, "source", "doc_id", "text",
                              WEIGHTS, BUDGET)
    got = {r["source"]: (r["d"], r["t"]) for r in
           sampled.groupBy("source")
                  .agg(F.count(F.lit(1)).alias("d"),
                       F.sum(F.size(tokens_expr("text"))).alias("t"))
                  .collect()}
    summ = mx.data_mixture_summary(docs, "source", "doc_id", "text",
                                   WEIGHTS, BUDGET).collect()
    for r in summ:
        kept = got.get(r["grp"], (0, 0))
        assert (r["kept_docs"], r["kept_tokens"]) == kept
    # every corpus group appears in the audit, even rate-0 ones
    n_groups = docs.select("source").distinct().count()
    assert len(summ) == n_groups


def test_mixture_zero_weight_groups_dropped(docs):
    sampled = mx.data_mixture(docs, "source", "doc_id", "text",
                              WEIGHTS, BUDGET)
    extra = sampled.where(~F.col("source").isin(*WEIGHTS)).count()
    assert extra == 0


def test_mixture_rate_caps_at_one(docs):
    """A weight whose target exceeds the group's supply keeps ALL of the
    group (rate 1) — the shortfall is visible as kept < target."""
    rates = mx.mixture_rates(docs, "source", "text",
                             {"src0": 1.0}, 10**12)
    total, rate = rates["src0"]
    assert rate == 1.0
    summ = {r["grp"]: r for r in
            mx.data_mixture_summary(docs, "source", "doc_id", "text",
                                    {"src0": 1.0}, 10**12).collect()}
    assert summ["src0"]["kept_docs"] == \
        docs.where(F.col("source") == "src0").count()
    assert summ["src0"]["kept_tokens"] == total


def test_mixture_group_cap_raises(docs, monkeypatch):
    monkeypatch.setattr(mx, "MAX_GROUPS", 3)
    with pytest.raises(ValueError, match="distinct values"):
        mx.mixture_rates(docs, "source", "text", WEIGHTS, BUDGET)


def test_mixture_null_and_empty_edge_cases(spark, tmp_path):
    """NULL group values, NULL text, and an all-empty-text group (total
    tokens 0) must neither crash the rate builder nor diverge from the
    DuckDB oracle: NULL groups ride the rate-0 default, NULL text counts
    0 tokens (not size()=-1), and a 0-token group gets rate 0 (not the
    inf -> LEAST -> 1.0 trap)."""
    import duckdb

    rows = [
        (1, "alpha beta gamma delta", "g1"),
        (2, "epsilon zeta", "g1"),
        (3, None, "g1"),          # NULL text
        (4, "", "gzero"),         # zero-token group
        (5, "", "gzero"),
        (6, "eta theta iota", None),  # NULL group
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, src string")
    path = str(tmp_path / "edge.parquet")
    df.coalesce(1).write.parquet(path)

    weights = {"g1": 0.6, "gzero": 0.3, "ghost": 0.1}  # ghost: absent
    summ = mx.data_mixture_summary(df, "src", "doc_id", "text",
                                   weights, 100).toPandas()
    con = duckdb.connect()
    con.sql(f"CREATE VIEW edge AS SELECT * FROM '{path}/*.parquet'")
    orc = con.sql(mx.oracle_data_mixture_sql(
        "edge", "src", "doc_id", "text", weights, 100)).df()
    a = summ.sort_values("grp", na_position="first").reset_index(drop=True)
    b = orc.sort_values("grp", na_position="first").reset_index(drop=True)
    assert list(a.columns) == list(b.columns)
    assert a["grp"].fillna("<null>").tolist() == \
        b["grp"].fillna("<null>").tolist()
    for c in a.columns[1:]:
        assert a[c].astype("int64").tolist() == \
            b[c].astype("int64").tolist(), (c, a, b)
    by_grp = {g: r for g, r in zip(a["grp"].fillna("<null>"),
                                   a.to_dict("records"))}
    assert by_grp["gzero"]["kept_docs"] == 0      # rate-0, not rate-1
    assert by_grp["<null>"]["kept_docs"] == 0     # default branch
    assert by_grp["g1"]["total_tokens"] == 6      # NULL text counted as 0

    # row-level sampler agrees and never crashes on the NULL group
    assert mx.data_mixture(df, "src", "doc_id", "text", weights, 100) \
             .where(F.col("src").isNull()).count() == 0

    # packing audit under the same pathology: exact accounting holds
    from dataprofiler_spark.operators.chunking import (
        oracle_packing_stats_sql, packing_stats)

    p = packing_stats(df, "doc_id", "text", context_len=4).toPandas()
    po = con.sql(oracle_packing_stats_sql("edge", "doc_id", "text",
                                          context_len=4)).df()
    for c in p.columns:
        assert float(p[c][0]) == float(po[c][0]), (c, p, po)


def test_quality_weighted_rows_agree_with_summary(docs):
    """Row-level soft filter and its audit agree; higher strength keeps
    a superset (monotone in strength, per-row deterministic)."""
    summ = mx.quality_weighted_sample_summary(
        docs, "doc_id", "text", strength=1.2).collect()[0]
    rows = mx.quality_weighted_sample(docs, "doc_id", "text", strength=1.2)
    assert rows.count() == summ["kept_docs"]
    assert 0 < summ["kept_docs"] < summ["total_docs"]
    weak = mx.quality_weighted_sample(docs, "doc_id", "text", strength=0.5)
    assert weak.select("doc_id").join(
        rows.select("doc_id"), "doc_id", "left_anti").count() == 0


def test_split_manifest_partitions_corpus(docs):
    rows = {r["split"]: r for r in
            mx.split_manifest(docs, "doc_id", "text").collect()}
    assert set(rows) <= {"train", "val", "test"}  # _rest empty at sum=1
    assert sum(r["n_docs"] for r in rows.values()) == docs.count()
    assert rows["train"]["n_docs"] > rows["val"]["n_docs"]


def test_split_nested_holdout(docs):
    """Shrinking the train share never moves an id INTO train: the
    0.6-train set is a subset of the 0.8-train set (stable holdouts)."""
    from dataprofiler_spark.operators.sampling import hash_fraction_expr

    h = hash_fraction_expr(F.col("doc_id"), "dps-split-v1")
    small = docs.where(h < 0.6).select("doc_id")
    big = docs.where(h < 0.8).select("doc_id")
    assert small.join(big, "doc_id", "left_anti").count() == 0


def test_split_fractions_over_one_raises(docs):
    with pytest.raises(ValueError, match="sum to > 1"):
        mx.split_manifest(docs, "doc_id", "text",
                          {"train": 0.9, "val": 0.2})


def test_mixture_many_weighted_groups_plan_scales(spark):
    """A realistic wide mixture (hundreds of weighted sources) must
    analyze and run: the keep-rate CASE chain is O(#weighted sources)
    and must not blow the Catalyst stack or take superlinear time."""
    n_groups = 400
    df = (spark.range(0, 8000)
          .select(F.col("id").alias("doc_id"),
                  F.concat(F.lit("word "),
                           (F.col("id") % 7).cast("string")).alias("text"),
                  F.concat(F.lit("g"),
                           (F.col("id") % n_groups).cast("string"))
                  .alias("src")))
    weights = {f"g{i}": 1.0 / n_groups for i in range(n_groups)}
    summ = mx.data_mixture_summary(df, "src", "doc_id", "text",
                                   weights, 4000).collect()
    assert len(summ) == n_groups
    assert all(r["kept_docs"] <= 8000 // n_groups for r in summ)
    kept = mx.data_mixture(df, "src", "doc_id", "text", weights, 4000)
    assert 0 < kept.count() <= 8000


def test_leakage_free_split_keeps_clusters_whole(spark, sf_dir):
    """Every near-dup cluster lands in exactly one split, and the split
    of each member equals the carve of its cluster_id — no near-dup
    pair can straddle train/test by construction."""
    import os
    from dataprofiler_spark.operators import mixture as mx

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    assign = mx.leakage_free_split(docs, "doc_id", "text",
                                   k=3, num_hashes=12, bands=2,
                                   threshold=0.8).collect()
    splits_per_cluster: dict[int, set] = {}
    for r in assign:
        splits_per_cluster.setdefault(r["cluster_id"], set()).add(r["split"])
    assert all(len(s) == 1 for s in splits_per_cluster.values())
    assert len(assign) == docs.count()  # every doc assigned exactly once


def test_leakage_free_split_fixes_naive_leak(spark):
    """A synthetic corpus of identical-text pairs whose ids the naive
    doc-id carve separates: the cluster-aware carve must reunite them."""
    from dataprofiler_spark.operators import mixture as mx
    from dataprofiler_spark.operators.sampling import hash_fraction_expr
    from pyspark.sql import functions as F

    # 40 docs = 20 identical pairs (i, i+100) — near-dup clusters of 2.
    rows = [(i + off, "alpha beta gamma delta epsilon zeta eta theta "
             f"iota kappa shared text body {i % 5}")
            for i in range(20) for off in (0, 100)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    naive = df.select(
        "doc_id",
        F.when(hash_fraction_expr(F.col("doc_id"), "dps-split-v1") < 0.5,
               "train").otherwise("test").alias("split")).collect()
    naive_split = {r["doc_id"]: r["split"] for r in naive}
    straddled = sum(1 for i in range(20)
                    if naive_split[i] != naive_split[i + 100])
    assert straddled > 0  # the naive carve does leak on this corpus

    assign = mx.leakage_free_split(
        df, "doc_id", "text", {"train": 0.5, "test": 0.5},
        threshold=0.5).collect()
    by_id = {r["doc_id"] if "doc_id" in r else r["id"]: r for r in assign}
    for i in range(20):
        assert by_id[i]["split"] == by_id[i + 100]["split"]
        assert by_id[i]["cluster_id"] == by_id[i + 100]["cluster_id"]


def test_leakage_free_manifest_consistent(spark, sf_dir):
    import os
    from dataprofiler_spark.operators import mixture as mx

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    assign = mx.leakage_free_split(docs, "doc_id", "text",
                                   bands=2, threshold=0.8)
    man = {r["split"]: (r["n_docs"], r["n_clusters"])
           for r in mx.leakage_free_split_manifest(
               docs, "doc_id", "text", bands=2, threshold=0.8).collect()}
    from collections import Counter
    docs_per_split = Counter(r["split"] for r in assign.collect())
    assert {s: n for s, (n, _) in man.items()} == dict(docs_per_split)
