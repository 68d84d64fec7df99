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
