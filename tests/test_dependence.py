"""Categorical dependence measures (operators/correlation.py):
mutual information semantics on hand-computable tables. Oracle parity
for the registered queries is covered by test_oracle_parity."""

from __future__ import annotations

import math

from dataprofiler_spark.operators import correlation as corr


def test_mutual_info_perfectly_dependent(spark):
    df = spark.createDataFrame([("x", "x")] * 50 + [("y", "y")] * 50,
                               ["p", "q"])
    r = corr.mutual_info_pair(df, "p", "q").collect()[0]
    assert abs(r["mi"] - math.log(2)) < 1e-6
    assert r["nmi"] == 1.0


def test_mutual_info_independent(spark):
    rows = [(a, b) for a in "xy" for b in "uv" for _ in range(25)]
    df = spark.createDataFrame(rows, ["p", "q"])
    r = corr.mutual_info_pair(df, "p", "q").collect()[0]
    assert r["mi"] == 0.0 and r["nmi"] == 0.0


def test_mutual_info_nulls_are_a_category(spark):
    df = spark.createDataFrame(
        [("x", None)] * 10 + [("y", "v")] * 10, ["p", "q"])
    r = corr.mutual_info_pair(df, "p", "q").collect()[0]
    assert abs(r["mi"] - math.log(2)) < 1e-6  # NULL tracks x perfectly
