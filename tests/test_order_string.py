"""String-keyed order detection must distribute (VERDICT r3 item 7):
the range-bucket projection of a string key has to spread rows over >1
bucket — a silent single-partition fallback is the round-1 global-window
anti-pattern — and classification must agree with a DuckDB global-lag
oracle on the same data."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators import order as od


def _string_keyed(spark, sf_dir):
    """orders keyed by a string with a long shared prefix (the hard
    case: first 8 bytes identical across all rows)."""
    orders = spark.read.parquet(os.path.join(sf_dir, "orders.parquet"))
    return orders.select(
        F.concat(F.lit("order_key_"),
                 F.lpad(F.col("o_orderkey").cast("string"), 10, "0")
                 ).alias("skey"),
        F.col("o_totalprice").alias("val"))


def test_string_key_spreads_buckets(spark, sf_dir):
    df = _string_keyed(spark, sf_dir)
    bucket = od._bucket_expr(df, "skey", od.DEFAULT_ORDER_BUCKETS)
    n = df.select(bucket.alias("b")).distinct().count()
    assert n > 1, "string key must range-bucket, not single-partition"


def test_string_key_order_profile_matches_global_lag(spark, duck, sf_dir):
    df = _string_keyed(spark, sf_dir)
    got = od.order_profile(df, "val", ["skey"]).collect()[0]
    path = os.path.join(sf_dir, "orders.parquet")
    exp = duck.sql(f"""
      WITH t AS (
        SELECT 'order_key_' || lpad(CAST(o_orderkey AS VARCHAR), 10, '0')
                 AS skey,
               o_totalprice AS val
        FROM '{path}'
      ), pairs AS (
        SELECT val AS v, LAG(val) OVER (ORDER BY skey) AS p FROM t
      )
      SELECT COUNT(*) AS n_pairs,
             SUM(CASE WHEN v > p THEN 1 ELSE 0 END) AS asc_pairs,
             SUM(CASE WHEN v < p THEN 1 ELSE 0 END) AS desc_pairs,
             SUM(CASE WHEN v = p THEN 1 ELSE 0 END) AS eq_pairs
      FROM pairs WHERE p IS NOT NULL
    """).fetchone()
    assert (got["n_pairs"], got["asc_pairs"], got["desc_pairs"],
            got["eq_pairs"]) == exp


def test_string_key_ascending_detected(spark):
    df = spark.createDataFrame(
        [(f"k{i:04d}", float(i)) for i in range(500)], ["skey", "val"])
    row = od.order_profile(df, "val", ["skey"]).collect()[0]
    assert row["order"] == "ascending"
    assert row["n_pairs"] == 499


def test_constant_string_key_single_bucket_is_exact(spark):
    df = spark.createDataFrame([("same", float(i)) for i in range(10)],
                               ["skey", "val"])
    bucket = od._bucket_expr(df, "skey", 64)
    assert df.select(bucket.alias("b")).distinct().count() == 1


def test_unsupported_key_type_raises(spark):
    df = spark.createDataFrame([([1, 2], 1.0)], ["akey", "val"])
    with pytest.raises(ValueError, match="range-bucketing"):
        od.order_profile(df, "val", ["akey"])


def test_prefix_value_monotone_variable_lengths(spark):
    """'aa' < 'b' lexicographically — zero-padded fixed-width reads must
    preserve that (the counter-example that breaks variable-length
    reads)."""
    df = spark.createDataFrame(
        [("aa", 1.0), ("b", 2.0), ("", 0.5), ("aaaaaaaaaaz", 1.5)],
        ["skey", "val"])
    proj = od._string_prefix_value(df, "skey")
    assert proj is not None
    kv, lo, hi = proj
    rows = (df.select("skey", kv.alias("kv")).orderBy("skey").collect())
    vals = [r["kv"] for r in rows]
    assert vals == sorted(vals), f"projection not monotone: {rows}"
    assert lo == min(vals) and hi == max(vals)
