"""Bucketed-table helpers — co-located, shuffle-free joins.

Not a reference feature (it never joins); essential at 100 TB: repeated
joins/aggregations on the same key (e.g. orders ⋈ lineitem on orderkey,
or a dedup pipeline re-joining signatures by doc id) should pay the
shuffle ONCE at write time. Spark's bucketed tables (`bucketBy` +
`sortBy`) persist the hash-partitioning in the metastore; subsequent
joins on the bucket key plan as SortMergeJoin with NO Exchange on either
side (verified by test_bucketing: zero Exchange operators in the joined
plan).

Usage::

    write_bucketed(lineitem, "lineitem_b", ["l_orderkey"], num_buckets=64)
    write_bucketed(orders, "orders_b", ["o_orderkey"], num_buckets=64)
    j = bucketed_join(spark, "orders_b", "lineitem_b",
                      "o_orderkey", "l_orderkey")   # shuffle-free

Bucket count guidance: buckets ≈ total_size / 256 MiB, same count on
both sides (mismatched counts re-shuffle the smaller side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 64, sort_cols: list[str] | None = None,
                   mode: str = "overwrite") -> None:
    writer = (df.write.mode(mode)
              .bucketBy(num_buckets, *bucket_cols)
              .sortBy(*(sort_cols or bucket_cols)))
    writer.saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  left_key: str, right_key: str, how: str = "inner") -> DataFrame:
    left = spark.table(left_table)
    right = spark.table(right_table)
    return left.join(right, left[left_key] == right[right_key], how)


def exchange_count(df: DataFrame) -> int:
    """Number of Exchange (shuffle) operators in the physical plan —
    the metric bucketing exists to drive to zero."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("simple")
    plan = buf.getvalue()
    return sum(1 for line in plan.splitlines()
               if "Exchange" in line and "reuse" not in line.lower())
