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
