from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataprofiler_spark import report as rep
from dataprofiler_spark.queries._registry import T, register

# ---------------------------------------------------------------------------
# Drift / diff statistics (SURVEY §2.5: PSI, chi2 homogeneity, Welch t)
# Split = before/after a date boundary — the canonical drift comparison.
# ---------------------------------------------------------------------------

from dataprofiler_spark.operators import drift as dr
from dataprofiler_spark.operators import typeinfer as ti

_ORD_A = "(SELECT * FROM orders WHERE o_orderdate < TIMESTAMP '1998-01-01')"
_ORD_B = "(SELECT * FROM orders WHERE o_orderdate >= TIMESTAMP '1998-01-01')"


def _orders_split(spark, sf_dir):
    df = T(spark, sf_dir, "orders")
    return (df.where(F.col("o_orderdate") < "1998-01-01"),
            df.where(F.col("o_orderdate") >= "1998-01-01"))


@register("daily_psi_events",
          dr.oracle_temporal_psi_sql("events", "ts", "event_type"))
def daily_psi_events(spark, sf_dir):
    """Day-over-day PSI of the event-type mix — drift chained along
    time in one relational plan (keys = days × categories, never
    rows)."""
    return dr.temporal_psi(T(spark, sf_dir, "events"), "ts", "event_type")


@register("psi_orderpriority",
          dr.oracle_categorical_psi_sql(_ORD_A, _ORD_B, "o_orderpriority"))
def psi_orderpriority(spark, sf_dir):
    a, b = _orders_split(spark, sf_dir)
    return dr.categorical_psi(a, b, "o_orderpriority")


@register("chi2_orderpriority",
          dr.oracle_chi2_sql(_ORD_A, _ORD_B, "o_orderpriority"))
def chi2_orderpriority(spark, sf_dir):
    a, b = _orders_split(spark, sf_dir)
    return dr.chi2_homogeneity(a, b, "o_orderpriority")


@register("welch_t_totalprice", dr.oracle_welch_t_sql(_ORD_A, _ORD_B, "o_totalprice"))
def welch_t_totalprice(spark, sf_dir):
    a, b = _orders_split(spark, sf_dir)
    return dr.welch_t(a, b, "o_totalprice")


# ---------------------------------------------------------------------------
# Type inference over stringified cells (SURVEY §1.2 / §2.2)
# ---------------------------------------------------------------------------

_TI_COLS = ["l_orderkey", "l_quantity", "l_extendedprice", "l_returnflag",
            "l_shipdate"]


@register("type_inference_lineitem", ti.oracle_type_inference_sql("lineitem", _TI_COLS))
def type_inference_lineitem(spark, sf_dir):
    return ti.type_inference(T(spark, sf_dir, "lineitem"), _TI_COLS)


