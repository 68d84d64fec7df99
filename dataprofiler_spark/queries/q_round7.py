from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataprofiler_spark import report as rep
from dataprofiler_spark.operators import correlation as corr
from dataprofiler_spark.operators import events as ev
from dataprofiler_spark.operators import histogram as hist
from dataprofiler_spark.operators import validators as vd
from dataprofiler_spark.queries.q_flagship import _flat_report_df
from dataprofiler_spark.queries._registry import T, register

# ---------------------------------------------------------------------------
# Round-7 operators: correlation-family completion + event/feature QA
# ---------------------------------------------------------------------------

@register("kendall_tau_lineitem",
          corr.oracle_kendall_tau_b_sql("lineitem", "l_quantity",
                                        "l_discount"))
def kendall_tau_lineitem(spark, sf_dir):
    """Kendall's tau-b with tie correction on two heavily-tied numeric
    columns (50 x 11 joint cells) — the cell-level pair fold, never a
    row-level one."""
    return corr.kendall_tau_b(T(spark, sf_dir, "lineitem"),
                              "l_quantity", "l_discount")


@register("markov_transitions_events",
          ev.oracle_markov_transitions_sql("events"))
def markov_transitions_events(spark, sf_dir):
    """First-order event-type transition matrix P(next | current) over
    per-user sequences; one user-partitioned lag window + a k^2 fold."""
    return ev.markov_transitions(T(spark, sf_dir, "events"))


@register("calendar_gaps_events",
          ev.oracle_calendar_gaps_sql("events", group_col="event_type"))
def calendar_gaps_events(spark, sf_dir):
    """Per-event-type calendar coverage: days with ZERO events between
    each type's first and last day — exact integer date arithmetic."""
    return ev.calendar_gaps(T(spark, sf_dir, "events"),
                            group_col="event_type")


@register("decile_stats_extendedprice",
          hist.oracle_decile_stats_sql("lineitem", "l_extendedprice"))
def decile_stats_extendedprice(spark, sf_dir):
    """Equal-frequency (decile) binning with per-bucket n/lo/hi/mean —
    integer rank intervals on the counts-CDF (deterministic under ties,
    unlike ntile)."""
    return hist.decile_stats(T(spark, sf_dir, "lineitem"),
                             "l_extendedprice")


# Binary outcome derived in-query with ONE shared SQL expression (the
# _DOC_URL_EXPR pattern): urgent/high priority as the "positive" class.
_WOE_LABEL_EXPR = "o_orderpriority IN ('1-URGENT', '2-HIGH')"


@register("woe_iv_orders",
          vd.oracle_woe_iv_sql("orders", "o_orderstatus",
                               _WOE_LABEL_EXPR))
def woe_iv_orders(spark, sf_dir):
    """Weight-of-evidence + IV contribution of order status against an
    urgent-priority outcome — the feature-screening fold (0.5-smoothed,
    shared expression in both engines)."""
    df = T(spark, sf_dir, "orders").select(
        "o_orderstatus", F.expr(_WOE_LABEL_EXPR).alias("__y"))
    return vd.woe_iv(df, "o_orderstatus", "__y")


@register("iv_summary_orders",
          vd.oracle_iv_summary_sql(
              "orders",
              {"o_orderstatus": "o_orderstatus",
               "o_order_month": "substr(CAST(o_orderdate AS VARCHAR), 6, 2)"},
              "o_orderpriority IN ('1-URGENT', '2-HIGH')"))
def iv_summary_orders(spark, sf_dir):
    """Information-value ranking of two candidate features (order
    status; order month) against the urgent-priority outcome — the
    melt-once multi-feature fold."""
    df = T(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.expr("substr(CAST(o_orderdate AS STRING), 6, 2)")
         .alias("o_order_month"),
        F.expr("o_orderpriority IN ('1-URGENT', '2-HIGH')").alias("__y"))
    return vd.iv_summary(df, ["o_orderstatus", "o_order_month"], "__y")


# Classifier-evaluation pair: a heavily-tied integer score against a
# binary outcome exercises the tie-corrected rank formulation; the
# label is ONE shared SQL expression in both engines.
_AUC_LABEL_EXPR = "l_returnflag = 'R'"


@register("roc_auc_lineitem",
          vd.oracle_roc_auc_sql("lineitem", "l_quantity",
                                _AUC_LABEL_EXPR))
def roc_auc_lineitem(spark, sf_dir):
    """Exact tie-corrected ROC AUC (Mann-Whitney on the score
    counts-CDF — integer arithmetic until one division)."""
    df = T(spark, sf_dir, "lineitem").select(
        "l_quantity", F.expr(_AUC_LABEL_EXPR).alias("__y"))
    return vd.roc_auc(df, "l_quantity", "__y")


_CAL_SCORE_EXPR = "l_discount * 10.0"


@register("calibration_lineitem",
          vd.oracle_calibration_curve_sql("lineitem", _CAL_SCORE_EXPR,
                                          _AUC_LABEL_EXPR))
def calibration_lineitem(spark, sf_dir):
    """Equal-width reliability diagram of a [0,1] score vs a binary
    outcome — one map-side bin + one groupBy."""
    df = T(spark, sf_dir, "lineitem").select(
        F.expr(_CAL_SCORE_EXPR).alias("__s"),
        F.expr(_AUC_LABEL_EXPR).alias("__y"))
    return vd.calibration_curve(df, "__s", "__y")


from dataprofiler_spark.queries.q_reports import _FLAT_REPORT_NO_ORACLE


@register("full_report_events", no_oracle_reason=_FLAT_REPORT_NO_ORACLE)
def full_report_events(spark, sf_dir):
    return _flat_report_df(spark, T(spark, sf_dir, "events"))


