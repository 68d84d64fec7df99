from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataprofiler_spark import report as rep
from dataprofiler_spark.operators import textanalysis as ta
from dataprofiler_spark.operators import histogram as hist
from dataprofiler_spark.operators import events as ev
from dataprofiler_spark.operators import drift as dr
from dataprofiler_spark.operators import dedup as dd
from dataprofiler_spark.queries.q_flagship import _flat_report_df
from dataprofiler_spark.queries._registry import T, register

# ---------------------------------------------------------------------------
# Untruncated flat report (rows-only: string-formatted floats are not
# hash-comparable across engines; the deterministic slice above carries
# the driver check for the same end-to-end path)
# ---------------------------------------------------------------------------

_LMDIV_A = "(SELECT * FROM documents WHERE source IN ('src0','src1','src2','src3','src4'))"
_LMDIV_B = "(SELECT * FROM documents WHERE source NOT IN ('src0','src1','src2','src3','src4'))"


@register("lm_divergence_documents",
          ta.oracle_lm_divergence_sql(_LMDIV_A, _LMDIV_B, "text"))
def lm_divergence_documents(spark, sf_dir):
    """Cross-corpus unigram KL/JS divergence between two source groups
    — the mixture-tuning / domain-shift number; vocabulary-sized folds
    use the round-then-decimal discipline."""
    from dataprofiler_spark.operators import textanalysis as _ta
    docs = T(spark, sf_dir, "documents")
    a = docs.where(F.col("source").isin(
        "src0", "src1", "src2", "src3", "src4"))
    b = docs.where(~F.col("source").isin(
        "src0", "src1", "src2", "src3", "src4"))
    return _ta.lm_divergence(a, b, "text")


@register("grouped_quantiles_lineitem",
          hist.oracle_grouped_quantiles_sql(
              "lineitem", "l_returnflag", "l_extendedprice",
              [0.25, 0.5, 0.75, 0.95]))
def grouped_quantiles_lineitem(spark, sf_dir):
    """Per-returnflag exact quantiles of extendedprice — the
    group-partitioned counts-CDF (one WindowExec keyed on the group;
    groups sort in parallel)."""
    return hist.grouped_quantiles(
        T(spark, sf_dir, "lineitem"), "l_returnflag", "l_extendedprice",
        [0.25, 0.5, 0.75, 0.95])


@register("type_cooccurrence_events",
          ev.oracle_type_cooccurrence_sql("events"))
def type_cooccurrence_events(spark, sf_dir):
    """Market-basket event-type pair stats (support/lift over per-user
    type sets) — within-user pair expansion bounded by the taxonomy,
    never a row-level self-join."""
    return ev.type_cooccurrence(T(spark, sf_dir, "events"))


_QSHIFT_A = "(SELECT * FROM orders WHERE o_orderdate < '1996-01-01')"
_QSHIFT_B = "(SELECT * FROM orders WHERE o_orderdate >= '1996-01-01')"


@register("quantile_shift_totalprice",
          dr.oracle_quantile_shift_sql(_QSHIFT_A, _QSHIFT_B,
                                       "o_totalprice"))
def quantile_shift_totalprice(spark, sf_dir):
    """Per-quantile drift of totalprice across a date split — the
    order-statistics view PSI's bins blur; two counts-CDF passes."""
    o = T(spark, sf_dir, "orders")
    a = o.where(F.col("o_orderdate") < "1996-01-01")
    b = o.where(F.col("o_orderdate") >= "1996-01-01")
    from dataprofiler_spark.operators import drift as _dr
    return _dr.quantile_shift(a, b, "o_totalprice")


@register("neardup_threshold_sweep_documents",
          dd.oracle_neardup_threshold_sweep_sql(
              "documents", "doc_id", "text", bands=2))
def neardup_threshold_sweep_documents(spark, sf_dir):
    """Verified-pair counts at each candidate dedup threshold — one
    LSH+verify pass at the lowest threshold, conditional counts above."""
    return dd.neardup_threshold_sweep(
        T(spark, sf_dir, "documents"), "doc_id", "text", bands=2)


@register("null_rate_by_day_events",
          ev.oracle_null_rate_by_day_sql("events", "ts",
                                         ["user_id", "value", "props"]))
def null_rate_by_day_events(spark, sf_dir):
    """Per-day completeness timeseries of three columns — one
    groupBy(day) wide agg, exploded to rows."""
    return ev.null_rate_by_day(T(spark, sf_dir, "events"), "ts",
                               ["user_id", "value", "props"])


@register("session_stats_events",
          ev.oracle_session_stats_sql("events"))
def session_stats_events(spark, sf_dir):
    """One-row session summary (count/users/mean events/median + p95
    duration) — sessionize plan + a counts-CDF quantile pass."""
    return ev.session_stats(T(spark, sf_dir, "events"))


@register("top_terms_by_group_documents",
          ta.oracle_top_terms_by_group_sql("documents", "source",
                                           "text", k=5))
def top_terms_by_group_documents(spark, sf_dir):
    """Per-source top-5 vocabulary with within-group share — one
    (group, term) tf aggregation + a group-partitioned top-k window."""
    from dataprofiler_spark.operators import textanalysis as _ta
    return _ta.top_terms_by_group(T(spark, sf_dir, "documents"),
                                  "source", "text", k=5)


def _load_spectrum_golden() -> str | None:
    """Golden-fixture oracle for the eigen-spectrum (the cnn_votes
    pattern): eigendecomposition is not SQL-expressible, but its value
    at the driver's sf0.01 IS deterministic — the covariance underneath
    is decimal-exact (partition-order independent) and numpy's eigh is
    deterministic on an identical matrix, with 6-digit output rounding
    absorbing platform ulps. Pinned from a recorded sf0.01 run; the
    distributed covariance stays independently oracled
    (embedding_covariance_embeddings), and the spectrum math is pinned
    against analytically-known spectra in tests."""
    import json
    import os as _os
    p = _os.path.join(_os.path.dirname(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__)))), "fixtures",
        "embedding_spectrum_sf001.json")
    if not _os.path.exists(p):
        return None
    with open(p) as fh:
        g = json.load(fh)
    return (f"SELECT CAST({g['dim']} AS INTEGER) AS dim, "
            f"CAST({g['n']} AS BIGINT) AS n, "
            f"CAST({g['total_var']} AS DOUBLE) AS total_var, "
            f"CAST({g['top1_ratio']} AS DOUBLE) AS top1_ratio, "
            f"CAST({g['top5_ratio']} AS DOUBLE) AS top5_ratio, "
            f"CAST({g['effective_rank']} AS DOUBLE) AS effective_rank, "
            f"CAST({g['participation_ratio']} AS DOUBLE) "
            f"AS participation_ratio")


@register("embedding_spectrum_embeddings", _load_spectrum_golden())
def embedding_spectrum_embeddings(spark, sf_dir):
    """Eigen-spectrum concentration of the embedding covariance —
    golden-fixture oracle at the driver's sf0.01 (see
    _load_spectrum_golden)."""
    from dataprofiler_spark.operators import vectorstats as vs
    return vs.embedding_spectrum(T(spark, sf_dir, "embeddings"),
                                 "embedding")


_FLAT_REPORT_NO_ORACLE = (
    "rows-only by construction, FINAL: the untruncated flat report "
    "stringifies order-dependent native doubles (double sum / var_pop "
    "/ skew / kurt accumulate in partition order), HLL estimates, and "
    "histogram-derived quantiles — no external engine can reproduce "
    "those byte strings. Every deterministic stat in it IS hash-checked "
    "through full_profile_* (deterministic_report_rows slice), and "
    "tests/test_plans.py::test_flat_report_consistent_with_"
    "deterministic_slice pins that the flat format agrees with the "
    "oracled slice value-for-value.")


@register("full_report_lineitem", no_oracle_reason=_FLAT_REPORT_NO_ORACLE)
def full_report_lineitem(spark, sf_dir):
    return _flat_report_df(spark, T(spark, sf_dir, "lineitem"))


