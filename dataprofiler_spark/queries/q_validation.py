from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataprofiler_spark import report as rep
from dataprofiler_spark.queries._registry import ORACLE_SQL
from dataprofiler_spark.queries._registry import T, register

# ---------------------------------------------------------------------------
# Validators (SURVEY §2.2: is_in_range / is_in_list predicates)
# ---------------------------------------------------------------------------

from dataprofiler_spark.operators import validators as vd

_RULES = [
    vd.Rule("l_quantity", "in_range", low=1, high=50),
    vd.Rule("l_discount", "in_range", low=0.0, high=0.1),
    vd.Rule("l_returnflag", "in_list", values=("A", "N", "R")),
    vd.Rule("l_orderkey", "not_null"),
]


@register("inclusion_orders_customer",
          None)
def inclusion_orders_customer(spark, sf_dir):
    """Unary inclusion-dependency discovery (foreign-key candidates):
    o_custkey ⊆ c_custkey reads containment 1.0, o_orderkey doesn't.
    Distinct melts + one value-keyed join — sized by distincts, not
    rows."""
    return vd.inclusion_profile(
        T(spark, sf_dir, "orders"), ["o_custkey", "o_orderkey"],
        T(spark, sf_dir, "customer"), ["c_custkey", "c_nationkey"])


ORACLE_SQL["inclusion_orders_customer"] = vd.oracle_inclusion_sql(
    "orders", ["o_custkey", "o_orderkey"],
    "customer", ["c_custkey", "c_nationkey"])


@register("skew_join_lineitem_orders",
          "SELECT l.l_orderkey AS k, l.l_quantity AS qty, "
          "o.o_totalprice AS total "
          "FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey")
def skew_join_lineitem_orders(spark, sf_dir):
    """Hot-key split join: result-identical to the plain equi-join (the
    oracle IS the plain SQL join) while hot keys route through a
    broadcast branch instead of co-locating on one reducer.
    hot_threshold=5 forces the split on TPC-H's ≤7-line orders so the
    driver check exercises BOTH branches."""
    from dataprofiler_spark.operators.skew import skew_join
    li = T(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("k"), F.col("l_quantity").alias("qty"))
    od = T(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("k"),
        F.col("o_totalprice").alias("total"))
    return skew_join(li, od, "k", hot_threshold=5)


# FD pairs with known answers: orderkey→orderdate HOLDS (one order,
# one date... actually orders is keyed on o_orderkey so trivially);
# use lineitem: (l_orderkey → l_shipdate) violated (many lines per
# order ship on different dates), (l_orderkey → l_orderkey) trivially
# holds, (l_linenumber → l_returnflag) violated.
_FD_PAIRS = [("l_orderkey", "l_shipdate"),
             ("l_linenumber", "l_returnflag"),
             ("l_orderkey", "l_orderkey")]


@register("fd_check_lineitem",
          vd.oracle_fd_check_sql("lineitem", _FD_PAIRS))
def fd_check_lineitem(spark, sf_dir):
    """Approximate functional-dependency profiling (TANE g3 error):
    does A determine B, and how many rows violate it. Two
    determinant-keyed shuffles per pair."""
    return vd.fd_check(T(spark, sf_dir, "lineitem"), _FD_PAIRS)


@register("validate_lineitem", vd.oracle_validate_sql("lineitem", _RULES))
def validate_lineitem(spark, sf_dir):
    return vd.validate(T(spark, sf_dir, "lineitem"), _RULES)


# ---------------------------------------------------------------------------
# Float precision stats (SURVEY §2.4, float_column_profile.py:277-396)
# ---------------------------------------------------------------------------

from dataprofiler_spark.operators import precision as pr

_PREC_COLS = ["l_quantity", "l_extendedprice", "l_discount"]


@register("precision_stats_lineitem",
          pr.oracle_precision_stats_sql("lineitem", _PREC_COLS))
def precision_stats_lineitem(spark, sf_dir):
    return pr.precision_stats(T(spark, sf_dir, "lineitem"), _PREC_COLS)


# ---------------------------------------------------------------------------
# Null-spec semantics (SURVEY §1.2 null model): regex-defined nulls over a
# derived string column constructed identically in both engines.
# ---------------------------------------------------------------------------

from dataprofiler_spark.functions.nulls import DEFAULT_NULL_SPEC

_NULLISH_CASE_SQL = """CASE
  WHEN c_custkey % 13 = 0 THEN ''
  WHEN c_custkey % 13 = 1 THEN 'NaN'
  WHEN c_custkey % 13 = 2 THEN 'none'
  WHEN c_custkey % 13 = 3 THEN 'NULL'
  WHEN c_custkey % 13 = 4 THEN '  '
  WHEN c_custkey % 13 = 5 THEN '--'
  ELSE c_mktsegment END"""


def _nullish_col():
    k = F.col("c_custkey") % 13
    return (F.when(k == 0, "").when(k == 1, "NaN").when(k == 2, "none")
            .when(k == 3, "NULL").when(k == 4, "  ").when(k == 5, "--")
            .otherwise(F.col("c_mktsegment")))


_NULLSPEC_ORACLE = f"""
WITH t AS (SELECT {_NULLISH_CASE_SQL} AS val FROM customer)
SELECT COUNT(*) AS sample_size,
       CAST(SUM(CASE WHEN val IS NULL
                OR regexp_matches(val, '(?i)^(?:(?:)|(?:nan)|(?:none)|(?:null)|(?:\\s+)|(?:--+)|(?:__+))$')
           THEN 1 ELSE 0 END) AS BIGINT) AS null_count,
       CAST(SUM(CASE WHEN val = '' THEN 1 ELSE 0 END) AS BIGINT) AS empty_count,
       CAST(SUM(CASE WHEN regexp_matches(val, '(?i)^nan$') THEN 1 ELSE 0 END) AS BIGINT) AS nan_count,
       CAST(SUM(CASE WHEN regexp_matches(val, '^\\s+$') THEN 1 ELSE 0 END) AS BIGINT) AS ws_count
FROM t
"""


from dataprofiler_spark.operators.nullindex import (
    null_type_indices, oracle_null_type_indices_sql)

_NTI_SUBQ = f"(SELECT c_custkey, {_NULLISH_CASE_SQL} AS val FROM customer)"


@register("null_type_indices_customer",
          oracle_null_type_indices_sql(_NTI_SUBQ, ["val"], "c_custkey",
                                       cap=20))
def null_type_indices_customer(spark, sf_dir):
    """Capped null_types_index (profile_builder.py:536-676): per null
    type the exact count + the 20 smallest row ids, one row per kept id."""
    df = T(spark, sf_dir, "customer").select(
        F.col("c_custkey"), _nullish_col().alias("val"))
    return null_type_indices(df, ["val"], "c_custkey", cap=20)


@register("nullspec_customer", _NULLSPEC_ORACLE)
def nullspec_customer(spark, sf_dir):
    df = T(spark, sf_dir, "customer").select(_nullish_col().alias("val"))
    v = F.col("val")
    return df.agg(
        F.count(F.lit(1)).alias("sample_size"),
        F.sum(F.when(DEFAULT_NULL_SPEC.is_null(v), 1).otherwise(0))
         .alias("null_count"),
        F.sum(F.when(v == "", 1).otherwise(0)).alias("empty_count"),
        F.sum(F.when(v.rlike("(?i)^nan$"), 1).otherwise(0)).alias("nan_count"),
        F.sum(F.when(v.rlike(r"^\s+$"), 1).otherwise(0)).alias("ws_count"),
    )


def _nullspec_pc_oracle():
    from dataprofiler_spark.functions.nulls import NullSpec
    a_re = NullSpec.with_extra("n/a", "missing").regex()
    b_re = DEFAULT_NULL_SPEC.regex()
    case_a = """CASE WHEN c_custkey % 11 = 0 THEN 'N/A'
       WHEN c_custkey % 11 = 1 THEN 'MISSING'
       WHEN c_custkey % 11 = 2 THEN 'NaN'
       ELSE c_mktsegment END"""
    case_b = """CASE WHEN c_custkey % 11 = 0 THEN 'N/A'
       WHEN c_custkey % 11 = 1 THEN '--'
       ELSE c_name END"""
    return f"""
WITH t AS (SELECT {case_a} AS val_a, {case_b} AS val_b FROM customer)
SELECT 'val_a' AS "column", COUNT(*) AS sample_size,
       CAST(COALESCE(SUM(CASE WHEN val_a IS NULL
                OR regexp_matches(val_a, '{a_re}')
            THEN 1 ELSE 0 END), 0) AS BIGINT) AS null_count
FROM t
UNION ALL
SELECT 'val_b', COUNT(*),
       CAST(COALESCE(SUM(CASE WHEN val_b IS NULL
                OR regexp_matches(val_b, '{b_re}')
            THEN 1 ELSE 0 END), 0) AS BIGINT)
FROM t
"""


@register("nullspec_per_column_customer", _nullspec_pc_oracle())
def nullspec_per_column_customer(spark, sf_dir):
    """Per-column null-value overrides (reference ``column_null_values``,
    profiler_options.py:1428-1490, applied per column at
    profile_builder.py:117-123): val_a counts 'N/A'/'MISSING' as null
    via a per-column override merged with the defaults
    (NullSpec.with_extra); val_b keeps the global default spec, so its
    'N/A' cells are NOT null but its '--' cells are. Runs the REAL
    Profiler wide agg — the override threads through
    ProfilerOptions.null_spec_for into the fused null expression."""
    from dataprofiler_spark.functions.nulls import NullSpec
    from dataprofiler_spark.plans.profile_plan import (Profiler,
                                                       ProfilerOptions)
    k = F.col("c_custkey") % 11
    df = T(spark, sf_dir, "customer").select(
        F.when(k == 0, "N/A").when(k == 1, "MISSING").when(k == 2, "NaN")
         .otherwise(F.col("c_mktsegment")).alias("val_a"),
        F.when(k == 0, "N/A").when(k == 1, "--")
         .otherwise(F.col("c_name")).alias("val_b"))
    opts = ProfilerOptions(
        column_null_values={"val_a": NullSpec.with_extra("n/a", "missing")})
    state = Profiler(df, opts).profile()
    rows = [(c, s.sample_size, s.null_count)
            for c, s in sorted(state.columns.items())]
    return spark.createDataFrame(
        rows, "column string, sample_size long, null_count long")


# ---------------------------------------------------------------------------
# Unstructured text summary (SURVEY §2.4 unstructured base stats +
# word stats; profile_builder.py:1449-1536, unstructured_text_profile.py)
# ---------------------------------------------------------------------------

_UNSTRUCT_ORACLE = """
SELECT COUNT(*) AS samples,
       CAST(SUM(CASE WHEN regexp_matches(text, '^\\s*$') OR text IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS empty_count,
       ROUND(CAST(SUM(octet_length(encode(text))) AS DOUBLE) / 1048576, 6) AS memory_mb,
       CAST(SUM(len(regexp_extract_all(LOWER(text), '[^ \\t\\n\\x0b\\f\\r]+'))) AS BIGINT) AS total_words,
       (SELECT COUNT(DISTINCT w) FROM (
          SELECT UNNEST(regexp_extract_all(LOWER(text), '[^ \\t\\n\\x0b\\f\\r]+')) AS w FROM documents
       )) AS unique_words
FROM documents
"""


@register("unstructured_summary_documents", _UNSTRUCT_ORACLE)
def unstructured_summary_documents(spark, sf_dir):
    df = T(spark, sf_dir, "documents")
    from dataprofiler_spark.session import explode_no_prefilter
    toks = F.regexp_extract_all(F.lower(F.col("text")), F.lit(r"[^ \t\n\x0B\f\r]+"), 0)
    uniq = (explode_no_prefilter(df.select(toks.alias("toks")), "toks", "w")
            .agg(F.count_distinct("w").alias("unique_words")))
    summary = df.agg(
        F.count(F.lit(1)).alias("samples"),
        F.sum(F.when(F.col("text").rlike(r"^\s*$") | F.col("text").isNull(), 1)
              .otherwise(0)).alias("empty_count"),
        F.round(F.sum(F.octet_length("text")).cast("double") / 1048576, 6)
         .alias("memory_mb"),
        F.sum(F.size(toks)).alias("total_words"),
    )
    return summary.crossJoin(F.broadcast(uniq))


# ---------------------------------------------------------------------------
# Null replication metrics (SURVEY §2.4, profile_builder.py:2589-2787) —
# demonstrated on a derived null-bearing column built identically in both
# engines (testdata has no native nulls).
# ---------------------------------------------------------------------------

from dataprofiler_spark.operators import nullreplication as nr

_NULLREP_DERIVED_SQL = """(SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL
                                  ELSE o_orderkey END AS tgt,
                                  o_totalprice
                           FROM orders)"""


@register("null_replication_orders",
          nr.oracle_null_replication_sql(_NULLREP_DERIVED_SQL, ["tgt"],
                                         ["tgt", "o_totalprice"]))
def null_replication_orders(spark, sf_dir):
    df = T(spark, sf_dir, "orders").select(
        F.when(F.col("o_orderkey") % 5 == 0, None)
         .otherwise(F.col("o_orderkey")).alias("tgt"),
        F.col("o_totalprice"),
    )
    return nr.null_replication_metrics(df, ["tgt"], ["tgt", "o_totalprice"])


