from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataprofiler_spark import report as rep
from dataprofiler_spark.operators import numeric as num
from dataprofiler_spark.queries.q_profile_stats import _LINEITEM_NUM
from dataprofiler_spark.operators import skew as sk
from dataprofiler_spark.queries.q_cnn import _trained_labeler_votes
from dataprofiler_spark.queries._registry import T, register

# ---------------------------------------------------------------------------
# Entity labeling (regex labeler, SURVEY §2.7), correlation & chi2 matrix,
# graph profile (SURVEY §2.4)
# ---------------------------------------------------------------------------

from dataprofiler_spark.labeler import regex_labeler as rl
from dataprofiler_spark.operators import correlation as corr
from dataprofiler_spark.operators import graph as gr

_LABEL_COLS = ["c_name", "c_acctbal", "c_mktsegment", "c_custkey"]


@register("label_votes_customer", rl.oracle_label_votes_sql("customer", _LABEL_COLS))
def label_votes_customer(spark, sf_dir):
    return rl.label_votes(T(spark, sf_dir, "customer"), _LABEL_COLS)


# ---------------------------------------------------------------------------
# Labeler evaluation (reference labeler_utils.evaluate_accuracy /
# classification_report): per-label precision/recall/F1/support from one
# distributed confusion groupBy. The (truth, predicted) pair is fully
# SQL-expressible — predicted is the first-match regex cell label,
# truth a deterministic "gold" annotation with injected disagreement
# (the cohens_kappa pattern) so FP/FN/zero-support paths all carry
# weight: custkey cells divisible by 7 are gold-labeled BAN (predicted
# INTEGER -> real confusion), BUILDING segment cells gold-labeled
# ADDRESS (never predicted -> zero-division recall path).
# ---------------------------------------------------------------------------

# Spark spells the string cast CAST(.. AS STRING); DuckDB needs
# VARCHAR — the oracle builder substitutes. The strings only feed
# anchored regexes, so the residual formatting differences between the
# engines' double->string casts (both shortest-round-trip decimal at
# these magnitudes) cannot flip a label.
_F1_CELLS = [
    ("CAST(c_custkey AS STRING)",
     "CASE WHEN c_custkey % 7 = 0 THEN 'BAN' ELSE 'INTEGER' END"),
    ("CAST(c_nationkey AS STRING)", "'INTEGER'"),
    ("CAST(c_acctbal AS STRING)", "'FLOAT'"),
    ("c_name", "'UNKNOWN'"),
    ("c_mktsegment",
     "CASE WHEN c_mktsegment = 'BUILDING' THEN 'ADDRESS' "
     "ELSE 'UNKNOWN' END"),
]


def _f1_labels() -> list[str]:
    return sorted(set(rl.LABEL_PATTERNS) | {"UNKNOWN"})


def _labeler_f1_oracle() -> str:
    cells = "\nUNION ALL\n".join(
        f"SELECT {cell.replace(' AS STRING)', ' AS VARCHAR)')} AS cell, "
        f"{truth} AS truth FROM customer"
        for cell, truth in _F1_CELLS)
    case = rl.oracle_cell_label_case("cell")
    labels = ", ".join(f"('{l}')" for l in _f1_labels())
    return f"""
WITH cells AS ({cells}),
prd AS (
  SELECT truth, {case} AS pred
  FROM cells WHERE cell IS NOT NULL AND truth IS NOT NULL
),
conf AS (SELECT truth, pred, COUNT(*) AS n FROM prd GROUP BY 1, 2),
labels(label) AS (VALUES {labels}),
per AS (
  SELECT label,
    COALESCE((SELECT SUM(n) FROM conf
              WHERE truth = label AND pred = label), 0) AS tp,
    COALESCE((SELECT SUM(n) FROM conf WHERE pred = label), 0) AS psum,
    COALESCE((SELECT SUM(n) FROM conf WHERE truth = label), 0) AS tsum
  FROM labels),
pr AS (
  SELECT label,
    CASE WHEN psum > 0 THEN CAST(tp AS DOUBLE) / psum ELSE 0.0 END AS p,
    CASE WHEN tsum > 0 THEN CAST(tp AS DOUBLE) / tsum ELSE 0.0 END AS r,
    tsum AS support
  FROM per),
rows_ AS (
  SELECT label, p, r,
    CASE WHEN p + r > 0 THEN 2 * p * r / (p + r) ELSE 0.0 END AS f1,
    support
  FROM pr
  UNION ALL
  SELECT 'accuracy', a, a, a, tot FROM (
    -- COALESCE: an EMPTY evaluation reads accuracy 0 over 0 samples
    -- (the engine's zero-division-to-0 rule), not NULL
    SELECT COALESCE(
             CAST(SUM(CASE WHEN truth = pred THEN n ELSE 0 END) AS DOUBLE)
             / SUM(n), 0.0) AS a,
           COALESCE(SUM(n), 0) AS tot
    FROM conf))
SELECT label, ROUND(p, 6) AS "precision", ROUND(r, 6) AS recall,
       ROUND(f1, 6) AS f1_score, CAST(support AS BIGINT) AS support
FROM rows_ ORDER BY label
"""


@register("labeler_f1_customer", _labeler_f1_oracle())
def labeler_f1_customer(spark, sf_dir):
    from dataprofiler_spark.functions.rounding import duckdb_round
    from dataprofiler_spark.labeler import evaluation as ev

    cust = T(spark, sf_dir, "customer")
    structs = [F.struct(F.expr(cell).alias("cell"),
                        F.expr(truth).alias("truth"))
               for cell, truth in _F1_CELLS]
    cells = (cust.select(F.explode(F.array(*structs)).alias("s"))
             .select("s.cell", "s.truth")
             .where(F.col("cell").isNotNull()
                    & F.col("truth").isNotNull()))
    prd = cells.select("truth",
                       rl.cell_label_expr("cell").alias("pred"))
    labels = _f1_labels()
    conf = ev.confusion_matrix(
        ev.confusion_counts(prd, "truth", "pred"), labels)
    report = ev.classification_report(conf, labels)  # full set: accuracy
    total = int(conf.sum())
    rows = [(l, report[l]["precision"], report[l]["recall"],
             report[l]["f1-score"], report[l]["support"])
            for l in labels]
    rows.append(("accuracy", report["accuracy"], report["accuracy"],
                 report["accuracy"], total))
    out = spark.createDataFrame(
        rows, "label string, p double, r double, f1 double, support long")
    return (out.select(
        "label", duckdb_round(F.col("p"), 6).alias("precision"),
        duckdb_round(F.col("r"), 6).alias("recall"),
        duckdb_round(F.col("f1"), 6).alias("f1_score"),
        F.col("support"))
        .orderBy("label"))


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register("correlation_lineitem", corr.oracle_correlation_sql("lineitem", _CORR_COLS))
def correlation_lineitem(spark, sf_dir):
    return corr.correlation_matrix(T(spark, sf_dir, "lineitem"), _CORR_COLS)


@register("benford_lineitem",
          num.oracle_benford_sql("lineitem", _LINEITEM_NUM))
def benford_lineitem(spark, sf_dir):
    """Benford first-digit screen per numeric column (TPC-H's uniform
    generators fail it loudly — the screen working as designed). One
    map-side digit projection + a 9·k-group fold."""
    return num.benford_test(T(spark, sf_dir, "lineitem"), _LINEITEM_NUM)


@register("robust_stats_lineitem",
          num.oracle_robust_stats_sql("lineitem", _LINEITEM_NUM))
def robust_stats_lineitem(spark, sf_dir):
    """Tukey IQR fences + trimmed/winsorized means — the robust
    complement to the z-score outlier fences; 2 scans at any column
    count, quantiles flow engine-side (no literal seams)."""
    return num.robust_stats(T(spark, sf_dir, "lineitem"), _LINEITEM_NUM)


# Cohen's kappa needs two "annotations" of the same rows over a shared
# label set; TPC-H has no annotator pair, so the second column is a
# deterministic imperfect copy of l_returnflag derived in-query — the
# SAME SQL expression through F.expr on the Spark side and inline in
# the oracle (the _DOC_URL_EXPR pattern).
_KAPPA_B_EXPR = ("CASE WHEN l_quantity < 25 THEN l_returnflag "
                 "ELSE 'N' END")


@register("cohens_kappa_lineitem",
          corr.oracle_cohens_kappa_sql(
              f"(SELECT l_returnflag, ({_KAPPA_B_EXPR}) AS rf2 "
              "FROM lineitem) t", "l_returnflag", "rf2"))
def cohens_kappa_lineitem(spark, sf_dir):
    """Chance-corrected agreement (label QA): kappa between
    l_returnflag and a deterministic imperfect re-annotation of it.
    One groupBy over observed cells; integer sums, engine-exact."""
    li = T(spark, sf_dir, "lineitem").withColumn(
        "rf2", F.expr(_KAPPA_B_EXPR))
    return corr.cohens_kappa(li, "l_returnflag", "rf2")


@register("theils_u_orders",
          corr.oracle_theils_u_sql("orders", "o_orderpriority",
                                   "o_orderstatus"))
def theils_u_orders(spark, sf_dir):
    """Theil's uncertainty coefficient both directions — the asymmetric
    categorical dependence (which column predicts which). MI shape:
    one joint groupBy + two marginal folds."""
    return corr.theils_u_pair(T(spark, sf_dir, "orders"),
                              "o_orderpriority", "o_orderstatus")


@register("cramers_v_orders",
          corr.oracle_cramers_v_sql("orders", "o_orderpriority",
                                    "o_orderstatus"))
def cramers_v_orders(spark, sf_dir):
    """Cramér's V — chi² normalized to [0,1], comparable across pairs
    and sample sizes; one contingency groupBy."""
    return corr.cramers_v_pair(T(spark, sf_dir, "orders"),
                               "o_orderpriority", "o_orderstatus")


@register("spearman_lineitem", corr.oracle_spearman_sql("lineitem",
                                                        _CORR_COLS))
def spearman_lineitem(spark, sf_dir):
    """Spearman rank-correlation matrix (monotone dependence, outlier-
    robust): distributed ranking via range-bucketed cumulative counts —
    no global window — and integer doubled-rank Pearson sums."""
    return corr.spearman_matrix(T(spark, sf_dir, "lineitem"), _CORR_COLS)


@register("mutual_info_lineitem",
          corr.oracle_mutual_info_pair_sql("lineitem", "l_returnflag",
                                           "l_linestatus"))
def mutual_info_lineitem(spark, sf_dir):
    """Mutual information (+ min-entropy-normalized NMI) for a
    categorical pair from one contingency groupBy — the dependence
    STRENGTH measure beside chi2_pair's independence test."""
    return corr.mutual_info_pair(T(spark, sf_dir, "lineitem"),
                                 "l_returnflag", "l_linestatus")


@register("chi2_pair_lineitem",
          corr.oracle_chi2_pair_sql("lineitem", "l_returnflag", "l_linestatus"))
def chi2_pair_lineitem(spark, sf_dir):
    return corr.chi2_matrix_pair(T(spark, sf_dir, "lineitem"),
                                 "l_returnflag", "l_linestatus")


_CROSSTAB_ORACLE = """
SELECT CAST(l_returnflag AS VARCHAR) AS l_returnflag,
       COUNT(*) FILTER (WHERE l_linestatus = 'F') AS "F",
       COUNT(*) FILTER (WHERE l_linestatus = 'O') AS "O"
FROM lineitem GROUP BY 1
"""


@register("crosstab_lineitem", _CROSSTAB_ORACLE)
def crosstab_lineitem(spark, sf_dir):
    """Contingency crosstab via pivot with explicit value list (explicit
    values keep the plan a single pass — no value-discovery job — and
    make the output schema deterministic)."""
    return (T(spark, sf_dir, "lineitem")
            .groupBy(F.col("l_returnflag").cast("string")
                     .alias("l_returnflag"))
            .pivot("l_linestatus", ["F", "O"])
            .agg(F.coalesce(F.count(F.lit(1)), F.lit(0)))
            .select("l_returnflag",
                    F.coalesce("F", F.lit(0)).alias("F"),
                    F.coalesce("O", F.lit(0)).alias("O")))


@register("graph_degree_nation",
          gr.oracle_degree_stats_sql("nation", "n_nationkey", "n_regionkey"))
def graph_degree_nation(spark, sf_dir):
    return gr.degree_stats(T(spark, sf_dir, "nation"), "n_nationkey", "n_regionkey")


@register("key_skew_lineitem",
          sk.oracle_key_skew_summary_sql("lineitem", ["l_orderkey"]))
def key_skew_lineitem(spark, sf_dir):
    """The pre-salting skew measurement on a join key: n_rows / n_keys /
    max_count / mean_count / skew_ratio — the number that decides
    between plain groupBy, AQE, and salted_agg at 100 TB."""
    return sk.key_skew_summary(T(spark, sf_dir, "lineitem"),
                               ["l_orderkey"])


@register("hot_keys_events",
          sk.oracle_hot_keys_sql("events", ["user_id"], k=5))
def hot_keys_events(spark, sf_dir):
    """Top-5 hottest event users — the isolate-and-broadcast candidate
    list. Deterministic tie-break (cnt desc, key asc),
    TakeOrderedAndProject plan."""
    return sk.hot_keys(T(spark, sf_dir, "events"), ["user_id"], k=5)


from dataprofiler_spark.operators import fuzzyjoin as fz


@register("fuzzy_pairs_customer",
          fz.oracle_fuzzy_self_pairs_sql(
              "customer", "c_custkey",
              "CAST(c_custkey AS VARCHAR)", max_dist=1))
def fuzzy_pairs_customer(spark, sf_dir):
    """Edit-distance self-join (PassJoin segment blocking + exact
    levenshtein verify): customer keys within one edit of each other
    over the natural decimal string. Deliberately UNPADDED — a
    zero-padded key puts a constant zero run at one end, and whichever
    segment falls inside it becomes one hot bucket holding most of the
    table (measured: OOM at sf0.1); the variable-length form spreads
    both segments across leading-digit buckets. The same rule at 100 TB:
    strip constant affixes from the key expression before fuzzy-joining.
    ASCII key keeps the brute-force DuckDB oracle byte/char-exact."""
    df = T(spark, sf_dir, "customer")
    return fz.fuzzy_self_pairs(
        df, "c_custkey", "c_name", max_dist=1,
        key_expr=F.col("c_custkey").cast("string"))


@register("pagerank_nation",
          gr.oracle_pagerank_sql("nation", "n_nationkey", "n_regionkey",
                                 iters=3))
def pagerank_nation(spark, sf_dir):
    """PageRank over the nation→region edge list (3 iterations,
    damping 85/100) — integer fixed-point ranks make every iteration
    bit-identical across engines (truncating div, order-independent
    integer sums)."""
    return gr.pagerank(T(spark, sf_dir, "nation"), "n_nationkey",
                       "n_regionkey", iters=3)


_COMPONENTS_ORACLE = """
WITH RECURSIVE
-- NULL is not a node: half-NULL edges keep their non-NULL endpoint as
-- an isolated node (mirrors operators/graph.connected_components)
nodes AS (
  SELECT n_nationkey AS node FROM nation WHERE n_nationkey IS NOT NULL
  UNION
  SELECT n_regionkey FROM nation WHERE n_regionkey IS NOT NULL
),
bi AS (
  SELECT n_nationkey AS src, n_regionkey AS dst FROM nation
  WHERE n_nationkey IS NOT NULL AND n_regionkey IS NOT NULL
  UNION
  SELECT n_regionkey, n_nationkey FROM nation
  WHERE n_nationkey IS NOT NULL AND n_regionkey IS NOT NULL
),
reach AS (
  SELECT node, node AS peer FROM nodes
  UNION
  SELECT r.node, b.dst FROM reach r JOIN bi b ON r.peer = b.src
),
comp AS (
  SELECT node, MIN(peer) AS component FROM reach GROUP BY node
),
sizes AS (
  SELECT component, COUNT(*) AS size FROM comp GROUP BY component
)
SELECT CAST(COUNT(*) AS BIGINT) AS num_components,
       CAST(MAX(size) AS BIGINT) AS max_component_size
FROM sizes
"""


@register("graph_components_nation", _COMPONENTS_ORACLE)
def graph_components_nation(spark, sf_dir):
    # Spark side: iterative min-label propagation (operators/graph.py);
    # oracle: recursive-CTE transitive closure (fine on a small graph —
    # the closure is quadratic, which is exactly why the distributed
    # side iterates instead).
    return gr.component_summary(T(spark, sf_dir, "nation"),
                                "n_nationkey", "n_regionkey")


