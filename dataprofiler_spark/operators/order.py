"""Order (sortedness) detection.

Reference semantics: dataprofiler/profilers/order_column_profile.py —
single scan classifying a column as ascending / descending / constant
value / random (:372-413), with piecewise merge rules across batches
(_merge_order:133-243, _is_intersecting:62-99, _is_enveloping:101-130).

Spark design: DataFrames are unordered, so "input order" must be pinned
explicitly (SURVEY §7.4 risk 2). The operator takes an ordering key; the
scan-order variant uses ``monotonically_increasing_id`` right after read
(valid per-file/partition order for parquet). Classification needs only
two counts — adjacent ascending pairs and adjacent descending pairs —
from one ``lag`` window. At scale the window over a global ordering is a
single range-partitioned sort; for per-partition order semantics swap the
global window for ``Window.partitionBy(spark_partition_id())``, which
needs no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def order_profile(df: DataFrame, col: str, order_by: list[str]) -> DataFrame:
    """(column, n_pairs, asc_pairs, desc_pairs, eq_pairs, order) where
    order ∈ {ascending, descending, constant value, random} following
    order_column_profile.py:372-413: constant if all equal; ascending if
    no descending violation; descending if no ascending violation."""
    w = Window.orderBy(*[F.col(c) for c in order_by])
    prev = F.lag(F.col(col)).over(w)
    pairs = df.select(
        F.col(col).alias("v"), prev.alias("p")
    ).where(F.col("p").isNotNull())
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(F.col("v") > F.col("p"), 1).otherwise(0)).alias("asc_pairs"),
        F.sum(F.when(F.col("v") < F.col("p"), 1).otherwise(0)).alias("desc_pairs"),
        F.sum(F.when(F.col("v") == F.col("p"), 1).otherwise(0)).alias("eq_pairs"),
    )
    order = (
        F.when((F.col("asc_pairs") == 0) & (F.col("desc_pairs") == 0), "constant value")
        .when(F.col("desc_pairs") == 0, "ascending")
        .when(F.col("asc_pairs") == 0, "descending")
        .otherwise("random")
    )
    return agg.select(F.lit(col).alias("column"), "n_pairs", "asc_pairs",
                      "desc_pairs", "eq_pairs", order.alias("order"))


def oracle_order_profile_sql(table: str, col: str, order_by: list[str]) -> str:
    ob = ", ".join(order_by)
    return f"""
WITH pairs AS (
  SELECT {col} AS v, LAG({col}) OVER (ORDER BY {ob}) AS p FROM {table}
), agg AS (
  SELECT COUNT(*) AS n_pairs,
         SUM(CASE WHEN v > p THEN 1 ELSE 0 END) AS asc_pairs,
         SUM(CASE WHEN v < p THEN 1 ELSE 0 END) AS desc_pairs,
         SUM(CASE WHEN v = p THEN 1 ELSE 0 END) AS eq_pairs
  FROM pairs WHERE p IS NOT NULL
)
SELECT '{col}' AS "column", n_pairs,
       CAST(asc_pairs AS BIGINT) AS asc_pairs,
       CAST(desc_pairs AS BIGINT) AS desc_pairs,
       CAST(eq_pairs AS BIGINT) AS eq_pairs,
       CASE WHEN asc_pairs = 0 AND desc_pairs = 0 THEN 'constant value'
            WHEN desc_pairs = 0 THEN 'ascending'
            WHEN asc_pairs = 0 THEN 'descending'
            ELSE 'random' END AS "order"
FROM agg
"""
