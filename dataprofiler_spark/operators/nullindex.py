"""Per-null-type row indices, capped — ``null_types_index`` parity.

Reference: profile_builder.py:536-676 builds ``null_types_index``: for
every column a dict {null cell value → row indices} (keyed by the LITERAL
matched cell, e.g. "NaN", "", "  "); report_helpers.py:260-330 caps the
indices shown. Round 1 shipped counts only (VERDICT missing-#4).

Spark design: DataFrames have no row order, so the caller names a row-id
column (natural key or a precomputed id). One melted projection keeps
only null-matching cells — (column, null_type, row_id) — then:

* totals: one groupBy (exact count per (column, null_type));
* capped ids: the salted two-stage rank (local row_number within
  (column, null_type, salt) keeps ≤ P·cap candidates — any of the true
  smallest cap ids beats < cap rows globally, so < cap within its salt
  group — then a final rank over the bounded survivors). No null-type's
  full index set ever sorts in one partition, and at most cap rows per
  group reach the output.

SQL NULL cells (no literal value to key by) use the ``<sql_null>``
sentinel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from dataprofiler_spark.functions.nulls import DEFAULT_NULL_SPEC, NullSpec

SQL_NULL = "<sql_null>"
_SALT = 32


def null_type_indices(df: DataFrame, cols: list[str], row_id_col: str,
                      spec: NullSpec = DEFAULT_NULL_SPEC,
                      cap: int = 100) -> DataFrame:
    """(column, null_type, null_count, row_id): per (column, null-type)
    the exact total count plus the ``cap`` smallest matching row ids,
    one output row per kept id."""
    entries = []
    for c in cols:
        v = F.col(c).cast("string")
        entries.append(F.when(
            spec.is_null(F.col(c)),
            F.struct(F.lit(c).alias("column"),
                     F.coalesce(v, F.lit(SQL_NULL)).alias("null_type"),
                     F.col(row_id_col).cast("long").alias("row_id"))))
    melted = (df.select(F.explode(F.array(*entries)).alias("e"))
              .where(F.col("e").isNotNull()).select("e.*"))

    totals = melted.groupBy("column", "null_type").agg(
        F.count(F.lit(1)).alias("null_count"))

    w_local = Window.partitionBy(
        "column", "null_type", F.pmod(F.xxhash64("row_id"), F.lit(_SALT))
    ).orderBy("row_id")
    w_final = Window.partitionBy("column", "null_type").orderBy("row_id")
    kept = (melted
            .withColumn("rl", F.row_number().over(w_local))
            .where(F.col("rl") <= cap)
            .withColumn("rn", F.row_number().over(w_final))
            .where(F.col("rn") <= cap)
            .select("column", "null_type", "row_id"))
    return kept.join(F.broadcast(totals), ["column", "null_type"]) \
        .select("column", "null_type", "null_count", "row_id")


def oracle_null_type_indices_sql(table: str, cols: list[str],
                                 row_id_col: str,
                                 spec: NullSpec = DEFAULT_NULL_SPEC,
                                 cap: int = 100) -> str:
    """DuckDB mirror: same null regex, same sentinel, same cap."""
    regex = spec.regex().replace("'", "''")
    parts = []
    for c in cols:
        parts.append(
            f"SELECT '{c}' AS \"column\","
            f" COALESCE(CAST({c} AS VARCHAR), '{SQL_NULL}') AS null_type,"
            f" CAST({row_id_col} AS BIGINT) AS row_id FROM {table}"
            f" WHERE {c} IS NULL"
            f" OR regexp_matches(CAST({c} AS VARCHAR), '{regex}')")
    melted = "\nUNION ALL\n".join(parts)
    return f"""
WITH m AS ({melted}),
     t AS (SELECT "column", null_type, COUNT(*) AS null_count
           FROM m GROUP BY 1, 2),
     r AS (SELECT "column", null_type, row_id,
                  ROW_NUMBER() OVER (PARTITION BY "column", null_type
                                     ORDER BY row_id) AS rn
           FROM m)
SELECT r."column", r.null_type, t.null_count, r.row_id
FROM r JOIN t USING ("column", null_type)
WHERE r.rn <= {cap}
"""
