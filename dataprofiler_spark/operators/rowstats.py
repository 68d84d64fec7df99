"""Dataset-level row statistics.

Reference semantics: dataprofiler/profilers/profile_builder.py —
row uniqueness via hashing every row (exact dict or HLL sketch,
:2202-2258, option ``hashing_method full|hll`` profiler_options.py:
1119-1209), ``unique_row_ratio`` (:2146-2159), ``duplicate_row_count``
(:2185-2200); row null stats as intersection/union of per-column null
index sets (:2260-2297).

Spark design: the reference materializes per-column null *index sets* and
intersects them on the driver — unbounded memory at scale. Here both row
null stats collapse into one expression pass (``nulls_in_row = Σ
when(isnull(c),1)``) and uniqueness is a single ``xxhash64`` distinct
count — exact via distinct-aggregate, or sketched via
``approx_count_distinct`` / ``hll_sketch_agg`` (mergeable) for the
streaming/merge path. No driver-side index sets anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _nulls_in_row(cols: list[str]) -> Column:
    expr = F.lit(0)
    for c in cols:
        expr = expr + F.when(F.col(c).isNull(), 1).otherwise(0)
    return expr


def row_stats(df: DataFrame, cols: list[str] | None = None,
              hashing_method: str = "full") -> DataFrame:
    """One-row DataFrame:
    (row_count, unique_row_count, duplicate_row_count, unique_row_ratio,
     rows_with_null_count, rows_all_null_count).

    ``hashing_method='full'`` → exact count of distinct rows (count
    distinct over all columns — Catalyst plans this as a two-stage
    aggregate, partial per partition, no full-row shuffle of raw data).
    ``'hll'`` → approx_count_distinct over xxhash64 of the row, the
    bounded-memory path for 100 TB (reference HLL mode,
    profile_builder.py:1679-1687).
    """
    cols = cols or df.columns
    ncols = len(cols)
    if hashing_method == "full":
        # distinct over the row STRUCT, not the column list:
        # count_distinct(a, b, ...) skips any row where one column is
        # NULL (SQL semantics), undercounting uniqueness on null-bearing
        # tables; the struct is never NULL and groups its null fields as
        # equal — matching the reference's whole-row hashing (ADVICE r1).
        uniq = F.count_distinct(F.struct(*[F.col(c) for c in cols]))
    elif hashing_method == "hll":
        uniq = F.approx_count_distinct(F.xxhash64(*[F.col(c) for c in cols]), 0.01)
    else:
        raise ValueError(f"unknown hashing_method {hashing_method!r}")

    nin = _nulls_in_row(cols)
    return df.agg(
        F.count(F.lit(1)).alias("row_count"),
        uniq.alias("unique_row_count"),
        (F.count(F.lit(1)) - uniq).alias("duplicate_row_count"),
        # nullif: an EMPTY table must yield ratio NULL, not an ANSI
        # divide-by-zero crash (empty-tables audit, r7)
        F.round(uniq / F.nullif(F.count(F.lit(1)), F.lit(0)), 6)
         .alias("unique_row_ratio"),
        F.sum(F.when(nin > 0, 1).otherwise(0)).alias("rows_with_null_count"),
        F.sum(F.when(nin == ncols, 1).otherwise(0)).alias("rows_all_null_count"),
    )


def oracle_row_stats_sql(table: str, cols: list[str]) -> str:
    """DuckDB SQL mirroring ``row_stats(hashing_method='full')``.

    Both engines count distinct whole rows with NULL fields grouping as
    equal: Spark via count_distinct over a row struct (never NULL itself),
    DuckDB via SELECT DISTINCT over all columns (DISTINCT treats NULLs as
    equal) — so null-bearing rows participate in uniqueness on both
    engines, matching the reference's whole-row hashing.
    """
    col_list = ", ".join(cols)
    null_sum = " + ".join(f"(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END)" for c in cols)
    return f"""
SELECT row_count, unique_row_count,
       row_count - unique_row_count AS duplicate_row_count,
       ROUND(CAST(unique_row_count AS DOUBLE) / NULLIF(row_count, 0), 6)
         AS unique_row_ratio,
       CAST(rows_with_null_count AS BIGINT) AS rows_with_null_count,
       CAST(rows_all_null_count AS BIGINT) AS rows_all_null_count
FROM (
  SELECT COUNT(*) AS row_count,
         (SELECT COUNT(*) FROM (SELECT DISTINCT {col_list} FROM {table})) AS unique_row_count,
         SUM(CASE WHEN ({null_sum}) > 0 THEN 1 ELSE 0 END) AS rows_with_null_count,
         SUM(CASE WHEN ({null_sum}) = {len(cols)} THEN 1 ELSE 0 END) AS rows_all_null_count
  FROM {table}
)"""


def referential_integrity(child: "DataFrame", parent: "DataFrame",
                          fk: str, pk: str, round_digits: int = 6) -> "DataFrame":
    """(n_child, n_orphans, orphan_ratio, n_parent, n_referenced,
    coverage_ratio): FK → PK integrity profile across two tables — the
    cross-table data-quality check the reference lacks (it profiles one
    table at a time). Plan: left-anti join for orphans + one distinct-join
    for coverage; both shuffle on the key, broadcast when the parent PK
    set is small."""
    n_child = child.count()
    n_parent = parent.count()
    orphans = child.join(parent, child[fk] == parent[pk], "left_anti").count()
    referenced = (parent.join(child.select(F.col(fk).alias(pk)).distinct(),
                              pk, "left_semi").count())
    spark = child.sparkSession
    return spark.createDataFrame(
        [(n_child, orphans,
          round(orphans / n_child, round_digits) if n_child else None,
          n_parent, referenced,
          round(referenced / n_parent, round_digits) if n_parent else None)],
        "n_child long, n_orphans long, orphan_ratio double, "
        "n_parent long, n_referenced long, coverage_ratio double")


def oracle_referential_integrity_sql(child: str, parent: str,
                                     fk: str, pk: str,
                                     round_digits: int = 6) -> str:
    return f"""
SELECT (SELECT COUNT(*) FROM {child}) AS n_child,
       (SELECT COUNT(*) FROM {child} c
        WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk})) AS n_orphans,
       ROUND(CAST((SELECT COUNT(*) FROM {child} c
              WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.{fk}))
             AS DOUBLE) / (SELECT COUNT(*) FROM {child}), {round_digits}) AS orphan_ratio,
       (SELECT COUNT(*) FROM {parent}) AS n_parent,
       (SELECT COUNT(*) FROM {parent} p
        WHERE EXISTS (SELECT 1 FROM {child} c WHERE c.{fk} = p.{pk})) AS n_referenced,
       ROUND(CAST((SELECT COUNT(*) FROM {parent} p
              WHERE EXISTS (SELECT 1 FROM {child} c WHERE c.{fk} = p.{pk}))
             AS DOUBLE) / (SELECT COUNT(*) FROM {parent}), {round_digits}) AS coverage_ratio
"""
