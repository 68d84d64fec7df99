"""Float precision statistics.

Reference: float_column_profile.py:277-396 — significant digits per cell
via regex stripping (sign/leading zeros/trailing zeros/exponent), then
min/max/mean/var/std + margin of error at z=3.291 (99.9%), sampled at
``min(n, max(20000, 0.05n))`` cells (:302).

Spark design: the reference's single strip regex uses lookbehind, which
RE2 (and thus a portable oracle) lacks — re-expressed as a 4-step strip
pipeline with identical semantics on every engine. Stats ride the exact
integer-sum battery (precision is a small integer), so results are
engine-reproducible with no rounding risk.

Overflow: precision values are ≤ ~40 (digits of a stringified double), so
the decimal(38,0) products n·s2 ≤ 1600·n² only overflow past n ≈ 2.5e17
rows — 5 orders beyond a 100 TB table. No fallback needed (cf. the
min-pivot + coalesce treatment in operators/numeric.py / correlation.py,
where cell magnitudes are unbounded).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Z_999 = 3.291  # float_column_profile.py margin-of-error z-score


def precision_expr(col: str) -> Column:
    """Significant-digit count of the stringified cell."""
    s = F.lower(F.col(col).cast("string"))
    t = F.regexp_replace(s, r"[eE].*", "")          # drop exponent part
    t = F.regexp_replace(t, r"\.?0+$", "")           # trailing zero run
    t = F.regexp_replace(t, r"^[+\-.0\s]+", "")      # leading sign/zeros/dots
    t = F.regexp_replace(t, r"[^0-9]", "")           # leftover dot
    return F.length(t)


def _duck_precision(col: str) -> str:
    s = f"LOWER(CAST({col} AS VARCHAR))"
    t = f"regexp_replace({s}, '[eE].*', '')"
    t = f"regexp_replace({t}, '\\.?0+$', '')"
    t = f"regexp_replace({t}, '^[+\\-.0\\s]+', '')"
    t = f"regexp_replace({t}, '[^0-9]', '', 'g')"
    return f"LENGTH({t})"


def precision_stats(df: DataFrame, cols: list[str],
                    round_digits: int = 6) -> DataFrame:
    """(column, min_prec, max_prec, mean_prec, var_prec, std_prec,
    margin_of_error) — one wide agg; integer sums → deterministic."""
    exprs = []
    for c in cols:
        p = precision_expr(c).cast("decimal(19,0)")
        exprs.extend([
            F.count(F.col(c)).alias(f"{c}__n"),
            F.min(p).cast("long").alias(f"{c}__min"),
            F.max(p).cast("long").alias(f"{c}__max"),
            F.sum(p.cast("decimal(38,0)")).alias(f"{c}__s1"),
            F.sum((p * p).cast("decimal(38,0)")).alias(f"{c}__s2"),
        ])
    row = df.agg(*exprs)
    structs = []
    for c in cols:
        n = F.col(f"{c}__n")
        s1 = F.col(f"{c}__s1")
        s2 = F.col(f"{c}__s2")
        mean = s1.cast("double") / n
        var = (n * s2 - s1 * s1).cast("double") / n / (n - 1)
        std = F.sqrt(var)
        moe = F.lit(Z_999) * std / F.sqrt(n.cast("double"))
        structs.append(F.struct(
            F.lit(c).alias("column"),
            F.col(f"{c}__min").alias("min_prec"),
            F.col(f"{c}__max").alias("max_prec"),
            F.round(mean, round_digits).alias("mean_prec"),
            F.round(var, round_digits).alias("var_prec"),
            F.round(std, round_digits).alias("std_prec"),
            F.round(moe, round_digits).alias("margin_of_error"),
        ))
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def oracle_precision_stats_sql(table: str, cols: list[str],
                               round_digits: int = 6) -> str:
    selects = []
    for c in cols:
        p = _duck_precision(c)
        var = ("CAST(CAST(p.n AS HUGEINT) * CAST(p.s2 AS HUGEINT)"
               " - CAST(p.s1 AS HUGEINT) * CAST(p.s1 AS HUGEINT) AS DOUBLE)"
               " / p.n / (p.n - 1)")
        selects.append(f"""
SELECT '{c}' AS "column", p.mn AS min_prec, p.mx AS max_prec,
       ROUND(CAST(p.s1 AS DOUBLE) / p.n, {round_digits}) AS mean_prec,
       ROUND({var}, {round_digits}) AS var_prec,
       ROUND(SQRT({var}), {round_digits}) AS std_prec,
       ROUND({Z_999} * SQRT({var}) / SQRT(CAST(p.n AS DOUBLE)), {round_digits}) AS margin_of_error
FROM (
  SELECT COUNT({c}) AS n,
         CAST(MIN({p}) AS BIGINT) AS mn, CAST(MAX({p}) AS BIGINT) AS mx,
         SUM(CAST({p} AS DECIMAL(38,0))) AS s1,
         SUM(CAST(CAST({p} AS DECIMAL(19,0)) * CAST({p} AS DECIMAL(19,0)) AS DECIMAL(38,0))) AS s2
  FROM {table}
) p""")
    return "\nUNION ALL\n".join(selects)
