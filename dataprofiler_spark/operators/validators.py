"""Column validators.

Reference: validators/base_validators.py:12-39 (is_in_range, is_in_list),
validate():51-160 — column-wise predicates returning per-column pass
counts / failing rows.

Spark design: each rule compiles to one boolean Column; all rules
evaluate in ONE agg pass (sum(when(...))); failing-row retrieval is a
filter the caller can limit — never a driver-side index list.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    column: str
    kind: str              # in_range | in_list | not_null | matches
    low: float | None = None
    high: float | None = None
    values: tuple = ()
    pattern: str | None = None

    def expr(self) -> Column:
        c = F.col(self.column)
        if self.kind == "in_range":
            return c.between(self.low, self.high)
        if self.kind == "in_list":
            return c.cast("string").isin(*[str(v) for v in self.values])
        if self.kind == "not_null":
            return c.isNotNull()
        if self.kind == "matches":
            return c.cast("string").rlike(self.pattern)
        raise ValueError(self.kind)

    @property
    def name(self) -> str:
        return f"{self.column}:{self.kind}"


def validate(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule, passed, failed, pass_ratio) — one pass for all rules."""
    exprs = [F.count(F.lit(1)).alias("__n")]
    for r in rules:
        exprs.append(F.sum(F.when(r.expr(), 1).otherwise(0)).alias(r.name))
    row = df.agg(*exprs)
    structs = [
        F.struct(
            F.lit(r.name).alias("rule"),
            F.col(r.name).alias("passed"),
            (F.col("__n") - F.col(r.name)).alias("failed"),
            F.round(F.col(r.name) / F.col("__n"), 6).alias("pass_ratio"),
        )
        for r in rules
    ]
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


def failing_rows(df: DataFrame, rule: Rule, limit: int = 100) -> DataFrame:
    return df.where(~rule.expr()).limit(limit)


def oracle_validate_sql(table: str, rules: list[Rule]) -> str:
    selects = []
    for r in rules:
        if r.kind == "in_range":
            cond = f"{r.column} BETWEEN {r.low} AND {r.high}"
        elif r.kind == "in_list":
            vals = ", ".join(f"'{v}'" for v in r.values)
            cond = f"CAST({r.column} AS VARCHAR) IN ({vals})"
        elif r.kind == "not_null":
            cond = f"{r.column} IS NOT NULL"
        elif r.kind == "matches":
            cond = f"regexp_matches(CAST({r.column} AS VARCHAR), '{r.pattern}')"
        else:
            raise ValueError(r.kind)
        selects.append(f"""
SELECT '{r.name}' AS rule,
       CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS passed,
       CAST(COUNT(*) - SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS BIGINT) AS failed,
       ROUND(CAST(SUM(CASE WHEN {cond} THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*), 6) AS pass_ratio
FROM {table}""")
    return "\nUNION ALL\n".join(selects)
