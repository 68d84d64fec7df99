"""Skew-aware aggregation — salting for hot keys.

Not in the reference (it never shuffles); essential at 100 TB: a groupBy
whose key distribution has heavy hitters stalls on the one reducer that
owns the hot key. Two mitigations ship here:

1. AQE skew-join splitting — already on via session defaults
   (spark.sql.adaptive.skewJoin.enabled) for joins.
2. ``salted_agg`` for aggregations — two-stage: groupBy (key, salt) with
   map-side partial aggregation, then groupBy key to combine. Works for
   any algebraic aggregate (sum/count/min/max — the profile battery);
   equivalent by the same partial+final algebra Catalyst uses.

Salting costs one extra (tiny) shuffle stage; use when key skew is known
(e.g. the empty-document shingle bucket, a null-ish join key, a megacity
in a geo key).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(df: DataFrame, key_cols: list[str],
               aggs: dict[str, tuple[str, str]],
               n_salts: int = 32) -> DataFrame:
    """Two-stage skew-resistant aggregation.

    ``aggs``: output_name → (input_col, fn) with fn ∈ {sum, count, min,
    max}. Example::

        salted_agg(df, ["user_id"], {"n": ("*", "count"),
                                     "total": ("value", "sum")})
    """
    salt = F.floor(F.rand(42) * n_salts).cast("int")

    stage1_aggs = []
    for name, (col, fn) in aggs.items():
        if fn == "count":
            stage1_aggs.append(F.count(F.lit(1) if col == "*" else F.col(col))
                               .alias(name))
        elif fn == "sum":
            stage1_aggs.append(F.sum(col).alias(name))
        elif fn == "min":
            stage1_aggs.append(F.min(col).alias(name))
        elif fn == "max":
            stage1_aggs.append(F.max(col).alias(name))
        else:
            raise ValueError(f"non-algebraic fn {fn!r}")
    partial = df.withColumn("__salt", salt).groupBy(*key_cols, "__salt") \
                .agg(*stage1_aggs)

    stage2_aggs = []
    for name, (col, fn) in aggs.items():
        combine = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}[fn]
        stage2_aggs.append(combine(name).alias(name))
    return partial.groupBy(*key_cols).agg(*stage2_aggs)
