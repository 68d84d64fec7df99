"""Distributed top-k finalization.

The one pattern every top-k in this engine shares: the *selection* of the k
winners must be distributed, and only the *rank assignment* may touch a
single partition — over exactly k rows.

``ranked_topk`` compiles the selection to ``TakeOrderedAndProject`` (Spark's
distributed top-k physical operator: each partition keeps its local k, the
driver merges per-partition heaps — no full sort, no single-partition
shuffle of all candidates). The rank column is then assigned with a window
over a constant partition key, which at that point holds only k rows, so
the "single partition" is k rows by construction, not the whole dataset.

This replaces the round-1 anti-pattern ``Window.orderBy(...).row_number()``
with no partitionBy, which moved every candidate row to one partition
(reference semantics: top-k truncations only — numerical_column_stats.py:61
top-5 modes, categorical_column_profile.py:376-381 top-k categories,
unstructured_text_profile.py:651-665 top-k words).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ranked_topk(df: DataFrame, order: list[Column], k: int,
                rank_col: str = "rank") -> DataFrame:
    """Top-k rows of ``df`` by ``order`` with a 1-based ``rank_col``.

    Physical plan: TakeOrderedAndProject (distributed per-partition heaps)
    for the limit, then a k-row window for the rank. Asserted in
    tests/test_plans.py::test_topk_is_take_ordered.
    """
    from pyspark.sql.window import Window

    top = df.orderBy(*order).limit(k)
    # Constant-but-non-foldable partition key: floor(rand(42)·0) ≡ 0 for
    # every row, but rand() is nondeterministic so Catalyst cannot fold
    # it away (partitionBy(lit(0)) folds to an EMPTY partition spec,
    # which makes WindowExec emit its single-partition warning even
    # though the input here is k rows by construction). The value is
    # deterministic — only the foldability is defeated.
    w = Window.partitionBy(F.floor(F.rand(42) * F.lit(0.0))).orderBy(*order)
    return top.withColumn(rank_col, F.row_number().over(w))
