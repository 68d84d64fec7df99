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


def key_skew_summary(df: DataFrame, key_cols: list[str],
                     round_digits: int = 6) -> DataFrame:
    """The "should I salt this key?" measurement: one row of
    (n_rows, n_keys, max_count, mean_count, skew_ratio) where
    skew_ratio = max_count / mean_count — the factor by which the
    hottest reducer outweighs the average one. Rule of thumb: ratios
    in the tens → AQE handles it; hundreds+ → salt (salted_agg) or
    isolate the hot keys.

    NULL keys group together (their own, frequently-hot, key — exactly
    what the measurement should surface, not hide).

    Plan: ONE groupBy(keys) + ONE tiny rollup of the count column —
    two shuffles, the second over n_keys rows."""
    counts = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count(F.lit(1)).alias("cnt"))
    return counts.agg(
        F.sum("cnt").alias("n_rows"),
        F.count(F.lit(1)).alias("n_keys"),
        F.max("cnt").alias("max_count"),
        F.round(F.sum("cnt") / F.count(F.lit(1)), round_digits)
        .alias("mean_count"),
        # double-FIRST: the integer product max_count * n_keys can pass
        # int64 at petabyte row counts (mirrors the oracle's CAST order)
        F.round(F.max("cnt").cast("double") * F.count(F.lit(1))
                / F.sum("cnt"), round_digits).alias("skew_ratio"),
    )


def hot_keys(df: DataFrame, key_cols: list[str], k: int = 5) -> DataFrame:
    """The k hottest keys (key..., cnt, rank) — the candidates for
    isolate-and-broadcast handling. Deterministic ties: count desc,
    then key columns asc. Distributed TakeOrderedAndProject."""
    from dataprofiler_spark.operators.topk import ranked_topk

    counts = df.groupBy(*[F.col(c) for c in key_cols]).agg(
        F.count(F.lit(1)).alias("cnt"))
    # nulls LAST on the tie-break: Spark's ASC defaults nulls-first,
    # DuckDB's defaults nulls-last — a NULL key tying a real key on
    # count would otherwise rank differently per engine
    order = [F.desc("cnt")] + [F.asc_nulls_last(c) for c in key_cols]
    return ranked_topk(counts, order, k).select(
        "rank", *key_cols, "cnt")


def oracle_key_skew_summary_sql(table: str, key_cols: list[str],
                                round_digits: int = 6) -> str:
    keys = ", ".join(key_cols)
    return f"""
WITH counts AS (
  SELECT {keys}, COUNT(*) AS cnt FROM {table} GROUP BY {keys}
)
SELECT CAST(SUM(cnt) AS BIGINT) AS n_rows,
       COUNT(*) AS n_keys,
       MAX(cnt) AS max_count,
       ROUND(CAST(SUM(cnt) AS DOUBLE) / COUNT(*), {round_digits})
         AS mean_count,
       ROUND(CAST(MAX(cnt) AS DOUBLE) * COUNT(*) / SUM(cnt),
             {round_digits}) AS skew_ratio
FROM counts
"""


def oracle_hot_keys_sql(table: str, key_cols: list[str],
                        k: int = 5) -> str:
    keys = ", ".join(key_cols)
    order = "cnt DESC, " + ", ".join(f"{c} ASC" for c in key_cols)
    return f"""
WITH counts AS (
  SELECT {keys}, COUNT(*) AS cnt FROM {table} GROUP BY {keys}
)
SELECT CAST(rank AS INT) AS rank, {keys}, cnt FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY {order}) AS rank FROM counts)
WHERE rank <= {k}
"""


def skew_join(left: DataFrame, right: DataFrame, key: str,
              hot_threshold: int = 1_000_000,
              max_hot_keys: int = 10_000,
              how: str = "inner") -> DataFrame:
    """Hot-key split join: result-identical to ``left.join(right, key,
    how)`` but immune to a handful of mega-keys stalling one reducer.

    The classic pattern AQE's skew-join splitting generalizes, exposed
    as an explicit operator for when you KNOW hot keys exist (AQE splits
    oversized partitions, but a single key's rows still co-locate; the
    split join instead broadcasts the hot keys' RIGHT side, so the hot
    LEFT rows never shuffle at all):

    1. Count left keys once; keys above ``hot_threshold`` rows are hot.
       The hot-key FRAME (at most |left| / hot_threshold keys by
       construction) routes the split via BROADCAST semi/anti joins —
       key values never collect to the driver and never become literal
       expressions (an isin() with thousands of literals is its own
       scale bug).
    2. cold LEFT ⋈ cold RIGHT: the normal shuffle join, hot keys
       anti-joined off BOTH sides (their partitions stay balanced).
    3. hot LEFT ⋈ broadcast(hot RIGHT): map-side, no shuffle of the
       hot rows. Requires the hot keys' right side to fit in a
       broadcast — true in the dimension-skew case this pattern
       targets; a hot key with a HUGE right side is a genuine
       cross-product and no join strategy saves it.
    4. Union. Supported ``how``: inner / left (semantics preserved
       per-row because every row routes to exactly one branch by its
       key's hotness). NULL join keys never match (standard equi-join)
       and route cold (anti-join keeps them).

    ``max_hot_keys``: if more keys clear the threshold than this, the
    key space isn't "a few mega-keys" — it's a uniform-ish
    distribution where the split buys nothing and the broadcast grows
    unbounded; fall back to the plain join (AQE handles partition-level
    imbalance) with a log note.

    WHEN TO USE (measured, SCALE.md §30): at small scale the plain AQE
    join WINS (0.4 s vs 1.4 s on the sf0.1 mega-key bench) — the split's
    ~4 extra small jobs outweigh a hot partition one reducer absorbs
    easily. Reach for skew_join only when key_skew_stats shows a top
    key larger than ~1 executor-partition of rows AND the hot keys'
    right side fits a broadcast; otherwise let AQE handle it."""
    import logging

    if how not in ("inner", "left"):
        raise ValueError(f"skew_join supports inner/left, got {how!r}")
    hk = (left.groupBy(key).agg(F.count(F.lit(1)).alias("__c"))
          .where(F.col("__c") > hot_threshold)
          .where(F.col(key).isNotNull())
          .select(key))
    # Materialize the hot-key frame ONCE: it is referenced by four
    # joins below, and without this each reference re-runs the full
    # groupBy over `left` (measured 4.99 s vs 1.5 s for the plain join
    # on the sf0.1 mega-key bench before this checkpoint). LIMIT first
    # so a uniform key space (the fallback case) never materializes an
    # unbounded frame; when the guard passes, the limited frame holds
    # ALL hot keys.
    hk = hk.limit(max_hot_keys + 1).localCheckpoint(eager=True)
    n_hot = hk.count()
    if n_hot == 0:
        return left.join(right, key, how)
    if n_hot > max_hot_keys:
        logging.getLogger("dataprofiler_spark").warning(
            "skew_join: >%d keys exceed hot_threshold=%d — not a "
            "mega-key skew; falling back to the plain join (AQE)",
            max_hot_keys, hot_threshold)
        return left.join(right, key, how)
    hkb = F.broadcast(hk)
    cold = (left.join(hkb, key, "left_anti")
            .join(right.join(hkb, key, "left_anti"), key, how))
    hot = (left.join(hkb, key, "left_semi")
           .join(F.broadcast(right.join(hkb, key, "left_semi")),
                 key, how))
    return cold.unionAll(hot)
