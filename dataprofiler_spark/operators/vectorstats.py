"""Vector (embedding) column profiling — per-dimension statistics.

Embedding columns (array<float>) are first-class in a training-data
pipeline: per-dimension mean/std catch collapsed or dead dimensions,
norm stats catch unnormalized batches. Plan: posexplode → ONE groupBy on
the dimension index (64–4096 groups — trivially small shuffle); scaled-
integer sums keep the results engine-exact (fp32 inputs scale cleanly at
1e6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_S = 1_000_000.0  # embeddings live in [-1, 1]; 1e-6 resolution


def embedding_dim_stats(df: DataFrame, vec_col: str,
                        round_digits: int = 6) -> DataFrame:
    """(dim, n, mean, stddev, min, max) per vector dimension."""
    exploded = df.select(
        F.posexplode(F.col(vec_col)).alias("dim", "x")
    ).select("dim", F.col("x").cast("double").alias("x"))
    xi = F.round(F.col("x") * _S, 0).cast("decimal(19,0)")
    agg = exploded.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xi.cast("decimal(38,0)")).alias("s1"),
        F.sum((xi * xi).cast("decimal(38,0)")).alias("s2"),
        F.round(F.min("x"), round_digits).alias("min"),
        F.round(F.max("x"), round_digits).alias("max"),
    )
    n = F.col("n")
    s1 = F.col("s1")
    s2 = F.col("s2")
    var = (n * s2 - s1 * s1).cast("double") / n / (n - 1) / (_S * _S)
    return agg.select(
        "dim", "n",
        F.round(s1.cast("double") / n / _S, round_digits).alias("mean"),
        F.round(F.sqrt(var), round_digits).alias("stddev"),
        "min", "max",
    )


def oracle_embedding_dim_stats_sql(table: str, vec_col: str, dim: int = 64,
                                   round_digits: int = 6) -> str:
    xi = f"CAST(ROUND(x * {_S}, 0) AS DECIMAL(19,0))"
    var = ("CAST(CAST(n AS HUGEINT) * CAST(s2 AS HUGEINT)"
           " - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT) AS DOUBLE)"
           f" / n / (n - 1) / ({_S} * {_S})")
    return f"""
WITH e AS (
  SELECT CAST(t.i - 1 AS INT) AS dim,
         CAST(({vec_col}::DOUBLE[])[CAST(t.i AS INT)] AS DOUBLE) AS x,
         {xi.replace('x *', f'CAST(({vec_col}::DOUBLE[])[CAST(t.i AS INT)] AS DOUBLE) *')} AS xi
  FROM {table} CROSS JOIN range(1, {dim + 1}) t(i)
), agg AS (
  SELECT dim, COUNT(*) AS n,
         SUM(CAST(xi AS DECIMAL(38,0))) AS s1,
         SUM(CAST(xi * xi AS DECIMAL(38,0))) AS s2,
         ROUND(MIN(x), {round_digits}) AS min,
         ROUND(MAX(x), {round_digits}) AS max
  FROM e GROUP BY dim
)
SELECT dim, n,
       ROUND(CAST(s1 AS DOUBLE) / n / {_S}, {round_digits}) AS mean,
       ROUND(SQRT({var}), {round_digits}) AS stddev,
       min, max
FROM agg
"""


def norm_stats(df: DataFrame, vec_col: str, round_digits: int = 6) -> DataFrame:
    """(n_vectors, mean_norm, min_norm, max_norm): L2-norm profile —
    catches unnormalized embedding batches before they poison cosine
    search. Sequential-fold dot products (engine-exact)."""
    dot = F.aggregate(
        F.zip_with(F.col(vec_col), F.col(vec_col),
                   lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v)
    norms = df.select(F.sqrt(dot).alias("nrm"))
    return norms.agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.round(F.avg("nrm"), round_digits).alias("mean_norm"),
        F.round(F.min("nrm"), round_digits).alias("min_norm"),
        F.round(F.max("nrm"), round_digits).alias("max_norm"),
    )
