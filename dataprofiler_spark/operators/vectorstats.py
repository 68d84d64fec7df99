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
  -- t.i <= len(v) mirrors Spark's posexplode: NULL / short vectors
  -- contribute no rows past their length (COUNT would otherwise
  -- include NULL-x rows the Spark side never sees)
  SELECT CAST(t.i - 1 AS INT) AS dim,
         CAST(({vec_col}::DOUBLE[])[CAST(t.i AS INT)] AS DOUBLE) AS x,
         {xi.replace('x *', f'CAST(({vec_col}::DOUBLE[])[CAST(t.i AS INT)] AS DOUBLE) *')} AS xi
  FROM {table} CROSS JOIN range(1, {dim + 1}) t(i)
  WHERE {vec_col} IS NOT NULL AND t.i <= len({vec_col}::DOUBLE[])
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


# embedding_covariance explodes n·d²/2 rows of CPU; above this dim the
# caller must either sample rows first (operators/sampling.hash_sample —
# the estimate converges long before the full corpus) or explicitly
# accept the cost with max_dim=None. Same loud-cap discipline as
# nbclassify.MAX_STATE_CELLS / clustering.MAX_AUDIT_LABELS.
MAX_COV_DIM = 1024


def embedding_covariance(df: DataFrame, vec_col: str,
                         round_digits: int = 9,
                         max_dim: int | None = MAX_COV_DIM) -> DataFrame:
    """(d1, d2, n, cov, corr) for every dimension pair d1 ≤ d2 — the
    covariance/correlation structure of an embedding column. High
    off-diagonal correlation means anisotropy (embeddings collapsed
    toward a cone — the known failure mode of contrastive encoders);
    this is the measurement you take before deciding to whiten or to
    trust raw cosine similarity.

    Plan: double posexplode builds (d1, x1, d2, x2) MAP-SIDE (no join —
    the upper-triangle filter halves it), then ONE groupBy on (d1, d2):
    d·(d+1)/2 groups, so the shuffle moves only partial aggregates.
    Every sum is per-pair and scaled-integer, which makes ragged/NULL
    vectors well-defined (a pair's n counts rows carrying BOTH dims) and
    the results engine-exact. The exploded stream is n·d²/2 rows of CPU
    (not memory — partial aggregation collapses it); at dim > ``max_dim``
    (default ``MAX_COV_DIM``) the operator REFUSES rather than silently
    launching the d²/2 explode — hash-sample rows first
    (operators/sampling.py; the estimate converges long before the full
    corpus) or pass ``max_dim=None`` to accept the cost explicitly. The
    probe is one cheap 1-row agg of max(size(vec)).

    Zero-variance dimensions yield corr = NULL (the correlation_matrix
    contract)."""
    if max_dim is not None:
        probe = (df.where(F.col(vec_col).isNotNull())
                 .agg(F.max(F.size(F.col(vec_col))).alias("d"))
                 .collect()[0]["d"])
        if probe is not None and probe > max_dim:
            raise ValueError(
                f"embedding_covariance: dim={probe} exceeds max_dim="
                f"{max_dim} — the pair explode is n*d^2/2 rows of CPU "
                f"({probe * (probe + 1) // 2:,} exploded rows PER "
                "VECTOR). hash_sample rows first "
                "(dataprofiler_spark.operators.sampling.hash_sample) or "
                "pass max_dim=None to accept the cost explicitly")
    from dataprofiler_spark.session import ensure_parallelism

    # the d²/2 pair explode is the CPU hot spot: don't let a single
    # input split serialize it (no-op at real scale); every aggregate
    # below is count/decimal-sum — partition-order independent
    df = ensure_parallelism(df)
    exploded = (df
                .where(F.col(vec_col).isNotNull())
                .select(F.posexplode(F.col(vec_col)).alias("d1", "x1"),
                        F.col(vec_col).alias("__v"))
                .select("d1", F.col("x1").cast("double").alias("x1"),
                        F.posexplode(F.col("__v")).alias("d2", "x2"))
                .where(F.col("d2") >= F.col("d1"))
                .select("d1", "x1", "d2",
                        F.col("x2").cast("double").alias("x2")))
    i1 = F.round(F.col("x1") * _S, 0).cast("decimal(19,0)")
    i2 = F.round(F.col("x2") * _S, 0).cast("decimal(19,0)")
    agg = exploded.groupBy("d1", "d2").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(i1.cast("decimal(38,0)")).alias("s1"),
        F.sum(i2.cast("decimal(38,0)")).alias("s2"),
        F.sum((i1 * i1).cast("decimal(38,0)")).alias("s11"),
        F.sum((i2 * i2).cast("decimal(38,0)")).alias("s22"),
        F.sum((i1 * i2).cast("decimal(38,0)")).alias("s12"),
    )
    n, s1, s2 = F.col("n"), F.col("s1"), F.col("s2")
    num = (n * F.col("s12") - s1 * s2).cast("double")
    den1 = (n * F.col("s11") - s1 * s1).cast("double")
    den2 = (n * F.col("s22") - s2 * s2).cast("double")
    cov = num / n / (n - 1) / (_S * _S)
    corr = F.when((den1 > 0) & (den2 > 0),
                  num / (F.sqrt(den1) * F.sqrt(den2)))
    return agg.select(
        "d1", "d2", "n",
        F.round(cov, round_digits).alias("cov"),
        F.round(corr, round_digits).alias("corr"),
    )


def oracle_embedding_covariance_sql(table: str, vec_col: str,
                                    dim: int = 64,
                                    round_digits: int = 9) -> str:
    v = f"{vec_col}::DOUBLE[]"
    x1 = f"CAST(({v})[CAST(t1.i AS INT)] AS DOUBLE)"
    x2 = f"CAST(({v})[CAST(t2.i AS INT)] AS DOUBLE)"
    i1 = f"CAST(ROUND({x1} * {_S}, 0) AS DECIMAL(19,0))"
    i2 = f"CAST(ROUND({x2} * {_S}, 0) AS DECIMAL(19,0))"
    return f"""
WITH e AS (
  SELECT CAST(t1.i - 1 AS INT) AS d1, CAST(t2.i - 1 AS INT) AS d2,
         {i1} AS i1, {i2} AS i2
  FROM {table}
  CROSS JOIN range(1, {dim + 1}) t1(i)
  CROSS JOIN range(1, {dim + 1}) t2(i)
  WHERE {vec_col} IS NOT NULL
    AND t1.i <= len({v}) AND t2.i <= len({v})
    AND t2.i >= t1.i
), agg AS (
  SELECT d1, d2, COUNT(*) AS n,
         SUM(CAST(i1 AS DECIMAL(38,0))) AS s1,
         SUM(CAST(i2 AS DECIMAL(38,0))) AS s2,
         SUM(CAST(i1 * i1 AS DECIMAL(38,0))) AS s11,
         SUM(CAST(i2 * i2 AS DECIMAL(38,0))) AS s22,
         SUM(CAST(i1 * i2 AS DECIMAL(38,0))) AS s12
  FROM e GROUP BY d1, d2
)
SELECT d1, d2, n,
       ROUND(CAST(CAST(n AS HUGEINT) * CAST(s12 AS HUGEINT)
                  - CAST(s1 AS HUGEINT) * CAST(s2 AS HUGEINT) AS DOUBLE)
             / n / (n - 1) / ({_S} * {_S}), {round_digits}) AS cov,
       ROUND(CASE WHEN CAST(CAST(n AS HUGEINT) * CAST(s11 AS HUGEINT)
                            - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT)
                            AS DOUBLE) > 0
                   AND CAST(CAST(n AS HUGEINT) * CAST(s22 AS HUGEINT)
                            - CAST(s2 AS HUGEINT) * CAST(s2 AS HUGEINT)
                            AS DOUBLE) > 0
                  THEN CAST(CAST(n AS HUGEINT) * CAST(s12 AS HUGEINT)
                            - CAST(s1 AS HUGEINT) * CAST(s2 AS HUGEINT)
                            AS DOUBLE)
                       / (SQRT(CAST(CAST(n AS HUGEINT) * CAST(s11 AS HUGEINT)
                                    - CAST(s1 AS HUGEINT) * CAST(s1 AS HUGEINT)
                                    AS DOUBLE))
                          * SQRT(CAST(CAST(n AS HUGEINT) * CAST(s22 AS HUGEINT)
                                      - CAST(s2 AS HUGEINT) * CAST(s2 AS HUGEINT)
                                      AS DOUBLE)))
             END, {round_digits}) AS corr
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


def quantize_int8_stats(df: DataFrame, vec_col: str,
                        round_digits: int = 9) -> DataFrame:
    """Per-dimension int8 (0–255) scalar-quantization audit: quantize
    each dimension against its global [min, max] range and report the
    reconstruction error — the go/no-go check before shrinking a 100 TB
    fp32 embedding store 4× for ANN serving (the standard IVF/HNSW
    memory lever; cf. FAISS ScalarQuantizer, public knowledge).

    Plan: posexplode → ONE groupBy(dim) for the ranges (64–4096 groups)
    → broadcast the tiny range frame back onto a second exploded scan →
    per-value quantize/dequantize in closed-form expressions → ONE
    groupBy(dim) for the error stats. Two corpus scans, both shuffles
    O(dim); at scale you'd persist the range frame as an artifact and
    pay one scan.

    Engine-exactness: q = floor((x−min)/(max−min)·255 + 0.5) is the
    same double expression tree on both engines (IEEE-deterministic),
    the error sum is a scaled-integer (1e9) decimal sum, and constant
    dimensions (max == min) pin q = 0 instead of dividing by zero.

    Output: (dim, n, vmin, vmax, n_saturated, mean_abs_err,
    max_abs_err) — n_saturated counts codes 0/255 (range-edge values).
    """
    from dataprofiler_spark.session import ensure_parallelism

    # two exploded corpus scans; min/max/count/decimal-sum aggregates
    # are partition-order independent, so parallelizing a single-split
    # local input is result-neutral (no-op at real scale)
    df = ensure_parallelism(df)
    exploded = df.select(
        F.posexplode(F.col(vec_col)).alias("dim", "x")
    ).select("dim", F.col("x").cast("double").alias("x"))
    rng = exploded.groupBy("dim").agg(
        F.min("x").alias("vmin"), F.max("x").alias("vmax"))
    scale = F.col("vmax") - F.col("vmin")
    q = F.when(scale > 0, F.least(F.lit(255.0), F.greatest(
        F.lit(0.0),
        F.floor((F.col("x") - F.col("vmin")) / scale * 255 + 0.5)
        .cast("double")))).otherwise(F.lit(0.0))
    joined = (exploded.join(F.broadcast(rng), "dim")
              .withColumn("q", q)
              .withColumn("err", F.abs(
                  F.col("x") - (F.col("vmin")
                                + F.col("q") / 255 * scale))))
    e9 = F.round(F.col("err") * 1e9, 0).cast("decimal(38,0)")
    agg = joined.groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.min("vmin"), 6).alias("vmin"),
        F.round(F.max("vmax"), 6).alias("vmax"),
        F.sum(F.when(F.col("q").isin(0.0, 255.0), 1)
              .otherwise(0)).cast("long").alias("n_saturated"),
        F.sum(e9).alias("s_err9"),
        F.max("err").alias("max_err"),
    )
    return agg.select(
        "dim", "n", "vmin", "vmax", "n_saturated",
        F.round(F.col("s_err9").cast("double") / F.col("n") / 1e9,
                round_digits).alias("mean_abs_err"),
        F.round(F.col("max_err"), round_digits).alias("max_abs_err"),
    )


def oracle_quantize_int8_sql(table: str, vec_col: str, dim: int = 64,
                             round_digits: int = 9) -> str:
    x = f"CAST(({vec_col}::DOUBLE[])[CAST(t.i AS INT)] AS DOUBLE)"
    return f"""
WITH e AS (
  -- t.i <= len(v) mirrors Spark's posexplode: NULL / short vectors
  -- contribute no rows past their length (n and mean_abs_err would
  -- otherwise silently diverge on corpora with NULL/ragged embeddings)
  SELECT CAST(t.i - 1 AS INT) AS dim, {x} AS x
  FROM {table} CROSS JOIN range(1, {dim + 1}) t(i)
  WHERE {vec_col} IS NOT NULL AND t.i <= len({vec_col}::DOUBLE[])
), rng AS (
  SELECT dim, MIN(x) AS vmin, MAX(x) AS vmax FROM e GROUP BY dim
), qe AS (
  SELECT e.dim, e.x, r.vmin, r.vmax,
         CASE WHEN r.vmax - r.vmin > 0 THEN
           LEAST(255.0, GREATEST(0.0,
             CAST(FLOOR((e.x - r.vmin) / (r.vmax - r.vmin) * 255 + 0.5)
                  AS DOUBLE)))
         ELSE 0.0 END AS q
  FROM e JOIN rng r USING (dim)
), err AS (
  SELECT dim, vmin, vmax, q,
         ABS(x - (vmin + q / 255 * (vmax - vmin))) AS err
  FROM qe
)
SELECT dim, COUNT(*) AS n,
       ROUND(MIN(vmin), 6) AS vmin,
       ROUND(MAX(vmax), 6) AS vmax,
       CAST(SUM(CASE WHEN q IN (0.0, 255.0) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_saturated,
       ROUND(CAST(SUM(CAST(ROUND(err * 1e9, 0) AS DECIMAL(38,0)))
                  AS DOUBLE) / COUNT(*) / 1e9,
             {round_digits}) AS mean_abs_err,
       ROUND(MAX(err), {round_digits}) AS max_abs_err
FROM err GROUP BY dim
"""


def embedding_shift(df_a: DataFrame, df_b: DataFrame, vec_col: str,
                    round_digits: int = 6) -> DataFrame:
    """One-row distribution-shift summary between two embedding
    batches: (n_a, n_b, mean_cosine, mean_l2_dist, max_abs_dim_shift) —
    the cheap "did my new embedding batch drift" check (encoder
    version bump, domain change) before re-running ANN/dedup thresholds
    tuned on the old distribution.

    * mean_cosine: cosine between the two MEAN vectors (1.0 = same
      direction; anisotropic encoders sit high here even across real
      drift — read together with the next two).
    * mean_l2_dist: L2 distance between the mean vectors.
    * max_abs_dim_shift: worst single-dimension mean delta — localizes
      the drift when one feature moved.

    Plan: each side is ONE posexplode + groupBy(dim) (the dim-stats
    shuffle, d groups); the two d-row frames join on dim and fold to
    one row. Fixed-point per-dim sums keep both engines exact; the
    derived doubles divide identical decimals. NULL vectors are
    excluded (the clustering-ops rule)."""
    def per_dim(df, side):
        e = (df.where(F.col(vec_col).isNotNull())
             .select(F.posexplode(F.col(vec_col)).alias("dim", "x"))
             .select("dim", F.col("x").cast("double").alias("x")))
        xi = F.round(F.col("x") * _S, 0).cast("decimal(19,0)")
        return e.groupBy("dim").agg(
            F.count(F.lit(1)).alias(f"n_{side}"),
            F.sum(xi.cast("decimal(38,0)")).alias(f"s_{side}"))
    j = per_dim(df_a, "a").join(per_dim(df_b, "b"), "dim")
    ma = F.col("s_a").cast("double") / F.col("n_a") / _S
    mb = F.col("s_b").cast("double") / F.col("n_b") / _S
    # per-dim products are doubles; round-then-decimal-sum makes the
    # d-term fold order-independent (join output order differs between
    # engines), mirroring the oracle exactly.
    dec = "decimal(38,15)"
    agg = j.agg(
        F.max("n_a").alias("n_a"),
        F.max("n_b").alias("n_b"),
        F.sum(F.round(ma * mb, 15).cast(dec)).alias("dot"),
        F.sum(F.round(ma * ma, 15).cast(dec)).alias("na2"),
        F.sum(F.round(mb * mb, 15).cast(dec)).alias("nb2"),
        F.sum(F.round((ma - mb) * (ma - mb), 15).cast(dec)).alias("d2"),
        F.max(F.abs(ma - mb)).alias("mx"))
    return agg.select(
        F.col("n_a"), F.col("n_b"),
        F.round(F.when((F.col("na2") > 0) & (F.col("nb2") > 0),
                       F.col("dot").cast("double")
                       / (F.sqrt(F.col("na2").cast("double"))
                          * F.sqrt(F.col("nb2").cast("double")))),
                round_digits).alias("mean_cosine"),
        F.round(F.sqrt(F.col("d2").cast("double")),
                round_digits).alias("mean_l2_dist"),
        F.round(F.col("mx"), round_digits).alias("max_abs_dim_shift"))


def oracle_embedding_shift_sql(table_a: str, table_b: str, vec_col: str,
                               round_digits: int = 6) -> str:
    def per_dim(table, side):
        return f"""
  SELECT CAST(t.i - 1 AS INT) AS dim, COUNT(*) AS n_{side},
         SUM(CAST(ROUND(CAST(({vec_col}::DOUBLE[])[CAST(t.i AS INT)]
                             AS DOUBLE) * {_S}, 0)
                  AS DECIMAL(38,0))) AS s_{side}
  FROM {table}, UNNEST(range(1, len({vec_col}::DOUBLE[]) + 1)) t(i)
  WHERE {vec_col} IS NOT NULL
  GROUP BY 1"""
    return f"""
WITH pa AS ({per_dim(table_a, 'a')}),
pb AS ({per_dim(table_b, 'b')}),
j AS (
  SELECT pa.dim, pa.n_a, pa.s_a, pb.n_b, pb.s_b,
         CAST(pa.s_a AS DOUBLE) / pa.n_a / {_S} AS ma,
         CAST(pb.s_b AS DOUBLE) / pb.n_b / {_S} AS mb
  FROM pa JOIN pb USING (dim)
),
agg AS (
  SELECT MAX(n_a) AS n_a, MAX(n_b) AS n_b,
         SUM(CAST(ROUND(ma * mb, 15) AS DECIMAL(38,15))) AS dot,
         SUM(CAST(ROUND(ma * ma, 15) AS DECIMAL(38,15))) AS na2,
         SUM(CAST(ROUND(mb * mb, 15) AS DECIMAL(38,15))) AS nb2,
         SUM(CAST(ROUND((ma - mb) * (ma - mb), 15)
                  AS DECIMAL(38,15))) AS d2,
         MAX(ABS(ma - mb)) AS mx
  FROM j
)
SELECT CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       ROUND(CASE WHEN na2 > 0 AND nb2 > 0
             THEN CAST(dot AS DOUBLE)
                  / (SQRT(CAST(na2 AS DOUBLE)) * SQRT(CAST(nb2 AS DOUBLE)))
             END, {round_digits}) AS mean_cosine,
       ROUND(SQRT(CAST(d2 AS DOUBLE)), {round_digits}) AS mean_l2_dist,
       ROUND(mx, {round_digits}) AS max_abs_dim_shift
FROM agg
"""


def embedding_spectrum(df: DataFrame, vec_col: str,
                       round_digits: int = 6,
                       max_dim: int | None = MAX_COV_DIM) -> DataFrame:
    """One-row spectral summary of the embedding covariance:
    (dim, n, total_var, top1_ratio, top5_ratio, effective_rank,
    participation_ratio): eigen-spectrum concentration of the d×d
    covariance — the quantitative form of the anisotropy question
    ``embedding_covariance`` lets you eyeball. top1_ratio ≈ 1 means the
    embeddings collapsed to a line (rank-1 cone); effective_rank
    (exp of the eigenvalue-distribution entropy, Roy & Vetterli 2007)
    and participation_ratio ((Σλ)²/Σλ² ) measure how many directions
    carry real variance — the numbers that decide whether to whiten
    before cosine retrieval.

    Plan: the distributed part IS ``embedding_covariance`` (oracled,
    decimal-exact); the d×d eigendecomposition runs DRIVER-SIDE on its
    d(d+1)/2-row result (bounded by the same ``max_dim`` gate —
    1024² × 8 B ≈ 8 MB, a scalar problem no cluster should shuffle
    for). numpy.linalg.eigh on a symmetric matrix; negative eigenvalue
    dust from rounding clamps to 0. NOT SQL-expressible (eigen) — the
    registry carries it rows-only; correctness is pinned against
    analytically-known spectra in tests/test_r7_reference_impls.py."""
    import numpy as np

    cov_rows = embedding_covariance(df, vec_col, round_digits=9,
                                    max_dim=max_dim).collect()
    spark = df.sparkSession
    if not cov_rows:
        return spark.createDataFrame(
            [], "dim int, n long, total_var double, top1_ratio double,"
                " top5_ratio double, effective_rank double,"
                " participation_ratio double")
    d = max(r["d2"] for r in cov_rows) + 1
    n = max(r["n"] for r in cov_rows)
    m = np.zeros((d, d))
    for r in cov_rows:
        c = float(r["cov"]) if r["cov"] is not None else 0.0
        m[r["d1"], r["d2"]] = c
        m[r["d2"], r["d1"]] = c
    ev = np.linalg.eigh(m)[0]
    ev = np.clip(ev, 0.0, None)[::-1]          # descending, clamped
    tot = float(ev.sum())
    if tot <= 0:
        row = (int(d), int(n), 0.0, None, None, None, None)
    else:
        p = ev / tot
        nz = p[p > 0]
        h = float(-(nz * np.log(nz)).sum())
        row = (int(d), int(n), round(tot, round_digits),
               round(float(p[0]), round_digits),
               round(float(p[:5].sum()), round_digits),
               round(float(np.exp(h)), round_digits),
               round(tot * tot / float((ev * ev).sum()), round_digits))
    return spark.createDataFrame(
        [row], "dim int, n long, total_var double, top1_ratio double,"
               " top5_ratio double, effective_rank double,"
               " participation_ratio double")
