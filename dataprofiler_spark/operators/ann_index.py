"""Persisted IVF (inverted-file) ANN index over an embedding column.

The in-memory IVF path (operators/mllib_ops.ivf_topk) re-fits and
re-assigns per query; this module makes the index a durable artifact —
the shape a 100 TB similarity-search deployment actually uses:

    {path}/centroids/   tiny parquet: (centroid, center array<double>)
    {path}/vectors/     parquet partitioned BY centroid: (id, embedding)
    {path}/_ivf_meta.json

Build fits the coarse quantizer (KMeans) on a SAMPLE (``fit_fraction``)
— at corpus scale the quantizer needs thousands of points, not
trillions — then assigns the full table map-side and writes it
partitioned by centroid. A query ranks centroids driver-side against
the tiny centroid table and reads ONLY the ``nprobe`` matching
partition directories: Spark partition pruning turns the recall/IO
trade into a file-listing decision (asserted in tests/test_plans.py).

Distance: cosine. Deterministic given the seed.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ivf_build(df: DataFrame, id_col: str, vec_col: str, path: str,
              n_centroids: int = 16, fit_fraction: float | None = None,
              seed: int = 42) -> dict:
    """Fit + assign + write the index; returns the metadata dict."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    vecs = df.select(F.col(id_col).alias("id"),
                     F.col(vec_col).alias("embedding"),
                     array_to_vector(F.col(vec_col).cast("array<double>"))
                     .alias("__features"))
    fit_on = vecs.sample(fit_fraction, seed=seed) if fit_fraction else vecs
    km = KMeans(k=n_centroids, seed=seed, featuresCol="__features",
                predictionCol="centroid")
    model = km.fit(fit_on)
    assigned = model.transform(vecs).select("id", "embedding", "centroid")
    (assigned.write.mode("overwrite").partitionBy("centroid")
     .parquet(os.path.join(path, "vectors")))

    spark = df.sparkSession
    centers = [(i, [float(x) for x in c])
               for i, c in enumerate(model.clusterCenters())]
    (spark.createDataFrame(centers, "centroid int, center array<double>")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(path, "centroids")))

    dim = len(centers[0][1]) if centers else 0
    meta = {"n_centroids": n_centroids, "dim": dim, "metric": "cosine",
            "seed": seed, "fit_fraction": fit_fraction}
    with open(os.path.join(path, "_ivf_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


def _cosine(a: list[float], b: list[float]) -> float:
    num = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(y * y for y in b) ** 0.5
    return num / (na * nb) if na and nb else 0.0


def ivf_probe_centroids(spark: SparkSession, path: str,
                        query_vec: list[float], nprobe: int) -> list[int]:
    """Rank centroids by cosine against the query (driver-side — the
    centroid table is O(n_centroids), tiny by construction)."""
    rows = spark.read.parquet(os.path.join(path, "centroids")).collect()
    ranked = sorted(rows, key=lambda r: (-_cosine(query_vec, r["center"]),
                                         r["centroid"]))
    return [r["centroid"] for r in ranked[:nprobe]]


def ivf_query(spark: SparkSession, path: str, query_vec: list[float],
              k: int = 10, nprobe: int = 2,
              exclude_id: int | None = None) -> DataFrame:
    """(rank, vec_id, cosine) over the nprobe nearest inverted lists.

    The ``centroid IN (...)`` filter is a partition filter on the
    vectors table — only nprobe/n_centroids of the files are listed or
    read. Scoring is a broadcast of the query literal + scan; top-k is
    distributed TakeOrderedAndProject."""
    from dataprofiler_spark.operators.similarity import cosine_expr
    from dataprofiler_spark.operators.topk import ranked_topk

    probe = ivf_probe_centroids(spark, path, query_vec, nprobe)
    vecs = spark.read.parquet(os.path.join(path, "vectors"))
    cand = vecs.where(F.col("centroid").isin(probe))
    if exclude_id is not None:
        cand = cand.where(F.col("id") != exclude_id)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    scored = cand.select(
        F.col("id").alias("vec_id"),
        F.round(cosine_expr(F.col("embedding"), q), 6).alias("cosine"))
    return (ranked_topk(scored, [F.desc("cosine"), F.asc("vec_id")], k)
            .select("rank", "vec_id", "cosine"))


def ivf_meta(path: str) -> dict:
    with open(os.path.join(path, "_ivf_meta.json")) as f:
        return json.load(f)
