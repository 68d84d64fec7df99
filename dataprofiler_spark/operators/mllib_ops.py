"""MLlib-backed variants of the dedup/similarity/correlation operators.

The expression-based implementations (operators/dedup.py, similarity.py,
correlation.py) are the oracle-checkable defaults; these MLlib variants
exist because (a) they are the idiomatic Spark ML path, (b) MinHashLSH /
BucketedRandomProjectionLSH ship approxSimilarityJoin with distributed
banding already tuned, and (c) an IVF index (KMeans coarse quantizer) is
the standard recall/latency trade for ANN at 100 TB. Results are
approximate/seed-dependent, so tests assert behavior (recall vs the
exact operator), not hashes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _shingle_vectors(df: DataFrame, id_col: str, text_col: str,
                     k: int = 3, num_features: int = 1 << 18):
    """Docs → sparse binary shingle vectors (HashingTF over char k-grams)."""
    from pyspark.ml.feature import HashingTF

    from dataprofiler_spark.operators.dedup import shingles_expr

    sh = df.select(F.col(id_col).alias("id"),
                   shingles_expr(text_col, k).alias("shingles"))
    tf = HashingTF(inputCol="shingles", outputCol="features",
                   numFeatures=num_features, binary=True)
    return tf.transform(sh)


def minhash_lsh_pairs_ml(df: DataFrame, id_col: str, text_col: str,
                         k: int = 3, num_hash_tables: int = 5,
                         jaccard_threshold: float = 0.5,
                         seed: int = 42) -> DataFrame:
    """(id1, id2, jaccard) near-dup pairs via MLlib MinHashLSH
    approxSimilarityJoin (distance = 1 − jaccard)."""
    from pyspark.ml.feature import MinHashLSH

    vecs = _shingle_vectors(df, id_col, text_col, k)
    mh = MinHashLSH(inputCol="features", outputCol="hashes",
                    numHashTables=num_hash_tables, seed=seed)
    model = mh.fit(vecs)
    joined = model.approxSimilarityJoin(
        vecs, vecs, 1.0 - jaccard_threshold, distCol="dist")
    return (joined
            .where(F.col("datasetA.id") < F.col("datasetB.id"))
            .select(F.col("datasetA.id").alias("id1"),
                    F.col("datasetB.id").alias("id2"),
                    F.round(1.0 - F.col("dist"), 6).alias("jaccard")))


def _embedding_vectors(df: DataFrame, id_col: str, vec_col: str):
    from pyspark.ml.functions import array_to_vector

    return df.select(F.col(id_col).alias("id"),
                     array_to_vector(F.col(vec_col).cast("array<double>"))
                     .alias("features"))


def ann_topk_ml(df: DataFrame, id_col: str, vec_col: str, query_id: int,
                k: int = 10, bucket_length: float = 2.0,
                num_hash_tables: int = 3, seed: int = 42) -> DataFrame:
    """(vec_id, dist) approx nearest neighbours via
    BucketedRandomProjectionLSH (euclidean)."""
    from pyspark.ml.feature import BucketedRandomProjectionLSH

    vecs = _embedding_vectors(df, id_col, vec_col)
    brp = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes",
        bucketLength=bucket_length, numHashTables=num_hash_tables, seed=seed)
    model = brp.fit(vecs)
    key = vecs.where(F.col("id") == query_id).collect()[0]["features"]
    nn = model.approxNearestNeighbors(
        vecs.where(F.col("id") != query_id), key, k, distCol="dist")
    return nn.select(F.col("id").alias("vec_id"), F.round("dist", 6).alias("dist"))


def ivf_index(df: DataFrame, id_col: str, vec_col: str,
              n_centroids: int = 16, seed: int = 42):
    """IVF coarse quantizer: KMeans centroids + per-vector assignment.
    Returns (model, assigned DataFrame with 'centroid' column). At scale
    the assigned table is written partitioned by centroid → a probe scans
    only nprobe partitions (partition pruning does the recall/IO trade)."""
    from pyspark.ml.clustering import KMeans

    vecs = _embedding_vectors(df, id_col, vec_col)
    km = KMeans(k=n_centroids, seed=seed, featuresCol="features",
                predictionCol="centroid")
    model = km.fit(vecs)
    return model, model.transform(vecs)


def ivf_topk(df: DataFrame, id_col: str, vec_col: str, query_id: int,
             k: int = 10, n_centroids: int = 16, nprobe: int = 2,
             seed: int = 42) -> DataFrame:
    """(rank, vec_id, cosine) searching only the nprobe nearest centroids'
    inverted lists — the IVF ANN scale path."""
    import numpy as np

    from dataprofiler_spark.operators.similarity import cosine_expr

    model, assigned = ivf_index(df, id_col, vec_col, n_centroids, seed)
    centers = model.clusterCenters()
    qrow = df.where(F.col(id_col) == query_id).select(vec_col).collect()[0][0]
    q = np.asarray(qrow, dtype=float)

    def cos(a, b):
        na, nb = np.linalg.norm(a), np.linalg.norm(b)
        return float(a @ b / (na * nb)) if na and nb else 0.0

    probe = sorted(range(len(centers)),
                   key=lambda i: -cos(q, np.asarray(centers[i])))[:nprobe]
    cand_ids = assigned.where(F.col("centroid").isin(probe)).select("id")
    cand = df.join(cand_ids.withColumnRenamed("id", id_col), id_col) \
             .where(F.col(id_col) != query_id)
    qdf = df.where(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qv"))
    scored = (cand.crossJoin(F.broadcast(qdf))
              .select(F.col(id_col).alias("vec_id"),
                      F.round(cosine_expr(F.col(vec_col), F.col("qv")), 6)
                      .alias("cosine")))
    from dataprofiler_spark.operators.topk import ranked_topk
    return ranked_topk(scored, [F.desc("cosine"), F.asc("vec_id")], k) \
        .select("rank", "vec_id", "cosine")


def correlation_matrix_ml(df: DataFrame, cols: list[str]) -> list[list[float]]:
    """MLlib Correlation.corr — the one-liner alternative to the exact
    integer-sum matrix (operators/correlation.py)."""
    from pyspark.ml.feature import VectorAssembler
    from pyspark.ml.stat import Correlation

    assembled = VectorAssembler(inputCols=cols, outputCol="__v").transform(
        df.select(*cols))
    m = Correlation.corr(assembled, "__v").collect()[0][0]
    return m.toArray().tolist()
