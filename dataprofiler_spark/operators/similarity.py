"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k is the exactness baseline: one broadcast of the
query vector, one scan, one top-k — the right plan at any scale when k is
small (no shuffle except the final ordered limit). The scale path is
random-hyperplane LSH: a deterministic set of hyperplanes (generated from
an md5-seeded PRNG in Python, embedded as literals, so Spark and the SQL
oracle share them bit-for-bit) maps each vector to a bucket; candidates
come only from the probe's bucket. An IVF variant would swap the
hyperplane code for k-means centroids — same plan shape.

Dot products are sequential left-folds over zip_with products in double —
matching DuckDB's list_sum(list_transform(...)) element order, so
cosines are bit-identical across engines (verified: see tests).
"""

from __future__ import annotations

import hashlib
import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def cosine_expr(a: Column, b: Column) -> Column:
    return _dot(a, b) / (F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


def cosine_topk(df: DataFrame, id_col: str, vec_col: str, query_id: int,
                k: int = 10, round_digits: int = 6) -> DataFrame:
    """(rank, vec_id, cosine): top-k neighbours of ``query_id`` by cosine,
    deterministic tie-break (cosine desc, id asc), self excluded.

    Plan: broadcast the query vector, score in one scan, finalize with the
    distributed TakeOrderedAndProject top-k (operators/topk.ranked_topk) —
    never a global single-partition window."""
    from dataprofiler_spark.operators.topk import ranked_topk

    q = df.where(F.col(id_col) == query_id).select(F.col(vec_col).alias("qv"))
    scored = (
        df.crossJoin(F.broadcast(q))
        .where(F.col(id_col) != query_id)
        .select(
            F.col(id_col).alias("vec_id"),
            F.round(cosine_expr(F.col(vec_col), F.col("qv")), round_digits)
             .alias("cosine"),
        )
    )
    return ranked_topk(
        scored, [F.desc("cosine"), F.asc("vec_id")], k
    ).select("rank", "vec_id", "cosine")


def _duck_dot(a: str, b: str, dim: int) -> str:
    return f"list_sum(list_transform(generate_series(1, {dim}), i -> {a}[i] * {b}[i]))"


def oracle_cosine_topk_sql(table: str, id_col: str, vec_col: str, query_id: int,
                           dim: int, k: int = 10, round_digits: int = 6) -> str:
    dot = _duck_dot("e.v", "q.v", dim)
    na = _duck_dot("e.v", "e.v", dim)
    nb = _duck_dot("q.v", "q.v", dim)
    return f"""
WITH q AS (SELECT {vec_col}::DOUBLE[] AS v FROM {table} WHERE {id_col} = {query_id}),
e AS (SELECT {id_col} AS vec_id, {vec_col}::DOUBLE[] AS v FROM {table}
      WHERE {id_col} <> {query_id}),
scored AS (
  SELECT e.vec_id,
         ROUND({dot} / (SQRT({na}) * SQRT({nb})), {round_digits}) AS cosine
  FROM e, q
)
SELECT * FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank,
         vec_id, cosine
  FROM scored
) WHERE rank <= {k}
"""


# -- random-hyperplane LSH --------------------------------------------------

def hyperplanes(dim: int, n_planes: int, seed: str = "dps-lsh-v1"
                ) -> list[list[float]]:
    """Deterministic pseudo-random hyperplanes in [-1, 1): md5(seed|p|d)
    drives each weight, so any engine (or language) regenerates the exact
    same planes."""
    planes = []
    for p in range(n_planes):
        row = []
        for d in range(dim):
            h = hashlib.md5(f"{seed}|{p}|{d}".encode()).digest()
            (u,) = struct.unpack(">Q", h[:8])
            row.append(round(u / 2 ** 63 - 1.0, 9))
        planes.append(row)
    return planes


def lsh_bucket_expr(vec_col: Column, planes: list[list[float]]) -> Column:
    """Bucket id = integer of sign bits of plane projections."""
    bucket = None
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(w) for w in plane])
        proj = _dot(vec_col, lit_plane)
        bit = F.when(proj > 0, F.lit(2 ** i)).otherwise(F.lit(0))
        bucket = bit if bucket is None else bucket + bit
    return bucket.cast("long")


def lsh_topk(df: DataFrame, id_col: str, vec_col: str, query_id: int,
             k: int = 10, n_planes: int = 4, dim: int = 64,
             round_digits: int = 6) -> DataFrame:
    """Approximate top-k: candidates restricted to the probe's LSH bucket.
    At scale, write the table bucketed/partitioned by this bucket id and
    the probe touches 1/2^n_planes of the data (partition pruning)."""
    from dataprofiler_spark.operators.topk import ranked_topk

    planes = hyperplanes(dim, n_planes)
    bucketed = df.select(
        F.col(id_col).alias("vec_id"), F.col(vec_col).alias("v"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )
    q = bucketed.where(F.col("vec_id") == query_id).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket"))
    cand = (
        bucketed.crossJoin(F.broadcast(q))
        .where((F.col("bucket") == F.col("qbucket")) & (F.col("vec_id") != query_id))
        .select(
            "vec_id",
            F.round(cosine_expr(F.col("v"), F.col("qv")), round_digits).alias("cosine"),
        )
    )
    return ranked_topk(
        cand, [F.desc("cosine"), F.asc("vec_id")], k
    ).select("rank", "vec_id", "cosine")


def oracle_lsh_topk_sql(table: str, id_col: str, vec_col: str, query_id: int,
                        k: int = 10, n_planes: int = 4, dim: int = 64,
                        round_digits: int = 6) -> str:
    planes = hyperplanes(dim, n_planes)
    terms = []
    for i, plane in enumerate(planes):
        arr = "([" + ", ".join(repr(w) for w in plane) + "]::DOUBLE[])"
        proj = _duck_dot("t.v", arr, dim)
        terms.append(f"(CASE WHEN {proj} > 0 THEN {2 ** i} ELSE 0 END)")
    bucket = " + ".join(terms)
    dot = _duck_dot("c.v", "q.v", dim)
    na = _duck_dot("c.v", "c.v", dim)
    nb = _duck_dot("q.v", "q.v", dim)
    return f"""
WITH b AS (
  SELECT t.{id_col} AS vec_id, t.v, CAST({bucket} AS BIGINT) AS bucket
  FROM (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}) t
),
q AS (SELECT v AS v, bucket AS qbucket FROM b WHERE vec_id = {query_id}),
cand AS (
  SELECT c.vec_id,
         ROUND({dot} / (SQRT({na}) * SQRT({nb})), {round_digits}) AS cosine
  FROM b c, (SELECT v, qbucket FROM q) q
  WHERE c.bucket = q.qbucket AND c.vec_id <> {query_id}
)
SELECT * FROM (
  SELECT ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank,
         vec_id, cosine
  FROM cand
) WHERE rank <= {k}
"""


def embedding_neardup_pairs(df: DataFrame, id_col: str, vec_col: str,
                            threshold: float = 0.95, n_planes: int = 8,
                            dim: int = 64, round_digits: int = 6) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via LSH bucketing: pairs
    sharing a bucket with cosine ≥ threshold. The pair join runs per
    bucket (shuffle on bucket id), never all-pairs."""
    planes = hyperplanes(dim, n_planes)
    b = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        lsh_bucket_expr(F.col(vec_col), planes).alias("bucket"),
    )
    x, y = b.alias("x"), b.alias("y")
    return (
        x.join(y, (F.col("x.bucket") == F.col("y.bucket"))
               & (F.col("x.id") < F.col("y.id")))
        .select(
            F.col("x.id").alias("id1"), F.col("y.id").alias("id2"),
            F.round(cosine_expr(F.col("x.v"), F.col("y.v")), round_digits)
             .alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def oracle_embedding_neardup_sql(table: str, id_col: str, vec_col: str,
                                 threshold: float = 0.95, n_planes: int = 8,
                                 dim: int = 64, round_digits: int = 6) -> str:
    planes = hyperplanes(dim, n_planes)
    terms = []
    for i, plane in enumerate(planes):
        arr = "([" + ", ".join(repr(w) for w in plane) + "]::DOUBLE[])"
        proj = _duck_dot("t.v", arr, dim)
        terms.append(f"(CASE WHEN {proj} > 0 THEN {2 ** i} ELSE 0 END)")
    bucket = " + ".join(terms)
    dot = _duck_dot("x.v", "y.v", dim)
    nx = _duck_dot("x.v", "x.v", dim)
    ny = _duck_dot("y.v", "y.v", dim)
    cos = f"{dot} / (SQRT({nx}) * SQRT({ny}))"
    return f"""
WITH b AS (
  SELECT t.{id_col} AS id, t.v, CAST({bucket} AS BIGINT) AS bucket
  FROM (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}) t
)
SELECT x.id AS id1, y.id AS id2, ROUND({cos}, {round_digits}) AS cosine
FROM b x JOIN b y ON x.bucket = y.bucket AND x.id < y.id
WHERE {cos} >= {threshold}
"""


def embedding_neardup_clusters(df: DataFrame, id_col: str, vec_col: str,
                               threshold: float = 0.95, n_planes: int = 8,
                               dim: int = 64, round_digits: int = 6,
                               max_iter: int = 20) -> DataFrame:
    """Embedding-cosine near-duplicate clusters: (id, cluster_id,
    cluster_size, is_canonical) for every vector — the embedding-space
    twin of ``dedup.neardup_clusters`` (pair generation is the
    LSH-bucketed cosine join; components are iterative min-label
    propagation; canonical = min-id member).

    Scale shape: per-bucket pair joins (never all-pairs) + O(cluster
    diameter) label-propagation rounds — near-dup graphs are cliques-ish
    so rounds stay small."""
    from dataprofiler_spark.operators.graph import connected_components

    pairs = embedding_neardup_pairs(df, id_col, vec_col,
                                    threshold=threshold, n_planes=n_planes,
                                    dim=dim, round_digits=round_digits)
    comps = (connected_components(pairs, "id1", "id2", max_iter=max_iter)
             .withColumnRenamed("node", "id"))
    ids = df.select(F.col(id_col).alias("id"))
    lab = (ids.join(comps, "id", "left")
           .select("id",
                   F.coalesce("component", F.col("id")).alias("cluster_id")))
    sizes = lab.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("cluster_size"))
    return (lab.join(sizes, "cluster_id")
            .select("id", "cluster_id", "cluster_size",
                    (F.col("id") == F.col("cluster_id")).alias("is_canonical")))


def oracle_embedding_neardup_clusters_sql(table: str, id_col: str,
                                          vec_col: str,
                                          threshold: float = 0.95,
                                          n_planes: int = 8, dim: int = 64,
                                          round_digits: int = 6) -> str:
    """Recursive-CTE transitive closure over the bucketed cosine pairs
    (mirrors dedup.oracle_neardup_clusters_sql)."""
    planes = hyperplanes(dim, n_planes)
    terms = []
    for i, plane in enumerate(planes):
        arr = "([" + ", ".join(repr(w) for w in plane) + "]::DOUBLE[])"
        proj = _duck_dot("t.v", arr, dim)
        terms.append(f"(CASE WHEN {proj} > 0 THEN {2 ** i} ELSE 0 END)")
    bucket = " + ".join(terms)
    dot = _duck_dot("x.v", "y.v", dim)
    nx = _duck_dot("x.v", "x.v", dim)
    ny = _duck_dot("y.v", "y.v", dim)
    cos = f"{dot} / (SQRT({nx}) * SQRT({ny}))"
    return f"""
WITH RECURSIVE b AS (
  SELECT t.{id_col} AS id, t.v, CAST({bucket} AS BIGINT) AS bucket
  FROM (SELECT {id_col}, {vec_col}::DOUBLE[] AS v FROM {table}) t
),
vpairs AS (
  SELECT x.id AS id1, y.id AS id2
  FROM b x JOIN b y ON x.bucket = y.bucket AND x.id < y.id
  WHERE {cos} >= {threshold}
),
nodes AS (SELECT {id_col} AS id FROM {table}),
bi AS (
  SELECT id1 AS src, id2 AS dst FROM vpairs
  UNION
  SELECT id2, id1 FROM vpairs
),
reach AS (
  SELECT id AS node, id AS peer FROM nodes
  UNION
  SELECT r.node, bb.dst FROM reach r JOIN bi bb ON r.peer = bb.src
),
comp AS (
  SELECT node AS id, MIN(peer) AS cluster_id FROM reach GROUP BY node
),
sizes AS (
  SELECT cluster_id, COUNT(*) AS cluster_size FROM comp GROUP BY cluster_id
)
SELECT c.id, c.cluster_id, CAST(s.cluster_size AS BIGINT) AS cluster_size,
       c.id = c.cluster_id AS is_canonical
FROM comp c JOIN sizes s USING (cluster_id)
"""


def embedding_decontaminate(corpus: DataFrame, bench: DataFrame,
                            id_col: str, vec_col: str,
                            threshold: float = 0.8,
                            round_digits: int = 6) -> DataFrame:
    """Semantic benchmark decontamination: for every corpus vector, the
    max cosine against the benchmark set; ``contaminated`` iff it meets
    the threshold. The embedding twin of ``curation.decontaminate``
    (reference has no decontamination surface at all).

    Scale shape: the benchmark (eval sets) is SMALL by nature — it is
    collapsed to ONE row of collected vectors and broadcast, so scoring
    is a pure map-side pass over the corpus scan: zero shuffles, no
    per-corpus-row join, no groupBy. Cost is O(|bench| · dim) per
    corpus row; for benchmark sets beyond ~10^4 vectors, pre-bucket
    both sides with ``lsh_bucket_expr`` and compare within buckets
    instead. An empty benchmark yields max = NULL, contaminated =
    false (fail-open is correct here: nothing to leak).
    """
    bvs = bench.agg(F.collect_list(F.col(vec_col)).alias("bvs"))
    cosines = F.transform(
        F.col("bvs"), lambda bv: cosine_expr(F.col(vec_col), bv))
    mx = F.array_max(cosines)
    return (corpus.crossJoin(F.broadcast(bvs))
            .select(F.col(id_col).alias("id"),
                    F.round(mx, round_digits).alias("max_benchmark_cosine"),
                    F.coalesce(mx >= F.lit(threshold), F.lit(False))
                     .alias("contaminated")))


def oracle_embedding_decontaminate_sql(table: str, id_col: str,
                                       vec_col: str, bench_pred: str,
                                       dim: int, threshold: float = 0.8,
                                       round_digits: int = 6) -> str:
    """Oracle over a benchmark defined as ``WHERE bench_pred`` rows of
    the same table (mirrors the registered query's bench subset)."""
    cos = (f"{_duck_dot('c.v', 'b.bv', dim)} / "
           f"(SQRT({_duck_dot('c.v', 'c.v', dim)}) * "
           f"SQRT({_duck_dot('b.bv', 'b.bv', dim)}))")
    return f"""
WITH b AS (SELECT {vec_col}::DOUBLE[] AS bv FROM {table} WHERE {bench_pred}),
c AS (SELECT {id_col} AS id, {vec_col}::DOUBLE[] AS v FROM {table})
SELECT c.id,
       ROUND(MAX({cos}), {round_digits}) AS max_benchmark_cosine,
       COALESCE(MAX(CASE WHEN {cos} >= {threshold} THEN 1 ELSE 0 END) = 1,
                FALSE) AS contaminated
FROM c LEFT JOIN b ON TRUE
GROUP BY c.id
"""
