"""Persisted IVF (inverted-file) ANN index over an embedding column.

The in-memory IVF path (operators/mllib_ops.ivf_topk) re-fits and
re-assigns per query; this module makes the index a durable artifact —
the shape a 100 TB similarity-search deployment actually uses:

    {path}/centroids/   tiny parquet: (centroid, center array<double>)
    {path}/vectors/     parquet partitioned BY centroid: (id, embedding)
    {path}/_ivf_meta.json

Build fits the coarse quantizer on a SAMPLE (``fit_fraction``) — at
corpus scale the quantizer needs thousands of points, not trillions —
then assigns the full table map-side and writes it partitioned by
centroid. A query ranks centroids driver-side against the tiny centroid
table and reads ONLY the ``nprobe`` matching partition directories:
Spark partition pruning turns the recall/IO trade into a file-listing
decision (asserted in tests/test_plans.py).

Quantizer (VERDICT r4 item 5): default ``"det"`` — this package's
deterministic distributed k-means (operators/clustering.kmeans_fit),
whose fixed-point algebra a DuckDB oracle reproduces bit-for-bit, so
build → persist → query is oracle-checkable END TO END
(queries.ann_index_query_embeddings). ``"mllib"`` keeps the MLlib KMeans
path (kmeans|| init — statistically better centers on hard corpora, but
its sampled init is not cross-engine reproducible, so no oracle).
``fit_fraction`` under "det" is an md5-hash sample (same rule as
operators/sampling.hash_sample) — deterministic and oracle-mirrorable,
unlike Spark's partition-order-dependent ``DataFrame.sample``.

Distance: cosine. Deterministic given the seed (both quantizers).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def ivf_build(df: DataFrame, id_col: str, vec_col: str, path: str,
              n_centroids: int = 16, fit_fraction: float | None = None,
              seed: int = 42, quantizer: str = "det",
              iters: int = 2, pq_m: int | None = None,
              pq_codes: int = 16, pq_iters: int = 1) -> dict:
    """Fit + assign + write the index; returns the metadata dict.

    ``pq_m`` (det quantizer only) additionally fits ``pq_m`` product-
    quantization codebooks (clustering.pq_fit) and stores each vector's
    m codes in the vectors table plus the codebooks in
    ``_pq_codebooks.json`` — the durable IVF-PQ layout ivf_query_adc
    serves from without ever reading the vector column."""
    pq_books = None
    if quantizer == "det":
        from dataprofiler_spark.operators import clustering as cl
        from dataprofiler_spark.operators.sampling import hash_sample

        # NULL vectors have no cell — same rule as the clustering ops
        df = df.where(F.col(vec_col).isNotNull())
        fit_on = (hash_sample(df, id_col, fit_fraction)
                  if fit_fraction else df)
        centers_list = cl.kmeans_fit(fit_on, id_col, vec_col,
                                     k=n_centroids, iters=iters)
        # centroid assignment via _assign_df: above ASSIGN_EXPR_MAX_K
        # centroids the full-corpus build scan switches to the
        # vectorized NumPy kernel (bit-identical — see clustering.py);
        # a deployment-sized n_centroids must not pay the O(k·dim)
        # interpreted expression per row.
        assigned = (cl._assign_df(
            df.select(F.col(id_col).alias("id"),
                      F.col(vec_col).alias("v")), centers_list)
            .select("id", F.col("v").alias("embedding"),
                    F.col("cluster").alias("centroid")))
        if pq_m is not None:
            dim = len(centers_list[0])
            sub = dim // pq_m
            pq_books = cl.pq_fit(fit_on, id_col, vec_col, m=pq_m,
                                 k_codes=pq_codes, iters=pq_iters,
                                 dim=dim)
            # one nested codebook literal + one transform lambda per
            # code column (r13 literal fusion — see clustering.pq_audit;
            # bit-identical (d, cl) structs and array_min tie-break)
            bmat = F.lit([[[float(w) for w in c] for c in book]
                          for book in pq_books])

            def _cand_struct(sl):
                # closure factory: pyspark HOF binding counts named
                # lambda params
                return lambda c, i: F.struct(
                    cl._sqdist(sl, c).alias("d"), i.alias("cl"))

            for j in range(pq_m):
                sl = F.slice(F.col("embedding"), j * sub + 1, sub)
                cands = F.transform(F.element_at(bmat, j + 1),
                                    _cand_struct(sl))
                assigned = assigned.withColumn(
                    f"code{j}", F.array_min(cands)["cl"].cast("int"))
    elif quantizer == "mllib":
        if pq_m is not None:
            raise ValueError("pq_m requires quantizer='det' (the PQ "
                             "codebooks reuse the deterministic k-means)")
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        vecs = df.select(F.col(id_col).alias("id"),
                         F.col(vec_col).alias("embedding"),
                         array_to_vector(F.col(vec_col)
                                         .cast("array<double>"))
                         .alias("__features"))
        fit_on = (vecs.sample(fit_fraction, seed=seed)
                  if fit_fraction else vecs)
        km = KMeans(k=n_centroids, seed=seed, featuresCol="__features",
                    predictionCol="centroid")
        model = km.fit(fit_on)
        assigned = model.transform(vecs).select("id", "embedding",
                                                "centroid")
        centers_list = [[float(x) for x in c]
                        for c in model.clusterCenters()]
    else:
        raise ValueError(f"unknown quantizer {quantizer!r}"
                         " (expected 'det' or 'mllib')")
    (assigned.write.mode("overwrite").partitionBy("centroid")
     .parquet(os.path.join(path, "vectors")))

    spark = df.sparkSession
    centers = [(i, c) for i, c in enumerate(centers_list)]
    (spark.createDataFrame(centers, "centroid int, center array<double>")
     .coalesce(1).write.mode("overwrite")
     .parquet(os.path.join(path, "centroids")))

    dim = len(centers[0][1]) if centers else 0
    meta = {"n_centroids": n_centroids, "dim": dim, "metric": "cosine",
            "seed": seed, "fit_fraction": fit_fraction,
            "quantizer": quantizer, "iters": iters,
            "pq_m": pq_m, "pq_codes": pq_codes if pq_m else None,
            "pq_iters": pq_iters if pq_m else None}
    with open(os.path.join(path, "_ivf_meta.json"), "w") as f:
        json.dump(meta, f)
    if pq_books is not None:
        with open(os.path.join(path, "_pq_codebooks.json"), "w") as f:
            json.dump(pq_books, f)
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


def ivf_query_adc(spark: SparkSession, path: str,
                  query_vec: list[float], k: int = 10, nprobe: int = 2,
                  exclude_id: int | None = None) -> DataFrame:
    """(rank, vec_id, approx_d) via asymmetric-distance scoring over the
    STORED PQ codes — the serving path that never reads the vector
    column: the pruned scan touches (id, centroid, code0..m) only
    (ReadSchema-asserted in tests), and each candidate costs m integer
    table lookups.

    Ranking semantics == clustering.ivf_pq_topk: probe cells by squared
    distance (tie → lowest centroid), ADC tables in 1e6 fixed-point
    longs, ties by (d6, id). Requires an index built with
    ``ivf_build(pq_m=...)``."""
    from dataprofiler_spark.operators.clustering import _SCALE
    from dataprofiler_spark.operators.topk import ranked_topk

    meta = ivf_meta(path)
    if not meta.get("pq_m"):
        raise ValueError(f"index at {path} was built without pq_m — "
                         "rebuild with ivf_build(..., pq_m=m)")
    with open(os.path.join(path, "_pq_codebooks.json")) as f:
        books = json.load(f)
    m = meta["pq_m"]
    sub = meta["dim"] // m
    qv = [float(x) for x in query_vec]

    def _sq(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    cent_rows = spark.read.parquet(
        os.path.join(path, "centroids")).collect()
    ranked = sorted(cent_rows,
                    key=lambda r: (_sq(qv, list(r["center"])),
                                   r["centroid"]))
    probe = [r["centroid"] for r in ranked[:nprobe]]
    dt6 = [[int(round(_sq(qv[j * sub:(j + 1) * sub], code) * _SCALE))
            for code in book] for j, book in enumerate(books)]

    cols = ["id", "centroid"] + [f"code{j}" for j in range(m)]
    vecs = spark.read.parquet(os.path.join(path, "vectors")).select(*cols)
    cand = vecs.where(F.col("centroid").isin(probe))
    if exclude_id is not None:
        cand = cand.where(F.col("id") != exclude_id)
    # one nested table literal (r13 fusion): same values, same
    # integer adds — bit-identical d6
    tmat = F.lit(dt6)
    total = None
    for j in range(m):
        term = F.element_at(F.element_at(tmat, j + 1),
                            F.col(f"code{j}") + 1)
        total = term if total is None else total + term
    scored = cand.select(F.col("id").alias("vec_id"),
                         total.alias("d6"))
    return (ranked_topk(scored, [F.asc("d6"), F.asc("vec_id")], k)
            .select("rank", "vec_id",
                    F.round(F.col("d6") / F.lit(float(_SCALE)), 6)
                    .alias("approx_d")))


def ivf_meta(path: str) -> dict:
    with open(os.path.join(path, "_ivf_meta.json")) as f:
        return json.load(f)


def oracle_ann_index_query_sql(table: str, id_col: str, vec_col: str,
                               n_centroids: int = 8, iters: int = 2,
                               nprobe: int = 2, k: int = 5,
                               dim: int = 64,
                               round_digits: int = 6) -> str:
    """SQL twin of build(quantizer='det') → ivf_query(query_vec =
    the smallest id's vector, exclude_id = that id).

    Mirrors every decision point of the persisted index: the
    deterministic k-means centroids (clustering._kmeans_ctes — exact
    fixed-point algebra), the one-cell-per-vector assignment
    (squared distance, tie → lowest centroid), the driver-side probe
    ranking (cosine DESC, centroid ASC — Python's sequential sum and
    DuckDB's list_sum are the same left fold over identical doubles),
    and the final top-k (rounded cosine DESC, id ASC)."""
    from dataprofiler_spark.operators.clustering import (_duck_sqdist,
                                                         _kmeans_ctes)
    sq = _duck_sqdist("e.v", "c.v", dim)
    dot = ("list_sum(list_transform(generate_series(1, {d}),"
           " i -> {a}[i] * {b}[i]))")
    qnum = dot.format(d=dim, a="c.v", b="q.qv")
    qna = dot.format(d=dim, a="c.v", b="c.v")
    qnb = dot.format(d=dim, a="q.qv", b="q.qv")
    num = dot.format(d=dim, a="cells.v", b="q.qv")
    na = dot.format(d=dim, a="cells.v", b="cells.v")
    nb = dot.format(d=dim, a="q.qv", b="q.qv")
    return f"""
WITH {_kmeans_ctes(table, id_col, vec_col, n_centroids, iters, dim)},
cells AS (
  SELECT id, v, cl::INT AS centroid FROM (
    SELECT e.id, e.v, c.cl,
           ROW_NUMBER() OVER (PARTITION BY e.id ORDER BY {sq}, c.cl) AS rn
    FROM e CROSS JOIN c{iters} c)
  WHERE rn = 1
),
q AS (SELECT id AS qid, v AS qv FROM e ORDER BY id LIMIT 1),
probes AS (
  SELECT cl::INT AS centroid FROM (
    SELECT c.cl,
           ROW_NUMBER() OVER (
             ORDER BY CASE WHEN {qna} > 0 AND {qnb} > 0
                           THEN {qnum} / (SQRT({qna}) * SQRT({qnb}))
                           ELSE 0.0 END DESC,
                      c.cl) AS rn
    FROM c{iters} c CROSS JOIN q)
  WHERE rn <= {nprobe}
),
scored AS (
  SELECT cells.id AS vec_id,
         ROUND(CASE WHEN {na} > 0 AND {nb} > 0 THEN {num} / (SQRT({na}) * SQRT({nb})) ELSE 0.0 END, {round_digits}) AS cosine
  FROM cells JOIN probes USING (centroid) CROSS JOIN q
  WHERE cells.id <> q.qid
)
SELECT CAST(rank AS INT) AS rank, vec_id, cosine FROM (
  SELECT *, ROW_NUMBER() OVER (ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM scored)
WHERE rank <= {k}
"""
