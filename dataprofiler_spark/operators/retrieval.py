"""Full-text retrieval scoring over document tables.

BM25 (Robertson & Sparck Jones probabilistic relevance framework; the
idf/saturation formulation popularized by Lucene — public literature)
as a relational plan: the query's terms are driver-side literals, so the
exploded term stream is filtered to them BEFORE any shuffle — the tf
aggregation touches only candidate (doc, query-term) rows, never the
full vocabulary. Per-term document frequency rides a window over that
tiny tf table; document length and the collection average come from
``size()`` expressions on the base scan (no second explode — the tfidf
lesson). At 100 TB the plan is: one corpus scan with the term filter
fused into it, one narrow shuffle on candidate doc ids, a broadcast of
the two collection constants, TakeOrdered top-k.

Cross-engine determinism: each per-term score is IEEE double with the
SAME operation order as the SQL oracle, rounded to 9 digits, then
summed as exact decimal before the final 6-digit round — the engine's
standard fixed-point pattern, so per-doc scores are bit-identical at
any partitioning.

A retrieval pipeline uses this as the ranking half of retrieval-based
decontamination (score eval questions against the training corpus) and
as a lightweight search audit beside the hashed-vector cosine path
(operators/textanalysis.hashed_cosine_topk).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataprofiler_spark.operators.textanalysis import (token_count_expr,
                                                       tokens_expr)

_TOKEN_RE = r"[^ \t\n\x0B\f\r]+"


def _query_terms(query: str) -> list[str]:
    """Driver-side tokenization with the corpus rule (lowercase,
    whitespace split), deduplicated, order-stable."""
    seen: dict[str, None] = {}
    for t in query.lower().split():
        seen.setdefault(t, None)
    return list(seen)


def bm25_topk(df: DataFrame, id_col: str, text_col: str, query: str,
              k: int = 10, k1: float = 1.2, b: float = 0.75,
              round_digits: int = 6) -> DataFrame:
    """(id, n_hit_terms, score, rank): top-k documents for ``query`` by
    BM25. idf = ln((N - df + 0.5)/(df + 0.5) + 1) (always positive);
    term saturation tf·(k1+1)/(tf + k1·(1 − b + b·dl/avgdl)). N counts
    every collection row (a NULL text is a length-0 document); ties
    break on id ascending."""
    terms = _query_terms(query)
    if not terms:
        raise ValueError("bm25_topk: empty query")
    from dataprofiler_spark.session import (ensure_parallelism,
                                            explode_no_prefilter)

    base = ensure_parallelism(
        df.select(F.col(id_col).alias("id"),
                  tokens_expr(text_col).alias("toks"),
                  token_count_expr(text_col).alias("dl")))
    consts = base.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"))
    exploded = explode_no_prefilter(base, "toks", "term", "id", "dl")
    tf = (exploded.where(F.col("term").isin(terms))
          .groupBy("id", "dl", "term")
          .agg(F.count(F.lit(1)).alias("tf")))
    from pyspark.sql.window import Window
    scored = (tf.withColumn("df", F.count(F.lit(1))
                            .over(Window.partitionBy("term")))
              .crossJoin(F.broadcast(consts)))
    idf = F.log((F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)) + F.lit(1.0))
    denom = (F.col("tf")
             + F.lit(k1) * (F.lit(1.0) - F.lit(b)
                            + F.lit(b) * F.col("dl") / F.col("avgdl")))
    term_score = F.round(idf * F.col("tf") * F.lit(k1 + 1.0) / denom, 9)
    return (scored
            .groupBy("id")
            .agg(F.count(F.lit(1)).alias("n_hit_terms"),
                 F.round(F.sum(term_score.cast("decimal(28,12)"))
                         .cast("double"), round_digits).alias("score"))
            .orderBy(F.desc("score"), F.asc("id"))
            .limit(k)
            .withColumn("rank", F.row_number().over(
                Window.orderBy(F.desc("score"), F.asc("id"))))
            .select("id", "n_hit_terms", "score", "rank"))


def _hash_query_vector(query: str, dim: int, seed: str) -> dict[int, int]:
    """Driver-side hashing-trick vector of the query text, bit-identical
    to operators/textanalysis.hashed_doc_vectors (same md5 scheme:
    dimension from hex[0:4], ±1 sign from hex[4]); zero entries dropped
    (signs can cancel)."""
    import hashlib

    qv: dict[int, int] = {}
    for t in query.lower().split():
        h = hashlib.md5(f"{seed}|{t}".encode()).hexdigest()
        dpos = int(h[:4], 16) % dim
        sign = 1 if int(h[4], 16) % 2 == 0 else -1
        qv[dpos] = qv.get(dpos, 0) + sign
    return {d: v for d, v in qv.items() if v != 0}


def hashed_query_cosine_topk(df: DataFrame, id_col: str, text_col: str,
                             query: str, k: int = 10, dim: int = 64,
                             seed: str = "dps-hashvec-v1",
                             round_digits: int = 9) -> DataFrame:
    """(id, cosine, rank): free-text vector search with no embedding
    column — the query hashes driver-side into the same hashing-trick
    space as the corpus (textanalysis.hashed_doc_vectors), so the dot
    product is a join on the hashed dimension against a broadcast
    ``dim``-row literal frame. Integer dots/norms, cosine rounded, ties
    (cosine desc, id asc). Zero-norm docs (and docs sharing no nonzero
    dimension with the query) don't rank."""
    from dataprofiler_spark.operators.textanalysis import hashed_doc_vectors
    from dataprofiler_spark.operators.topk import ranked_topk

    qv = _hash_query_vector(query, dim, seed)
    if not qv:
        raise ValueError("hashed_query_cosine_topk: query hashes to the "
                         "zero vector (empty query or cancelling signs)")
    qnrm2 = float(sum(v * v for v in qv.values()))
    spark = df.sparkSession
    qf = spark.createDataFrame(sorted(qv.items()), "dpos int, qv long")
    vecs = (hashed_doc_vectors(df, id_col, text_col, dim=dim, seed=seed)
            .where(F.col("value") != 0)
            .select(F.col(id_col).alias("id"), "dpos", "value"))
    norms = vecs.groupBy("id").agg(
        F.sum(F.col("value") * F.col("value")).alias("nrm2"))
    dots = (vecs.join(F.broadcast(qf), "dpos")
            .groupBy("id")
            .agg(F.sum(F.col("value") * F.col("qv")).alias("dot")))
    scored = (dots.join(norms, "id")
              .where(F.col("nrm2") > 0)
              .select("id",
                      F.round(F.col("dot").cast("double")
                              / (F.sqrt(F.col("nrm2").cast("double"))
                                 * F.lit(qnrm2 ** 0.5)),
                              round_digits).alias("cosine")))
    return ranked_topk(scored, [F.desc("cosine"), F.asc("id")], k)


def hybrid_rrf_topk(df: DataFrame, id_col: str, text_col: str, query: str,
                    k: int = 10, n_cand: int = 50, rrf_k: int = 60,
                    dim: int = 64, seed: str = "dps-hashvec-v1",
                    k1: float = 1.2, b: float = 0.75) -> DataFrame:
    """(id, bm25_rank, cos_rank, rrf, rank): reciprocal-rank fusion
    (Cormack, Clarke & Buettcher 2009) of the BM25 lexical ranking and
    the hashed-vector cosine ranking for one free-text query — the
    standard hybrid-search / retrieval-decontamination combiner.

    Each leg takes its top ``n_cand`` independently (both end in
    TakeOrderedAndProject, so the fusion join touches ≤ 2·n_cand rows no
    matter the corpus size); rrf = Σ_leg 1/(rrf_k + rank_leg), with a
    missing leg contributing 0. Ranks are integers, and each reciprocal
    is computed in double with the same expression order on both
    engines, so the fused score is engine-exact."""
    bm = (bm25_topk(df, id_col, text_col, query, k=n_cand, k1=k1, b=b)
          .select("id", F.col("rank").alias("bm25_rank")))
    vr = (hashed_query_cosine_topk(df, id_col, text_col, query,
                                   k=n_cand, dim=dim, seed=seed)
          .select("id", F.col("rank").alias("cos_rank")))
    from dataprofiler_spark.operators.topk import ranked_topk

    fused = (bm.join(vr, "id", "full_outer")
             .select("id", "bm25_rank", "cos_rank",
                     F.round(
                         F.coalesce(F.lit(1.0)
                                    / (F.lit(rrf_k) + F.col("bm25_rank")),
                                    F.lit(0.0))
                         + F.coalesce(F.lit(1.0)
                                      / (F.lit(rrf_k) + F.col("cos_rank")),
                                      F.lit(0.0)),
                         9).alias("rrf")))
    return ranked_topk(fused, [F.desc("rrf"), F.asc("id")], k)


def _bm25_ctes(table: str, id_col: str, text_col: str, query: str,
               k1: float, b: float, round_digits: int) -> str:
    """CTE chain base/consts/tf/scored/per_term/bm_agg — ``bm_agg`` is
    (id, n_hit_terms, score). Composable: hybrid fusion appends vector
    CTEs that re-read ``base.toks``."""
    terms = _query_terms(query)
    in_list = ", ".join("'" + t.replace("'", "''") + "'" for t in terms)
    toks = f"regexp_extract_all(LOWER({text_col}), '{_TOKEN_RE}')"
    return f"""base AS (
  SELECT {id_col} AS id,
         COALESCE(LEN({toks}), 0) AS dl,
         {toks} AS toks
  FROM {table}
),
consts AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS avgdl
  FROM base
),
tf AS (
  SELECT id, dl, term, COUNT(*) AS tf
  FROM (SELECT id, dl, UNNEST(toks) AS term FROM base)
  WHERE term IN ({in_list})
  GROUP BY id, dl, term
),
scored AS (
  SELECT tf.id, tf.dl, tf.tf,
         COUNT(*) OVER (PARTITION BY term) AS df,
         consts.n_docs, consts.avgdl
  FROM tf CROSS JOIN consts
),
per_term AS (
  SELECT id,
         ROUND(LN((n_docs - df + 0.5) / (df + 0.5) + 1.0)
               * tf * {k1 + 1.0!r}
               / (tf + {k1!r} * (1.0 - {b!r} + {b!r} * dl / avgdl)),
               9) AS s
  FROM scored
),
bm_agg AS (
  SELECT id, COUNT(*) AS n_hit_terms,
         ROUND(CAST(SUM(CAST(s AS DECIMAL(28,12))) AS DOUBLE),
               {round_digits}) AS score
  FROM per_term GROUP BY id
)"""


def oracle_bm25_topk_sql(table: str, id_col: str, text_col: str,
                         query: str, k: int = 10, k1: float = 1.2,
                         b: float = 0.75, round_digits: int = 6) -> str:
    ctes = _bm25_ctes(table, id_col, text_col, query, k1, b, round_digits)
    return f"""
WITH {ctes}
SELECT id, n_hit_terms, score,
       CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id ASC) AS BIGINT)
         AS rank
FROM bm_agg
ORDER BY score DESC, id ASC
LIMIT {k}
"""


def _hashed_cosine_ctes(table: str, id_col: str, text_col: str,
                        query: str, dim: int, seed: str,
                        round_digits: int) -> str:
    """CTE chain vtok/vsparse/vnorms/qvec/vdots/vcos — ``vcos`` is
    (id, cosine), mirroring hashed_query_cosine_topk: the corpus side is
    textanalysis.hashed_doc_vectors' md5 scheme, the query vector is the
    driver-computed literal VALUES list, and the cosine divides the
    integer dot by sqrt(nrm2)·<literal qnorm> in the same order."""
    qv = _hash_query_vector(query, dim, seed)
    if not qv:
        raise ValueError("oracle: query hashes to the zero vector")
    qnrm = repr(float(sum(v * v for v in qv.values())) ** 0.5)
    vals = ", ".join(f"({d}, {v})" for d, v in sorted(qv.items()))
    h = f"md5('{seed}' || '|' || t)"
    return f"""vtok AS (
  SELECT {id_col} AS id,
         unnest(regexp_extract_all(LOWER({text_col}), '{_TOKEN_RE}')) AS t
  FROM {table}
),
vsparse AS (
  SELECT id,
         CAST(('0x' || substr({h}, 1, 4))::BIGINT % {dim} AS INT) AS dpos,
         CAST(SUM(CASE WHEN ('0x' || substr({h}, 5, 1))::BIGINT % 2 = 0
                       THEN 1 ELSE -1 END) AS BIGINT) AS value
  FROM vtok GROUP BY 1, 2
  HAVING value <> 0
),
vnorms AS (
  SELECT id, SUM(value * value) AS nrm2 FROM vsparse GROUP BY id
),
qvec AS (
  SELECT * FROM (VALUES {vals}) AS q(dpos, qv)
),
vdots AS (
  SELECT id, SUM(value * qv) AS dot
  FROM vsparse JOIN qvec USING (dpos)
  GROUP BY id
),
vcos AS (
  SELECT vdots.id,
         ROUND(CAST(dot AS DOUBLE)
               / (SQRT(CAST(nrm2 AS DOUBLE)) * {qnrm}),
               {round_digits}) AS cosine
  FROM vdots JOIN vnorms ON vdots.id = vnorms.id
  WHERE nrm2 > 0
)"""


def oracle_hashed_query_cosine_topk_sql(table: str, id_col: str,
                                        text_col: str, query: str,
                                        k: int = 10, dim: int = 64,
                                        seed: str = "dps-hashvec-v1",
                                        round_digits: int = 9) -> str:
    ctes = _hashed_cosine_ctes(table, id_col, text_col, query, dim, seed,
                               round_digits)
    return f"""
WITH {ctes}
SELECT id, cosine,
       CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, id ASC) AS BIGINT)
         AS rank
FROM vcos
ORDER BY cosine DESC, id ASC
LIMIT {k}
"""


def oracle_hybrid_rrf_topk_sql(table: str, id_col: str, text_col: str,
                               query: str, k: int = 10, n_cand: int = 50,
                               rrf_k: int = 60, dim: int = 64,
                               seed: str = "dps-hashvec-v1",
                               k1: float = 1.2, b: float = 0.75) -> str:
    bm_ctes = _bm25_ctes(table, id_col, text_col, query, k1, b,
                         round_digits=6)
    v_ctes = _hashed_cosine_ctes(table, id_col, text_col, query, dim, seed,
                                 round_digits=9)
    return f"""
WITH {bm_ctes},
{v_ctes},
bm AS (
  SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY score DESC, id ASC)
                  AS BIGINT) AS bm25_rank
  FROM bm_agg ORDER BY score DESC, id ASC LIMIT {n_cand}
),
vr AS (
  SELECT id, CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, id ASC)
                  AS BIGINT) AS cos_rank
  FROM vcos ORDER BY cosine DESC, id ASC LIMIT {n_cand}
),
fused AS (
  SELECT COALESCE(bm.id, vr.id) AS id, bm25_rank, cos_rank,
         ROUND(COALESCE(CAST(1.0 AS DOUBLE) / ({rrf_k} + bm25_rank), 0.0)
               + COALESCE(CAST(1.0 AS DOUBLE) / ({rrf_k} + cos_rank), 0.0),
               9) AS rrf
  FROM bm FULL OUTER JOIN vr ON bm.id = vr.id
)
SELECT id, bm25_rank, cos_rank, rrf,
       CAST(ROW_NUMBER() OVER (ORDER BY rrf DESC, id ASC) AS BIGINT)
         AS rank
FROM fused
ORDER BY rrf DESC, id ASC
LIMIT {k}
"""
