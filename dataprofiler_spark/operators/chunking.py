"""Document chunking + TF-IDF — training-data prep operators.

Chunking splits long documents into fixed-size token windows with
overlap (the standard context-window prep for LLM training/retrieval
corpora). Pure Catalyst expressions: tokenize once to a column,
generate chunk start offsets with ``sequence``, slice with
``F.slice`` — map-side only, zero shuffle, so at 100 TB the cost is
the scan plus the (bounded) output fan-out. Token positions — not
character offsets — define the windows, matching how a tokenizer-based
pipeline consumes them.

TF-IDF scores each (doc, term): ``tf = count in doc``,
``idf = ln((N + 1) / (df + 1)) + 1`` (the smoothed convention).
Shape: one explode + one (doc, term) groupBy for tf, one term groupBy
for df, a broadcast of the single-row corpus size, and a top-k window
per doc bounded to k rows. Nothing is all-pairs and the df table is
vocabulary-sized, not corpus-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataprofiler_spark.operators.textanalysis import tokens_expr


def chunk_documents(df: DataFrame, id_col: str, text_col: str,
                    chunk_tokens: int = 128,
                    overlap_tokens: int = 16) -> DataFrame:
    """(id, chunk_index, n_tokens, chunk_text): token-window chunks with
    overlap. Windows start every ``chunk_tokens - overlap_tokens``
    tokens; the final partial window is kept (min length 1 token).
    Documents shorter than one window yield exactly one chunk."""
    if not 0 <= overlap_tokens < chunk_tokens:
        raise ValueError("need 0 <= overlap_tokens < chunk_tokens")
    stride = chunk_tokens - overlap_tokens
    toks = df.select(F.col(id_col).alias("id"),
                     tokens_expr(text_col).alias("toks"))
    n = F.size("toks")
    # last window start: the largest multiple of stride < n (so a doc of
    # exactly chunk_tokens yields one chunk, not one + an empty tail)
    n_chunks = F.when(n <= chunk_tokens, F.lit(1)).otherwise(
        F.ceil((n - F.lit(chunk_tokens)) / F.lit(stride)) + 1)
    out = (toks.where(n > 0)
           .withColumn("chunk_index",
                       F.explode(F.sequence(F.lit(0),
                                            n_chunks.cast("int") - 1)))
           .withColumn("start", F.col("chunk_index") * stride)
           .withColumn("chunk_toks",
                       F.slice("toks", F.col("start") + 1, chunk_tokens)))
    return out.select(
        "id", "chunk_index",
        F.size("chunk_toks").alias("n_tokens"),
        F.array_join("chunk_toks", " ").alias("chunk_text"))


def chunk_summary(df: DataFrame, id_col: str, text_col: str,
                  chunk_tokens: int = 128,
                  overlap_tokens: int = 16) -> DataFrame:
    """Corpus-level chunking stats (1 row): total chunks, docs, max
    chunks per doc, total chunk tokens — the sizing numbers a training
    pipeline needs before materializing the chunked corpus."""
    ch = chunk_documents(df, id_col, text_col, chunk_tokens,
                         overlap_tokens)
    return ch.agg(
        F.count(F.lit(1)).alias("n_chunks"),
        F.count_distinct("id").alias("n_docs"),
        F.max("chunk_index").alias("max_chunk_index"),
        F.sum("n_tokens").alias("total_chunk_tokens"),
        F.min("n_tokens").alias("min_chunk_tokens"),
        F.max("n_tokens").alias("max_chunk_tokens"))


def oracle_chunk_summary_sql(table: str, id_col: str, text_col: str,
                             chunk_tokens: int = 128,
                             overlap_tokens: int = 16) -> str:
    stride = chunk_tokens - overlap_tokens
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    return f"""
WITH t AS (
  SELECT {id_col} AS id, {toks} AS toks, len({toks}) AS n
  FROM {table} WHERE len({toks}) > 0
),
c AS (
  SELECT id,
         UNNEST(generate_series(0,
           CASE WHEN n <= {chunk_tokens} THEN 0
                ELSE CAST(CEIL(CAST(n - {chunk_tokens} AS DOUBLE)
                               / {stride}) AS BIGINT) END)) AS chunk_index,
         toks, n
  FROM t
),
s AS (
  SELECT id, chunk_index,
         len(toks[chunk_index * {stride} + 1 :
                  LEAST(chunk_index * {stride} + {chunk_tokens}, n)])
           AS n_tokens
  FROM c
)
SELECT COUNT(*) AS n_chunks,
       COUNT(DISTINCT id) AS n_docs,
       CAST(MAX(chunk_index) AS INT) AS max_chunk_index,
       CAST(SUM(n_tokens) AS BIGINT) AS total_chunk_tokens,
       CAST(MIN(n_tokens) AS INT) AS min_chunk_tokens,
       CAST(MAX(n_tokens) AS INT) AS max_chunk_tokens
FROM s
"""


def tfidf_top_terms(df: DataFrame, id_col: str, text_col: str,
                    k: int = 5, min_df: int = 1,
                    round_digits: int = 6) -> DataFrame:
    """(id, term, tf, tfidf, rank): top-k characteristic terms per doc
    by smoothed TF-IDF. Ties break on term asc for determinism."""
    from pyspark.sql.window import Window

    from dataprofiler_spark.session import (ensure_parallelism,
                                            explode_no_prefilter)

    base = ensure_parallelism(
        df.select(F.col(id_col).alias("id"),
                  tokens_expr(text_col).alias("toks")))
    terms = explode_no_prefilter(base, "toks", "term", "id")
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # document frequency as a window over the tf table — NOT a second
    # aggregation of the raw terms: re-deriving tf twice would re-scan
    # and re-explode the corpus (Spark doesn't reuse shuffle files
    # across re-derived DataFrame lineages). Same shuffle count, one
    # scan.
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("term")))
    if min_df > 1:
        scored = scored.where(F.col("df") >= min_df)
    total = df.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (scored.crossJoin(F.broadcast(total))
              .withColumn(
                  "tfidf",
                  F.round(F.col("tf") * (F.log((F.col("n_docs") + 1)
                                               / (F.col("df") + 1)) + 1),
                          round_digits)))
    w = Window.partitionBy("id").orderBy(F.desc("tfidf"), F.asc("term"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("id", "term", "tf", "tfidf", "rank"))


def oracle_tfidf_top_sql(table: str, id_col: str, text_col: str,
                         k: int = 5, min_df: int = 1,
                         round_digits: int = 6) -> str:
    toks = f"regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')"
    return f"""
WITH terms AS (
  SELECT {id_col} AS id, UNNEST({toks}) AS term FROM {table}
),
tf AS (
  SELECT id, term, COUNT(*) AS tf FROM terms GROUP BY id, term
),
dfq AS (
  SELECT term, COUNT(*) AS df FROM tf GROUP BY term HAVING COUNT(*) >= {min_df}
),
total AS (SELECT COUNT(*) AS n_docs FROM {table}),
scored AS (
  SELECT tf.id, tf.term, tf.tf,
         ROUND(tf.tf * (LN(CAST(total.n_docs + 1 AS DOUBLE)
                           / (dfq.df + 1)) + 1), {round_digits}) AS tfidf
  FROM tf JOIN dfq USING (term) CROSS JOIN total
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY id
                               ORDER BY tfidf DESC, term ASC) AS rank
  FROM scored
)
SELECT id, term, tf, CAST(tfidf AS DOUBLE) AS tfidf, rank
FROM ranked WHERE rank <= {k}
"""


def packing_stats(df: DataFrame, id_col: str, text_col: str,
                  context_len: int = 512,
                  round_digits: int = 6) -> DataFrame:
    """Context-window packing audit for a training corpus: one row of
    (n_docs, total_tokens, docs_over_context, truncated_tokens,
    padding_waste_1doc, packed_windows_lb, packing_efficiency).

    - ``truncated_tokens``: tokens lost if each doc is clipped to the
      context length (the truncate-don't-split policy's cost);
    - ``padding_waste_1doc``: pad tokens burned by naive
      one-document-per-window batching;
    - ``packed_windows_lb``: ceil(usable/context) — the lower bound any
      concat-and-split packer achieves, so ``packing_efficiency`` =
      usable / (windows * context) is the best-case window fill.

    Pure single-pass aggregation over a (id, text) projection — the
    decision whether to pack, truncate, or chunk a 100-TB corpus is one
    scan. Floats are confined to the final rounded efficiency ratio.
    """
    from dataprofiler_spark.operators.textanalysis import token_count_expr

    tc = token_count_expr(text_col)  # NULL text = 0 tokens, not size()=-1
    usable = F.least(tc, F.lit(context_len))
    agg = df.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(tc).alias("total_tokens"),
        F.sum((tc > context_len).cast("bigint")).alias("docs_over_context"),
        F.sum(F.greatest(tc - context_len, F.lit(0)).cast("bigint"))
         .alias("truncated_tokens"),
        F.sum((F.lit(context_len) - usable).cast("bigint"))
         .alias("padding_waste_1doc"),
        F.sum(usable.cast("bigint")).alias("usable_tokens"),
    )
    windows = F.ceil(F.col("usable_tokens").cast("double")
                     / F.lit(float(context_len)))
    return agg.select(
        "n_docs", "total_tokens", "docs_over_context", "truncated_tokens",
        "padding_waste_1doc",
        windows.alias("packed_windows_lb"),
        F.round(F.col("usable_tokens").cast("double")
                / (windows * F.lit(context_len)).cast("double"),
                round_digits).alias("packing_efficiency"),
    )


def oracle_packing_stats_sql(table: str, id_col: str, text_col: str,
                             context_len: int = 512,
                             round_digits: int = 6) -> str:
    tc = f"COALESCE(len(regexp_extract_all(LOWER({text_col}), '[^ \\t\\n\\x0b\\f\\r]+')), 0)"
    usable = f"LEAST({tc}, {context_len})"
    return f"""
WITH a AS (
  SELECT COUNT(*) AS n_docs,
         CAST(SUM({tc}) AS BIGINT) AS total_tokens,
         CAST(SUM(CASE WHEN {tc} > {context_len} THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_over_context,
         CAST(SUM(GREATEST({tc} - {context_len}, 0)) AS BIGINT)
           AS truncated_tokens,
         CAST(SUM({context_len} - {usable}) AS BIGINT) AS padding_waste_1doc,
         CAST(SUM({usable}) AS BIGINT) AS usable_tokens
  FROM {table}
)
SELECT n_docs, total_tokens, docs_over_context, truncated_tokens,
       padding_waste_1doc,
       CAST(CEIL(CAST(usable_tokens AS DOUBLE) / {float(context_len)!r})
            AS BIGINT) AS packed_windows_lb,
       ROUND(CAST(usable_tokens AS DOUBLE)
             / CAST(CEIL(CAST(usable_tokens AS DOUBLE)
                         / {float(context_len)!r}) * {context_len}
                    AS DOUBLE), {round_digits}) AS packing_efficiency
FROM a
"""


def pack_manifest(df: DataFrame, id_col: str, text_col: str,
                  context_len: int = 512, n_shards: int = 8,
                  seed: str = "dps-pack-v1") -> DataFrame:
    """Deterministic concat-and-split packing plan: assign every document
    a (shard, window range) under sequential greedy packing, the layout a
    training run's data loader materializes.

    Documents are sharded by md5(id) (so the plan is stable as the corpus
    grows and shards can pack independently on different executors), then
    packed in md5 order within the shard: each doc occupies tokens
    [cum_before, cum_before + tokens) of the shard's concatenated stream,
    i.e. context windows start_window..end_window. Zero-token docs pin
    both bounds to the window they fall at (they occupy no tokens).

    Plan: one scan + ONE cumulative-sum window partitioned by shard —
    n_shards bounded partitions, never a global order. At 100 TB raise
    ``n_shards`` so each shard's manifest fits a task; the per-shard
    token stream is exactly what a deterministic data loader replays.

    Output: (id, shard, tokens, start_window, end_window).
    """
    from pyspark.sql.window import Window

    from dataprofiler_spark.operators.textanalysis import token_count_expr

    tc = token_count_expr(text_col).cast("bigint")
    h = F.md5(F.concat_ws("|", F.lit(seed), F.col(id_col).cast("string")))
    shard = (F.conv(F.substring(h, 1, 4), 16, 10).cast("long")
             % n_shards).cast("int")
    base = df.select(F.col(id_col).alias("id"), tc.alias("tokens"),
                     h.alias("h"), shard.alias("shard"))
    w = (Window.partitionBy("shard").orderBy("h", "id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    cum = F.sum("tokens").over(w)
    start = (cum - F.col("tokens")).cast("double")
    ctx = F.lit(float(context_len))
    return base.select(
        F.col("id").alias(id_col), "shard", "tokens",
        F.floor(start / ctx).cast("bigint").alias("start_window"),
        F.when(F.col("tokens") > 0,
               F.floor((start + F.col("tokens") - 1) / ctx))
         .otherwise(F.floor(start / ctx))
         .cast("bigint").alias("end_window"),
    )


def oracle_pack_manifest_sql(table: str, id_col: str, text_col: str,
                             context_len: int = 512, n_shards: int = 8,
                             seed: str = "dps-pack-v1") -> str:
    from dataprofiler_spark.operators.textanalysis import TOKEN_COUNT_SQL

    tc = TOKEN_COUNT_SQL.format(col=text_col)
    h = f"md5('{seed}' || '|' || CAST({id_col} AS VARCHAR))"
    return f"""
WITH base AS (
  SELECT {id_col} AS id, CAST({tc} AS BIGINT) AS tokens, {h} AS h,
         CAST(('0x' || substr({h}, 1, 4))::BIGINT % {n_shards} AS INT)
           AS shard
  FROM {table}
),
packed AS (
  SELECT id, shard, tokens,
         CAST(SUM(tokens) OVER (PARTITION BY shard ORDER BY h, id
                                ROWS UNBOUNDED PRECEDING) - tokens
              AS DOUBLE) AS start_tok
  FROM base
)
SELECT id AS {id_col}, shard, tokens,
       CAST(FLOOR(start_tok / {float(context_len)!r}) AS BIGINT)
         AS start_window,
       CAST(CASE WHEN tokens > 0
                 THEN FLOOR((start_tok + tokens - 1) / {float(context_len)!r})
                 ELSE FLOOR(start_tok / {float(context_len)!r}) END
            AS BIGINT) AS end_window
FROM packed
"""
