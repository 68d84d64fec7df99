"""Driver-facing query registry.

Every implemented operator from SURVEY.md §2 registers here as a
(spark_callable, oracle_sql) pair. ``__spark_entry__.py`` re-exports the
registry. The oracle SQL is DuckDB-dialect ANSI SQL computing the same
result with the same column names; numeric formulations are chosen so
double-precision results are bit-identical across engines (see
operators/numeric.py docstring).
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataprofiler_spark.operators import categorical as cat
from dataprofiler_spark.operators import datetimes as dt
from dataprofiler_spark.operators import histogram as hist
from dataprofiler_spark.operators import numeric as num
from dataprofiler_spark.operators import order as ordmod
from dataprofiler_spark.operators import rowstats as rs
from dataprofiler_spark.operators import textstats as ts

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn
    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS), which Spark rejects by
        # default; read as long nanos and convert to microsecond timestamps
        # with integer division (a double division would lose precision at
        # 1.7e18 ns epochs).
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ---------------------------------------------------------------------------
# Numeric profile battery (SURVEY §2.4: min/max/sum/mean/variance/stddev/
# skewness/kurtosis/num_zeros/num_negatives, exact oracle-matched mode)
# ---------------------------------------------------------------------------

_LINEITEM_NUM = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


@register(
    "numeric_profile_lineitem",
    num.oracle_numeric_profile_sql("lineitem", _LINEITEM_NUM),
)
def numeric_profile_lineitem(spark, sf_dir):
    df = T(spark, sf_dir, "lineitem")
    return num.numeric_profile(df, _LINEITEM_NUM, mode="exact")


_ORDERS_NUM = ["o_totalprice"]


@register(
    "numeric_profile_orders",
    num.oracle_numeric_profile_sql("orders", _ORDERS_NUM),
)
def numeric_profile_orders(spark, sf_dir):
    df = T(spark, sf_dir, "orders")
    return num.numeric_profile(df, _ORDERS_NUM, mode="exact")


# ---------------------------------------------------------------------------
# Categorical profile (SURVEY §2.4: category counts, gini, unalikeability,
# unique counts, top-k)
# ---------------------------------------------------------------------------

_LINEITEM_CAT = ["l_returnflag", "l_linestatus"]

_CAT_COUNTS_ORACLE = """
SELECT 'l_returnflag' AS "column", CAST(l_returnflag AS VARCHAR) AS value,
       COUNT(*) AS count
FROM lineitem GROUP BY l_returnflag
UNION ALL
SELECT 'l_linestatus' AS "column", CAST(l_linestatus AS VARCHAR) AS value,
       COUNT(*) AS count
FROM lineitem GROUP BY l_linestatus
"""


@register("category_counts_lineitem", _CAT_COUNTS_ORACLE)
def category_counts_lineitem(spark, sf_dir):
    df = T(spark, sf_dir, "lineitem")
    return cat.category_counts(df, _LINEITEM_CAT)


_CAT_STATS_ORACLE = """
WITH counts AS (
  SELECT 'l_returnflag' AS col, CAST(l_returnflag AS VARCHAR) AS value,
         COUNT(*) AS cnt FROM lineitem GROUP BY l_returnflag
  UNION ALL
  SELECT 'l_linestatus' AS col, CAST(l_linestatus AS VARCHAR) AS value,
         COUNT(*) AS cnt FROM lineitem GROUP BY l_linestatus
)
SELECT col AS "column",
       COUNT(*) AS unique_count,
       SUM(cnt) AS sample_count,
       ROUND(CAST(COUNT(*) AS DOUBLE) / SUM(cnt), 6) AS unique_ratio,
       ROUND(1.0 - CAST(SUM(cnt * cnt) AS DOUBLE) / (SUM(cnt) * SUM(cnt)), 6) AS gini_impurity,
       ROUND(CAST(SUM(cnt) * SUM(cnt) - SUM(cnt * cnt) AS DOUBLE)
             / (SUM(cnt) * SUM(cnt) - SUM(cnt)), 6) AS unalikeability
FROM counts GROUP BY col
"""


@register("categorical_stats_lineitem", _CAT_STATS_ORACLE)
def categorical_stats_lineitem(spark, sf_dir):
    df = T(spark, sf_dir, "lineitem")
    counts = cat.category_counts(df, _LINEITEM_CAT)
    stats = cat.categorical_stats(counts)
    return stats.select(
        "column",
        "unique_count",
        "sample_count",
        F.round("unique_ratio", 6).alias("unique_ratio"),
        F.round("gini_impurity", 6).alias("gini_impurity"),
        F.round("unalikeability", 6).alias("unalikeability"),
    )


_TOPK_ORACLE = """
WITH counts AS (
  SELECT 'o_orderpriority' AS col, CAST(o_orderpriority AS VARCHAR) AS value,
         COUNT(*) AS cnt FROM orders GROUP BY o_orderpriority
  UNION ALL
  SELECT 'o_orderstatus' AS col, CAST(o_orderstatus AS VARCHAR) AS value,
         COUNT(*) AS cnt FROM orders GROUP BY o_orderstatus
), ranked AS (
  SELECT col, value, cnt,
         ROW_NUMBER() OVER (PARTITION BY col ORDER BY cnt DESC, value ASC) AS rank
  FROM counts
)
SELECT col AS "column", value, cnt AS count, rank FROM ranked WHERE rank <= 3
"""


@register("top_categories_orders", _TOPK_ORACLE)
def top_categories_orders(spark, sf_dir):
    df = T(spark, sf_dir, "orders")
    counts = cat.category_counts(df, ["o_orderpriority", "o_orderstatus"])
    return cat.top_k_categories(counts, k=3)


# ---------------------------------------------------------------------------
# Row statistics (SURVEY §2.4: row uniqueness, duplicate rows, row nulls)
# ---------------------------------------------------------------------------

_LINEITEM_ALL = [
    "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
    "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    "l_shipdate",
]


@register("row_stats_lineitem", rs.oracle_row_stats_sql("lineitem", _LINEITEM_ALL))
def row_stats_lineitem(spark, sf_dir):
    df = T(spark, sf_dir, "lineitem")
    return rs.row_stats(df, _LINEITEM_ALL, hashing_method="full")


# ---------------------------------------------------------------------------
# Distinct counts per column (SURVEY §2.4 unique_count; exact mode)
# ---------------------------------------------------------------------------

_DISTINCT_COLS = ["l_orderkey", "l_partkey", "l_suppkey", "l_returnflag",
                  "l_linestatus", "l_shipdate"]

_DISTINCT_ORACLE = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS \"column\", COUNT(DISTINCT {c}) AS unique_count FROM lineitem"
    for c in _DISTINCT_COLS
)


@register("distinct_counts_lineitem", _DISTINCT_ORACLE)
def distinct_counts_lineitem(spark, sf_dir):
    df = T(spark, sf_dir, "lineitem")
    aggs = [F.count_distinct(F.col(c)).alias(c) for c in _DISTINCT_COLS]
    row = df.agg(*aggs)
    structs = [
        F.struct(F.lit(c).alias("column"), F.col(c).alias("unique_count"))
        for c in _DISTINCT_COLS
    ]
    return row.select(F.explode(F.array(*structs)).alias("s")).select("s.*")


# ---------------------------------------------------------------------------
# Histogram / quantiles / median / MAD / modes (SURVEY §2.4)
# ---------------------------------------------------------------------------

@register("histogram_extendedprice",
          hist.oracle_histogram_sql("lineitem", "l_extendedprice", 20))
def histogram_extendedprice(spark, sf_dir):
    return hist.histogram(T(spark, sf_dir, "lineitem"), "l_extendedprice", 20)


_QPROBS = [0.01, 0.05, 0.1, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99]


@register("quantiles_extendedprice",
          hist.oracle_quantiles_sql("lineitem", "l_extendedprice", _QPROBS))
def quantiles_extendedprice(spark, sf_dir):
    return hist.quantiles(T(spark, sf_dir, "lineitem"), "l_extendedprice", _QPROBS)


@register("median_mad_quantity",
          hist.oracle_median_mad_sql("lineitem", "l_quantity"))
def median_mad_quantity(spark, sf_dir):
    return hist.median_mad(T(spark, sf_dir, "lineitem"), "l_quantity")


@register("modes_quantity", hist.oracle_modes_sql("lineitem", "l_quantity", 5))
def modes_quantity(spark, sf_dir):
    return hist.modes(T(spark, sf_dir, "lineitem"), "l_quantity", 5)


# ---------------------------------------------------------------------------
# Datetime profile + time-bucket rollup (SURVEY §2.4; events stream table)
# ---------------------------------------------------------------------------

@register("datetime_profile_orders",
          dt.oracle_datetime_profile_sql("orders", ["o_orderdate"]))
def datetime_profile_orders(spark, sf_dir):
    return dt.datetime_profile(T(spark, sf_dir, "orders"), ["o_orderdate"])


@register("time_bucket_events",
          dt.oracle_time_bucket_sql("events", "ts", "value", "hour"))
def time_bucket_events(spark, sf_dir):
    return dt.time_bucket_rollup(T(spark, sf_dir, "events"), "ts", "value", "hour")


# ---------------------------------------------------------------------------
# Order detection (SURVEY §2.4 / §2.6)
# ---------------------------------------------------------------------------

@register("order_profile_lineitem",
          ordmod.oracle_order_profile_sql(
              "lineitem", "l_orderkey", ["l_orderkey", "l_linenumber"]))
def order_profile_lineitem(spark, sf_dir):
    return ordmod.order_profile(
        T(spark, sf_dir, "lineitem"), "l_orderkey", ["l_orderkey", "l_linenumber"])


@register("order_profile_events_value",
          ordmod.oracle_order_profile_sql("events", "value", ["event_id"]))
def order_profile_events_value(spark, sf_dir):
    return ordmod.order_profile(T(spark, sf_dir, "events"), "value", ["event_id"])


# ---------------------------------------------------------------------------
# Text column stats + unstructured word counts (SURVEY §2.4)
# ---------------------------------------------------------------------------

_TEXT_COLS = ["c_name", "c_mktsegment"]


@register("text_stats_customer",
          ts.oracle_text_length_stats_sql("customer", _TEXT_COLS))
def text_stats_customer(spark, sf_dir):
    return ts.text_length_stats(T(spark, sf_dir, "customer"), _TEXT_COLS)


@register("word_counts_documents",
          ts.oracle_word_counts_sql("documents", "text", 20))
def word_counts_documents(spark, sf_dir):
    return ts.word_counts(T(spark, sf_dir, "documents"), "text", 20)


# ---------------------------------------------------------------------------
# Dedup suite (training-data pipeline ops; SURVEY §7.2 step 8)
# ---------------------------------------------------------------------------

from dataprofiler_spark.operators import dedup as dd
from dataprofiler_spark.operators import multimodal as mm
from dataprofiler_spark.operators import similarity as sim
from dataprofiler_spark.operators import textanalysis as ta


@register("exact_dedup_documents", dd.oracle_exact_dedup_sql("documents", "text"))
def exact_dedup_documents(spark, sf_dir):
    return dd.exact_dedup_summary(T(spark, sf_dir, "documents"), "text")


@register("ngram_jaccard_documents",
          dd.oracle_ngram_jaccard_adjacent_sql("documents", "doc_id", "text", 3))
def ngram_jaccard_documents(spark, sf_dir):
    return dd.ngram_jaccard_adjacent(T(spark, sf_dir, "documents"), "doc_id", "text", 3)


@register("minhash_signatures_documents",
          dd.oracle_minhash_signatures_sql("documents", "doc_id", "text", 3, 12))
def minhash_signatures_documents(spark, sf_dir):
    return dd.minhash_signatures(T(spark, sf_dir, "documents"), "doc_id", "text", 3, 12)


@register("minhash_lsh_pairs_documents",
          dd.oracle_minhash_lsh_pairs_sql("documents", "doc_id", "text",
                                          k=3, num_hashes=12, bands=6, threshold=0.5))
def minhash_lsh_pairs_documents(spark, sf_dir):
    return dd.minhash_lsh_pairs(T(spark, sf_dir, "documents"), "doc_id", "text",
                                k=3, num_hashes=12, bands=6, threshold=0.5)


@register("simhash_documents", dd.oracle_simhash_sql("documents", "doc_id", "text"))
def simhash_documents(spark, sf_dir):
    return dd.simhash(T(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# Similarity search over embeddings
# ---------------------------------------------------------------------------

@register("cosine_topk_embeddings",
          sim.oracle_cosine_topk_sql("embeddings", "vec_id", "embedding", 0, 64, 10))
def cosine_topk_embeddings(spark, sf_dir):
    return sim.cosine_topk(T(spark, sf_dir, "embeddings"), "vec_id", "embedding", 0, 10)


@register("lsh_topk_embeddings",
          sim.oracle_lsh_topk_sql("embeddings", "vec_id", "embedding", 0, 10, 4, 64))
def lsh_topk_embeddings(spark, sf_dir):
    return sim.lsh_topk(T(spark, sf_dir, "embeddings"), "vec_id", "embedding", 0,
                        k=10, n_planes=4, dim=64)


@register("embedding_neardup_pairs",
          sim.oracle_embedding_neardup_sql("embeddings", "vec_id", "embedding",
                                           threshold=0.5, n_planes=4, dim=64))
def embedding_neardup_pairs_q(spark, sf_dir):
    return sim.embedding_neardup_pairs(T(spark, sf_dir, "embeddings"), "vec_id",
                                       "embedding", threshold=0.5, n_planes=4, dim=64)


# ---------------------------------------------------------------------------
# Text analysis (lang-id, quality, token counts, fingerprints)
# ---------------------------------------------------------------------------

@register("token_summary_documents",
          ta.oracle_token_count_sql("documents", "doc_id", "text"))
def token_summary_documents(spark, sf_dir):
    return ta.token_count_summary(T(spark, sf_dir, "documents"), "doc_id", "text")


@register("quality_features_documents",
          ta.oracle_quality_features_sql("documents", "doc_id", "text"))
def quality_features_documents(spark, sf_dir):
    return ta.quality_features(T(spark, sf_dir, "documents"), "doc_id", "text")


@register("language_id_documents",
          ta.oracle_language_id_sql("documents", "doc_id", "text"))
def language_id_documents(spark, sf_dir):
    return ta.language_id(T(spark, sf_dir, "documents"), "doc_id", "text")


@register("fingerprints_documents",
          ta.oracle_fingerprints_sql("documents", "doc_id", "text"))
def fingerprints_documents(spark, sf_dir):
    return ta.fingerprints(T(spark, sf_dir, "documents"), "doc_id", "text")


# ---------------------------------------------------------------------------
# Multimodal plumbing (binary column -> mapInPandas feature extraction).
# The stub decode derives features deterministically from the payload, so
# the whole pipeline (Arrow batching included) is oracle-checkable in SQL.
# ---------------------------------------------------------------------------

_MEDIA_ORACLE = """
SELECT COUNT(*) AS n_media,
       SUM(octet_length(encode(text))) AS total_bytes,
       MIN(octet_length(encode(text))) AS min_bytes,
       MAX(octet_length(encode(text))) AS max_bytes,
       COUNT(DISTINCT md5(text)) AS distinct_payloads,
       COUNT(DISTINCT octet_length(encode(text)) % 3) AS n_formats
FROM documents
"""


@register("media_profile_documents", _MEDIA_ORACLE)
def media_profile_documents(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    media = mm.documents_as_media(docs)
    feats = mm.decode_media_features(media, "id", "payload")
    return mm.media_profile(feats)
