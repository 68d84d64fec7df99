from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataprofiler_spark import report as rep
from dataprofiler_spark.operators import textanalysis as ta
from dataprofiler_spark.operators import numeric as num
from dataprofiler_spark.operators import multimodal as mm
from dataprofiler_spark.queries._registry import ORACLE_SQL
from dataprofiler_spark.queries._registry import T, register

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


@register("quality_rollup_documents",
          ta.oracle_quality_rollup_sql("documents", "text", "source"))
def quality_rollup_documents(spark, sf_dir):
    """Per-source corpus health (n_docs, tokens, order-independent avg
    quality, low-quality count) + grand total via ROLLUP."""
    return ta.quality_rollup(T(spark, sf_dir, "documents"), "text", "source")


# The synthetic documents table has no URL column, so the registered
# query derives a deterministic one from (doc_id, source) — the SAME SQL
# expression string runs through F.expr on the Spark side and inline in
# the oracle, so the parse under test is identical. The pool exercises
# every branch of the registrable-domain heuristic: www/sub hosts, a
# two-level suffix (co.uk), a bare two-label host, a port, and NULLs.
_DOC_URL_EXPR = (
    "CASE WHEN doc_id % 17 = 0 THEN NULL ELSE "
    "'https://' || "
    "CASE CAST(doc_id % 6 AS INT) "
    "  WHEN 0 THEN 'www.alpha.com'"
    "  WHEN 1 THEN 'cdn.alpha.com'"
    "  WHEN 2 THEN 'news.beta.co.uk'"
    "  WHEN 3 THEN 'beta.co.uk'"
    "  WHEN 4 THEN 'gamma.io'"
    "  ELSE 'sub.delta.org' END || "
    "CASE WHEN doc_id % 13 = 0 THEN ':8443' ELSE '' END || "
    "'/' || source || '/' || CAST(doc_id AS VARCHAR(20)) END")


def _domain_oracle():
    from dataprofiler_spark.operators import domains as dmn
    return dmn.oracle_domain_rollup_sql("documents", _DOC_URL_EXPR, "text")


@register("domain_rollup_documents", None)
def domain_rollup_documents(spark, sf_dir):
    """Per-registrable-domain curation rollup (CCNet-style weighting
    table): quality / token / corpus-wide exact-dup stats per domain.
    Map-side host parse + suffix heuristic, one groupBy(domain) + one
    md5-keyed dup agg."""
    from dataprofiler_spark.operators import domains as dmn
    docs = T(spark, sf_dir, "documents").withColumn(
        "url", F.expr(_DOC_URL_EXPR))
    return dmn.domain_rollup(docs, "url", "text")


ORACLE_SQL["domain_rollup_documents"] = _domain_oracle()


@register("numeric_profile_by_returnflag",
          num.oracle_numeric_profile_by_group_sql("lineitem", "l_returnflag",
                                                  "l_extendedprice"))
def numeric_profile_by_returnflag(spark, sf_dir):
    """Segmented exact-mode numeric battery: one groupBy, decimal power
    sums — per-segment drill-down of the profile."""
    return num.numeric_profile_by_group(T(spark, sf_dir, "lineitem"),
                                        "l_returnflag", "l_extendedprice")


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

# The synthesized payload is PNG sig(8) + IHDR len(4) + "IHDR"(4) +
# w(4) + h(4) + depth/color/etc(5) + CRC(4) = 33 bytes + the text; the
# REAL header parser in the engine extracts (png, w, h), and this oracle
# recomputes the same dimension statistics independently from the
# (text length, id) derivation — so a parser regression breaks the hash.
_MEDIA_ORACLE = """
SELECT COUNT(*) AS n_media,
       CAST(SUM(33 + octet_length(encode(text))) AS BIGINT) AS total_bytes,
       MIN(33 + octet_length(encode(text))) AS min_bytes,
       MAX(33 + octet_length(encode(text))) AS max_bytes,
       COUNT(DISTINCT md5(CAST(LENGTH(text) % 512 + 16 AS VARCHAR)
                          || '|' || CAST(doc_id % 512 + 16 AS VARCHAR)
                          || '|' || text)) AS distinct_payloads,
       CAST(COUNT(DISTINCT CASE WHEN text IS NULL THEN NULL
                           ELSE 'png' END) AS BIGINT) AS n_formats,
       ROUND(AVG(LENGTH(text) % 512 + 16), 6) AS avg_width,
       CAST(MAX(LENGTH(text) % 512 + 16) AS BIGINT) AS max_width,
       -- height derives from doc_id, but a NULL text nulls the WHOLE
       -- payload on the engine side, so every per-media stat must skip
       -- NULL-text rows here too (found by the adversarial suite)
       ROUND(AVG(CASE WHEN text IS NULL THEN NULL
                 ELSE doc_id % 512 + 16 END), 6) AS avg_height,
       CAST(MAX(CASE WHEN text IS NULL THEN NULL
                ELSE doc_id % 512 + 16 END) AS BIGINT) AS max_height
FROM documents
"""


@register("media_profile_documents", _MEDIA_ORACLE)
def media_profile_documents(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    media = mm.documents_as_png_media(docs)
    feats = mm.decode_media_features(media, "id", "payload")
    return mm.media_profile(feats)


# Audio/video twin of the PNG path: synthesize VALID WAV containers from
# (doc_id, text), parse them back with the real RIFF chunk walker, and
# let the oracle recompute the same audio stats from the derivation —
# a parser regression breaks the hash.
_AV_ORACLE = """
WITH d AS (
  SELECT doc_id,
         doc_id % 2 + 1 AS ch,
         8000 + (LENGTH(COALESCE(text, '')) % 8) * 1000 AS rate,
         octet_length(encode(COALESCE(text, ''))) AS dsz
  FROM documents
)
SELECT COUNT(*) AS n_media,
       CAST(SUM(44 + dsz) AS BIGINT) AS total_bytes,
       CAST(1 AS BIGINT) AS n_formats,
       ROUND(AVG(rate), 6) AS avg_sample_rate,
       CAST(MAX(rate) AS BIGINT) AS max_sample_rate,
       ROUND(AVG(ch), 6) AS avg_channels,
       CAST(SUM((dsz * 1000) // (rate * ch * 2)) AS BIGINT)
         AS total_duration_ms,
       CAST(MAX((dsz * 1000) // (rate * ch * 2)) AS BIGINT)
         AS max_duration_ms
FROM d
"""


@register("av_profile_documents", _AV_ORACLE)
def av_profile_documents(spark, sf_dir):
    docs = T(spark, sf_dir, "documents")
    media = mm.documents_as_wav_media(docs)
    feats = mm.decode_av_features(media, "id", "payload")
    return mm.av_profile(feats)


