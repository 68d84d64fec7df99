from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataprofiler_spark import report as rep
from dataprofiler_spark.labeler import regex_labeler as rl
from dataprofiler_spark.operators import textanalysis as ta
from dataprofiler_spark.queries.q_cnn import _ner_redact_rows
from dataprofiler_spark.queries.q_cnn import _ner_span_counts
from dataprofiler_spark.queries._registry import T, register

# ---------------------------------------------------------------------------
# Event-stream analytics: sessionization, JSON props, rolling windows
# ---------------------------------------------------------------------------

from dataprofiler_spark.operators import events as ev


@register("sessionize_events", ev.oracle_sessionize_sql("events"))
def sessionize_events(spark, sf_dir):
    return ev.sessionize(T(spark, sf_dir, "events"))


@register("json_props_events", ev.oracle_json_props_sql("events"))
def json_props_events(spark, sf_dir):
    return ev.json_props_summary(T(spark, sf_dir, "events"))


@register("rolling_avg_events", ev.oracle_rolling_avg_sql("events"))
def rolling_avg_events(spark, sf_dir):
    return ev.rolling_avg(T(spark, sf_dir, "events"))


_FUNNEL_STEPS = ["view", "click", "purchase"]


@register("funnel_events", ev.oracle_funnel_sql("events", _FUNNEL_STEPS))
def funnel_events(spark, sf_dir):
    """Ordered view→click→purchase funnel: per-user first-qualifying
    times via shared-partition windows (one Exchange total)."""
    return ev.funnel(T(spark, sf_dir, "events"), _FUNNEL_STEPS)


@register("funnel_within_events",
          ev.oracle_funnel_sql("events", _FUNNEL_STEPS,
                               within_seconds=14400))
def funnel_within_events(spark, sf_dir):
    """Funnel with a 4-hour conversion window — the bounded variant
    (discriminating on this corpus: most users don't chain view→click
    within 4h)."""
    return ev.funnel(T(spark, sf_dir, "events"), _FUNNEL_STEPS,
                     within_seconds=14400)


_FUNNEL_GAPS = [3600, 86400]


@register("funnel_gap_events",
          ev.oracle_funnel_sql("events", _FUNNEL_STEPS,
                               max_gap_seconds=_FUNNEL_GAPS))
def funnel_gap_events(spark, sf_dir):
    """Funnel with per-transition max gaps (1 h to click, 1 day to
    purchase) — the generalization of the uniform conversion window."""
    return ev.funnel(T(spark, sf_dir, "events"), _FUNNEL_STEPS,
                     max_gap_seconds=_FUNNEL_GAPS)


@register("retention_cohorts_events", ev.oracle_retention_sql("events"))
def retention_cohorts_events(spark, sf_dir):
    """Weekly cohort retention matrix from first-activity periods."""
    return ev.retention_cohorts(T(spark, sf_dir, "events"))


@register("interarrival_events", ev.oracle_interarrival_sql("events"))
def interarrival_events(spark, sf_dir):
    """Per-user inter-event gap summary + Goh-Barabási burstiness (bot
    vs human activity shape); user-partitioned lag window + one exact
    integer-microsecond fold."""
    return ev.interarrival_stats(T(spark, sf_dir, "events"))


@register("active_users_events", ev.oracle_active_users_sql("events"))
def active_users_events(spark, sf_dir):
    """Exact DAU/WAU/stickiness via the explode-into-windows trick
    (trailing countDistinct can't ride a window function)."""
    return ev.active_users_rollup(T(spark, sf_dir, "events"))


# z=1.0 so the mildly uneven synthetic day counts actually flag rows —
# a discriminating hash, not an all-False column (the outlier_counts
# z-tuning rationale).
@register("daily_anomalies_events",
          ev.oracle_daily_volume_anomalies_sql("events", z=1.0))
def daily_anomalies_events(spark, sf_dir):
    """Robust (median/MAD) per-day volume anomaly flags — the
    feed-health monitor. One groupBy(day) + an O(days) median pass."""
    return ev.daily_volume_anomalies(T(spark, sf_dir, "events"), z=1.0)


# ---------------------------------------------------------------------------
# Unstructured entity extraction (SURVEY §2.7 entity_counts/percentages)
# ---------------------------------------------------------------------------

@register("entity_counts_events_props",
          rl.oracle_unstructured_entity_counts_sql("events", "props"))
def entity_counts_events_props(spark, sf_dir):
    return rl.unstructured_entity_counts(T(spark, sf_dir, "events"), "props")


# ---------------------------------------------------------------------------
@register("hashed_doc_vectors_documents",
          ta.oracle_hashed_doc_vectors_sql("documents", "doc_id", "text",
                                           dim=16))
def hashed_doc_vectors_documents(spark, sf_dir):
    """Feature-hashing document vectors (hashing trick, ±1 signs from
    md5): the deterministic text→vector bridge that lets the embedding
    stack (cosine/LSH/k-means/IVF) run on corpora without an embedding
    column. Exploded dense form (id, dpos, value) with exact integer
    values."""
    return ta.hashed_doc_vectors(T(spark, sf_dir, "documents"),
                                 "doc_id", "text", dim=16)


@register("hashed_cosine_topk_documents",
          ta.oracle_hashed_cosine_topk_sql("documents", "doc_id", "text",
                                           query_id=7, k=10, dim=64))
def hashed_cosine_topk_documents(spark, sf_dir):
    """Similarity search over the text corpus with NO embedding column:
    sparse cosine top-k between hashing-trick vectors — the dot product
    is a join on the hashed dimension (query side broadcast), integer
    dots/norms, engine-exact ranking."""
    return ta.hashed_cosine_topk(T(spark, sf_dir, "documents"),
                                 "doc_id", "text", query_id=7, k=10,
                                 dim=64)


from dataprofiler_spark.operators import retrieval as rtv

_BM25_QUERY = "spark window merge vector"


@register("bm25_topk_documents",
          rtv.oracle_bm25_topk_sql("documents", "doc_id", "text",
                                   _BM25_QUERY, k=10))
def bm25_topk_documents(spark, sf_dir):
    """BM25 full-text ranking over the corpus: the query's terms are
    driver literals so the candidate filter fuses into the corpus scan;
    one narrow shuffle on candidate doc ids, collection constants
    broadcast, TakeOrdered top-k. The lexical half of retrieval-based
    decontamination beside hashed_cosine_topk's vector half."""
    return rtv.bm25_topk(T(spark, sf_dir, "documents"), "doc_id", "text",
                         _BM25_QUERY, k=10)


@register("query_cosine_topk_documents",
          rtv.oracle_hashed_query_cosine_topk_sql(
              "documents", "doc_id", "text", _BM25_QUERY, k=10, dim=64))
def query_cosine_topk_documents(spark, sf_dir):
    """Free-text vector search with no embedding column: the query
    hashes driver-side into the hashing-trick space, docs rank by
    integer-exact cosine against the broadcast literal query vector."""
    return rtv.hashed_query_cosine_topk(T(spark, sf_dir, "documents"),
                                        "doc_id", "text", _BM25_QUERY,
                                        k=10, dim=64)


@register("hybrid_rrf_topk_documents",
          rtv.oracle_hybrid_rrf_topk_sql("documents", "doc_id", "text",
                                         _BM25_QUERY, k=10, n_cand=25,
                                         dim=64))
def hybrid_rrf_topk_documents(spark, sf_dir):
    """Hybrid search: reciprocal-rank fusion of the BM25 lexical leg and
    the hashed-vector cosine leg — each leg TakeOrdered to n_cand, so
    the fusion join is O(n_cand) regardless of corpus size."""
    return rtv.hybrid_rrf_topk(T(spark, sf_dir, "documents"), "doc_id",
                               "text", _BM25_QUERY, k=10, n_cand=25,
                               dim=64)


# BPE-ish token counting (SURVEY north-star: token budget estimation)
# ---------------------------------------------------------------------------

@register("bpe_token_summary_documents",
          ta.oracle_bpe_token_count_sql("documents", "doc_id", "text"))
def bpe_token_summary_documents(spark, sf_dir):
    return ta.bpe_token_count_summary(T(spark, sf_dir, "documents"),
                                      "doc_id", "text")


