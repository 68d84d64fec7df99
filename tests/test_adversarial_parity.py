"""Adversarial cross-engine parity: run the REAL registered queries and
their DuckDB oracles over generated edge-case data — NULL / empty /
whitespace / unicode / regex-metachar texts, NULL labels and sources,
NULL and zero vectors, duplicate rows — instead of the well-behaved
testdata. Every divergence this suite finds is a bug the driver's
clean-data check cannot see.

Queries listed here must hold their oracle contract on dirty data;
operators whose contract EXCLUDES a pathology (e.g. ragged vectors)
document that in their docstrings and are exercised to the boundary of
that contract, not past it.
"""

from __future__ import annotations

import os
import random

import duckdb
import pytest

from dataprofiler_spark.queries import ORACLE_SQL, SPARK_QUERIES
from tests.oracle_utils import assert_frames_match

DIM = 64


def _adv_documents(spark):
    rows = []
    texts = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "src0"),
        (1, "the quick brown fox jumps over the lazy dog", "en", "src1"),
        (2, None, None, "src0"),                     # NULL text + lang
        (3, "", "en", None),                          # empty text, NULL src
        (4, "   \t  ", "en", "src2"),                 # whitespace only
        (5, "héllo wörld — naïve café 你好 мир", "fr", "src2"),
        (6, "a.b|c(d)[e]{f}^g$h \\ backslash", "en", "src3"),
        (7, "repeat repeat repeat repeat repeat repeat", "en", "src0"),
        (8, "line\nbreak\ttab 'quote' \"dquote\"", "en", "src1"),
        (9, "solo", "de", "src3"),
    ]
    rng = random.Random(7)
    words = ["spark", "table", "vector", "query", "agg", "join", "scan",
             "data", "fast", "slow"]
    for i in range(10, 60):
        t = " ".join(rng.choice(words) for _ in range(rng.randint(3, 40)))
        texts.append((i, t, rng.choice(["en", "de", None]),
                      rng.choice(["src0", "src1", "src2", None])))
    for i, t, lang, src in texts:
        rows.append((i, t, lang, src, len(t) if t is not None else None))
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
              " n_chars long")


def _adv_embeddings(spark):
    rng = random.Random(11)
    rows = []
    for i in range(40):
        v = [rng.uniform(-1, 1) for _ in range(DIM)]
        n = sum(x * x for x in v) ** 0.5
        rows.append((i, [x / n for x in v], rng.choice([0, 1, 2, 3])))
    rows.append((100, [0.0] * DIM, 1))          # zero vector
    rows.append((101, None, 2))                  # NULL vector
    rows.append((102, rows[0][1], None))         # dup vector, NULL label
    rows.append((103, rows[0][1], 0))            # exact duplicate of 0
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int")


def _adv_orders(spark):
    """NULL keys/prices/dates/priorities, negative and constant prices,
    one dominant priority, duplicate keys."""
    rng = random.Random(13)
    rows = []
    pris = ["1-URGENT", "2-HIGH", "3-MEDIUM", None]
    for i in range(120):
        rows.append((
            i,
            rng.choice([None, 1, 2, 3, 4, 5]),
            rng.choice(["O", "F", None]),
            rng.choice([None, -500.25, 0.0, 1234.5,
                        rng.uniform(1.0, 9999.0)]),
            rng.choice([None, "1997-03-0%d" % (i % 9 + 1),
                        "1998-06-0%d" % (i % 9 + 1)]),
            pris[0] if i % 3 == 0 else rng.choice(pris),
        ))
    from pyspark.sql import functions as SF
    return (spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderstatus string,"
              " o_totalprice double, o_orderdate_s string,"
              " o_orderpriority string")
        .withColumn("o_orderdate", SF.to_timestamp("o_orderdate_s"))
        .drop("o_orderdate_s")
        .select("o_orderkey", "o_custkey", "o_orderstatus",
                "o_totalprice", "o_orderdate", "o_orderpriority"))


def _adv_lineitem(spark):
    """NULLs and negatives in every measure, NULL categoricals, a
    constant column (l_tax), duplicate (orderkey, linenumber) rows."""
    rng = random.Random(17)
    rows = []
    for i in range(150):
        rows.append((
            i % 60,                              # duplicate orderkeys
            rng.choice([None, 1, 2, 3]),
            rng.choice([1, 2, None]),
            i % 4,
            rng.choice([None, -5.0, 0.0, 17.25, rng.uniform(1, 50)]),
            rng.choice([None, -100.5, 0.0, rng.uniform(100, 90000)]),
            rng.choice([None, 0.0, 0.04, 0.08]),
            0.05,                                # constant
            rng.choice(["A", "N", "R", None]),
            rng.choice(["O", "F"]),
            rng.choice([None, "1996-01-1%d" % (i % 9 + 1)]),
        ))
    from pyspark.sql import functions as SF
    return (spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long, l_suppkey long,"
              " l_linenumber int, l_quantity double,"
              " l_extendedprice double, l_discount double, l_tax double,"
              " l_returnflag string, l_linestatus string,"
              " l_shipdate_s string")
        .withColumn("l_shipdate", SF.to_timestamp("l_shipdate_s"))
        .drop("l_shipdate_s")
        .select("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
                "l_quantity", "l_extendedprice", "l_discount", "l_tax",
                "l_returnflag", "l_linestatus", "l_shipdate"))


def _adv_events(spark):
    """NULL users/types/values/props, malformed JSON props, duplicate
    event ids, one hot user."""
    rng = random.Random(19)
    rows = []
    types = ["view", "click", "purchase", None]
    for i in range(200):
        uid = 1 if i % 3 == 0 else rng.choice([None, 2, 3, 4, 5])
        props = rng.choice([None, '{"k": 3}', '{"k": null}', '{}',
                            'not json', '{"other": 1}'])
        rows.append((
            # event_id stays UNIQUE: adjacent-pair order detection has
            # no canonical order under duplicate keys (documented
            # contract in operators/order.py) — NULL values still
            # exercise the seam carry bug this suite caught
            i,
            "2024-01-01 0%d:%02d:00" % (i % 9, i % 60),
            uid, rng.choice(types),
            rng.choice([None, -1.5, 0.0, rng.uniform(0, 100)]),
            props,
        ))
    from pyspark.sql import functions as SF
    return (spark.createDataFrame(
        rows, "event_id long, ts_s string, user_id long,"
              " event_type string, value double, props string")
        .withColumn("ts", SF.to_timestamp("ts_s")).drop("ts_s")
        .select("event_id", "ts", "user_id", "event_type", "value",
                "props"))


def _adv_customer(spark):
    """NULL names/balances/segments, empty and whitespace names,
    unicode, numbers-as-text names (type-inference bait), negative
    balances."""
    rng = random.Random(23)
    rows = []
    segs = ["BUILDING", "MACHINERY", None]
    names = [None, "", "   ", "Customer#000001", "José Münz 株式会社",
             "12345", "3.14", "1996-01-02", "true"]
    for i in range(80):
        rows.append((
            i, rng.choice(names), rng.choice([None, 0, 1, 2]),
            rng.choice([None, -999.99, 0.0, rng.uniform(-100, 9000)]),
            rng.choice(segs),
        ))
    return spark.createDataFrame(
        rows, "c_custkey long, c_name string, c_nationkey int,"
              " c_acctbal double, c_mktsegment string")


def _adv_nation(spark):
    """Self-loop, duplicate edge, NULL region (dangling), shared node
    ids between the two endpoint domains."""
    rows = [(0, "A", 0),        # self-loop (node 0 -> node 0)
            (1, "B", 0), (2, "C", 0), (2, "C2", 0),   # duplicate edge
            (3, "D", 1), (4, "E", None),              # NULL dst
            (5, "F", 2), (6, "G", 2), (7, "H", 3)]
    return spark.createDataFrame(
        rows, "n_nationkey int, n_name string, n_regionkey int")


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("adv"))
    builders = {"documents": _adv_documents, "embeddings": _adv_embeddings,
                "orders": _adv_orders, "lineitem": _adv_lineitem,
                "events": _adv_events, "nation": _adv_nation,
                "customer": _adv_customer}
    for t, fn in builders.items():
        fn(spark).coalesce(1).write.mode("overwrite") \
            .parquet(os.path.join(d, f"{t}.parquet"))
    return d


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duckdb.connect()
    for t in ["documents", "embeddings", "orders", "lineitem", "events",
              "nation", "customer"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{os.path.join(adv_dir, t + '.parquet')}/*.parquet'")
    yield con
    con.close()


# Queries reading only documents/embeddings whose contract must hold on
# dirty data. Excluded by contract: cnn_labeler_customer /
# ner_spans_orders / ner_redact_orders / trained_labeler_customer
# (oracles are sf0.01-pinned golden VALUES tables — data-bound by
# design; dirty-text behavior is covered in test_ner/test_trainable
# instead) and full_report_* (rows-only, no SQL oracle).
ADV_QUERIES = [
    # documents / text family
    "exact_dedup_documents",
    "ngram_jaccard_documents",
    "minhash_signatures_documents",
    "minhash_lsh_pairs_documents",
    "cross_source_dup_matrix_documents",
    "winnow_fingerprints_documents",
    "winnow_neardup_pairs_documents",
    "minhash_lsh_pairs_bottomk",
    "simhash_documents",
    "simhash_neardup_documents",
    "neardup_clusters_documents",
    "canonical_sample_documents",
    "token_summary_documents",
    "language_id_documents",
    "fingerprints_documents",
    "word_counts_documents",
    "quality_features_documents",
    "quality_rollup_documents",
    "quality_weighted_sample_documents",
    "repetition_signals_documents",
    "crossdoc_ngram_dup_documents",
    "substring_dup_documents",
    "corpus_curation_documents",
    "clean_sample_documents",
    "unigram_logprob_documents",
    "bigram_logprob_documents",
    "collocations_pmi_documents",
    "packing_stats_documents",
    "pack_manifest_documents",
    "chunk_summary_documents",
    "tfidf_top_terms_documents",
    "hashed_doc_vectors_documents",
    "hashed_cosine_topk_documents",
    "nb_source_confusion_documents",
    "decontaminate_documents",
    "decontaminate_by_benchmark_documents",
    "data_mixture_documents",
    "bpe_token_summary_documents",
    "bm25_topk_documents",
    "domain_rollup_documents",
    "markup_signals_documents",
    "paragraph_dup_documents",
    "zipf_vocab_documents",
    "query_cosine_topk_documents",
    "hybrid_rrf_topk_documents",
    "unstructured_summary_documents",
    "media_profile_documents",
    "av_profile_documents",
    "split_manifest_documents",
    "split_leakage_documents",
    "leakage_free_split_documents",
    "data_mixture_source_lang",
    # embeddings family
    "embedding_dim_stats",
    "embedding_covariance_embeddings",
    "embedding_shift_embeddings",
    "embedding_norm_stats",
    "quantize_int8_embeddings",
    "cosine_topk_embeddings",
    "lsh_topk_embeddings",
    "embedding_neardup_pairs",
    "embedding_neardup_clusters",
    "embedding_decontaminate_embeddings",
    "embedding_decontaminate_bucketed",
    "kmeans_assign_embeddings",
    "kmeans_clusters_embeddings",
    "cluster_sample_embeddings",
    "embedding_outliers_embeddings",
    "ivf_topk_embeddings",
    "ivf_recall_embeddings",
    "ivf_pq_topk_embeddings",
    "ivf_pq_residual_topk_embeddings",
    "pq_audit_embeddings",
    "label_centroid_audit_embeddings",
    "embedding_group_cosines",
    "ann_index_query_embeddings",
    "hard_negatives_embeddings",
    # orders family — numeric / datetime / categorical / drift
    "numeric_profile_orders",
    "datetime_profile_orders",
    "top_categories_orders",
    "psi_orderpriority",
    "null_phi_orders",
    "chi2_orderpriority",
    "cramers_v_orders",
    "theils_u_orders",
    "welch_t_totalprice",
    "psi_numeric_totalprice",
    "ks_js_totalprice",
    "hash_sample_orders",
    "stratified_sample_orders",
    "null_replication_orders",
    "expectations_orders",
    # lineitem family — the exact-mode numeric battery and friends
    "numeric_profile_lineitem",
    "outlier_counts_lineitem",
    "histogram_extendedprice",
    "grouped_histogram_lineitem",
    "quantiles_extendedprice",
    "median_mad_quantity",
    "modes_quantity",
    "precision_stats_lineitem",
    "category_counts_lineitem",
    "categorical_stats_lineitem",
    "distinct_counts_lineitem",
    "row_stats_lineitem",
    "correlation_lineitem",
    "spearman_lineitem",
    "chi2_pair_lineitem",
    "mutual_info_lineitem",
    "crosstab_lineitem",
    "validate_lineitem",
    "fd_check_lineitem",
    "type_inference_lineitem",
    "key_skew_lineitem",
    "cohens_kappa_lineitem",
    "robust_stats_lineitem",
    "benford_lineitem",
    "entropy_lineitem",
    "numeric_profile_by_returnflag",
    "order_profile_lineitem",
    # events family
    "sessionize_events",
    "funnel_events",
    "funnel_within_events",
    "funnel_gap_events",
    "retention_cohorts_events",
    "rolling_avg_events",
    "json_props_events",
    "entity_counts_events_props",
    "time_bucket_events",
    "rollup_events_type_day",
    "topk_events_per_user",
    "daily_psi_events",
    "daily_anomalies_events",
    "active_users_events",
    "interarrival_events",
    "hot_keys_events",
    "order_profile_events_value",
    # graph family
    "graph_degree_nation",
    "graph_components_nation",
    "pagerank_nation",
    # customer family — text stats / nulls / regex labeling / type infer
    "text_stats_customer",
    "nullspec_customer",
    "null_type_indices_customer",
    "label_votes_customer",
    "pii_redact_customer",
    "pattern_profile_customer",
    "fuzzy_pairs_customer",
    # cross-table + composites
    "referential_integrity_lineitem_orders",
    "skew_join_lineitem_orders",
    "inclusion_orders_customer",
    "interval_join_events",
    "asof_last_purchase_events",
    "full_profile_lineitem",
    "full_profile_events",
    # round-7 additions
    "kendall_tau_lineitem",
    "markov_transitions_events",
    "calendar_gaps_events",
    "decile_stats_extendedprice",
    "woe_iv_orders",
    "roc_auc_lineitem",
    "calibration_lineitem",
    "grouped_quantiles_lineitem",
    "lm_divergence_documents",
    "iv_summary_orders",
    "type_cooccurrence_events",
    "quantile_shift_totalprice",
    "neardup_threshold_sweep_documents",
    "null_rate_by_day_events",
    "session_stats_events",
    "top_terms_by_group_documents",
]


@pytest.mark.nightly
@pytest.mark.parametrize("name", ADV_QUERIES)
def test_query_matches_oracle_on_adversarial_data(name, spark, adv_duck,
                                                  adv_dir):
    assert name in SPARK_QUERIES and name in ORACLE_SQL, name
    sdf = SPARK_QUERIES[name](spark, adv_dir).toPandas()
    ddf = adv_duck.sql(ORACLE_SQL[name]).df()
    assert_frames_match(sdf, ddf, name)
