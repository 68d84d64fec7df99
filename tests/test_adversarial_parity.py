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


@pytest.fixture(scope="module")
def adv_dir(tmp_path_factory, spark):
    d = str(tmp_path_factory.mktemp("adv"))
    _adv_documents(spark).coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(d, "documents.parquet"))
    _adv_embeddings(spark).coalesce(1).write.mode("overwrite") \
        .parquet(os.path.join(d, "embeddings.parquet"))
    return d


@pytest.fixture(scope="module")
def adv_duck(adv_dir):
    con = duckdb.connect()
    for t in ["documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"'{os.path.join(adv_dir, t + '.parquet')}/*.parquet'")
    yield con
    con.close()


# Queries reading only documents/embeddings whose contract must hold on
# dirty data. (Excluded by contract: none yet — add with a reason.)
ADV_QUERIES = [
    # documents / text family
    "exact_dedup_documents",
    "ngram_jaccard_documents",
    "minhash_signatures_documents",
    "minhash_lsh_pairs_documents",
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
    "packing_stats_documents",
    "pack_manifest_documents",
    "chunk_summary_documents",
    "tfidf_top_terms_documents",
    "hashed_doc_vectors_documents",
    "hashed_cosine_topk_documents",
    "nb_source_confusion_documents",
    "decontaminate_by_benchmark_documents",
    "split_manifest_documents",
    "split_leakage_documents",
    "leakage_free_split_documents",
    "data_mixture_source_lang",
    # embeddings family
    "embedding_dim_stats",
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
]


@pytest.mark.parametrize("name", ADV_QUERIES)
def test_query_matches_oracle_on_adversarial_data(name, spark, adv_duck,
                                                  adv_dir):
    assert name in SPARK_QUERIES and name in ORACLE_SQL, name
    sdf = SPARK_QUERIES[name](spark, adv_dir).toPandas()
    ddf = adv_duck.sql(ORACLE_SQL[name]).df()
    assert_frames_match(sdf, ddf, name)
