from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataprofiler_spark import report as rep
from dataprofiler_spark.queries._registry import T, register

# ---------------------------------------------------------------------------
# Dedup suite (training-data pipeline ops; SURVEY §7.2 step 8)
# ---------------------------------------------------------------------------

from dataprofiler_spark.operators import ann_index as ai
from dataprofiler_spark.operators import nbclassify as nbc
from dataprofiler_spark.operators import skew as sk
from dataprofiler_spark.operators import dedup as dd
from dataprofiler_spark.operators import multimodal as mm
from dataprofiler_spark.operators import clustering as clus
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


@register("winnow_fingerprints_documents",
          dd.oracle_winnow_fingerprints_sql("documents", "doc_id", "text",
                                            k=5, window=4))
def winnow_fingerprints_documents(spark, sf_dir):
    """Winnowing fingerprint sets (MOSS, Schleimer et al. 2003):
    char-5-gram md5 hashes, window-4 minima — guarantees any shared
    substring of length >= 8 shares a fingerprint; entirely map-side."""
    return dd.winnow_fingerprints(T(spark, sf_dir, "documents"),
                                  "doc_id", "text", k=5, window=4)


@register("winnow_neardup_pairs_documents",
          dd.oracle_winnow_neardup_pairs_sql("documents", "doc_id", "text",
                                             k=5, window=4, min_shared=20,
                                             max_fp_freq=50))
def winnow_neardup_pairs_documents(spark, sf_dir):
    """Localized-copy detection: pairs sharing >= 20 winnowing
    fingerprints after dropping boilerplate fingerprints hotter than 50
    docs (the deterministic skew guard, mirrored in the oracle)."""
    return dd.winnow_neardup_pairs(T(spark, sf_dir, "documents"),
                                   "doc_id", "text", k=5, window=4,
                                   min_shared=20, max_fp_freq=50)


@register("cross_source_dup_matrix_documents",
          dd.oracle_cross_source_dup_matrix_sql(
              "documents", "doc_id", "text", "source",
              k=3, num_hashes=12, bands=6, threshold=0.5))
def cross_source_dup_matrix_documents(spark, sf_dir):
    """Near-dup pair counts between sources (provenance view of
    duplication): LSH pairs joined to source labels, aggregated to at
    most |sources|² rows."""
    return dd.cross_source_dup_matrix(T(spark, sf_dir, "documents"),
                                      "doc_id", "text", "source",
                                      k=3, num_hashes=12, bands=6,
                                      threshold=0.5)


@register("minhash_lsh_pairs_bottomk",
          dd.oracle_minhash_lsh_pairs_sql("documents", "doc_id", "text",
                                          k=3, num_hashes=12, bands=6,
                                          threshold=0.5, verify_k=64))
def minhash_lsh_pairs_bottomk(spark, sf_dir):
    """Bottom-k (KMV) verify variant: per-doc verify sets capped at the
    64 smallest hashes, jaccard = bottom-k estimator — bounds the
    shuffle row for multi-MB docs; oracle mirrors the sketch rule."""
    return dd.minhash_lsh_pairs(T(spark, sf_dir, "documents"), "doc_id",
                                "text", k=3, num_hashes=12, bands=6,
                                threshold=0.5, verify_k=64)


@register("minhash_lsh_autocap_documents",
          dd.oracle_minhash_lsh_pairs_sql("documents", "doc_id", "text",
                                          k=3, num_hashes=12, bands=6,
                                          threshold=0.5,
                                          max_bucket_size="auto",
                                          pair_budget_per_doc=20))
def minhash_lsh_autocap_documents(spark, sf_dir):
    """Auto-cap mode (VERDICT r9 item 6): the lsh_bucket_profile cap
    ladder folds into the pair plan — the bucket-size aggregate the
    skew guard computes anyway also derives the suggested cap, which
    broadcasts back into the bucket filter (no extra corpus scan, no
    hand-picked constant). pair_budget_per_doc=20 so the ladder
    actually bites on the templated testdata (the corpus-dependent
    cap is what the oracle must reproduce, not a fixed default)."""
    return dd.minhash_lsh_pairs(T(spark, sf_dir, "documents"), "doc_id",
                                "text", k=3, num_hashes=12, bands=6,
                                threshold=0.5, max_bucket_size="auto",
                                pair_budget_per_doc=20)


@register("simhash_documents", dd.oracle_simhash_sql("documents", "doc_id", "text"))
def simhash_documents(spark, sf_dir):
    return dd.simhash(T(spark, sf_dir, "documents"), "doc_id", "text")


@register("neardup_clusters_documents",
          dd.oracle_neardup_clusters_sql("documents", "doc_id", "text",
                                         k=3, num_hashes=12, bands=2,
                                         threshold=0.8))
def neardup_clusters_documents(spark, sf_dir):
    # Selective operating point (bands=2, threshold=0.8): dedup clusters
    # mean "near-identical", and the sparse pair graph keeps the
    # recursive-CTE oracle closure cheap. Pipeline: LSH pairs →
    # connected components → canonical per cluster.
    return dd.neardup_clusters(T(spark, sf_dir, "documents"), "doc_id", "text",
                               k=3, num_hashes=12, bands=2, threshold=0.8)




@register("lsh_bucket_profile_documents",
          dd.oracle_lsh_bucket_profile_sql("documents", "doc_id", "text",
                                           k=3, num_hashes=12, bands=6))
def lsh_bucket_profile_documents(spark, sf_dir):
    """The cap-tuning dial for banded LSH (SCALE.md §32): bucket-size
    distribution + candidate-pair work under a cap ladder + the
    largest cap within the pair budget — one groupBy, no join,
    integer-exact."""
    return dd.lsh_bucket_profile(T(spark, sf_dir, "documents"),
                                 "doc_id", "text",
                                 k=3, num_hashes=12, bands=6)


def _oracle_streaming_neardup():
    from dataprofiler_spark.streaming.neardup import \
        oracle_streaming_neardup_sql
    return oracle_streaming_neardup_sql("documents", "doc_id", "text",
                                        k=3, num_hashes=12, bands=2,
                                        verify_threshold=0.5)


@register("streaming_neardup_flags_documents",
          _oracle_streaming_neardup())
def streaming_neardup_flags_documents(spark, sf_dir):
    """StreamingNearDup replayed deterministically (r11, the streaming
    SemDeDup pattern): two micro-batches (batch = doc_id % 2) run
    through the REAL foreachBatch hook in order — batch 0 seeds the
    band-partitioned signature store, batch 1 is flagged when any band
    bucket matches a stored key AND exact jaccard vs the stored
    shingle-hash set clears the verify threshold. The SQL twin
    re-derives shingles → minhash → bands → probe → verify, so the
    cross-batch store semantics are hash-checked end-to-end. Output:
    (id, batch, flagged) per signature-bearing doc."""
    import tempfile

    from dataprofiler_spark.operators.dedup import (_band_buckets,
                                                    _minhash_wide)
    from dataprofiler_spark.streaming.neardup import StreamingNearDup

    docs = T(spark, sf_dir, "documents")
    store = tempfile.mkdtemp(prefix="dps_neardup_stream_")
    nd = StreamingNearDup(store, "doc_id", "text", k=3, num_hashes=12,
                          bands=2, verify_threshold=0.5)
    for b in (0, 1):
        nd.update(docs.where(F.col("doc_id") % 2 == b), b)
    flagged = sorted({i for _, i in nd.flagged})
    spark_ids = (_band_buckets(
        _minhash_wide(docs, "doc_id", "text", 3, 12), 12, 2)
        .select("id").distinct())
    fdf = spark.createDataFrame([(i,) for i in flagged],
                                "id long").withColumn("__f", F.lit(1))
    return (spark_ids.join(fdf, "id", "left")
            .select("id", (F.col("id") % 2).cast("int").alias("batch"),
                    F.col("__f").isNotNull().alias("flagged")))
