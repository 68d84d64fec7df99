"""Streaming semantic decontamination against a persisted benchmark
LSH store — score every ingested micro-batch of documents against a
frozen eval-suite embedding set before the docs reach a training mix.

The batch operator (operators/similarity.embedding_decontaminate_bucketed)
re-derives the benchmark's (band, bucket) keys per call; a stream can't
afford that, and the benchmark is FROZEN by definition — so the keys and
vectors become a durable artifact (build_benchmark_store), and each
micro-batch pays exactly one probe join (the StreamingNearDup store
pattern, with the roles reversed: here the STORE side is the frozen
reference and batches are never appended).

    {path}/keys/      (id, band, bucket), partitioned by band
    {path}/vectors/   (id, v array<double>)   — exact-cosine verify side
    {path}/_decon_meta.json                   — bands/planes/dim/seed

Per batch (foreachBatch):
1. (band, bucket) keys for the batch via the SAME banded hyperplanes
   (seeded from the store's meta — deterministic across sessions).
2. Join against the store keys (band-partitioned: the probe prunes to
   matching band partitions) → candidate (batch_id, bench_id) pairs.
3. Exact cosine against the store's vectors; a batch doc is
   CONTAMINATED when any benchmark cosine ≥ threshold.

State is bounded: the store is O(benchmark) on disk, nothing grows with
the stream, and the flagged log holds only (batch_id, doc_id, max_cos)
hits. Recall follows the LSH S-curve of (bands, planes_per_band) exactly
as in the batch operator — measure with the batch twin on a sample
before freezing settings (SCALE.md §ANN workflow).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

KEYS_SCHEMA = "id long, band int, bucket bigint"
VECS_SCHEMA = "id long, v array<double>"


def build_benchmark_store(bench_df: DataFrame, id_col: str, vec_col: str,
                          path: str, bands: int = 4,
                          planes_per_band: int = 8, dim: int = 64,
                          seed: str = "dps-lsh-v1") -> dict:
    """Freeze a benchmark embedding set into a probe-ready store."""
    from dataprofiler_spark.operators.similarity import \
        embedding_band_buckets

    # The store schemas pin `id long`; cast here so an int32/string id
    # column writes the schema the probe-side read enforces (a numeric
    # string casts fine; a non-numeric id must be mapped by the caller
    # and fails loudly below instead of at first probe).
    base = bench_df.select(F.col(id_col).cast("long").alias("id"),
                           F.col(vec_col).cast("array<double>").alias("v"))
    n_bad = base.where(F.col("id").isNull()).limit(1).count()
    if n_bad:
        raise ValueError(
            f"build_benchmark_store: column {id_col!r} has values that "
            "do not cast to BIGINT; map ids to integers first "
            "(e.g. xxhash64(id))")
    keys = embedding_band_buckets(base, "id", "v", bands=bands,
                                  planes_per_band=planes_per_band,
                                  dim=dim, seed=seed)
    (keys.write.mode("overwrite").partitionBy("band")
     .parquet(os.path.join(path, "keys")))
    (base.write.mode("overwrite").parquet(os.path.join(path, "vectors")))
    meta = {"bands": bands, "planes_per_band": planes_per_band,
            "dim": dim, "seed": seed}
    with open(os.path.join(path, "_decon_meta.json"), "w") as f:
        json.dump(meta, f)
    return meta


class StreamingEmbeddingDecon:
    """foreachBatch hook: flag micro-batch docs semantically too close
    to a frozen benchmark store.

    ``flagged`` accumulates (batch_id, doc_id, max_cosine) driver-side
    for inspection/tests; production pipelines route a flagged DataFrame
    to a sink instead (override ``on_flagged``)."""

    def __init__(self, store_path: str, id_col: str = "id",
                 vec_col: str = "v", threshold: float = 0.95,
                 round_digits: int = 6):
        self.store_path = store_path
        self.id_col, self.vec_col = id_col, vec_col
        self.threshold = threshold
        self.round_digits = round_digits
        with open(os.path.join(store_path, "_decon_meta.json")) as f:
            self.meta = json.load(f)
        self.flagged: list[tuple[int, int, float]] = []
        self.batches_seen = 0

    def score_batch(self, batch_df: DataFrame) -> DataFrame:
        """(id, max_cosine) for batch docs with any benchmark cosine ≥
        threshold — the same candidate join + exact verify as the batch
        operator, probing the persisted keys instead of re-hashing the
        benchmark."""
        from dataprofiler_spark.operators.similarity import (
            cosine_expr, embedding_band_buckets)

        spark = batch_df.sparkSession
        base = batch_df.select(
            F.col(self.id_col).cast("long").alias("id"),
            F.col(self.vec_col).cast("array<double>").alias("v"))
        keys = embedding_band_buckets(
            base, "id", "v", bands=self.meta["bands"],
            planes_per_band=self.meta["planes_per_band"],
            dim=self.meta["dim"], seed=self.meta["seed"])
        store_keys = spark.read.schema(KEYS_SCHEMA).parquet(
            os.path.join(self.store_path, "keys"))
        cand = (keys.alias("b")
                .join(store_keys.alias("s"),
                      (F.col("b.band") == F.col("s.band"))
                      & (F.col("b.bucket") == F.col("s.bucket")))
                .select(F.col("b.id").alias("bid"),
                        F.col("s.id").alias("sid"))
                .distinct())
        store_vecs = spark.read.schema(VECS_SCHEMA).parquet(
            os.path.join(self.store_path, "vectors"))
        scored = (cand
                  .join(base.select(F.col("id").alias("bid"),
                                    F.col("v").alias("bv")), "bid")
                  .join(store_vecs.select(F.col("id").alias("sid"),
                                          F.col("v").alias("sv")), "sid")
                  .select("bid",
                          F.round(cosine_expr(F.col("bv"), F.col("sv")),
                                  self.round_digits).alias("cos")))
        return (scored.groupBy(F.col("bid").alias("id"))
                .agg(F.max("cos").alias("max_cosine"))
                .where(F.col("max_cosine") >= self.threshold))

    def on_flagged(self, flagged_df: DataFrame, batch_id: int) -> None:
        """Default routing: accumulate driver-side (hits are tiny —
        contamination is the exception, not the rule). Override to
        write to a sink/queue in production."""
        self.flagged.extend(
            (batch_id, r["id"], r["max_cosine"])
            for r in sorted(flagged_df.collect(), key=lambda r: r["id"]))

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        self.on_flagged(self.score_batch(batch_df), batch_id)
        self.batches_seen += 1

    def attach(self, stream_df: DataFrame):
        return stream_df.writeStream.foreachBatch(self.update)
