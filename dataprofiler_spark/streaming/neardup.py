"""Streaming near-duplicate detection against a persistent signature
store — the incremental-dedup pattern a production ingest pipeline runs:
each micro-batch is LSH-probed against everything ingested before it,
flagged docs are dropped (or routed), and the survivors' signatures are
appended to the store.

Shape per batch (foreachBatch — the store read/append is a batch-side
effect Structured Streaming's stateful operators can't express):

1. (id, band, bucket) keys for the batch via the SAME banded-MinHash
   construction as the batch operator (operators/dedup.py) — map-side.
2. LEFT-SEMI join of batch keys against the store → ids whose ANY band
   bucket has been seen before (candidate near-dups of earlier docs).
3. Survivors' keys appended to the store (parquet, append mode).

Semantics: a doc is flagged when it LSH-matches any PRIOR-batch doc;
within-batch duplicates are intentionally not flagged here (run the
batch pair/cluster operators on the batch when that matters). Candidate
precision is governed by the band/row operating point exactly as in
``minhash_lsh_pairs``; a verify join against stored shingle sets can be
layered on when exact-jaccard confirmation is worth storing ``hs``.

Scale: the store holds bands × docs fixed-width rows, partitioned by
``band`` so the probe join prunes to matching band partitions; append
writes are small per batch. Compact the store periodically (rewrite with
larger files) as with any append-heavy parquet table.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STORE_SCHEMA = "id long, band int, bucket string"


class StreamingNearDup:
    """foreachBatch hook: flag near-dups of previously-ingested docs and
    grow the signature store.

    ``flagged`` accumulates (batch_id, id) pairs driver-side for
    inspection/tests; production pipelines route the flagged DataFrame
    to a sink instead (override ``on_flagged``)."""

    def __init__(self, store_path: str, id_col: str = "id",
                 text_col: str = "text", k: int = 3, num_hashes: int = 12,
                 bands: int = 2):
        self.store_path = store_path
        self.id_col, self.text_col = id_col, text_col
        self.k, self.num_hashes, self.bands = k, num_hashes, bands
        self.flagged: list[tuple[int, int]] = []
        self.batches_seen = 0

    def _store(self, spark: SparkSession) -> DataFrame | None:
        if not os.path.isdir(self.store_path):
            return None
        try:
            return spark.read.schema(STORE_SCHEMA).parquet(self.store_path)
        except Exception:
            return None

    def update(self, batch_df: DataFrame, batch_id: int) -> None:
        from dataprofiler_spark.operators.dedup import minhash_band_buckets

        spark = batch_df.sparkSession
        keys = minhash_band_buckets(batch_df, self.id_col, self.text_col,
                                    self.k, self.num_hashes,
                                    self.bands).persist()
        try:
            store = self._store(spark)
            flagged: set[int] = set()
            if store is not None:
                hit_ids = (keys.join(store, ["band", "bucket"], "left_semi")
                           .select("id").distinct())
                # tiny per batch (flagged ids only); a production pipeline
                # would route this DataFrame to a sink instead
                flagged = {r["id"] for r in hit_ids.collect()}
            self.flagged.extend((batch_id, i) for i in sorted(flagged))
            survivors = keys if not flagged else keys.where(
                ~F.col("id").isin(*flagged))
            (survivors.write.mode("append").partitionBy("band")
             .parquet(self.store_path))
        finally:
            keys.unpersist()
        self.batches_seen += 1

    def attach(self, stream_df: DataFrame):
        return stream_df.writeStream.foreachBatch(self.update)


def compact_store(spark: SparkSession, store_path: str,
                  target_files_per_band: int = 1) -> int:
    """Rewrite the append-heavy signature store with large files
    (``target_files_per_band`` per band partition) — run between
    streaming sessions, not concurrently with one. Returns the row
    count. The rewrite goes to a sibling temp dir and swaps in whole so
    a crash mid-compaction leaves the original store intact."""
    import shutil

    df = spark.read.schema(STORE_SCHEMA).parquet(store_path)
    tmp = store_path.rstrip("/") + ".compact-tmp"
    (df.repartition(target_files_per_band, "band")
     .write.mode("overwrite").partitionBy("band").parquet(tmp))
    n = spark.read.schema(STORE_SCHEMA).parquet(tmp).count()
    old = store_path.rstrip("/") + ".compact-old"
    shutil.move(store_path, old)
    shutil.move(tmp, store_path)
    shutil.rmtree(old)
    return n
