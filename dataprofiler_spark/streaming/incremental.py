"""Streaming / batch-incremental profiling.

The reference's "streaming" is batch-incremental update + merge
(update_profile, profile_builder.py:939-997) — there are no watermark
semantics to replicate (SURVEY §2.6). On Spark this maps naturally onto
Structured Streaming's ``foreachBatch``: each micro-batch is profiled with
the SAME three-job plan (plans/profile_plan.py) and folded into the
running ``DatasetState`` with the state algebra (state.py) — the identical
``+`` used by the public profile1+profile2 API.

For true continuous aggregation (e.g. the time-bucket rollup,
operators/datetimes.time_bucket_rollup) the same groupBy runs under
``readStream`` with a watermark — that query shape is already
streaming-safe (append-mode windowed agg).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from dataprofiler_spark.plans.profile_plan import Profiler, ProfilerOptions
from dataprofiler_spark.state import DatasetState


class StreamingProfiler:
    """Fold micro-batches into one mergeable profile state."""

    def __init__(self, options: ProfilerOptions | None = None):
        self.options = options or ProfilerOptions()
        self.state: DatasetState | None = None
        self.batches_seen = 0

    def update(self, batch_df: DataFrame, batch_id: int | None = None) -> DatasetState:
        """foreachBatch hook: profile the micro-batch, merge."""
        p = Profiler(batch_df, self.options)
        chunk = p.profile()
        self.state = chunk if self.state is None else self.state + chunk
        self.batches_seen += 1
        return self.state

    def attach(self, stream_df: DataFrame):
        """Wire onto a streaming DataFrame:
        ``StreamingProfiler().attach(spark.readStream...).start()``."""
        return stream_df.writeStream.foreachBatch(
            lambda df, bid: self.update(df, bid))


def streaming_exact_dedup(stream_df: DataFrame, id_col: str, text_col: str,
                          watermark_col: str, delay: str = "10 minutes"):
    """Streaming exact dedup: keep the first occurrence of each
    normalized-text fingerprint, with state bounded by the watermark.

    ``dropDuplicatesWithinWatermark`` keeps fingerprint state only for
    the watermark horizon — the 100 TB-stream-safe variant of
    ``dropDuplicates`` (whose state grows without bound). Near-dup
    (MinHash/SimHash) streaming variants compose the same way: compute
    the signature map-side, dedup on (band, bucket) within the horizon.
    """
    from pyspark.sql import functions as F

    norm = F.regexp_replace(F.trim(F.lower(F.col(text_col))), r"\s+", " ")
    return (
        stream_df
        .withColumn("__fp", F.md5(norm))
        .withWatermark(watermark_col, delay)
        .dropDuplicatesWithinWatermark(["__fp"])
        .drop("__fp")
    )
