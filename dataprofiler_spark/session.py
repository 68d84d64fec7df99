"""SparkSession construction with scale-oriented defaults.

The engine is designed for a multi-executor cluster reading ~100 TB; the
settings below are the ones that matter at that scale (AQE, skew-join
handling, partial aggregation pushdown, Arrow for the few pandas-UDF
paths). Local testing uses ``local[N]`` but nothing here assumes a single
JVM.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Tuned for correctness at any scale; sizes that are cluster-dependent are
# left overridable via normal Spark conf mechanisms.
_SCALE_DEFAULTS: dict[str, str] = {
    # Adaptive query execution: runtime re-plan, skew-join splitting and
    # partition coalescing are essential on skewed 100 TB joins/aggs.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow transfer for the pandas_udf / mapInPandas paths (labeler,
    # multimodal decode, minhash batch kernels).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    # Large parquet scans: 128 MiB splits keep task count sane at 100 TB
    # (Spark default; stated explicitly because it is load-bearing).
    "spark.sql.files.maxPartitionBytes": "134217728",
    # Ensure timestamp semantics are stable across engines.
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(
    app_name: str = "dataprofiler-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine's defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` for local testing;
    on a real cluster the caller passes a session built by their own
    launcher and none of this matters — every public API accepts an
    existing SparkSession/DataFrame.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus_env) if cpus_env and cpus_env.isdigit() else 32

    builder = SparkSession.builder.appName(app_name).master(master)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    for k, v in _SCALE_DEFAULTS.items():
        builder = builder.config(k, v)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


_SEED: int | None = None


def set_seed(seed: int | None) -> None:
    """Global sampling seed (reference: dp.set_seed / DATAPROFILER_SEED,
    dataprofiler/__init__.py:26-31, rng_utils.py:10-19). Consumed by
    Profiler sampling and any operator that samples."""
    global _SEED
    _SEED = seed


def get_seed(default: int = 42) -> int:
    if _SEED is not None:
        return _SEED
    env = os.environ.get("DATAPROFILER_SEED")
    return int(env) if env and env.isdigit() else default


def ensure_parallelism(df, min_partitions: int | None = None):
    """Repartition ONLY when the input is under-partitioned relative to the
    cluster (e.g. one small parquet file on a 32-core local run).

    At real scale the scan already yields thousands of partitions and this
    is a no-op — the guard exists so compute-heavy per-row operators
    (minhash, simhash, embedding math) aren't serialized by a single
    input split. The repartition is round-robin: these operators are
    embarrassingly parallel per row, so no key locality is lost.
    """
    if df.isStreaming:
        # partition inspection (df.rdd) would execute the streaming
        # plan; micro-batch sizing is the trigger's job anyway
        return df
    spark = df.sparkSession
    target = min_partitions or spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < max(target // 2, 2):
        return df.repartition(target)
    return df


def explode_no_prefilter(df, array_col, alias: str, *keep: str):
    """``explode()`` without the optimizer's inferred pre-filter.

    Plain ``explode(arr)`` makes InferFiltersFromGenerate add
    ``size(arr) > 0 AND arr IS NOT NULL`` *below* the Generate; predicate
    pushdown then moves that filter under the nearest Exchange, where the
    (often expensive) array expression is re-evaluated twice per row on
    the narrow pre-shuffle side — for a single-file local scan that means
    double work on ONE core, and for higher-order-function arrays the
    expression is interpreted with no common-subexpression reuse.

    ``explode_outer`` infers nothing; the cheap ``IS NOT NULL`` filter on
    the *exploded output* runs post-Generate. Semantics match explode()
    exactly as long as the array cannot contain NULL elements — true for
    every regexp/substring/array_join-derived array in this engine.
    """
    from pyspark.sql import functions as F

    out = df.select(*keep, F.explode_outer(array_col).alias(alias))
    return out.where(F.col(alias).isNotNull())


def load_tables(spark: SparkSession, sf_dir: str, tables: list[str] | None = None):
    """Load the driver's parquet tables as a dict of DataFrames."""
    names = tables or [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]
    out = {}
    for name in names:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            out[name] = spark.read.parquet(path)
    return out


def register_persisted(out, *frames):
    """Attach persisted dependency frames to a returned plan so callers
    can release the cache once done: ``unpersist_plan(result)``.

    Operators with a ``cache=True`` contract (minhash_lsh_pairs,
    semantic_dedup, winnow_neardup_pairs, curate_corpus_semantic, ...)
    persist an intermediate that several plan subtrees share. The
    persisted frame is NOT the returned frame, so callers had no handle
    to unpersist it short of ``spark.catalog.clearCache()`` — a session
    running many corpora accumulated pinned cache entries (ADVICE r11).
    Frames already registered on an input plan are propagated, so the
    composed funnel releases its stages' caches too. The attribute is
    plain Python state on the DataFrame wrapper: it survives returns
    and assignments, but NOT further transformations (``df.select(...)``
    builds a new wrapper) — release at the operator-output level.
    """
    existing = list(getattr(out, "_dps_persisted", []))
    out._dps_persisted = existing + list(frames)
    return out


def unpersist_plan(df, blocking: bool = False) -> int:
    """Release every cache a ``cache=True`` operator pinned under this
    returned plan (see :func:`register_persisted`). Safe to call on any
    DataFrame (no-op when nothing is registered); returns the number of
    frames released. Call AFTER the final action over the result —
    unpersisting earlier just recomputes."""
    frames = list(getattr(df, "_dps_persisted", []))
    for f in frames:
        f.unpersist(blocking)
    if frames:
        df._dps_persisted = []
    return len(frames)
