"""dataprofiler_spark — a PySpark-native data profiling and training-data
pipeline engine with the capabilities of capitalone/DataProfiler,
re-designed Spark-first (see SURVEY.md).

Public API:
    Data(path)                       — sniffed, lazy load handle
    Profiler(data_or_df).report()    — full profile in 3 Spark jobs
    Profiler(df).update_profile(df2) — batch-incremental
    state1 + state2                  — mergeable profile algebra
    diff_profiles(a, b)              — drift report (PSI/chi²/t-test)
    DataLabeler(...).predict(df)     — entity labeling (regex/CNN/name)
    StreamingProfiler().attach(sdf)  — Structured Streaming foreachBatch
    get_spark() / load_tables()      — session + testdata helpers
"""

from dataprofiler_spark.data import Data
from dataprofiler_spark.dp_logging import get_logger, set_verbosity
from dataprofiler_spark.labeler import DataLabeler
from dataprofiler_spark.labeler.trainable import (TrainableDataLabeler,
                                                  train_structured_labeler)
from dataprofiler_spark.operators.validators import Validator
from dataprofiler_spark.plans.dispatch import (GraphProfiler,
                                               UnstructuredProfiler,
                                               profile_path)
from dataprofiler_spark.interop import (load_reference_profile,
                                        save_reference_profile)
from dataprofiler_spark.plans.diff_plan import (diff_frames, diff_snapshots,
                                                profile_timeline)
from dataprofiler_spark.plans.profile_plan import Profiler, ProfilerOptions
from dataprofiler_spark.plugins import load_plugins
from dataprofiler_spark.report import build_report, diff_profiles
from dataprofiler_spark.session import get_spark, load_tables, set_seed
from dataprofiler_spark.state import (DatasetState, from_json,
                                      merge_profile_list, to_json)
from dataprofiler_spark.streaming.drift import StreamingDriftMonitor
from dataprofiler_spark.streaming.embedding_decon import (
    StreamingEmbeddingDecon, build_benchmark_store)
from dataprofiler_spark.streaming.history import (ProfileHistory,
                                                  drift_series,
                                                  drift_timeline)
from dataprofiler_spark.streaming.incremental import StreamingProfiler
from dataprofiler_spark.streaming.winnow import StreamingWinnowDup
from dataprofiler_spark import reports_graphs as graphs

# Reference aliases: the reference exposes profiler/labeler families as
# distinct classes (profile_builder.py / data_labelers.py); here the
# dispatch is parameter-driven, so the aliases pin the call shapes.
StructuredProfiler = Profiler


def StructuredDataLabeler(*args, **kwargs):
    """Reference alias: DataLabeler(labeler_type='structured')."""
    kwargs.setdefault("labeler_type", "structured")
    return DataLabeler(*args, **kwargs)


def UnstructuredDataLabeler(*args, **kwargs):
    """Reference alias: DataLabeler(labeler_type='unstructured')."""
    kwargs.setdefault("labeler_type", "unstructured")
    return DataLabeler(*args, **kwargs)


__all__ = [
    "Data", "DataLabeler", "Profiler", "ProfilerOptions", "UnstructuredProfiler",
    "GraphProfiler", "StructuredProfiler", "StructuredDataLabeler",
    "UnstructuredDataLabeler", "TrainableDataLabeler",
    "train_structured_labeler", "Validator", "load_plugins", "graphs",
    "DatasetState", "StreamingProfiler", "StreamingDriftMonitor",
    "StreamingEmbeddingDecon", "build_benchmark_store",
    "StreamingWinnowDup",
    "ProfileHistory", "drift_series", "drift_timeline",
    "build_report", "diff_profiles",
    "diff_frames", "diff_snapshots", "profile_timeline",
    "load_reference_profile", "save_reference_profile",
    "get_spark", "load_tables", "merge_profile_list", "profile_path",
    "set_seed", "set_verbosity", "get_logger", "to_json", "from_json",
]
__version__ = "0.1.0"
