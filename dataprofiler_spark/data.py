"""``Data(path)`` — the reference's load entry point.

Reference flow (README.md:70-90, data_readers/data.py): ``data =
dp.Data(path); profile = dp.Profiler(data); profile.report()``. Here
``Data`` wraps the sniff-and-read pipeline (sources/sniff.py) around a
lazy Spark scan: for local/cluster filesystem paths, nothing is
materialized at construction beyond the header bytes the sniffer
reads, so ``Data("s3a://bucket/100tb/")`` costs nothing until a
profile runs. http(s) URLs are the exception: the body is fetched to a
local temp file AT CONSTRUCTION (sniffing and Spark both need local
bytes; sources/url.py enforces a size guard) — at scale, point Spark
at a distributed-filesystem URI instead.
"""

from __future__ import annotations

import io

from pyspark.sql import DataFrame, SparkSession


def _spool_buffer(buf) -> str:
    """File-like input → a temp file the sniffer and Spark can read
    (reference FileOrBufferHandler, data_readers/filepath_or_buffer.py:
    22-100 — it normalizes str/StringIO/BytesIO to a readable buffer;
    Spark needs the opposite normalization, to a path). Reads from the
    buffer's CURRENT position; StringIO spools as UTF-8. Driver-side by
    nature — a buffer lives in driver RAM, so this path is for small
    legacy inputs, not the 100 TB scan path."""
    import tempfile

    raw = buf.read()
    if isinstance(raw, str):
        raw = raw.encode("utf-8")
    f = tempfile.NamedTemporaryFile(prefix="dps_buffer_", delete=False)
    f.write(raw)
    f.close()
    return f.name


class Data:
    """Sniffed, lazily-read dataset handle.

    Attributes mirror the reference's surface: ``data_type`` (csv /
    json / parquet / avro / text / graph_csv / orc), ``df`` (the lazy
    DataFrame — the reference's ``.data`` pandas frame equivalent).
    Accepts a path/URL, an open file / ``BytesIO`` / ``StringIO``
    buffer (reference filepath_or_buffer.py), or in-memory ``data=``
    (a Spark or pandas DataFrame) with an explicit ``data_type``
    (reference data.py:30-63 argument contract)."""

    def __init__(self, path=None, spark: SparkSession | None = None,
                 data_type: str | None = None, data=None, **options):
        from dataprofiler_spark.session import get_spark
        from dataprofiler_spark.sources.sniff import SniffResult, read_data

        if path is None and data is None:
            raise ValueError(
                "At least need to pass data or point to a data file.")
        if path is not None and data is not None:
            raise ValueError(
                "Either initialize from data or point to a data file. "
                "Cannot do both at the same time.")
        self._spark = spark or get_spark()
        if data is not None:
            if not data_type:
                raise ValueError(
                    "In memory data must be specified as a specific "
                    "data type.")
            import pandas as pd
            if isinstance(data, pd.DataFrame):
                data = self._spark.createDataFrame(data)
            if not isinstance(data, DataFrame):
                raise TypeError(
                    "data= must be a Spark or pandas DataFrame")
            self.path = None
            self.df = data
            self._sniff = SniffResult(data_type, dict(options))
            return
        if isinstance(path, (io.IOBase, io.StringIO, io.BytesIO)) \
                or (not isinstance(path, str) and hasattr(path, "read")):
            path = _spool_buffer(path)
        self.path = path
        self.df, self._sniff = read_data(self._spark, path,
                                         fmt=data_type, **options)

    @property
    def data_type(self) -> str:
        return self._sniff.format

    @property
    def options(self) -> dict:
        return dict(self._sniff.options)

    @property
    def data(self) -> DataFrame:
        """Reference's ``.data``; here the lazy DataFrame itself."""
        return self.df

    @property
    def metadata(self) -> DataFrame | None:
        """Whole-document JSON only (reference json_data.py metadata
        split): the non-payload fields of the document, one row per
        document; ``None`` for every other source."""
        return getattr(self._sniff, "metadata_df", None)

    def head(self, n: int = 5):
        return self.df.limit(n).toPandas()

    def __len__(self) -> int:
        return self.df.count()

    def profile(self, options=None):
        """Route to the right profiler family (reference
        Profiler.__new__, profile_builder.py:3075-3146)."""
        from dataprofiler_spark.plans.dispatch import (GraphProfiler,
                                                       UnstructuredProfiler)
        from dataprofiler_spark.plans.profile_plan import Profiler

        if self.data_type in ("text", "graph_csv"):
            if options is not None:
                raise ValueError(
                    f"options are not supported for {self.data_type} "
                    "profiles (ProfilerOptions configures the structured "
                    "profiler only)")
            if self.data_type == "text":
                return UnstructuredProfiler(self.df, "value")
            return GraphProfiler(self.df)
        return Profiler(self.df, options)
