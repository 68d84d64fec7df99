"""Registry core: the (name -> spark callable) and (name -> oracle SQL)
dicts, the @register decorator, and the shared table loader T().
Family modules under dataprofiler_spark/queries/ register themselves on
import; dataprofiler_spark/queries/__init__.py wires the import order
and the driver window.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SPARK_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}
# Rows registered WITHOUT an oracle must say why (VERDICT r11 item 8):
# the SLA test rejects an un-oracled row with no justification, so
# "forgot the oracle" cannot masquerade as "rows-only by construction".
NO_ORACLE_REASON: dict[str, str] = {}


def register(name: str, oracle: str | None = None,
             no_oracle_reason: str | None = None):
    def deco(fn):
        SPARK_QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        elif no_oracle_reason:
            NO_ORACLE_REASON[name] = no_oracle_reason
        return fn
    return deco


def T(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver runs these queries in ITS session — pin the timezone so
    # timestamp formatting/epoch math matches the DuckDB oracle (naive
    # timestamps) regardless of the host default.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    if name == "events":
        # events.ts has shipped as parquet TIMESTAMP(NANOS) in some data
        # generations (Spark rejects nanos by default → read as long and
        # integer-divide to micros; a double division would lose precision
        # at 1.7e18 ns epochs) and as plain TIMESTAMP in others. Branch on
        # the actual read dtype so both generations load identically.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
        ts_type = dict(df.dtypes).get("ts")
        if ts_type in ("bigint", "long"):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif ts_type == "timestamp_ntz":
            # Session tz is pinned to UTC above, so ntz→ltz is instant-
            # preserving; downstream ops (unix_micros, windowing) expect LTZ.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


