"""Streaming drift monitor: per-micro-batch PSI against a frozen
baseline profile.

The reference's drift surface is batch-only (profile.diff(other) —
report.py:326-454 / operators/drift.py). In production the question is
continuous: "is today's feed still distributed like the profile I
signed off on?". Structured Streaming answers it with ``foreachBatch``:
the baseline is aggregated ONCE and frozen driver-side (bounded:
category counts capped loudly, numeric state is just (lo, hi) + bin
counts), and each micro-batch runs one small groupBy + broadcast join
against the frozen counts — per batch cost is one scan of the batch,
O(categories) driver state, no growing state store.

Semantics match operators/drift.py exactly where the framing allows:
  * categorical: identical smoothing ((c+1)/(n+k), k = aligned category
    count) — a micro-batch's PSI equals drift.categorical_psi(baseline,
    batch) run in batch mode (pinned by tests/test_streaming_drift.py).
  * numeric: bin edges are FROZEN from the baseline — a monitor cannot
    re-derive edges from data it hasn't seen yet; out-of-range batch
    values clamp into the edge bins (the standard monitoring
    formulation). Two edge rules (``numeric_bins``):
      - "quantile" (default): edges from the baseline's approximate
        quantiles (percentile_approx at freeze time) — every bin holds
        ~1/bins of the baseline mass, so one extreme baseline outlier
        cannot collapse all the mass into a single bin the way
        equal-width (min, max) edges do (VERDICT r4 item 7). This is
        the standard PSI formulation for monitoring.
      - "width": equal-width bins over the baseline (min, max),
        bit-compatible with drift.numeric_psi's framing.

COMPATIBILITY — recorded PSI baselines (r5 semantics change): two
behaviors changed together in round 5 and BOTH shift the numeric PSI a
monitor reports, so PSI values logged by a pre-r5 monitor are NOT
comparable to post-r5 values for the same data:
  1. the default edge rule moved "width" → "quantile" (VERDICT r4
     item 7); construct with ``numeric_bins="width"`` to keep the old
     edges, and
  2. smoothing now runs over ALL dense bins rather than only the
     observed buckets — this affects "width" mode too (an unobserved
     bin now contributes its smoothed mass instead of being absent).
If you alert on absolute PSI thresholds against historical logs,
re-freeze the baseline and re-record the expected PSI level once after
upgrading rather than comparing across the seam.
"""

from __future__ import annotations

import math
import time

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class StreamingDriftMonitor:
    """Freeze a baseline; score every micro-batch against it.

    ``columns`` maps column name -> "categorical" | "numeric".
    ``alert_threshold`` marks log entries with alert=True when any
    column's PSI exceeds it (the conventional 0.2 "significant shift"
    cut — reference categorical_column_profile.py PSI reporting leaves
    interpretation to the caller, so the threshold is opt-in here too).
    """

    def __init__(self, baseline_df: DataFrame, columns: dict[str, str],
                 bins: int = 10, max_categories: int = 10_000,
                 alert_threshold: float | None = None,
                 sink_path: str | None = None, round_digits: int = 6,
                 numeric_bins: str = "quantile"):
        if numeric_bins not in ("quantile", "width"):
            raise ValueError(f"numeric_bins must be 'quantile' or 'width',"
                             f" got {numeric_bins!r}")
        self.columns = dict(columns)
        self.bins = bins
        self.numeric_bins = numeric_bins
        self.alert_threshold = alert_threshold
        self.sink_path = sink_path
        self.round_digits = round_digits
        self.log: list[dict] = []
        self._cat_counts: dict[str, list[tuple[str | None, int]]] = {}
        # col -> (edges, bin-count list); edges are the frozen interior
        # cut points, bucket = #edges strictly below x (clamped by
        # construction to 0..len(edges)).
        self._num_state: dict[str, tuple[list[float], list[tuple[int, int]]]] = {}
        bad = [f"{k!r} for column {c!r}" for c, k in self.columns.items()
               if k not in ("categorical", "numeric")]
        if bad:
            raise ValueError(f"unknown kind {bad[0]}")
        num_cols = [c for c, k in self.columns.items() if k == "numeric"]
        cat_cols = [c for c, k in self.columns.items() if k == "categorical"]

        # categorical baselines stay ONE job per column: the
        # limit(max_categories+1) guard must bound the driver transfer
        # BEFORE a high-cardinality key ships its whole value set
        for col in cat_cols:
            rows = (baseline_df
                    .groupBy(F.col(col).cast("string").alias("value"))
                    .agg(F.count(F.lit(1)).alias("cnt"))
                    .limit(max_categories + 1).collect())
            if len(rows) > max_categories:
                raise ValueError(
                    f"baseline column {col!r} exceeds max_categories="
                    f"{max_categories}; monitor a bucketed projection "
                    "instead of a high-cardinality key")
            self._cat_counts[col] = [(r["value"], r["cnt"]) for r in rows]

        # numeric baselines: the r12 shape ran TWO jobs per column
        # (edge sketch, then bucket counts), each a full baseline scan.
        # r13 (guide §1.2): one agg carrying every column's
        # percentile_approx (or min/max) sketch, then one melted
        # explode → groupBy(column, bucket) pass for every column's
        # bin counts — 2 scans total regardless of column count.
        # Identical edge values (same expressions), identical counts.
        if num_cols:
            if self.numeric_bins == "quantile":
                qs = [i / self.bins for i in range(1, self.bins)]
                row = baseline_df.agg(*[
                    F.percentile_approx(F.col(c).cast("double"), qs,
                                        10_000).alias(f"__e{i}")
                    for i, c in enumerate(num_cols)]).collect()[0]
                for i, col in enumerate(num_cols):
                    # dedupe: a heavy point mass yields repeated cut
                    # points; repeated edges would mint empty bins that
                    # only add smoothing noise.
                    edges, seen = [], set()
                    for e in (row[f"__e{i}"] or []):
                        if e is not None and e not in seen:
                            seen.add(e)
                            edges.append(float(e))
                    edges.sort()
                    self._num_state[col] = (edges, [])
            else:
                mm = baseline_df.agg(*[
                    g for i, c in enumerate(num_cols) for g in
                    (F.min(F.col(c).cast("double")).alias(f"__lo{i}"),
                     F.max(F.col(c).cast("double")).alias(f"__hi{i}"))
                ]).collect()[0]
                for i, col in enumerate(num_cols):
                    lo, hi = float(mm[f"__lo{i}"]), float(mm[f"__hi{i}"])
                    w = (hi - lo) / float(self.bins) or 1.0
                    self._num_state[col] = (
                        [lo + w * j for j in range(1, self.bins)], [])
            entries = [F.struct(
                F.lit(c).alias("column"),
                self._bucket_expr(c, self._num_state[c][0])
                .alias("bucket"),
                F.col(c).cast("double").isNotNull().alias("keep"))
                for c in num_cols]
            counts = (baseline_df
                      .select(F.explode(F.array(*entries)).alias("e"))
                      .where(F.col("e.keep"))
                      .groupBy(F.col("e.column").alias("column"),
                               F.col("e.bucket").alias("bucket"))
                      .agg(F.count(F.lit(1)).alias("cnt"))
                      .collect())
            for r in counts:
                edges, lst = self._num_state[r["column"]]
                lst.append((r["bucket"], r["cnt"]))

    def _bucket_expr(self, col: str, edges: list[float]):
        """bucket = #frozen edges at or below x — monotone, clamps out-of-
        range values into the first/last bin, and works for BOTH edge
        rules (width mode's edges are the equal-width interior cuts, so
        this reproduces the floor((x-lo)/w) bucket for in-range x)."""
        x = F.col(col).cast("double")
        if not edges:
            return F.lit(0).cast("int")
        return F.aggregate(
            F.array(*[F.lit(e) for e in edges]),
            F.lit(0),
            lambda acc, e: acc + F.when(x >= e, 1).otherwise(0),
        ).cast("int")

    # -- per-batch scoring ---------------------------------------------------

    # sentinel melt key for the row count — NUL-prefixed so no real
    # column name can collide
    _ROWS_KEY = "\x00rows"

    def _psi_categorical(self, batch: dict[str | None, int],
                         col: str) -> float | None:
        """PSI over the full outer union of baseline/batch keys, +1
        smoothing on both sides (same formula the r12 per-column Spark
        aggregate computed; moved to the driver over the single-pass
        melted counts — bounded by max_categories, and float-sum order
        differences land below the round_digits rounding)."""
        base = dict(self._cat_counts[col])
        keys = sorted((set(base) | set(batch)),
                      key=lambda v: (v is not None, v))
        k = len(keys)
        na = sum(base.values())
        nb = sum(batch.values())
        psi = 0.0
        for key in keys:
            pa = (base.get(key, 0) + 1) / (na + k)
            pb = (batch.get(key, 0) + 1) / (nb + k)
            psi += (pb - pa) * math.log(pb / pa)
        return round(psi, self.round_digits)

    def _psi_numeric(self, batch: dict[int, int], col: str) -> float | None:
        edges, base_counts = self._num_state[col]
        n_bins = len(edges) + 1
        base = dict(base_counts)
        na, nb = sum(base.values()), sum(batch.values())
        if nb == 0:
            return None
        psi = 0.0
        for bucket in range(n_bins):
            pa = (base.get(bucket, 0) + 1) / (na + n_bins)
            pb = (batch.get(bucket, 0) + 1) / (nb + n_bins)
            psi += (pb - pa) * math.log(pb / pa)
        return round(psi, self.round_digits)

    def update(self, batch_df: DataFrame, batch_id: int | None = None) -> dict:
        """foreachBatch hook: score one micro-batch against the frozen
        baseline; append to the in-memory log and the optional sink.

        ONE batch scan for everything (r13, guide §1.2): the r12 shape
        ran 1 + n_columns jobs per micro-batch — a count plus one
        groupBy-collect per monitored column, each re-scanning the
        batch. All columns (and the row count, via a sentinel entry)
        now melt into a single explode → groupBy(column, key) pass; the
        driver folds the bounded per-key counts into the same PSI
        formulas. Smoothed-PSI values are unchanged up to float-sum
        order (asserted within 2e-6 of the batch operator by
        test_streaming_psi_matches_batch_operator)."""
        entries = [F.struct(
            F.lit(self._ROWS_KEY).alias("column"),
            F.lit(None).cast("string").alias("key"),
            F.lit(True).alias("keep"))]
        for col, kind in self.columns.items():
            if kind == "categorical":
                entries.append(F.struct(
                    F.lit(col).alias("column"),
                    F.col(col).cast("string").alias("key"),
                    F.lit(True).alias("keep")))
            else:
                edges = self._num_state[col][0]
                entries.append(F.struct(
                    F.lit(col).alias("column"),
                    self._bucket_expr(col, edges).cast("string")
                    .alias("key"),
                    F.col(col).cast("double").isNotNull().alias("keep")))
        melted = (batch_df
                  .select(F.explode(F.array(*entries)).alias("e"))
                  .where(F.col("e.keep"))
                  .groupBy(F.col("e.column").alias("column"),
                           F.col("e.key").alias("key"))
                  .agg(F.count(F.lit(1)).alias("cnt"))
                  .collect())
        per_col: dict[str, dict] = {}
        n = 0
        for r in melted:
            if r["column"] == self._ROWS_KEY:
                n = r["cnt"]
            else:
                per_col.setdefault(r["column"], {})[r["key"]] = r["cnt"]
        entry: dict = {"batch_id": batch_id, "n_rows": n, "psi": {}}
        for col, kind in self.columns.items():
            if n == 0:
                entry["psi"][col] = None
                continue
            if kind == "categorical":
                entry["psi"][col] = self._psi_categorical(
                    per_col.get(col, {}), col)
            else:
                entry["psi"][col] = self._psi_numeric(
                    {int(k): v for k, v in per_col.get(col, {}).items()},
                    col)
        if self.alert_threshold is not None:
            entry["alert"] = any(
                v is not None and v > self.alert_threshold
                for v in entry["psi"].values())
        self.log.append(entry)
        if self.sink_path is not None:
            spark = batch_df.sparkSession
            rows = [(int(batch_id) if batch_id is not None else -1,
                     float(time.time()), col, entry["psi"][col], int(n))
                    for col in self.columns]
            (spark.createDataFrame(
                rows, "batch_id long, wall_ts double, column_name string, "
                      "psi double, n_rows long")
             .write.mode("append").parquet(self.sink_path))
        return entry

    def attach(self, stream_df: DataFrame):
        """``monitor.attach(spark.readStream...).start()`` — scores every
        micro-batch; pair with ``trigger(availableNow=True)`` for
        catch-up scoring of a backlog."""
        return stream_df.writeStream.foreachBatch(
            lambda df, bid: self.update(df, bid))
