from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataprofiler_spark import report as rep
from dataprofiler_spark.queries._registry import T, register

# ---------------------------------------------------------------------------
# Full profile (flagship). The driver-checked variant runs the REAL
# end-to-end ``Profiler().profile()`` and emits the deterministic,
# engine-portable slice of the report (report.deterministic_report_rows),
# hash-checked against a composite DuckDB oracle. Order-dependent floats
# (native double sum / var_pop / skew / kurt), HLL estimates, histograms
# and category maps are excluded here — each is covered by its own
# exact-mode oracled query above. The untruncated flat report stays
# registered as a rows-only check (full_report_*, end of registry).
# ---------------------------------------------------------------------------

def _flat_report_df(spark, df):
    from dataprofiler_spark import Profiler
    from dataprofiler_spark.report import build_report, flat_dict

    report = build_report(Profiler(df).profile(), output_format="compact")
    flat = flat_dict(report)
    rows = [(k, str(v)) for k, v in sorted(flat.items())]
    return spark.createDataFrame(rows, "key string, value string")


def _deterministic_profile_df(spark, df):
    from dataprofiler_spark import Profiler
    from dataprofiler_spark.report import deterministic_report_rows

    rows = deterministic_report_rows(Profiler(df).profile())
    return spark.createDataFrame(
        rows,
        "column string, stat string, value_num double, value_str string")


_LI_NUM_ALL = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
               "l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_LI_STR = ["l_returnflag", "l_linestatus"]
_LI_DT = ["l_shipdate"]
_EV_NUM = ["event_id", "user_id", "value"]
_EV_STR = ["event_type", "props"]
_EV_DT = ["ts"]


@register("full_profile_lineitem",
          rep.oracle_full_profile_sql("lineitem", _LI_NUM_ALL, _LI_STR,
                                      _LI_DT))
def full_profile_lineitem(spark, sf_dir):
    return _deterministic_profile_df(spark, T(spark, sf_dir, "lineitem"))


@register("full_profile_events",
          rep.oracle_full_profile_sql("events", _EV_NUM, _EV_STR, _EV_DT))
def full_profile_events(spark, sf_dir):
    return _deterministic_profile_df(spark, T(spark, sf_dir, "events"))


@register("merged_profile_lineitem",
          rep.oracle_full_profile_sql("lineitem", _LI_NUM_ALL, _LI_STR,
                                      _LI_DT))
def merged_profile_lineitem(spark, sf_dir):
    """Merge invariance at driver strength (reference
    test_profile_builder.py's central invariant, profile_builder.py:
    939-997): profile two DISJOINT halves of lineitem independently,
    merge the states with the ``+`` algebra, and emit the deterministic
    report slice — hash-checked against the WHOLE-TABLE oracle, proving
    ``profile(A) + profile(B) == profile(A ∪ B)`` cross-engine, not
    just in local tests."""
    from pyspark.sql import functions as F

    from dataprofiler_spark import Profiler
    from dataprofiler_spark.report import deterministic_report_rows

    df = T(spark, sf_dir, "lineitem")
    half_a = df.where(F.pmod(F.col("l_orderkey"), F.lit(2)) == 0)
    half_b = df.where(F.pmod(F.col("l_orderkey"), F.lit(2)) == 1)
    merged = Profiler(half_a).profile() + Profiler(half_b).profile()
    rows = deterministic_report_rows(merged)
    return spark.createDataFrame(
        rows,
        "column string, stat string, value_num double, value_str string")


@register("profile_diff_events",
          rep.oracle_profile_diff_sql("events", "ts", _EV_NUM, _EV_STR))
def profile_diff_events(spark, sf_dir):
    """Composed ``.diff()`` end-to-end (reference profiler_utils.py:
    417-667 semantics via report.diff_profiles): profile two midpoint
    time-slices of events, run the REAL diff, and emit its
    deterministic slice (row-count delta, per-column type/null/min/max
    diffs). The drift statistics the full diff also carries (Welch t,
    PSI, KS, chi²) are order-dependent and each oracled separately
    (welch_t_*, psi_*, ks_js_*, chi2_*). NULL-ts rows belong to
    neither snapshot. Refuses loudly on an empty/all-null-ts table —
    a time-slice of nothing has no midpoint."""
    from pyspark.sql import functions as F

    from dataprofiler_spark import Profiler
    from dataprofiler_spark.report import (deterministic_diff_rows,
                                           diff_profiles)

    base = T(spark, sf_dir, "events").where(F.col("ts").isNotNull())
    b = base.agg(F.min(F.unix_micros("ts")).alias("mn"),
                 F.max(F.unix_micros("ts")).alias("mx")).collect()[0]
    if b["mn"] is None:
        raise ValueError("profile_diff_events: no non-null timestamps "
                         "to time-slice")
    mid = (b["mn"] + b["mx"]) // 2
    snap_a = base.where(F.unix_micros("ts") < F.lit(mid))
    snap_b = base.where(F.unix_micros("ts") >= F.lit(mid))
    sa = Profiler(snap_a).profile()
    sb = Profiler(snap_b).profile()
    rows = deterministic_diff_rows(diff_profiles(sa, sb), sa, sb)
    return spark.createDataFrame(
        rows,
        "column string, stat string, value_num double, value_str string")


def _profile_by_oracle() -> str:
    parts = []
    for g in ("A", "N", "R"):
        inner = rep.oracle_full_profile_sql(
            f"(SELECT * FROM lineitem WHERE l_returnflag = '{g}')",
            _LI_NUM_ALL, ["l_linestatus"], _LI_DT)
        parts.append(f"SELECT '{g}' AS grp, * FROM ({inner})")
    return "\nUNION ALL\n".join(parts)


@register("profile_by_returnflag_lineitem", _profile_by_oracle())
def profile_by_returnflag_lineitem(spark, sf_dir):
    """Segmented profiling (beyond the reference): per-group full
    profiles from ONE grouped scan — ``Profiler.profile_by`` runs the
    same wide-agg expression set groupBy(l_returnflag) instead of
    looping a whole profile per segment (3 groups → 1 scan, not 3).
    Emits each group's deterministic report slice; the oracle is the
    flagship's own SQL mirror filtered per group value."""
    from dataprofiler_spark import Profiler
    from dataprofiler_spark.report import deterministic_report_rows

    states = Profiler(T(spark, sf_dir, "lineitem")).profile_by(
        "l_returnflag")
    rows = []
    for g in sorted(states):
        for r in deterministic_report_rows(states[g]):
            rows.append((str(g), *r))
    return spark.createDataFrame(
        rows, "grp string, column string, stat string, "
              "value_num double, value_str string")


@register("profile_timeline_events_week",
          # CAST .. AS TIMESTAMP: DuckDB's date_trunc('week') yields a
          # DATE whose VARCHAR form drops the midnight time; the Spark
          # key is a timestamp's str()
          rep.oracle_profile_by_sql(
              "events", "CAST(date_trunc('week', ts) AS TIMESTAMP)",
              _EV_NUM, _EV_STR, _EV_DT))
def profile_timeline_events_week(spark, sf_dir):
    """Hypertable-style rollup: per-WEEK full profiles of events from
    ONE grouped scan (plans/diff_plan.py::profile_timeline) — the
    profile timeline a drift monitor reads, at one scan instead of
    n_buckets. Emits each bucket's deterministic report slice; the
    oracle GROUP BYs the same stats per date_trunc('week') bucket."""
    from dataprofiler_spark.plans.diff_plan import profile_timeline
    from dataprofiler_spark.report import deterministic_report_rows

    states = profile_timeline(T(spark, sf_dir, "events"), "ts",
                              unit="week")
    rows = []
    for g in sorted(states):
        for r in deterministic_report_rows(states[g]):
            rows.append((str(g), *r))
    return spark.createDataFrame(
        rows, "grp string, column string, stat string, "
              "value_num double, value_str string")


@register("profile_diff_fused_events",
          rep.oracle_profile_diff_sql("events", "ts", _EV_NUM, _EV_STR))
def profile_diff_fused_events(spark, sf_dir):
    """The FUSED snapshot-diff plan (plans/diff_plan.py): both slice
    profiles from ONE side-split scan (groupBy(side) over the
    profiler's own wide-agg expressions — the FILTER-split shape the
    shared oracle uses) instead of the composed path's two full
    profile passes. Same ``diff_profiles``, same deterministic slice,
    same oracle as profile_diff_events — proving plan equivalence
    cross-engine while costing ~half the scans (bench rows
    profile_diff_events vs profile_diff_fused_events)."""
    from dataprofiler_spark.plans.diff_plan import diff_snapshots
    from dataprofiler_spark.report import deterministic_diff_rows

    diff, sa, sb = diff_snapshots(T(spark, sf_dir, "events"), "ts")
    rows = deterministic_diff_rows(diff, sa, sb)
    return spark.createDataFrame(
        rows,
        "column string, stat string, value_num double, value_str string")




# ---------------------------------------------------------------------------
# Reference-format profile import (interop.py; reference
# json_encoder.py:19-100, json_decoder.py:23-250,
# profile_builder.py:1169-1233): a migrating user's saved DataProfiler
# profile loads into engine state and diffs against a fresh Spark
# profile. The fixture is a REAL reference-library save (regenerated
# in-container by scripts/make_ref_profile_fixture.py at sf0.001);
# its deterministic slice embeds into the oracle as literals, so the
# oracle checks the import parse + the live profile + the join.
# ---------------------------------------------------------------------------

_REF_FIXTURE = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))),
    "fixtures", "ref_profile_lineitem_sf0001.json.gz")


def _ref_fixture_rows():
    from dataprofiler_spark.interop import load_reference_profile
    from dataprofiler_spark.report import deterministic_report_rows
    return deterministic_report_rows(load_reference_profile(_REF_FIXTURE))


def _imported_diff_oracle() -> str:
    vals = []
    for c, s, vn, vs in _ref_fixture_rows():
        num = ("CAST(NULL AS DOUBLE)" if vn is None
               else f"CAST({vn!r} AS DOUBLE)")
        st = ("CAST(NULL AS VARCHAR)" if vs is None
              else "'" + str(vs).replace("'", "''") + "'")
        vals.append(f"('{c}', '{s}', {num}, {st})")
    base = rep.oracle_full_profile_sql("lineitem", _LI_NUM_ALL, _LI_STR,
                                       _LI_DT)
    return f"""
WITH spark_side AS ({base}),
ref_side ("column", stat, ref_num, ref_str) AS (VALUES {", ".join(vals)})
SELECT s."column" AS "column", s.stat AS stat,
       r.ref_num AS ref_num, s.value_num AS spark_num,
       s.value_num - r.ref_num AS delta_num,
       r.ref_str AS ref_str, s.value_str AS spark_str
FROM spark_side s JOIN ref_side r
  ON s."column" = r."column" AND s.stat = r.stat
"""


@register("imported_profile_diff_lineitem", _imported_diff_oracle())
def imported_profile_diff_lineitem(spark, sf_dir):
    """Migration path end-to-end: parse a reference-library saved
    profile (interop.load_reference_profile), take its deterministic
    report slice, and join it per (column, stat) against the slice of
    a freshly computed Spark profile of lineitem at sf_dir — the
    legacy-vs-new drift table a user checks after switching engines.
    Both sides of the join are REAL paths (import parse; full
    Profiler().profile()); the delta arithmetic is bit-reproducible
    because both engines subtract the same embedded literals from
    hash-proven equal profile values."""
    from dataprofiler_spark import Profiler
    from dataprofiler_spark.report import deterministic_report_rows

    ref = {(c, s): (vn, vs) for c, s, vn, vs in _ref_fixture_rows()}
    cur = deterministic_report_rows(
        Profiler(T(spark, sf_dir, "lineitem")).profile())
    out = []
    for c, s, vn, vs in cur:
        if (c, s) not in ref:
            continue
        rn, rs = ref[(c, s)]
        delta = None if (vn is None or rn is None) else vn - rn
        out.append((c, s, rn, vn, delta, rs, vs))
    return spark.createDataFrame(
        out, "column string, stat string, ref_num double, "
             "spark_num double, delta_num double, "
             "ref_str string, spark_str string")
