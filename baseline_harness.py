"""Measure the reference library (capitalone/DataProfiler) on THIS machine.

The reference cannot import in this container as-is (fastavro, chardet,
psutil, scipy, datasketches, HLL are absent). This harness makes it run
WITHOUT changing its behavior on the measured path:

- fastavro / chardet / datasketches / HLL: MagicMock stubs — these back
  the AVRO/CSV readers, the opt-in CMS sketch, and the opt-in HLL row
  hashing, none of which execute when profiling a parquet-loaded
  pandas.DataFrame with default options.
- psutil: real fakes for cpu_count / virtual_memory so the reference's
  multiprocessing pool sizing (profiler_utils.py:226-233) sees the real
  machine shape (32 cpus, 128 GiB).
- scipy.stats: chi2 / t distribution objects backed by the engine's own
  special functions (dataprofiler_spark/functions/special.py, ~1e-13
  accurate) because chi2 p-values run inside the profile loop
  (profiler_utils.py:784). Everything else resolves to MagicMock.
- data labeler: disabled via options — TensorFlow is absent, and the
  Spark engine's default profile also runs without the CNN labeler, so
  the comparison is like-for-like.

Usage: python baseline_harness.py [sf_dir] [table]
Prints one JSON line: reference import+profile wall time at its DEFAULT
sampling (max(0.2n, 5000) rows/column) and at FULL data, on the same
table bench.py's full_profile uses.
"""

from __future__ import annotations

import json
import math
import sys
import time
import types


# ---------------------------------------------------------------------------
# special-function fakes — reuse the engine's implementations
# ---------------------------------------------------------------------------

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.abspath(__file__)))

from dataprofiler_spark.functions.special import (betainc as _betainc,
                                                  gammainc_lower as
                                                  _gammainc_P)


class _Chi2Dist:
    def __init__(self, df):
        self.df = float(df)

    def cdf(self, x):
        return _gammainc_P(self.df / 2.0, float(x) / 2.0)

    def sf(self, x):
        return 1.0 - self.cdf(x)


class _TDist:
    def __init__(self, df):
        self.df = float(df)

    def cdf(self, x):
        x = float(x)
        v = self.df
        ib = _betainc(v / 2.0, 0.5, v / (v + x * x))
        return 1 - 0.5 * ib if x > 0 else 0.5 * ib

    def sf(self, x):
        return 1.0 - self.cdf(x)


def install_stubs() -> None:
    from unittest import mock

    for name in ["fastavro", "chardet", "chardet.universaldetector",
                 "datasketches", "HLL"]:
        mod = types.ModuleType(name)  # real module: keeps __name__ etc.
        mod.__getattr__ = lambda attr: mock.MagicMock()
        sys.modules.setdefault(name, mod)

    psutil = types.ModuleType("psutil")
    psutil.cpu_count = lambda *a, **k: 32

    def _vm():
        vm = types.SimpleNamespace()
        vm.total = 128 << 30
        vm.available = 64 << 30
        vm.percent = 50.0
        return vm

    psutil.virtual_memory = _vm
    sys.modules["psutil"] = psutil

    scipy = types.ModuleType("scipy")
    stats = types.ModuleType("scipy.stats")
    stats.chi2 = _Chi2Dist
    stats.t = _TDist
    stats.__getattr__ = lambda name: mock.MagicMock()
    scipy.stats = stats
    scipy.__version__ = "1.11.0"
    scipy.__getattr__ = lambda name: mock.MagicMock()
    sys.modules["scipy"] = scipy
    sys.modules["scipy.stats"] = stats


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    table = sys.argv[2] if len(sys.argv) > 2 else "lineitem"

    install_stubs()
    sys.path.insert(0, "/root/reference")

    import pandas as pd

    t0 = time.perf_counter()
    import dataprofiler as dp
    t_import = time.perf_counter() - t0

    df = pd.read_parquet(f"{sf_dir}/{table}.parquet")

    opts = dp.ProfilerOptions()
    opts.set({"data_labeler.is_enabled": False})

    t0 = time.perf_counter()
    prof = dp.Profiler(df, options=opts)
    prof.report(report_options={"output_format": "compact"})
    t_default = time.perf_counter() - t0

    t0 = time.perf_counter()
    prof_full = dp.Profiler(df, samples_per_update=len(df), options=opts)
    prof_full.report(report_options={"output_format": "compact"})
    t_full = time.perf_counter() - t0

    # sanity: the run must produce real numbers, not mock objects
    rep = prof_full.report(report_options={"output_format": "compact"})
    col0 = rep["data_stats"][0]["statistics"]
    assert isinstance(col0.get("mean", 0.0), (int, float)), col0.get("mean")

    print(json.dumps({
        "engine": "reference-dataprofiler",
        "sf_dir": sf_dir,
        "table": table,
        "rows": len(df),
        "cols": df.shape[1],
        "import_sec": round(t_import, 3),
        "profile_default_sampling_sec": round(t_default, 3),
        "profile_full_data_sec": round(t_full, 3),
        "default_sample_rows_per_col": max(int(0.2 * len(df)), 5000),
        "labeler": "disabled (no TF in env; Spark side equally CNN-less)",
    }))


if __name__ == "__main__":
    main()
