#!/usr/bin/env python
"""Fast A/B timing harness for a handful of bench rows (r13).

bench.py is the OFFICIAL methodology (cold JVM per group, min-of-3) but
spins a JVM per group even for groups BENCH_ONLY leaves empty — ~8 min
for a 4-query A/B pass. This harness runs the SAME timed lambdas
(bench.build_runners) for the named queries in ONE fresh JVM, n reps,
and prints min + all reps. Use ONLY for relative A/B iteration; final
numbers always come from bench.py.

    python scripts/r13_ab.py q1,q2,... [n_reps]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    names = [s for s in sys.argv[1].split(",") if s]
    n_reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, root)
    os.chdir(root)

    from dataprofiler_spark.session import get_spark
    spark = get_spark(app_name="r13-ab", extra_conf={
        "spark.ui.enabled": "false",
        "spark.ui.showConsoleProgress": "false",
    })
    import bench
    runners = bench.build_runners(spark, sf_dir)
    # warm the session (scan metadata, JIT) like bench.py's group warmup
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()

    out: dict[str, dict] = {}
    for name in names:
        _, fn = runners[name]
        if hasattr(fn, "setup"):
            fn.setup()
        reps = []
        for _ in range(n_reps):
            t0 = time.perf_counter()
            fn()
            reps.append(round(time.perf_counter() - t0, 3))
        out[name] = {"min": min(reps), "reps": reps}
    print(json.dumps({"tree": root, "queries": out}))
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
