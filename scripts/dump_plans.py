#!/usr/bin/env python
"""Dump .explain("formatted") for named registered queries to files.

    python scripts/dump_plans.py <outdir> <suffix> q1 q2 ...

Writes <outdir>/<query>_<suffix>.txt per query (sf0.1 frames — plan
shape, not execution).
"""

from __future__ import annotations

import importlib
import os
import sys


def main() -> int:
    outdir, suffix, names = sys.argv[1], sys.argv[2], sys.argv[3:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.getcwd())
    mod = importlib.import_module("__spark_entry__")
    from dataprofiler_spark.session import get_spark
    spark = get_spark(master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    qs = mod.queries()
    os.makedirs(outdir, exist_ok=True)
    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}_{suffix}.txt ({len(plan)} chars)")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
