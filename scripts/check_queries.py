#!/usr/bin/env python
"""Targeted driver-contract check: run the named registered queries vs
their DuckDB oracles at sf0.01 (the verify-skill recipe, subset form).

    python scripts/check_queries.py q1 q2 ...           # named rows
    python scripts/check_queries.py --module q_embeddings  # whole module

Exit 0 = all match.
"""

from __future__ import annotations

import importlib
import sys

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir = "/root/testdata/sf0.01"
    args = sys.argv[1:]
    sys.path.insert(0, ".")
    mod = importlib.import_module("__spark_entry__")
    qs, osql = mod.queries(), mod.oracle_sql()
    if args and args[0] == "--module":
        modname = args[1]
        qmod = importlib.import_module(f"dataprofiler_spark.queries.{modname}")
        names = [n for n in qs
                 if getattr(qs[n], "__module__", "") == qmod.__name__]
    else:
        names = args
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries: {missing}")
        return 1

    from dataprofiler_spark.session import get_spark
    spark = get_spark(master="local[8]", shuffle_partitions=8,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    bad = 0
    for name in names:
        sdf = qs[name](spark, sf_dir).toPandas()
        if name not in osql:
            print(f"  {name}: rows={len(sdf)} (rows-only)")
            continue
        ddf = con.sql(osql[name]).df()
        a = (sdf.reindex(sorted(sdf.columns), axis=1)
             .sort_values(by=sorted(sdf.columns)).reset_index(drop=True))
        b = (ddf.reindex(sorted(ddf.columns), axis=1)
             .sort_values(by=sorted(ddf.columns)).reset_index(drop=True))
        ok = (list(a.columns) == list(b.columns) and len(a) == len(b)
              and all(
            (a[c].astype(float).fillna(-9e9)
             .eq(b[c].astype(float).fillna(-9e9)).all()
             if (a[c].dtype.kind == "f" or b[c].dtype.kind == "f")
             else list(a[c]) == list(b[c]))
            for c in a.columns))
        print(f"  {name}: rows={len(sdf)} oracle_match={ok}")
        bad += 0 if ok else 1
    spark.stop()
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
