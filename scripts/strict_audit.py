#!/usr/bin/env python
"""Strict cross-engine audit: every registered query vs its DuckDB
oracle at REPR level — column dtypes must agree in kind and every cell
must repr() identically after a canonical sort.

This is deliberately STRICTER than tests/test_oracle_parity.py (which
normalizes values before hashing): it catches the class of seams a
value-normalizing comparator cannot see — the r7 example was an oracle
emitting n as HUGEINT (pandas float64) against the engine's int64:
equal as numbers, different as hashed reprs, driver-red for a round.

Run before every driver-window rotation:

    python scripts/strict_audit.py [sf_dir]

Exit code 0 = all clean; 1 = issues printed.
"""

from __future__ import annotations

import importlib
import sys
import time

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    sys.path.insert(0, ".")
    mod = importlib.import_module("__spark_entry__")
    from dataprofiler_spark.session import get_spark
    spark = get_spark(master="local[16]", shuffle_partitions=16,
                      extra_conf={"spark.ui.enabled": "false",
                                  "spark.ui.showConsoleProgress": "false"})
    import duckdb
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM"
                f" '{sf_dir}/{t}.parquet'")
    qs, osql = mod.queries(), mod.oracle_sql()
    bad, n_ok = [], 0
    t0 = time.time()
    for name, fn in qs.items():
        try:
            if name not in osql:
                fn(spark, sf_dir).collect()     # rows-only: must run
                n_ok += 1
                continue
            sdf = fn(spark, sf_dir).toPandas()
            ddf = con.sql(osql[name]).df()
            cols = sorted(sdf.columns)
            a = (sdf.reindex(cols, axis=1).sort_values(by=cols)
                 .reset_index(drop=True))
            b = (ddf.reindex(sorted(ddf.columns), axis=1)
                 .sort_values(by=sorted(ddf.columns))
                 .reset_index(drop=True))
            if list(a.columns) != list(b.columns) or len(a) != len(b):
                bad.append((name, "shape", list(a.columns),
                            list(b.columns), len(a), len(b)))
                continue
            clean = True
            for c in a.columns:
                if a[c].dtype.kind != b[c].dtype.kind:
                    bad.append((name, "dtype", c, str(a[c].dtype),
                                str(b[c].dtype)))
                    clean = False
                    break
                if list(map(repr, a[c])) != list(map(repr, b[c])):
                    bad.append((name, "value", c))
                    clean = False
                    break
            n_ok += clean
        except Exception as e:                  # noqa: BLE001
            bad.append((name, "ERR", str(e)[:160]))
    spark.stop()
    print(f"strict audit: {n_ok} clean / {len(qs)} queries"
          f" in {time.time() - t0:.0f}s; issues: {len(bad)}")
    for row in bad:
        print(*row)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
