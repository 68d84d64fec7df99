#!/usr/bin/env python
"""skew_join vs plain-AQE crossover measurement at cluster-ish scale
(VERDICT r7 item 8): synthetic skewed joins at increasing left-side
sizes inside the 128 GiB sandbox, 10% of left mass on ONE key.

Shape: left = N rows, key space 100k, key 0 carries 10% of rows;
right = 100k-row dimension (one row per key, 32-byte payload) — the
dimension-skew regime skew_join targets. Both joins count the joined
payload so the measurement includes the full exchange.

Run:  python scripts/skew_crossover.py [N1 N2 ...]   (defaults below)
Appends one line per (size, strategy, seconds) to stdout.
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import functions as F


def make_frames(spark, n_rows: int, n_keys: int = 100_000,
                hot_frac: float = 0.10):
    hot_rows = int(n_rows * hot_frac)
    cold = (spark.range(n_rows - hot_rows)
            .select((F.col("id") % (n_keys - 1) + 1).alias("k"),
                    F.col("id").alias("payload")))
    hot = (spark.range(hot_rows)
           .select(F.lit(0).cast("long").alias("k"),
                   F.col("id").alias("payload")))
    left = cold.unionAll(hot)
    # ~1 KB INCOMPRESSIBLE payload per dim row -> right ≈ 100 MB even
    # after shuffle compression: genuinely above the (adaptive)
    # auto-broadcast threshold, so the plain join REALLY shuffles and
    # the skew lands on a reducer. No threshold overrides: a dimension
    # small enough to broadcast has no skew problem at all, and
    # measuring that regime would be dishonest. (A repeat()-built
    # payload compresses ~30x and lets AQE nondeterministically flip
    # the plan to broadcast — the first version of this script did
    # exactly that.)
    chunks = [F.md5((F.col("id") * 37 + i).cast("string"))
              for i in range(32)]
    right = (spark.range(n_keys)
             .select(F.col("id").alias("k"),
                     F.concat(*chunks).alias("dim")))
    return left, right


def run_once(spark, left, right, strategy: str, hot_threshold: int) -> float:
    from dataprofiler_spark.operators.skew import skew_join
    t0 = time.time()
    if strategy == "skew_join":
        j = skew_join(left, right, "k", hot_threshold=hot_threshold)
    else:
        j = left.join(right, "k")
    # length sum forces the dim payload through the join
    j.agg(F.sum(F.length("dim"))).collect()
    return time.time() - t0


def main() -> None:
    sys.path.insert(0, ".")
    from dataprofiler_spark.session import get_spark
    sizes = [int(s) for s in sys.argv[1:]] or [
        2_000_000, 10_000_000, 50_000_000, 150_000_000]
    spark = get_spark(master="local[32]", shuffle_partitions=64,
                      extra_conf={
                          "spark.ui.enabled": "false",
                          "spark.sql.adaptive.enabled": "true",
                          "spark.driver.memory": "96g",
                      })
    print("size,strategy,cold_s,warm_s", flush=True)
    for n in sizes:
        left, right = make_frames(spark, n)
        hot_threshold = max(n // 50, 1000)  # ~5x mean key mass
        for strat in ("plain_aqe", "skew_join"):
            cold = run_once(spark, left, right, strat, hot_threshold)
            warm = min(run_once(spark, left, right, strat, hot_threshold)
                       for _ in range(2))
            print(f"{n},{strat},{cold:.2f},{warm:.2f}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
