"""Synthetic high-k check (VERDICT r11 item 3): force the resolved
SemDeDup k to >= 10^4 on the sf1 blowup and measure the two-level
quantizer against the flat fit, plus the two-level data slope
(sf0.1 -> sf1 at fixed target_cell_size).

The embeddings tables are small (2k vectors at sf0.1, 20k at sf1), so
high k is forced via target_cell_size=2 — degenerate cells, but the
codebook mechanics (driver fold size, assign cost in k) are exactly
what the flat-vs-two-level comparison isolates. Fresh JVM per timing
(NOTES_r8 noise protocol).

Usage: python scripts/high_k_check.py            # all timings
       python scripts/high_k_check.py time <mode> <sf_dir> <target>
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _time_one(mode: str, sf_dir: str, target: int) -> None:
    sys.path.insert(0, REPO)
    from dataprofiler_spark.session import get_spark

    spark = get_spark(master="local[32]", shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "false"})
    from dataprofiler_spark.operators import clustering as cl

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    emb.count()  # warm file listing
    t0 = time.perf_counter()
    out = cl.semantic_dedup(emb, "vec_id", "embedding", threshold=0.9,
                            target_cell_size=target, iters=2,
                            two_level=(mode == "two"))
    n_keep = out.where("keep").count()
    dt = time.perf_counter() - t0
    print(json.dumps({"mode": mode, "sf_dir": sf_dir, "target": target,
                      "n_keep": n_keep, "sec": round(dt, 2)}))
    spark.stop()


def main() -> None:
    if len(sys.argv) > 1 and sys.argv[1] == "time":
        _time_one(sys.argv[2], sys.argv[3], int(sys.argv[4]))
        return
    runs = [
        ("two", "/root/testdata/sf0.1", 2),   # k = 1e3
        ("two", "/tmp/dps_sf1", 2),           # k = 1e4  (slope vs above)
        ("flat", "/tmp/dps_sf1", 2),          # k = 1e4  (A/B)
    ]
    for mode, d, t in runs:
        r = subprocess.run([sys.executable, os.path.abspath(__file__),
                            "time", mode, d, str(t)],
                           capture_output=True, text=True, timeout=3600)
        for line in reversed(r.stdout.strip().splitlines()):
            try:
                print(json.dumps(json.loads(line)))
                break
            except json.JSONDecodeError:
                continue
        else:
            print(json.dumps({"mode": mode, "sf_dir": d,
                              "error": r.stderr[-500:]}))


if __name__ == "__main__":
    main()
