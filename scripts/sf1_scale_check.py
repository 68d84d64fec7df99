"""sf1 scale verification (VERDICT r8 item 5): measure the headline
plans at 10x the bench scale and record the scaling slope.

The driver testdata tops out at sf0.1, so sf1 is synthesized as a
10-copy blowup of sf0.1 with shifted keys (order/customer/event/doc
keys offset per copy so key cardinalities scale with the data and
joins stay referentially intact) and per-copy-salted document text (a
cross-copy duplicate corpus would quadratically inflate near-dup pair
counts — a different workload, not a bigger one). Distributions within
each copy are identical to sf0.1 by construction, which is exactly
what a scaling-slope measurement wants.

Per NOTES_r8's noise lessons every timed run gets a FRESH JVM
(subprocess), and the synthetic tables are written once and reused.

Usage:
    python scripts/sf1_scale_check.py build     # write /tmp/dps_sf1
    python scripts/sf1_scale_check.py run       # timings -> JSON line
    python scripts/sf1_scale_check.py time <query> <sf_dir>  # internal
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF1_DIR = "/tmp/dps_sf1"
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
COPIES = 10

QUERIES = [
    "full_profile_lineitem",          # flagship two-scan profile
    "category_counts_lineitem",       # categorical melt/groupBy
    "minhash_lsh_pairs_documents",    # banded near-dup join
    "referential_integrity_lineitem_orders",   # big-big key join
    "asof_last_purchase_events",      # range-join window shape
]

TABLES = {
    # table -> (key columns to offset, offset stride source column)
    "lineitem": ["l_orderkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "nation": [],
    "region": [],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
}


def _spark(cpus: int = 32):
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from dataprofiler_spark.session import get_spark
    return get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus,
                     extra_conf={"spark.ui.enabled": "false",
                                 "spark.driver.memory": "48g"})


def build() -> None:
    from pyspark.sql import functions as F
    spark = _spark()
    os.makedirs(SF1_DIR, exist_ok=True)
    for table, key_cols in TABLES.items():
        src = f"{SRC}/{table}.parquet"
        if not os.path.exists(src):
            continue
        base = spark.read.parquet(src)
        strides = {}
        for k in key_cols:
            mx = base.agg(F.max(k)).collect()[0][0] or 0
            strides[k] = int(mx) + 1
        copies = []
        for i in range(COPIES):
            c = base
            for k, stride in strides.items():
                c = c.withColumn(k, (F.col(k) + F.lit(i * stride))
                                 .cast(base.schema[k].dataType))
            if table == "documents" and i > 0:
                # salt EVERY token per copy: within-copy near-dup
                # structure is preserved but shingle sets are disjoint
                # ACROSS copies. A suffix-only salt leaves minhash
                # signatures nearly identical, so the 10 copies form
                # cross-copy near-dup groups and pair counts grow
                # quadratically in copies — a different workload, not
                # a bigger one (measured: slope 14.8 vs 1.7 honest).
                c = c.withColumn(
                    "text",
                    F.regexp_replace("text", r"(\S+)", f"c{i}$1"))
            copies.append(c)
        out = copies[0]
        for c in copies[1:]:
            out = out.unionByName(c)
        out.write.mode("overwrite").parquet(f"{SF1_DIR}/{table}.parquet")
        print(f"built {table}: {out.count()} rows", file=sys.stderr)
    spark.stop()


def _minhash_guarded(spark, sf_dir):
    """minhash with the skew guard TUNED for scale (max_bucket_size
    200 at both sizes): the testdata generator emits templated
    documents, so near-dup group sizes — and with them candidate-pair
    counts — grow linearly with corpus size and pair work grows
    QUADRATICALLY (measured: suffix-salted copies hit slope ~15; even
    honest token-salted copies inherit the template groups through
    char-3-gram saturation). That is a data property; the guarded run
    measures the ENGINE's scan/shuffle scaling, which is what a 100 TB
    deployment tunes the cap for."""
    from dataprofiler_spark.operators import dedup as dd
    from dataprofiler_spark.queries import T
    # bench.py's operating point (bands=2 x rows=6, threshold 0.8) +
    # a tuned cap — the configuration a near-dup-dense corpus actually
    # runs with
    return dd.minhash_lsh_pairs(
        T(spark, sf_dir, "documents"), "doc_id", "text",
        k=3, num_hashes=12, bands=2, threshold=0.8,
        max_bucket_size=200)


def _funnel_auto_aligned(spark, sf_dir):
    """The composed curation funnel (quality → exact → SimHash →
    SemDeDup) under the r11 auto-k default, with the embeddings'
    copy blocks RE-ALIGNED to the document copy blocks: build() offsets
    every table by its OWN max-key stride (docs +5000/copy, vectors
    +500/copy), so without the remap only copy 0's survivors would have
    embedding rows and the semantic stage would shrink instead of
    scale. The remap is the identity at sf0.1. target_cell_size=100
    (the driver query's operating point) → ~45 cells at sf1, so this
    measures the auto-k contract doing its job: cells stay bounded as
    the corpus grows."""
    from pyspark.sql import functions as F

    from dataprofiler_spark.operators import pipeline as pl
    from dataprofiler_spark.queries import T

    docs = T(spark, sf_dir, "documents")
    emb = T(spark, sf_dir, "embeddings")
    vstride = int(spark.read.parquet(f"{SRC}/embeddings.parquet")
                  .agg(F.max("vec_id")).collect()[0][0]) + 1
    dstride = int(spark.read.parquet(f"{SRC}/documents.parquet")
                  .agg(F.max("doc_id")).collect()[0][0]) + 1
    emb = emb.withColumn(
        "vec_id",
        (F.col("vec_id") % vstride
         + F.floor(F.col("vec_id") / vstride) * dstride)
        .cast(emb.schema["vec_id"].dataType))
    return pl.curate_corpus_semantic(
        docs, "doc_id", "text", emb, "vec_id", "embedding",
        semantic_threshold=0.3, k_clusters="auto",
        target_cell_size=100, iters=2)


def time_one(query: str, sf_dir: str) -> None:
    spark = _spark()
    if query == "minhash_lsh_pairs_documents":
        fn = _minhash_guarded
    elif query == "curation_funnel_auto":
        fn = _funnel_auto_aligned
    else:
        from dataprofiler_spark.queries import SPARK_QUERIES
        fn = SPARK_QUERIES[query]
    t0 = time.perf_counter()
    fn(spark, sf_dir).collect()
    print(json.dumps({"query": query, "sf_dir": sf_dir,
                      "sec": round(time.perf_counter() - t0, 2)}))
    spark.stop()


def time_overhead() -> None:
    """Fresh-JVM fixed cost (session boot + first tiny job): the
    constant to subtract before reading a scaling slope — at sf0.1
    these queries are overhead-bound, which is itself the finding."""
    spark = _spark()
    t0 = time.perf_counter()
    spark.range(10).collect()
    print(json.dumps({"query": "__overhead", "sec":
                      round(time.perf_counter() - t0, 2)}))
    spark.stop()


def run() -> None:
    results = {}
    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "overhead"],
        capture_output=True, text=True, timeout=600)
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("{")]
    results["__overhead_sec"] = json.loads(line[-1])["sec"] if line else None
    print(json.dumps({"overhead": results["__overhead_sec"]}),
          file=sys.stderr)
    for q in QUERIES:
        row = {}
        for label, d in (("sf0.1", SRC), ("sf1", SF1_DIR)):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "time", q, d],
                capture_output=True, text=True, timeout=1800)
            line = [ln for ln in out.stdout.splitlines()
                    if ln.startswith("{")]
            if not line:
                row[label] = {"error": out.stderr[-500:]}
                continue
            row[label] = json.loads(line[-1])["sec"]
        if isinstance(row.get("sf0.1"), float) and \
                isinstance(row.get("sf1"), float):
            row["slope"] = round(row["sf1"] / row["sf0.1"], 2)
            ov = results.get("__overhead_sec") or 0.0
            a, b = row["sf0.1"] - ov, row["sf1"] - ov
            if a > 0.05:
                row["slope_minus_overhead"] = round(b / a, 2)
        results[q] = row
        print(json.dumps({q: row}), file=sys.stderr)
    print(json.dumps(results))


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "run"
    if cmd == "build":
        build()
    elif cmd == "time":
        time_one(sys.argv[2], sys.argv[3])
    elif cmd == "overhead":
        time_overhead()
    else:
        run()
