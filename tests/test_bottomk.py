"""Bottom-k (KMV) verify sketch for MinHash LSH (VERDICT r3 item 6):
the per-doc verify set is capped at the k smallest distinct hashes, the
jaccard becomes the standard bottom-k estimator, and the shuffle row is
bounded for arbitrarily wide documents."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators import dedup as dd


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_sketch_bounded_for_wide_docs(spark):
    """A multi-thousand-shingle doc must carry at most verify_k hashes
    into the verify joins."""
    big = " ".join(f"tok{i}" for i in range(3000))
    df = _docs(spark, [(1, big), (2, big + " extra words here")])
    wide = dd._minhash_wide(df, "doc_id", "text", k=3, num_hashes=12,
                            verify_k=64)
    sizes = wide.select(F.size("hs").alias("n")).collect()
    assert all(r["n"] <= 64 for r in sizes)
    # and the uncapped set really would have been huge
    full = dd._minhash_wide(df, "doc_id", "text", k=3, num_hashes=12)
    assert all(r["n"] > 1000
               for r in full.select(F.size("hs").alias("n")).collect())


def test_signature_mins_unchanged_by_cap(spark):
    """The minhash signature aggregates ALL hashes — capping the verify
    set must not change any mh column (the permuted min need not lie in
    the bottom-k of h60)."""
    df = _docs(spark, [(i, f"doc number {i} " + " ".join(
        f"w{j}" for j in range(i * 7 % 50 + 5))) for i in range(20)])
    a = dd._minhash_wide(df, "doc_id", "text", 3, 12).drop("hs")
    b = dd._minhash_wide(df, "doc_id", "text", 3, 12, verify_k=8).drop("hs")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_estimator_exact_for_small_docs(spark):
    """Docs with <= verify_k distinct shingles keep EXACT jaccard (the
    sketch is the full set)."""
    rows = [(1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy cat"),
            (3, "completely different text with other words entirely")]
    df = _docs(spark, rows)
    exact = {(r["id1"], r["id2"]): r["jaccard"]
             for r in dd.minhash_lsh_pairs(df, "doc_id", "text",
                                           threshold=0.0).collect()}
    est = {(r["id1"], r["id2"]): r["jaccard"]
           for r in dd.minhash_lsh_pairs(df, "doc_id", "text",
                                         threshold=0.0,
                                         verify_k=512).collect()}
    assert est == exact and exact, exact


def test_estimator_error_bound(spark):
    """Property: on wide overlapping docs the bottom-k estimate lands
    within a few stderr of the exact jaccard (stderr ~ sqrt(J(1-J)/k) ~
    0.044 for J=0.5, k=128 — assert a generous 4-sigma bound)."""
    base = [f"tok{i}" for i in range(800)]
    # ~50% token overlap => jaccard ~ 1/3 over 3-shingles; exact value
    # computed below from the uncapped run.
    d1 = " ".join(base)
    d2 = " ".join(base[:400] + [f"alt{i}" for i in range(400)])
    df = _docs(spark, [(1, d1), (2, d2)])
    kw = dict(k=3, num_hashes=12, bands=6, threshold=0.0)
    exact = dd.minhash_lsh_pairs(df, "doc_id", "text", **kw).collect()
    est = dd.minhash_lsh_pairs(df, "doc_id", "text", verify_k=128,
                               **kw).collect()
    assert len(exact) == 1 and len(est) == 1
    j, jh = exact[0]["jaccard"], est[0]["jaccard"]
    import math
    stderr = math.sqrt(j * (1 - j) / 128)
    assert abs(jh - j) <= 4 * stderr, (j, jh, stderr)


def test_banded_embedding_pair_join_keys_on_band_bucket(spark, sf_dir):
    """The banded embedding near-dup pair join must key on
    (band, bucket) — a join keyed on bucket alone (or worse, a nested
    loop) collapses the banding back into 2^planes buckets."""
    import os

    from dataprofiler_spark.operators import similarity as sim

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    pairs = sim.embedding_neardup_pairs(emb, "vec_id", "embedding",
                                        threshold=0.5, bands=4,
                                        planes_per_band=4,
                                        max_bucket_size=100)
    plan = pairs._jdf.queryExecution().optimizedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    # the self-join condition references both band and bucket columns
    import re
    join_lines = [ln for ln in plan.splitlines() if "Join" in ln]
    assert any(re.search(r"band#\d+L? = band#\d+L?", ln)
               and re.search(r"bucket#\d+L? = bucket#\d+L?", ln)
               for ln in join_lines), plan


def test_banded_embedding_skew_guard_caps_dense_cluster(spark):
    """One dense cluster (many identical vectors → one bucket in every
    band) must be dropped by max_bucket_size instead of exploding into
    m^2/2 pairs on a single task."""
    from dataprofiler_spark.operators import similarity as sim

    dense = [(i, [1.0] * 8) for i in range(300)]          # one bucket
    sparse = [(1000 + i, [float((i * 7 + j) % 5 - 2) for j in range(8)])
              for i in range(20)]
    df = spark.createDataFrame(dense + sparse,
                               ["vec_id", "embedding"])
    capped = sim.embedding_neardup_pairs(df, "vec_id", "embedding",
                                         threshold=0.99, bands=4,
                                         planes_per_band=4, dim=8,
                                         max_bucket_size=50)
    rows = capped.collect()
    # the 300-member clique (≈45k pairs) is dropped by the cap; only
    # sparse-side coincidences may remain
    assert len(rows) < 1000
    assert not any(r["id1"] < 1000 and r["id2"] < 1000 for r in rows)


def test_bucketed_decontaminate_plan_no_driver_collect(spark, sf_dir):
    """The bucketed decontaminate must ship the benchmark through a
    broadcast JOIN (executor-side exchange, works past 10^4 vectors) —
    never a driver collect into a literal (the brute-force variant's
    one-row crossJoin is the small-bench baseline, not this path)."""
    import os

    from pyspark.sql import functions as F

    from dataprofiler_spark.operators import similarity as sim

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    bench = emb.where(F.col("vec_id") % 37 == 0)
    out = sim.embedding_decontaminate_bucketed(emb, bench, "vec_id",
                                               "embedding", threshold=0.8,
                                               bands=4, planes_per_band=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan, plan
    # the bench side is a real scan feeding the broadcast, not a
    # collected LocalTableScan literal
    assert "LocalTableScan" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_bottomk_oracle_parity(spark, duck, sf_dir):
    """The registered bottom-k query matches its DuckDB oracle (also
    covered by test_oracle_parity; kept here so a sketch-rule change
    fails next to the sketch tests)."""
    from dataprofiler_spark.queries import ORACLE_SQL, SPARK_QUERIES
    from tests.oracle_utils import assert_frames_match

    name = "minhash_lsh_pairs_bottomk"
    sdf = SPARK_QUERIES[name](spark, sf_dir).toPandas()
    ddf = duck.sql(ORACLE_SQL[name]).df()
    assert_frames_match(sdf, ddf, name)
