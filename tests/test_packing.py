"""Sharded packing manifest (operators/chunking.pack_manifest):
interval-partition invariants per shard plus the zero-token pin.
Cross-engine hash parity is covered by test_oracle_parity."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from dataprofiler_spark.operators import chunking as ck


def test_pack_manifest_shards_partition_token_stream(spark, sf_dir):
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    ctx = 256
    out = ck.pack_manifest(docs, "doc_id", "text", context_len=ctx,
                           n_shards=4).collect()
    assert len(out) == docs.count()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r["shard"], []).append(r)
    assert set(by_shard) <= set(range(4))
    for shard, rows in by_shard.items():
        # replay the shard's greedy stream: windows must reproduce
        # exactly from the cumulative token count in (h, id) order —
        # order rows by (start_window, end_window, id) which matches
        # because the stream is monotone
        total = sum(r["tokens"] for r in rows)
        # invariant checks that don't depend on intra-shard order:
        for r in rows:
            assert 0 <= r["start_window"] <= r["end_window"]
            if r["tokens"] == 0:
                assert r["start_window"] == r["end_window"]
            else:
                # a doc spans exactly ceil over its occupied token range
                span = r["end_window"] - r["start_window"] + 1
                assert span >= (r["tokens"] + ctx - 1) // ctx - 1
        assert max(r["end_window"] for r in rows) == (
            max(0, (total - 1)) // ctx if total else 0)


def test_pack_manifest_zero_and_null_text(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, None), (3, ""), (4, "d " * 300)],
        "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           ck.pack_manifest(df, "doc_id", "text", context_len=100,
                            n_shards=1).collect()}
    assert out[2]["tokens"] == 0 and out[3]["tokens"] == 0
    assert out[2]["start_window"] == out[2]["end_window"]
    assert out[4]["tokens"] == 300
    assert out[4]["end_window"] >= out[4]["start_window"] + 2


def test_pack_manifest_window_is_per_shard(spark, sf_dir):
    """The cumulative sum partitions by shard — no single-partition
    global window in the plan."""
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    out = ck.pack_manifest(docs, "doc_id", "text", n_shards=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan, plan
