"""Registrable-domain extraction + per-domain rollup
(operators/domains.py). Oracle parity for the registered query is
covered by test_oracle_parity[domain_rollup_documents]."""

from __future__ import annotations

from dataprofiler_spark.operators import domains as dm


def test_registrable_domain_heuristic(spark):
    """Every branch: www/sub stripping, two-level suffix (co.uk/com.au),
    bare two-label host, IPv4 passthrough, single label, port/userinfo/
    scheme-less handling, NULL/garbage."""
    rows = [
        (1, "https://www.news.example.co.uk:8080/p?q=1", "example.co.uk"),
        (2, "http://user:pw@cdn.alpha.com/x", "alpha.com"),
        (3, "gamma.io/path", "gamma.io"),
        (4, "https://192.168.0.1:443/x", "192.168.0.1"),
        (5, "https://localhost/x", "localhost"),
        (6, None, None),
        (7, "   https://SUB.Delta.ORG/abc   ", "delta.org"),
        (8, "ftp://files.beta.com.au/z", "beta.com.au"),
        (9, "!!!", "!!!"),
    ]
    df = spark.createDataFrame([(i, u) for i, u, _ in rows],
                               "id long, url string")
    got = {r["id"]: r["domain"]
           for r in dm.domain_extract(df, "id", "url").collect()}
    for i, _, want in rows:
        assert got[i] == want, (i, got[i], want)


def test_domain_rollup_dup_is_corpus_wide(spark):
    """n_dup_docs counts docs whose exact text repeats ANYWHERE in the
    corpus — one copy per domain still counts on both domains."""
    rows = [
        (1, "https://a.com/1", "same text body here"),
        (2, "https://b.com/1", "same text body here"),
        (3, "https://a.com/2", "unique alpha doc"),
        (4, None, "unique invalid-url doc"),
    ]
    df = spark.createDataFrame(rows, "id long, url string, text string")
    out = {r["domain"]: r for r in
           dm.domain_rollup(df, "url", "text").collect()}
    assert set(out) == {"a.com", "b.com", "(invalid)"}
    assert out["a.com"]["n_docs"] == 2 and out["a.com"]["n_dup_docs"] == 1
    assert out["b.com"]["n_dup_docs"] == 1 and out["b.com"]["dup_ratio"] == 1.0
    assert out["(invalid)"]["n_dup_docs"] == 0


def test_streaming_domain_rollup_matches_batch(spark):
    """Folding per-batch state across micro-batches reproduces the
    one-shot batch rollup over the concatenated data exactly (the
    mergeable-algebra contract), minus the batch-only dup columns."""
    from dataprofiler_spark.streaming.domains import StreamingDomainRollup

    b1 = [(1, "https://a.com/1", "some reasonably long text with the and of"),
          (2, "https://b.co.uk/1", "short"),
          (3, None, "invalid url doc")]
    b2 = [(4, "https://www.a.com/2", "another document for the a domain"),
          (5, "https://b.co.uk/2", "more b text with the stopwords of and")]
    schema = "id long, url string, text string"
    mon = StreamingDomainRollup()
    mon.update(spark.createDataFrame(b1, schema), 0)
    mon.update(spark.createDataFrame(b2, schema), 1)
    assert mon.batches_seen == 2
    snap = {r["domain"]: r for r in mon.snapshot()}

    from dataprofiler_spark.operators.domains import domain_rollup
    batch = {r["domain"]: r for r in domain_rollup(
        spark.createDataFrame(b1 + b2, schema), "url", "text").collect()}
    assert set(snap) == set(batch) == {"a.com", "b.co.uk", "(invalid)"}
    for d in snap:
        for k in ("n_docs", "total_tokens", "avg_quality", "n_low_quality"):
            assert snap[d][k] == batch[d][k], (d, k, snap[d], batch[d])


def test_streaming_domain_rollup_cap_overflow(spark):
    """Past max_domains, new domains fold into '(other)' — totals exact,
    state bounded."""
    from dataprofiler_spark.streaming.domains import StreamingDomainRollup

    rows = [(i, f"https://site{i}.com/x", f"doc {i} text") for i in range(6)]
    mon = StreamingDomainRollup(max_domains=3)
    mon.update(spark.createDataFrame(rows, "id long, url string, text string"))
    snap = {r["domain"]: r for r in mon.snapshot()}
    assert len(snap) == 4 and "(other)" in snap
    assert sum(r["n_docs"] for r in snap.values()) == 6
    assert snap["(other)"]["n_docs"] == 3
