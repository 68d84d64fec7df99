"""Streaming per-domain curation rollup — the continuous twin of
operators/domains.domain_rollup: fold each micro-batch's per-domain
quality/token stats into bounded driver state, so a live web-ingest
pipeline can watch domain health (and re-weight or block a domain)
without re-scanning history.

Semantics vs the batch operator: n_docs / total_tokens / n_low_quality
and the DECIMAL-summed avg_quality fold EXACTLY (the state is the same
mergeable algebra — pinned by the parity test against a one-shot batch
rollup over the concatenated batches). The corpus-wide exact-dup signal
is deliberately batch-only: it needs an md5 store that grows with the
stream (use StreamingNearDup / the winnow store for streaming dup
detection); this monitor's state is O(domains × 4 counters), period.

State is capped loudly (``max_domains``): a crawl frontier can mint
unbounded registrable domains, and a silent dict blowup is the exact
failure mode the engine's cap discipline exists to prevent. Overflow
domains fold into the '(other)' bucket — totals stay exact, only the
per-domain breakdown truncates (deterministically: first-seen wins the
named slots).
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class StreamingDomainRollup:
    """foreachBatch hook: per-registrable-domain corpus health,
    folded incrementally."""

    def __init__(self, url_col: str = "url", text_col: str = "text",
                 low_quality_threshold: float = 0.5,
                 max_domains: int = 100_000):
        self.url_col, self.text_col = url_col, text_col
        self.low_quality_threshold = low_quality_threshold
        self.max_domains = max_domains
        # domain -> [n_docs, total_tokens, sum_score(Decimal), n_low]
        self.state: dict[str, list] = {}
        self.batches_seen = 0

    def update(self, batch_df: DataFrame, batch_id: int | None = None
               ) -> None:
        from dataprofiler_spark.operators.domains import \
            registrable_domain_expr
        from dataprofiler_spark.operators.textanalysis import \
            _quality_raw_exprs

        e = _quality_raw_exprs(self.text_col)
        rows = (batch_df.select(
            F.coalesce(registrable_domain_expr(self.url_col),
                       F.lit("(invalid)")).alias("domain"),
            e["n_tokens"].alias("__nt"),
            e["score"].alias("__score"))
            .groupBy("domain")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("__nt").alias("nt"),
                 F.sum(F.col("__score").cast("decimal(28,12)")).alias("sc"),
                 F.sum(F.when(F.col("__score")
                              < self.low_quality_threshold, 1)
                       .otherwise(0)).alias("lo"))
            .collect())
        for r in sorted(rows, key=lambda r: r["domain"]):
            key = r["domain"]
            if key not in self.state and len(self.state) >= self.max_domains:
                key = "(other)"
            s = self.state.setdefault(key, [0, 0, Decimal(0), 0])
            s[0] += r["n"]
            s[1] += r["nt"] or 0
            s[2] += r["sc"] or Decimal(0)
            s[3] += r["lo"]
        self.batches_seen += 1

    def snapshot(self, round_digits: int = 6) -> list[dict]:
        """Sorted per-domain rows matching the batch rollup's columns
        (minus the batch-only dup stats)."""
        out = []
        for dom in sorted(self.state):
            n, nt, sc, lo = self.state[dom]
            out.append({
                "domain": dom, "n_docs": n, "total_tokens": nt,
                "avg_quality": round(float(sc) / n, round_digits),
                "n_low_quality": lo,
            })
        return out

    def attach(self, stream_df: DataFrame):
        return stream_df.writeStream.foreachBatch(self.update)
