"""Streaming event-type transition monitor — the continuous twin of
operators/events.markov_transitions: fold each micro-batch's
(from_type, to_type) transition counts into bounded driver state, so a
live event pipeline can watch behavioral drift (a bot loop or a broken
client shows up as a transition-probability shift) without re-scanning
history.

Cross-batch seams: transitions WITHIN a batch come from the same
user-partitioned lag window the batch operator uses; the seam pair
between a user's LAST event of one batch and FIRST event of the next is
stitched from O(users) carried state (per-user last (ts, type)),
capped loudly at ``max_users`` — beyond the cap, new users' seam pairs
are skipped (within-batch pairs still count; ``seam_skipped`` counts
every refused tracking/stitch EVENT — one per untracked user per batch
it appears in, so it grows while the loss persists). With ordered per-user arrival (the contract of an
event-time-partitioned stream), fold == batch — pinned by the parity
test. State: O(types² + min(users, max_users)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class StreamingMarkov:
    """foreachBatch hook: first-order transition counts, folded."""

    def __init__(self, user_col: str = "user_id",
                 type_col: str = "event_type", ts_col: str = "ts",
                 max_users: int = 1_000_000):
        self.user_col, self.type_col, self.ts_col = (
            user_col, type_col, ts_col)
        self.max_users = max_users
        self.trans: dict[tuple[str, str], int] = {}
        # user -> (last_ts, last_type); the stitch compares the
        # incoming batch's first (ts, type) against this tuple (same
        # ordering the batch operator's lag window uses), so an
        # out-of-order batch is DETECTED (counted in seam_out_of_order
        # and not stitched) instead of silently fabricating a wrong
        # seam transition.
        self.last: dict = {}
        self.seam_skipped = 0
        self.seam_out_of_order = 0
        self.batches_seen = 0

    def update(self, batch_df: DataFrame, batch_id: int | None = None
               ) -> None:
        from pyspark.sql.window import Window

        base = (batch_df.where(F.col(self.user_col).isNotNull()
                               & F.col(self.type_col).isNotNull()
                               & F.col(self.ts_col).isNotNull()))
        w = Window.partitionBy(self.user_col).orderBy(
            self.ts_col, self.type_col)
        pairs = (base.select(
            F.lag(F.col(self.type_col)).over(w).alias("a"),
            F.col(self.type_col).alias("b"))
            .where(F.col("a").isNotNull())
            .groupBy("a", "b").agg(F.count(F.lit(1)).alias("n")))
        for r in pairs.collect():
            k = (r["a"], r["b"])
            self.trans[k] = self.trans.get(k, 0) + int(r["n"])
        # per-user first/last of this batch (tiny: O(batch users) rows)
        fl = (base.groupBy(F.col(self.user_col).alias("u"))
              .agg(F.min(F.struct(self.ts_col, self.type_col))
                   .alias("first"),
                   F.max(F.struct(self.ts_col, self.type_col))
                   .alias("last"))).collect()
        for r in fl:
            u = r["u"]
            first = (r["first"][self.ts_col], r["first"][self.type_col])
            last = (r["last"][self.ts_col], r["last"][self.type_col])
            prev = self.last.get(u)
            if prev is not None:
                if first < prev:
                    # Incoming batch's first event PRECEDES the stored
                    # last event — an out-of-order micro-batch. The
                    # seam pair (prev_type -> first_type) would be a
                    # fabricated transition; count the violation and
                    # keep the later of the two states.
                    self.seam_out_of_order += 1
                    if last > prev:
                        self.last[u] = last
                    continue
                k = (prev[1], first[1])
                self.trans[k] = self.trans.get(k, 0) + 1
            elif len(self.last) >= self.max_users:
                self.seam_skipped += 1
                continue
            self.last[u] = last
        self.batches_seen += 1

    def snapshot(self, round_digits: int = 6) -> list[dict]:
        """Rows mirroring the batch operator's schema
        (from_type, to_type, n_trans, prob)."""
        outdeg: dict[str, int] = {}
        for (a, _), n in self.trans.items():
            outdeg[a] = outdeg.get(a, 0) + n
        return [
            {"from_type": a, "to_type": b, "n_trans": n,
             "prob": round(n / outdeg[a], round_digits)}
            for (a, b), n in sorted(self.trans.items())
        ]
