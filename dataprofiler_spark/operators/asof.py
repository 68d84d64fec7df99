"""As-of join — attach the most recent right-side row at or before each
left timestamp, per key.

Spark has no native as-of join (pandas merge_asof / DuckDB ASOF JOIN /
kdb aj are the usual references). The scalable formulation is the
union-sort trick, NOT a range join:

  1. union left and right rows tagged by side, projecting a common
     (key, ts, payload) shape;
  2. one window sort per key: last_value(right_payload, ignorenulls)
     over (partition by key, order by ts, side) carries the latest right
     value forward;
  3. keep left rows.

Cost: ONE shuffle on the key + a per-key sort — the same plan shape as
any windowed aggregation, linear in |L| + |R|. A naive join on
``l.ts >= r.ts`` is a range join that explodes quadratically; this never
does. Ties (left.ts == right.ts) take the right row (side ordering puts
right first), matching DuckDB ASOF JOIN's >= semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(left: DataFrame, right: DataFrame, key: str,
              left_ts: str, right_ts: str,
              right_value: str, out_col: str = "asof_value") -> DataFrame:
    """Left rows + ``out_col`` = right_value of the latest right row with
    right_ts <= left_ts and matching key (NULL when none)."""
    l_tag = left.select(
        F.col(key).alias("k"), F.col(left_ts).alias("t"),
        F.lit(1).alias("side"),
        F.lit(None).cast(right.schema[right_value].dataType).alias("rv"),
        F.struct(*[F.col(c) for c in left.columns]).alias("row"),
    )
    # NULL keys have no identity: a NULL-key left row must NOT match
    # NULL-key right rows (window partitioning groups NULLs together
    # where the SQL equality join never does — found by the adversarial
    # parity suite). Excluding NULL-key right rows leaves the NULL-key
    # partition with only rv=NULL rows → asof_value NULL, matching SQL.
    r_tag = right.where(F.col(key).isNotNull()).select(
        F.col(key).alias("k"), F.col(right_ts).alias("t"),
        F.lit(0).alias("side"),
        F.col(right_value).alias("rv"),
        F.lit(None).cast(l_tag.schema["row"].dataType).alias("row"),
    )
    unioned = l_tag.unionByName(r_tag)
    w = (Window.partitionBy("k").orderBy(F.col("t").asc(), F.col("side").asc())
         .rowsBetween(Window.unboundedPreceding, 0))
    carried = unioned.withColumn(
        "asof", F.last("rv", ignorenulls=True).over(w))
    return (carried.where(F.col("side") == 1)
            .select("row.*", F.col("asof").alias(out_col)))


def last_purchase_gap(events: DataFrame) -> DataFrame:
    """(event_id, last_purchase_us): for every event, epoch-us of the
    user's most recent 'purchase' event at or before it — the classic
    feature-engineering as-of."""
    ev = events.select(
        F.col("event_id"), F.col("user_id"),
        F.unix_micros(F.col("ts")).alias("us"))
    purchases = (events.where(F.col("event_type") == "purchase")
                 .select(F.col("user_id"),
                         F.unix_micros(F.col("ts")).alias("pus")))
    joined = asof_join(ev, purchases, key="user_id",
                       left_ts="us", right_ts="pus",
                       right_value="pus", out_col="last_purchase_us")
    return joined.select("event_id", "last_purchase_us")


def oracle_last_purchase_gap_sql(table: str) -> str:
    """DuckDB native ASOF JOIN as the oracle for the union-sort
    implementation."""
    return f"""
WITH ev AS (
  SELECT event_id, user_id, epoch_us(ts) AS us FROM {table}
), purchases AS (
  SELECT user_id, epoch_us(ts) AS pus FROM {table}
  WHERE event_type = 'purchase'
)
SELECT ev.event_id, p.pus AS last_purchase_us
FROM ev ASOF LEFT JOIN purchases p
  ON ev.user_id = p.user_id AND ev.us >= p.pus
"""
