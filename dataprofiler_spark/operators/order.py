"""Order (sortedness) detection — distributed, no global window.

Reference semantics: dataprofiler/profilers/order_column_profile.py —
single scan classifying a column as ascending / descending / constant
value / random (:372-413), with piecewise merge rules across batches
(_merge_order:133-243, _is_intersecting:62-99, _is_enveloping:101-130).

Spark design: DataFrames are unordered, so "input order" must be pinned
explicitly (SURVEY §7.4 risk 2); the operator takes an ordering key.
Classification needs only adjacent-pair direction counts, which round 1
computed with a **global** lag window — a single-partition sort of the
whole table at scale. This version distributes it:

1. one cheap agg gets min/max of the leading order key;
2. every row gets a **range bucket** = ``width_bucket(key, min, max, B)``
   — monotone in the key, so equal keys always share a bucket and the
   concatenation of sorted buckets is the global order;
3. adjacent pairs *within* a bucket come from a ``lag`` window partitioned
   by bucket (distributed sort, B-way parallel, no single partition);
4. the B-1 *seam* pairs (last row of bucket b, first row of bucket b+1)
   come from a per-bucket ``min_by``/``max_by`` aggregate — B tiny rows —
   lagged over bucket order (a window over B rows, not the data).

Empty buckets simply don't appear in step 4, so the seam lag naturally
bridges them. String leading keys range-bucket too: after stripping the
min/max common prefix, the next 8 bytes of the UTF-8 encoding — zero-
padded to fixed width, read as a big-endian integer — are weakly
monotone in the string's binary-collation sort order, which is all
bucketing needs (within-bucket sorts and seam min_by/max_by use the
real key). Other types (maps, structs with no natural range) raise
rather than silently degrading to a single global partition.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from pyspark.sql.types import (DateType, NumericType, StringType,
                               TimestampType, TimestampNTZType)

DEFAULT_ORDER_BUCKETS = 64


def _string_prefix_value(df: DataFrame, key: str) -> tuple[Column, float,
                                                           float] | None:
    """Monotone numeric projection of a string key, or None when the
    column is constant/empty (single bucket is then *exact*, not a
    degradation). Strips the corpus-wide common prefix (min and max
    share it ⇒ every row shares it) so keys like 'user_000123' still
    spread across buckets; assumes the default UTF8_BINARY collation.
    """
    row = df.agg(F.min(key).alias("lo"), F.max(key).alias("hi")).first()
    lo_s, hi_s = row["lo"], row["hi"]
    if lo_s is None or hi_s is None or lo_s == hi_s:
        return None
    lob, hib = lo_s.encode("utf-8"), hi_s.encode("utf-8")
    plen = 0
    while plen < min(len(lob), len(hib)) and lob[plen] == hib[plen]:
        plen += 1
    # Fixed-width zero-padding before the integer read is what makes the
    # projection monotone: variable-length reads are not ('aa'=0x6161 >
    # 'b'=0x62 numerically but 'aa' < 'b' lexicographically).
    kv = F.conv(
        F.hex(F.expr(
            f"rpad(substring(encode(`{key}`, 'UTF-8'), {plen + 1}, 8), "
            f"8, x'00')")),
        16, 10).cast("double")

    def val(b: bytes) -> float:
        return float(int.from_bytes(b[plen:plen + 8].ljust(8, b"\x00"),
                                    "big"))

    return kv, val(lob), val(hib)


def _bucket_expr(df: DataFrame, key: str, num_buckets: int) -> Column:
    """Monotone range-bucket of the leading order key. Every supported
    key type distributes; a constant/empty key yields one bucket (which
    is exact). Unsupported key types raise — a silent single-bucket
    fallback would be the round-1 global-window anti-pattern."""
    dtype = df.schema[key].dataType
    lo = hi = None
    if isinstance(dtype, NumericType):
        kv = F.col(key).cast("double")
    elif isinstance(dtype, (TimestampType, TimestampNTZType)):
        kv = F.unix_micros(F.col(key)).cast("double")
    elif isinstance(dtype, DateType):
        kv = F.datediff(F.col(key), F.lit("1970-01-01")).cast("double")
    elif isinstance(dtype, StringType):
        proj = _string_prefix_value(df, key)
        if proj is None:
            return F.lit(1)
        kv, lo, hi = proj
    else:
        raise ValueError(
            f"order_profile: no distributed range-bucketing for order key "
            f"{key!r} of type {dtype.simpleString()}; cast it to a "
            f"numeric/timestamp/date/string key first")
    if lo is None:
        row = df.agg(F.min(kv).alias("lo"), F.max(kv).alias("hi")).first()
        lo, hi = row["lo"], row["hi"]
    if lo is None or hi is None or lo == hi or num_buckets <= 1:
        return F.lit(1)
    # nulls sort first in Spark ascending order → bucket 0 keeps them ahead
    return F.coalesce(
        F.width_bucket(kv, F.lit(float(lo)), F.lit(float(hi)),
                       F.lit(num_buckets)),
        F.lit(0),
    )


def ordered_pairs(df: DataFrame, order_by: list[str], value_cols: list[str],
                  num_buckets: int = DEFAULT_ORDER_BUCKETS) -> DataFrame:
    """Adjacent-pair rows in the global order defined by ``order_by``:
    for every value column ``c`` the output has ``c`` and ``c__prev``.

    Rows that begin a bucket carry NULL prevs (their true pair is emitted
    once as a seam row), so consumers must guard pair predicates with
    ``c__prev IS NOT NULL`` — exactly the guard a global-lag formulation
    needs for the first row. Seam rows duplicate first-row values in the
    value columns; min/max/min_by/max_by over the output are unaffected
    (duplicates of existing (value, key) pairs), counts other than pair
    counts would not be (don't compute them here). ``__k`` — the order-by
    struct — is passed through for first/last-observed aggregation
    (``min_by(c, __k)``).
    """
    bucket = _bucket_expr(df, order_by[0], num_buckets)
    okey = F.struct(*[F.col(c) for c in order_by])
    b = df.select(*[F.col(c) for c in set(order_by) | set(value_cols)],
                  bucket.alias("__b"), okey.alias("__k"))

    w_in = Window.partitionBy("__b").orderBy(*[F.col(c) for c in order_by])
    within = b.select(
        F.col("__k"),
        *[F.col(c) for c in value_cols],
        *[F.lag(F.col(c)).over(w_in).alias(f"{c}__prev") for c in value_cols],
    )

    # struct min/max, NOT min_by/max_by: Spark's min_by/max_by IGNORE
    # rows whose VALUE is NULL, so a bucket ending in a NULL value would
    # carry its last non-null value into the seam — a pair the global
    # lag formulation never sees (found by the adversarial parity
    # suite). The struct comparison is decided by __k before the value
    # field, so NULL values ride along faithfully; on __k ties the
    # value breaks the tie deterministically (order keys with
    # duplicates have no canonical adjacent-pair order anyway —
    # documented contract).
    per_bucket = b.groupBy("__b").agg(
        F.min(F.col("__k")).alias("__k"),
        *[F.min(F.struct(F.col("__k").alias("k"), F.col(c).alias("v")))
          ["v"].alias(f"{c}__first") for c in value_cols],
        *[F.max(F.struct(F.col("__k").alias("k"), F.col(c).alias("v")))
          ["v"].alias(f"{c}__last") for c in value_cols],
    )
    # B rows, not data; floor(rand·0) ≡ 0 is a constant partition key that
    # Catalyst can't fold away (see operators/topk.py) — keeps WindowExec
    # from reporting an empty partition spec.
    w_b = Window.partitionBy(F.floor(F.rand(42) * F.lit(0.0))).orderBy("__b")
    seams = per_bucket.select(
        F.col("__k"),
        *[F.col(f"{c}__first").alias(c) for c in value_cols],
        *[F.lag(F.col(f"{c}__last")).over(w_b).alias(f"{c}__prev")
          for c in value_cols],
    ).where(F.lit(True))
    # drop the first bucket's seam row (no predecessor): all prevs NULL there
    first_seam_guard = None
    for c in value_cols:
        g = F.col(f"{c}__prev").isNotNull()
        first_seam_guard = g if first_seam_guard is None else (first_seam_guard | g)
    # a seam row where every prev is NULL is either the first bucket or a
    # bucket following an all-NULL tail; keeping it is harmless (guarded
    # consumers ignore NULL prevs) — we drop only to avoid an extra row.
    seams = seams.where(first_seam_guard if first_seam_guard is not None
                        else F.lit(False))
    return within.unionByName(seams)


def order_profile(df: DataFrame, col: str, order_by: list[str],
                  num_buckets: int = DEFAULT_ORDER_BUCKETS) -> DataFrame:
    """(column, n_pairs, asc_pairs, desc_pairs, eq_pairs, order) where
    order ∈ {ascending, descending, constant value, random} following
    order_column_profile.py:372-413: constant if all equal; ascending if
    no descending violation; descending if no ascending violation.

    n_pairs counts true adjacent pairs (prev NOT NULL), identical to the
    global-lag formulation; plan is distributed (see module docstring).
    """
    pairs = ordered_pairs(df, order_by, [col], num_buckets)
    v, p = F.col(col), F.col(f"{col}__prev")
    agg = pairs.where(p.isNotNull()).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.when(v > p, 1).otherwise(0)).alias("asc_pairs"),
        F.sum(F.when(v < p, 1).otherwise(0)).alias("desc_pairs"),
        F.sum(F.when(v == p, 1).otherwise(0)).alias("eq_pairs"),
    )
    order = (
        F.when((F.col("asc_pairs") == 0) & (F.col("desc_pairs") == 0), "constant value")
        .when(F.col("desc_pairs") == 0, "ascending")
        .when(F.col("asc_pairs") == 0, "descending")
        .otherwise("random")
    )
    return agg.select(F.lit(col).alias("column"), "n_pairs", "asc_pairs",
                      "desc_pairs", "eq_pairs", order.alias("order"))


def oracle_order_profile_sql(table: str, col: str, order_by: list[str]) -> str:
    ob = ", ".join(order_by)
    return f"""
WITH pairs AS (
  SELECT {col} AS v, LAG({col}) OVER (ORDER BY {ob}) AS p FROM {table}
), agg AS (
  SELECT COUNT(*) AS n_pairs,
         SUM(CASE WHEN v > p THEN 1 ELSE 0 END) AS asc_pairs,
         SUM(CASE WHEN v < p THEN 1 ELSE 0 END) AS desc_pairs,
         SUM(CASE WHEN v = p THEN 1 ELSE 0 END) AS eq_pairs
  FROM pairs WHERE p IS NOT NULL
)
SELECT '{col}' AS "column", n_pairs,
       CAST(asc_pairs AS BIGINT) AS asc_pairs,
       CAST(desc_pairs AS BIGINT) AS desc_pairs,
       CAST(eq_pairs AS BIGINT) AS eq_pairs,
       CASE WHEN asc_pairs = 0 AND desc_pairs = 0 THEN 'constant value'
            WHEN desc_pairs = 0 THEN 'ascending'
            WHEN asc_pairs = 0 THEN 'descending'
            ELSE 'random' END AS "order"
FROM agg
"""
