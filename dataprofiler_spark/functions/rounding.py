"""Cross-engine deterministic rounding of DOUBLE expressions.

THE SEAM (r6 driver-red `robust_stats_lineitem`, and the likely root of
`cramers_v_orders`): Spark's ``round(double, d)`` converts the double to
an EXACT BigDecimal and applies HALF_UP, while DuckDB's ``ROUND(double,
d)`` computes ``round(x * 10^d) / 10^d`` in double arithmetic. For a
value within 1 ulp of a d-digit half boundary the two disagree in the
last digit: ``53055.818474499996`` (whose exact rational source value is
``...4745``, a tie) rounds to ``...474`` under Spark but ``...475``
under DuckDB — the multiply ``x * 1e6`` lands exactly ON the half and
round-half-away fires. Such ties are COMMON, not exotic: any decimal sum
of 6-dp values divided by an even count can land on a 7th-digit 5.

``duckdb_round`` reproduces DuckDB's procedure with Spark expressions —
``round(x * 10^d, 0) / 10^d`` (Spark's HALF_UP equals C's
round-half-away on the exact .5 the multiply produces) — so BOTH engines
round the identical IEEE double with the identical procedure. Verified
bit-exact against DuckDB on tie values, sub-ulp-below-tie values,
negatives, and tiny magnitudes (tests/test_rounding_parity.py).

Guard: for |x| ≥ 2^53 / 10^d the multiply loses integer precision, so
the helper returns x unchanged (a double that large has no digits left
to round at d decimals anyway — DuckDB's path is identity there too, as
probed on 1e300/9.1e15/inf). Use this helper for every FINAL rounding of
a double-typed statistic in an oracled query; rounding of DECIMAL-typed
expressions is exact in both engines and needs no helper.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def duckdb_round(col: Column, digits: int = 6) -> Column:
    """Round a DOUBLE column to ``digits`` decimals with DuckDB's
    ROUND(double, d) semantics (bit-exact cross-engine, including the
    -0.0 DuckDB emits when a negative value rounds to zero — Spark's
    own round returns +0.0 there, which a bitwise value-hash
    distinguishes)."""
    scale = float(10 ** digits)
    safe = float(2 ** 53) / scale
    x = col.cast("double")
    m = F.round(F.abs(x) * F.lit(scale), 0) / F.lit(scale)
    signed = F.when(x == 0.0, x).otherwise(
        F.when(x < 0, -m).otherwise(m))
    return F.when(F.abs(x) < safe, signed).otherwise(x)
