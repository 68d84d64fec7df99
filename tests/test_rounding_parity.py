"""duckdb_round: bit-exact parity with DuckDB's ROUND(double, d).

The r6 driver-red class: Spark round(double) is exact-BigDecimal
HALF_UP, DuckDB ROUND(double) is round(x*10^d)/10^d in IEEE doubles —
they disagree within 1 ulp of a d-digit half. The helper mirrors
DuckDB's procedure; this suite pins bit-equality on adversarial values.
"""

import duckdb
import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.functions.rounding import duckdb_round

ADVERSARIAL = [
    53055.818474499996,   # the literal r6 robust_stats red (tie source)
    -53055.818474499996,
    0.0000005, -0.0000005,
    2.5e-7, -2.5e-7,
    1.0000004999999999,
    0.1234565, 0.12345649999999999, 0.12345650000000001,
    123456.7890185, 99.9999995,
    0.0, -0.0, 1.0, -1.0,
    1e-12, 1e12 + 0.5 * 1e-6,
    8.9e9, 9.1e15, 1e300, float("inf"), float("-inf"),
]


@pytest.mark.parametrize("digits", [0, 2, 6, 9])
def test_duckdb_round_bit_parity(spark, digits):
    df = spark.createDataFrame([(v,) for v in ADVERSARIAL], "x double")
    got = [r[0] for r in
           df.select(duckdb_round(F.col("x"), digits)).collect()]
    con = duckdb.connect()
    want = [con.sql(
        f"SELECT ROUND(CAST('{v!r}' AS DOUBLE), {digits})").fetchone()[0]
        for v in ADVERSARIAL]
    for v, g, w in zip(ADVERSARIAL, got, want):
        assert repr(g) == repr(w), (v, digits, g, w)


def test_duckdb_round_null_passthrough(spark):
    df = spark.createDataFrame([(None,)], "x double")
    assert df.select(duckdb_round(F.col("x"), 6)).collect()[0][0] is None


def test_tie_quotient_matches_oracle(spark):
    """The exact r6 failure shape: 6-dp decimal sum / even count lands
    on a 7th-digit half; both engines must emit the same rounded
    double."""
    # 3183349108.470000 / 60000 = 53055.8184745 exactly
    df = spark.createDataFrame([("3183349108.470000",)], "s string")
    got = df.select(duckdb_round(
        F.col("s").cast("decimal(38,6)").cast("double") / F.lit(60000),
        6)).collect()[0][0]
    con = duckdb.connect()
    want = con.sql(
        "SELECT ROUND(CAST(CAST('3183349108.470000' AS DECIMAL(38,6))"
        " AS DOUBLE) / 60000, 6)").fetchone()[0]
    assert repr(got) == repr(want) == "53055.818475"


def test_no_native_percentile_in_operators():
    """Every exact quantile must run on the counts-CDF (scale: bounded
    state; correctness: no cross-engine interpolation seam). Native
    F.percentile/percentile() is banned in operators/ — only the
    documented percentile_approx opt-in in streaming/drift.py remains.
    """
    import pathlib
    root = pathlib.Path(__file__).resolve().parents[1] / "dataprofiler_spark"
    bad = []
    for p in (root / "operators").glob("*.py"):
        src = p.read_text()
        for i, line in enumerate(src.splitlines(), 1):
            t = line.split("#")[0]
            if "F.percentile(" in t or "quantile_cont(" in t:
                bad.append(f"{p.name}:{i}: {line.strip()}")
    assert not bad, "native percentile reintroduced:\n" + "\n".join(bad)
