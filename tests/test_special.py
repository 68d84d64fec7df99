"""Driver-side special functions (functions/special.py): p-values without
scipy, pinned against published distribution values."""

import pytest

from dataprofiler_spark.functions.special import (betainc, chi2_sf,
                                                  gammainc_lower, t_sf)


def test_gammainc_known_values():
    import math
    assert gammainc_lower(1.0, 1.0) == pytest.approx(1 - math.exp(-1), rel=1e-12)
    assert gammainc_lower(0.5, 0.5) == pytest.approx(0.6826894921, rel=1e-9)
    assert gammainc_lower(3.0, 0.0) == 0.0


def test_chi2_sf_critical_values():
    # textbook 5% critical values
    assert chi2_sf(3.841458820694124, 1) == pytest.approx(0.05, rel=1e-9)
    assert chi2_sf(5.991464547107979, 2) == pytest.approx(0.05, rel=1e-9)
    assert chi2_sf(18.307038053275146, 10) == pytest.approx(0.05, rel=1e-9)
    assert chi2_sf(0.0, 5) == pytest.approx(1.0)


def test_t_sf_symmetry_and_critical():
    assert t_sf(0.0, 7) == pytest.approx(0.5)
    assert t_sf(2.0, 7) + t_sf(-2.0, 7) == pytest.approx(1.0, rel=1e-12)
    # t 5% two-sided critical value at dof=10 is 2.228138852
    assert 2 * t_sf(2.2281388519649385, 10) == pytest.approx(0.05, rel=1e-9)


def test_betainc_bounds():
    assert betainc(2.0, 3.0, 0.0) == 0.0
    assert betainc(2.0, 3.0, 1.0) == 1.0
    # I_0.5(2,2) = 0.5 by symmetry
    assert betainc(2.0, 2.0, 0.5) == pytest.approx(0.5, rel=1e-12)


def test_p_values_wired_into_drift():
    from dataprofiler_spark.operators.drift import (p_value_chi2,
                                                    p_value_welch)
    assert p_value_chi2(3.841458820694124, 1) == pytest.approx(0.05, rel=1e-6)
    assert p_value_welch(2.2281388519649385, 10) == pytest.approx(0.05, rel=1e-6)


def test_edge_attribute_profile_bounded_collect(spark):
    """A high-cardinality categorical edge attribute ships at most
    max_categories rows to the driver (salted top-K, not a full
    groupBy collect), with exact overflow accounting."""
    from pyspark.sql import functions as F

    from dataprofiler_spark.operators.graph import edge_attribute_profile

    # 5000 edges, 250 distinct attr values (ratio 0.05 -> categorical),
    # skewed so the top-K selection is meaningful
    edges = (spark.range(5000)
             .select(F.col("id").alias("src"),
                     (F.col("id") + 1).alias("dst"),
                     F.when(F.col("id") < 2500, F.lit("hot"))
                      .otherwise(F.concat(F.lit("v"),
                                          (F.col("id") % 250).cast("string")))
                      .alias("attr")))
    prof = edge_attribute_profile(edges, ["attr"],
                                  categorical_threshold=0.06,
                                  max_categories=50)
    p = prof["attr"]
    assert p["kind"] == "categorical"
    assert len(p["histogram"]) <= 50
    assert p["histogram"]["hot"] == 2500        # top category survives
    assert p["truncated"] is True
    assert p["overflow_count"] == 5000 - sum(p["histogram"].values())
    # and the uncapped path is unchanged for small cardinality
    small = edge_attribute_profile(edges.where(F.col("attr") == "hot"),
                                   ["attr"], categorical_threshold=1.0)
    assert small["attr"]["histogram"] == {"hot": 2500}
    assert "truncated" not in small["attr"]


def test_expectation_report_pass_fail(spark, duck):
    from pyspark.sql import functions as F

    from dataprofiler_spark.operators.validators import (
        Expectation, expectation_report, oracle_expectation_sql)
    from tests.oracle_utils import assert_frames_match

    df = spark.createDataFrame(
        [(1, 10.0), (2, 20.0), (2, None), (4, 30.0)],  # dup key + null
        "k long, v double")
    exps = [
        Expectation("unique", "k"),                       # FAIL: dup 2
        Expectation("row_count_between", low=3, high=10),  # pass
        Expectation("nonnull_ratio_at_least", "v", low=0.9),  # FAIL: 0.75
        Expectation("mean_between", "v", low=15.0, high=25.0),  # pass: 20
    ]
    rows = {r["check"]: r for r in expectation_report(df, exps).collect()}
    assert rows["k:unique"]["observed"] == 1.0
    assert rows["k:unique"]["passed"] is False
    assert rows["*:row_count_between"]["passed"] is True
    assert rows["v:nonnull_ratio_at_least"]["observed"] == 0.75
    assert rows["v:nonnull_ratio_at_least"]["passed"] is False
    assert rows["v:mean_between"]["observed"] == 20.0
    assert rows["v:mean_between"]["passed"] is True
    # oracle agreement on the same handcrafted table
    duck.sql("CREATE OR REPLACE VIEW exp_t AS SELECT * FROM (VALUES "
             "(1, 10.0), (2, 20.0), (2, NULL), (4, 30.0)) AS t(k, v)")
    ddf = duck.sql(oracle_expectation_sql("exp_t", exps)).df()
    assert_frames_match(expectation_report(df, exps).toPandas(), ddf,
                        "expectation_report")


def test_funnel_short_gap_list_falls_back_to_within(spark):
    """max_gap_seconds shorter than the transition count: later
    transitions fall back to within_seconds instead of silently
    unbounding."""
    from pyspark.sql import functions as F

    from dataprofiler_spark.operators.events import funnel

    rows = [(1, "view", 0), (1, "click", 30),       # gap 30s
            (1, "purchase", 10_000)]                # gap ~2.8h
    df = (spark.createDataFrame(rows, "user_id long, event_type string, t long")
          .withColumn("ts", F.timestamp_seconds("t")))
    steps = ["view", "click", "purchase"]
    # within=3600 bounds click->purchase (10k s > 3600) even though the
    # gap list only covers view->click
    out = {r["event_type"]: r["n_users"] for r in
           funnel(df, steps, within_seconds=3600,
                  max_gap_seconds=[60]).collect()}
    assert out["click"] == 1 and out["purchase"] == 0
    # explicit None in the list DOES unbound that transition
    out2 = {r["event_type"]: r["n_users"] for r in
            funnel(df, steps, within_seconds=3600,
                   max_gap_seconds=[60, None]).collect()}
    assert out2["purchase"] == 1


def test_expectation_fails_closed_on_empty(spark, duck):
    """Empty/all-null inputs report passed=False (never NULL) for
    ratio/mean expectations — in Spark AND the DuckDB oracle."""
    from dataprofiler_spark.operators.validators import (
        Expectation, expectation_report, oracle_expectation_sql)
    from tests.oracle_utils import assert_frames_match

    empty = spark.createDataFrame([], "k long, v double")
    exps = [Expectation("nonnull_ratio_at_least", "v", low=0.5),
            Expectation("mean_between", "v", low=0.0, high=1.0),
            Expectation("unique", "k")]
    rows = {r["check"]: r for r in expectation_report(empty, exps).collect()}
    assert rows["v:nonnull_ratio_at_least"]["passed"] is False
    assert rows["v:mean_between"]["passed"] is False
    assert rows["k:unique"]["passed"] is True  # zero rows: no duplicates
    duck.sql("CREATE OR REPLACE VIEW empty_t AS "
             "SELECT * FROM (VALUES (1::BIGINT, 1.0)) t(k, v) WHERE FALSE")
    ddf = duck.sql(oracle_expectation_sql("empty_t", exps)).df()
    assert_frames_match(expectation_report(empty, exps).toPandas(), ddf,
                        "expectation_empty")


def test_dp_logging_surface():
    import logging

    from dataprofiler_spark import get_logger, set_verbosity
    from dataprofiler_spark.dp_logging import get_child_logger

    lg = get_logger()
    assert lg.name == "dataprofiler_spark"
    assert any(isinstance(h, logging.NullHandler) for h in lg.handlers)
    set_verbosity(logging.INFO)
    assert lg.level == logging.INFO
    assert any(isinstance(h, logging.StreamHandler) for h in lg.handlers)
    child = get_child_logger("dataprofiler_spark.operators.numeric")
    assert child.name == "dataprofiler_spark.operators.numeric"


def test_pagerank_semantics(spark):
    """Star graph: the hub receiving every edge accumulates rank; leaf
    ranks equal the teleport base; the total is bounded by 1 (integer
    truncation loses mass, never adds); empty graph raises."""
    import pytest as _pytest

    from dataprofiler_spark.operators import graph as gr

    edges = spark.createDataFrame(
        [(i, 99) for i in range(1, 9)], "s long, d long")
    out = {r["node"]: r["rank"] for r in
           gr.pagerank(edges, "s", "d", iters=3).collect()}
    assert len(out) == 9
    hub = out[99]
    leaves = [v for n, v in out.items() if n != 99]
    assert all(v == leaves[0] for v in leaves)  # symmetric leaves
    assert hub > 5 * leaves[0]                  # hub dominates
    assert sum(out.values()) <= 1.0 + 1e-9      # truncation only loses

    with _pytest.raises(ValueError, match="empty graph"):
        gr.pagerank(edges.where("s < 0"), "s", "d")


def test_pagerank_dangling_mass_drops(spark):
    """A dangling node (no out-edges) receives rank but re-emits none —
    its mass leaves the system (documented), so total mass strictly
    shrinks with iterations on a chain ending in a sink, while the
    sink stays ahead of the source at any iteration count."""
    from dataprofiler_spark.operators import graph as gr

    chain = spark.createDataFrame(
        [(1, 2), (2, 3)], "s long, d long")  # 3 is dangling
    r1 = {r["node"]: r["rank"] for r in
          gr.pagerank(chain, "s", "d", iters=1).collect()}
    r3 = {r["node"]: r["rank"] for r in
          gr.pagerank(chain, "s", "d", iters=3).collect()}
    assert r1[3] > r1[1] and r3[3] > r3[1]
    assert sum(r3.values()) < sum(r1.values())  # dangling leak


def test_column_entropy_semantics(spark):
    """Uniform k values -> H = ln(k), normalized 1; constant -> H = 0,
    normalized NULL; NULL is a category."""
    import math

    from dataprofiler_spark.operators import categorical as cat

    df = spark.createDataFrame(
        [(v, "x", v if v != "c" else None)
         for v in ["a", "b", "c", "d"] for _ in range(25)],
        "u string, k string, withnull string")
    out = {r["column"]: r for r in cat.column_entropy(
        df, ["u", "k", "withnull"]).collect()}
    assert abs(out["u"]["entropy"] - math.log(4)) < 1e-6
    assert out["u"]["normalized_entropy"] == 1.0
    assert out["k"]["entropy"] == 0.0
    assert out["k"]["normalized_entropy"] is None
    # NULL replaces 'c' as its own category: same distribution shape
    assert out["withnull"]["k"] == 4
    assert abs(out["withnull"]["entropy"] - math.log(4)) < 1e-6


def test_pattern_profile_semantics(spark):
    from dataprofiler_spark.operators import categorical as cat

    df = spark.createDataFrame(
        [("AB-1234",)] * 8 + [("XY-77",)] * 3 + [(None,)] * 2
        + [("weird VALUE 9",)],
        "code string")
    out = {(r["rank"]): r for r in cat.pattern_profile(
        df, ["code"], k=4).collect()}
    assert out[1]["pattern"] == "AA-9999" and out[1]["count"] == 8
    assert out[1]["collapsed"] == "A-9"
    assert out[2]["pattern"] == "AA-99"
    assert out[2]["collapsed"] == "A-9"   # same shape family
    assert out[3]["pattern"] == "(null)" and out[3]["count"] == 2
    assert out[4]["pattern"] == "aaaaa_AAAAA_9"
    assert out[4]["collapsed"] == "a_A_9"
    assert abs(out[1]["share"] - 8 / 14) < 1e-5  # 6-digit rounding


def test_fd_check_semantics(spark):
    """g3 = minimum delete fraction; exact FD -> 0/holds; NULL
    determinant is a group."""
    from dataprofiler_spark.operators import validators as vd

    rows = [
        (1, "x", "p"), (1, "x", "p"), (1, "y", "p"),   # 1 -> {x,x,y}
        (2, "z", "q"), (2, "z", "q"),                   # 2 -> {z,z}
        (None, "w", "r"),                               # NULL group
    ]
    df = spark.createDataFrame(rows, "a int, b string, c string")
    out = {(r["determinant"], r["dependent"]): r for r in
           vd.fd_check(df, [("a", "b"), ("a", "c")]).collect()}
    ab = out[("a", "b")]
    # delete the single 'y' row and a->b holds: g3 = 1/6
    assert not ab["fd_holds"] and ab["violating_groups"] == 1
    assert abs(ab["g3_error"] - 1 / 6) < 1e-6
    ac = out[("a", "c")]
    assert ac["fd_holds"] and ac["g3_error"] == 0.0
    assert ac["n_groups"] == 3  # NULL determinant counted as a group


def test_inclusion_profile_semantics(spark):
    """Exact containment values incl. cross-type string comparison and
    NULL exclusion."""
    from dataprofiler_spark.operators import validators as vd

    a = spark.createDataFrame(
        [(1, "x"), (2, "y"), (3, None), (None, "z")],
        "fk int, junk string")
    b = spark.createDataFrame([("1",), ("2",), ("9",)], "pk string")
    out = {(r["col_a"], r["col_b"]): r for r in vd.inclusion_profile(
        a, ["fk", "junk"], b, ["pk"]).collect()}
    fk = out[("fk", "pk")]
    # fk distincts {1,2,3}; {1,2} appear in pk (INT vs VARCHAR matches
    # through the string cast — the cross-type FK case)
    assert fk["distinct_a"] == 3 and fk["intersection"] == 2
    assert abs(fk["containment"] - 2 / 3) < 1e-6
    jk = out[("junk", "pk")]
    assert jk["intersection"] == 0 and jk["containment"] == 0.0
