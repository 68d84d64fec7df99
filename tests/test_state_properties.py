"""Property-based tests (hypothesis) for the profile-state algebra.

The reference's key invariant — profile(A) + profile(B) == profile(A∪B)
(test_profile_builder.py throughout) — is exactly Spark's partial/final
aggregation contract, so the merge algebra in state.py must hold for ANY
split, not just the hand-picked ones in the unit tests. Pure driver-side
math: no SparkSession needed, thousands of cases in seconds.
"""

from __future__ import annotations

import math

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from dataprofiler_spark.state import (CategoricalState, DatetimeState,
                                      NumericState, OrderState)

finite = st.floats(min_value=-1e6, max_value=1e6,
                   allow_nan=False, allow_infinity=False)


def numeric_state(values: list[float]) -> NumericState:
    """Batch-kernel construction: the same quantities the wide agg
    computes per column (count/sum/min/max/central moments)."""
    n = len(values)
    if n == 0:
        return NumericState()
    mean = sum(values) / n
    return NumericState(
        n=n, sum=sum(values), min=min(values), max=max(values),
        m2=sum((v - mean) ** 2 for v in values),
        m3=sum((v - mean) ** 3 for v in values),
        m4=sum((v - mean) ** 4 for v in values),
        num_zeros=sum(1 for v in values if v == 0),
        num_negatives=sum(1 for v in values if v < 0),
    )


def _close(a, b, tol=1e-6):
    if a is None or b is None:
        return a is None and b is None
    if math.isclose(a, b, rel_tol=tol, abs_tol=tol):
        return True
    return False


@settings(max_examples=300, deadline=None)
@given(st.lists(finite, max_size=60), st.lists(finite, max_size=60))
def test_numeric_merge_equals_whole(xs, ys):
    merged = numeric_state(xs) + numeric_state(ys)
    whole = numeric_state(xs + ys)
    assert merged.n == whole.n
    assert merged.num_zeros == whole.num_zeros
    assert merged.num_negatives == whole.num_negatives
    assert _close(merged.sum, whole.sum, 1e-5)
    assert merged.min == whole.min and merged.max == whole.max
    assert _close(merged.mean, whole.mean, 1e-5)
    # float-order sensitivity (SURVEY §7.4 risk 6): tolerances, scaled —
    # m3/m4 cancellation near-zero spread needs absolute slack
    scale = max(1.0, abs(whole.m2))
    assert merged.m2 - whole.m2 == 0 or \
        abs(merged.m2 - whole.m2) / scale < 1e-6


@settings(max_examples=200, deadline=None)
@given(st.lists(finite, min_size=5, max_size=40),
       st.lists(finite, min_size=5, max_size=40),
       st.lists(finite, min_size=5, max_size=40))
def test_numeric_merge_associative_commutative(xs, ys, zs):
    a, b, c = numeric_state(xs), numeric_state(ys), numeric_state(zs)
    ab_c = (a + b) + c
    a_bc = a + (b + c)
    b_a = b + a
    scale = max(1.0, abs(ab_c.m2))
    assert ab_c.n == a_bc.n == (b_a + c).n
    assert _close(ab_c.sum, a_bc.sum, 1e-5)
    assert abs(ab_c.m2 - a_bc.m2) / scale < 1e-5
    assert _close((a + b).mean, b_a.mean, 1e-6)


cats = st.dictionaries(st.sampled_from(list("abcdefgh")),
                       st.integers(min_value=1, max_value=1000), max_size=8)


@settings(max_examples=300, deadline=None)
@given(cats, cats, cats)
def test_categorical_merge_is_multiset_union(c1, c2, c3):
    a, b, c = (CategoricalState(categories=dict(d)) for d in (c1, c2, c3))
    merged = (a + b) + c
    other = a + (b + c)
    for k in set(c1) | set(c2) | set(c3):
        want = c1.get(k, 0) + c2.get(k, 0) + c3.get(k, 0)
        assert merged.categories[k] == want == other.categories[k]


@given(cats, cats)
@settings(max_examples=100, deadline=None)
def test_categorical_stop_condition_absorbs(c1, c2):
    a = CategoricalState(categories=dict(c1), active=False)
    b = CategoricalState(categories=dict(c2))
    assert not (a + b).active and not (b + a).active
    assert (a + b).categories == {}


orders = st.sampled_from(["ascending", "descending", "constant value", "random"])


@st.composite
def order_states(draw):
    o = draw(orders)
    lo = draw(st.integers(min_value=0, max_value=50))
    hi = draw(st.integers(min_value=0, max_value=50))
    lo, hi = min(lo, hi), max(lo, hi)
    if o == "constant value":
        first = last = lo
    elif o == "ascending":
        first, last = lo, hi
    elif o == "descending":
        first, last = hi, lo
    else:
        first, last = lo, hi
    return OrderState(order=o, first=first, last=last,
                      n=draw(st.integers(min_value=1, max_value=100)),
                      piecewise=draw(st.booleans()) if o not in (
                          "random",) else False)


@settings(max_examples=500, deadline=None)
@given(order_states(), order_states())
def test_order_merge_commutative(a, b):
    """The reference's range algebra is symmetric in its inputs
    (order_column_profile.py:133-262 treats both sides as ranges)."""
    ab, ba = a + b, b + a
    assert ab.order == ba.order
    assert ab.n == ba.n == a.n + b.n
    if ab.order in ("random", "constant value"):
        assert (ab.first, ab.last) == (ba.first, ba.last)


@settings(max_examples=300, deadline=None)
@given(order_states(), order_states())
def test_order_merge_invariants(a, b):
    m = a + b
    assert m.order in ("ascending", "descending", "constant value", "random")
    if a.order == "random" or b.order == "random":
        assert m.order == "random"
    if m.order == "random":
        assert not m.piecewise
    # merged range always covers both input ranges
    vals = [v for v in (a.first, a.last, b.first, b.last)]
    assert min(m.first, m.last) <= min(vals)
    assert max(m.first, m.last) >= max(vals)


@settings(max_examples=200, deadline=None)
@given(st.lists(st.sampled_from(["%Y-%m-%d", "%m/%d/%y", "%b %d, %Y"]),
                max_size=3),
       st.lists(st.sampled_from(["%Y-%m-%d", "%d/%m/%Y"]), max_size=2))
def test_datetime_formats_union(f1, f2):
    a = DatetimeState(n=1, min_ts="2020-01-01", max_ts="2021-01-01",
                      formats=list(f1))
    b = DatetimeState(n=2, min_ts="2019-06-01", max_ts="2020-06-01",
                      formats=list(f2))
    m = a + b
    assert set(m.formats) == set(f1) | set(f2)
    assert m.min_ts == "2019-06-01" and m.max_ts == "2021-01-01"
    assert m.n == 3


@st.composite
def histograms(draw):
    lo = draw(st.floats(min_value=-1e4, max_value=1e4,
                        allow_nan=False, allow_infinity=False))
    width = draw(st.floats(min_value=1e-3, max_value=1e3,
                           allow_nan=False, allow_infinity=False))
    nbins = draw(st.integers(min_value=1, max_value=12))
    counts = draw(st.lists(st.integers(min_value=0, max_value=500),
                           min_size=nbins, max_size=nbins))
    return {"bin_edges": [lo + i * width for i in range(nbins + 1)],
            "bin_counts": counts}


@settings(max_examples=300, deadline=None)
@given(histograms(), histograms())
def test_histogram_merge_preserves_mass_and_range(h1, h2):
    """Re-binned merge (the bounded-memory analog of the reference's
    pseudo-data assimilation) must conserve total count exactly and
    cover the union of both ranges."""
    from dataprofiler_spark.state import _merge_histograms

    m = _merge_histograms(h1, h2)
    assert sum(m["bin_counts"]) == sum(h1["bin_counts"]) + sum(h2["bin_counts"])
    assert m["bin_edges"][0] <= min(h1["bin_edges"][0], h2["bin_edges"][0])
    assert m["bin_edges"][-1] >= max(h1["bin_edges"][-1], h2["bin_edges"][-1])
    # edges strictly ordered
    assert all(e2 > e1 for e1, e2 in zip(m["bin_edges"], m["bin_edges"][1:]))
    # identity on one side
    assert _merge_histograms(h1, None) == h1
    assert _merge_histograms(None, h2) == h2


def test_histogram_method_loss_accumulates_across_merges(spark, sf_dir):
    """'Follow the best expert' (numerical_column_stats.py:1176-1240):
    per-method losses sum across merges, the selection is the argmin of
    the accumulated loss, and merge order does not change it."""
    import os as _os

    from pyspark.sql import functions as F

    from dataprofiler_spark import Profiler
    from dataprofiler_spark.operators.histogram import \
        select_histogram_method

    li = spark.read.parquet(_os.path.join(sf_dir, "lineitem.parquet"))
    parts = [Profiler(li.where(F.col("l_orderkey") % 3 == i)).profile()
             for i in range(3)]
    h = [p.columns["l_extendedprice"].numeric.histogram for p in parts]
    assert all(x.get("method_losses") for x in h)

    m_ab = (parts[0] + parts[1]) + parts[2]
    m_ba = parts[2] + (parts[1] + parts[0])
    ha = m_ab.columns["l_extendedprice"].numeric.histogram
    hb = m_ba.columns["l_extendedprice"].numeric.histogram
    for m, v in ha["method_losses"].items():
        # accumulated = sum of the three chunks' losses, any merge order
        expect = sum(x["method_losses"].get(m, 0.0) for x in h)
        assert v == pytest.approx(expect, rel=1e-9)
        assert hb["method_losses"][m] == pytest.approx(v, rel=1e-9)
    sel_a = select_histogram_method(ha["method_losses"],
                                    ha["suggested_bin_counts"])
    sel_b = select_histogram_method(hb["method_losses"],
                                    hb["suggested_bin_counts"])
    assert sel_a == sel_b
    assert sel_a == min(ha["method_losses"], key=lambda m: (
        ha["method_losses"][m], -ha["suggested_bin_counts"].get(m, 0)))


def test_rebin_preserves_mass_and_variance_sanity():
    from dataprofiler_spark.operators.histogram import (hist_variance,
                                                        rebin_counts)

    counts = [10, 20, 30, 40, 50, 40, 30, 20, 10, 5]
    edges = [float(i) for i in range(11)]
    for k in (1, 2, 3, 5, 10):
        cs, es = rebin_counts(counts, edges, k)
        assert sum(cs) == pytest.approx(sum(counts))
        assert es[0] == edges[0] and es[-1] == edges[-1]
        assert len(cs) == min(k, len(counts))
    # coarser bins can only lose resolution, not invent variance wildly
    v10 = hist_variance(counts, edges)
    cs5, es5 = rebin_counts(counts, edges, 5)
    assert hist_variance(cs5, es5) == pytest.approx(v10, rel=0.2)
