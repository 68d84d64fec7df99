"""Fuzzy (edit-distance) join: completeness against a pure-Python DP."""
import random

import pytest

from pyspark.sql import functions as F

from dataprofiler_spark.operators import fuzzyjoin as fz


def _lev(a: str, b: str) -> int:
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _brute_pairs(rows, max_dist):
    out = set()
    for i, (ia, sa) in enumerate(rows):
        for ib, sb in rows[i + 1:]:
            if sa is None or sb is None:
                continue
            d = _lev(sa, sb)
            if d <= max_dist:
                lo, hi = (ia, ib) if ia < ib else (ib, ia)
                out.add((lo, hi, d))
    return out


def _spark_pairs(spark, rows, max_dist):
    df = spark.createDataFrame(rows, "id long, s string")
    got = fz.fuzzy_self_pairs(df, "id", "s", max_dist=max_dist).collect()
    return {(r["id1"], r["id2"], r["dist"]) for r in got}


def test_known_pairs_tau1(spark):
    rows = [(1, "kitten"), (2, "sitten"), (3, "sittin"), (4, "sitting"),
            (5, "kitchen"), (6, "mitten"), (7, "xyz")]
    got = _spark_pairs(spark, rows, 1)
    assert got == _brute_pairs(rows, 1)
    assert (1, 2, 1) in got and (2, 3, 1) in got and (3, 4, 1) in got
    assert (1, 6, 1) in got


def test_random_strings_complete_tau1_tau2(spark):
    rng = random.Random(5)
    alpha = "abc"
    rows = [(i, "".join(rng.choice(alpha)
                        for _ in range(rng.randint(0, 7))))
            for i in range(60)]
    for tau in (1, 2):
        assert _spark_pairs(spark, rows, tau) == _brute_pairs(rows, tau), tau


def test_unicode_char_semantics(spark):
    """Spark side is CHARACTER-based: multibyte chars count as one edit."""
    rows = [(1, "héllo"), (2, "hello"), (3, "你好"), (4, "你"),
            (5, "naïve"), (6, "naive")]
    got = _spark_pairs(spark, rows, 1)
    assert got == _brute_pairs(rows, 1)
    assert (1, 2, 1) in got and (3, 4, 1) in got and (5, 6, 1) in got


def test_null_and_empty(spark):
    """NULL text has no identity; empty strings pair with <=tau-char
    strings."""
    rows = [(1, None), (2, None), (3, ""), (4, ""), (5, "a"), (6, "ab")]
    got = _spark_pairs(spark, rows, 1)
    assert got == _brute_pairs(rows, 1)
    assert (3, 4, 0) in got and (3, 5, 1) in got and (5, 6, 1) in got
    assert not any(1 in (a, b) or 2 in (a, b) for a, b, _ in got)


def test_duplicate_strings_dist0(spark):
    rows = [(1, "same"), (2, "same"), (3, "same")]
    assert _spark_pairs(spark, rows, 1) == {(1, 2, 0), (1, 3, 0),
                                            (2, 3, 0)}


def test_fuzzy_join_two_tables(spark):
    master = spark.createDataFrame(
        [(1, "acme corp"), (2, "globex"), (3, "initech")],
        "id long, name string")
    dirty = spark.createDataFrame(
        [(10, "acme c0rp"), (11, "globexx"), (12, "unrelated"),
         (13, None)],
        "id long, name string")
    got = {(r["id1"], r["id2"], r["dist"])
           for r in fz.fuzzy_join(dirty, "id", "name",
                                  master, "id", "name",
                                  max_dist=1).collect()}
    assert got == {(10, 1, 1), (11, 2, 1)}


def test_key_expr_override(spark):
    """key_expr replaces the raw column (prefix-strip pattern)."""
    rows = [(1, "Customer#000000001"), (2, "Customer#000000002"),
            (3, "Customer#000000011")]
    df = spark.createDataFrame(rows, "id long, s string")
    got = {(r["id1"], r["id2"], r["dist"])
           for r in fz.fuzzy_self_pairs(
               df, "id", "s", max_dist=1,
               key_expr=F.reverse(F.substring("s", 10, 9))).collect()}
    # reversed digits: 100000000 / 200000000 / 110000000 — pairs (1,2)
    # and (1,3) differ in one digit; (2,3) differs in two (excluded)
    assert got == {(1, 2, 1), (1, 3, 1)}


def test_probe_candidate_bound(spark):
    """The probe explode is bounded: <= (2t+1)^2 (t+1) rows per string
    before dedup — the documented scale contract."""
    df = spark.createDataFrame([(1, "abcdefghij")], "id long, s string")
    n = fz._probe_side(df, "id", "s", 1).count()
    assert n <= 9 * 2
    n2 = fz._probe_side(df, "id", "s", 2).count()
    assert n2 <= 25 * 3
