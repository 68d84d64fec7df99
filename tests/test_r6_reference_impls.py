"""Round-6 operators vs INDEPENDENT pure-Python reference
implementations on seeded random data — a third opinion besides the
DuckDB oracle (which deliberately shares the formulation, so a shared
formulation bug would pass parity; a from-scratch Python fold won't).
"""

from __future__ import annotations

import math
import random
from collections import Counter, defaultdict

import pytest


def _rows(seed, n=400):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        a = rng.choice(["x", "y", "z", None])
        b = rng.choice(["p", "q", None])
        v = rng.choice([None, 0.0, rng.uniform(-50, 5000)])
        out.append((i, a, b, v))
    return out


@pytest.fixture(scope="module")
def frame(spark):
    return spark.createDataFrame(
        _rows(99), "id long, a string, b string, v double")


def test_entropy_vs_python(spark, frame):
    from dataprofiler_spark.operators.categorical import column_entropy

    got = {r["column"]: r for r in
           column_entropy(frame, ["a", "b"]).collect()}
    rows = _rows(99)
    for idx, col in ((1, "a"), (2, "b")):
        c = Counter(r[idx] for r in rows)     # NULL is a category
        n = sum(c.values())
        h = -sum(k / n * math.log(k / n) for k in c.values())
        assert got[col]["n"] == n and got[col]["k"] == len(c)
        assert got[col]["entropy"] == pytest.approx(h, abs=1e-5)
        assert got[col]["normalized_entropy"] == pytest.approx(
            h / math.log(len(c)), abs=1e-5)


def test_cohens_kappa_vs_python(spark, frame):
    from dataprofiler_spark.operators.correlation import cohens_kappa

    r = cohens_kappa(frame, "a", "b").collect()[0]
    rows = [(x[1], x[2]) for x in _rows(99)
            if x[1] is not None and x[2] is not None]
    n = len(rows)
    po = sum(1 for a, b in rows if a == b) / n
    ra, cb = Counter(a for a, _ in rows), Counter(b for _, b in rows)
    pe = sum(ra[k] * cb.get(k, 0) for k in ra) / n / n
    kappa = (po - pe) / (1 - pe)
    assert r["n"] == n
    assert r["po"] == pytest.approx(po, abs=1e-5)
    assert r["pe"] == pytest.approx(pe, abs=1e-5)
    assert r["kappa"] == pytest.approx(kappa, abs=1e-5)


def test_null_phi_vs_python(spark, frame):
    from dataprofiler_spark.operators.correlation import null_phi_matrix

    r = null_phi_matrix(frame, ["a", "v"]).collect()[0]
    rows = _rows(99)
    n = len(rows)
    r1 = sum(1 for x in rows if x[1] is None)
    r2 = sum(1 for x in rows if x[3] is None)
    n11 = sum(1 for x in rows if x[1] is None and x[3] is None)
    phi = (n * n11 - r1 * r2) / math.sqrt(
        r1 * (n - r1) * r2 * (n - r2))
    assert (r["null1"], r["null2"], r["both_null"]) == (r1, r2, n11)
    assert r["phi"] == pytest.approx(phi, abs=1e-5)


def test_fd_g3_vs_python(spark, frame):
    from dataprofiler_spark.operators.validators import fd_check

    r = fd_check(frame, [("a", "b")]).collect()[0]
    groups = defaultdict(Counter)
    for x in _rows(99):
        groups[x[1]][x[2]] += 1
    n = sum(sum(c.values()) for c in groups.values())
    keep = sum(max(c.values()) for c in groups.values())
    assert r["n"] == n and r["n_groups"] == len(groups)
    assert r["g3_error"] == pytest.approx(1 - keep / n, abs=1e-5)
    assert r["violating_groups"] == sum(
        1 for c in groups.values() if len(c) > 1)


def test_benford_vs_python(spark, frame):
    from dataprofiler_spark.operators.numeric import benford_test

    r = benford_test(frame, ["v"]).collect()[0]
    digits = Counter()
    for x in _rows(99):
        v = x[3]
        if v is None or v == 0:
            continue
        s = f"{abs(v):.10f}".replace(".", "").lstrip("0")
        digits[int(s[0])] += 1
    n = sum(digits.values())
    chi2 = sum((digits.get(d, 0) - math.log10(1 + 1 / d) * n) ** 2
               / (math.log10(1 + 1 / d) * n) for d in range(1, 10))
    assert r["n"] == n
    assert r["chi2"] == pytest.approx(chi2, rel=1e-4)
    top = max(range(1, 10),
              key=lambda d: (digits.get(d, 0), -d))
    assert r["top_digit"] == top


def test_robust_stats_vs_python(spark, frame):
    from dataprofiler_spark.operators.numeric import robust_stats

    r = robust_stats(frame, ["v"], trim=0.05).collect()[0]
    vals = sorted(x[3] for x in _rows(99) if x[3] is not None)

    def q(p):
        # linear interpolation (quantile_cont / Spark percentile rule)
        i = (len(vals) - 1) * p
        lo, hi = int(math.floor(i)), int(math.ceil(i))
        return vals[lo] + (vals[hi] - vals[lo]) * (i - lo)

    q1, q3, lo, hi = q(0.25), q(0.75), q(0.05), q(0.95)
    assert r["q1"] == pytest.approx(q1, abs=1e-4)
    assert r["iqr"] == pytest.approx(q3 - q1, abs=1e-4)
    fl, fh = q1 - 1.5 * (q3 - q1), q3 + 1.5 * (q3 - q1)
    assert r["n_low_outliers"] == sum(1 for v in vals if v < fl)
    assert r["n_high_outliers"] == sum(1 for v in vals if v > fh)
    inner = [v for v in vals if lo < v < hi]
    assert r["trimmed_mean"] == pytest.approx(
        sum(round(v, 6) for v in inner) / len(inner), abs=1e-4)
    wins = [round(lo, 6) if v <= lo else round(hi, 6) if v >= hi
            else round(v, 6) for v in vals]
    assert r["winsorized_mean"] == pytest.approx(
        sum(wins) / len(wins), abs=1e-4)


def test_zipf_slope_vs_numpy(spark):
    from dataprofiler_spark.operators.textanalysis import zipf_vocab_stats

    rng = random.Random(5)
    words = []
    for r_ in range(1, 30):
        words += [f"t{r_:03d}"] * max(1, int(200 / r_ ** 1.2))
    rng.shuffle(words)
    df = spark.createDataFrame([(0, " ".join(words))],
                               "doc_id long, text string")
    got = zipf_vocab_stats(df, "text", max_rank=29).collect()[0]

    import numpy as np
    counts = sorted(Counter(words).items(),
                    key=lambda kv: (-kv[1], kv[0]))
    x = np.log(np.arange(1, len(counts) + 1))
    y = np.log(np.array([c for _, c in counts], dtype=float))
    slope = np.polyfit(x, y, 1)[0]
    assert got["zipf_slope"] == pytest.approx(slope, abs=1e-3)
    assert got["vocab_size"] == len(counts)


# ---------------------------------------------------------------------------
# Third-opinion checks for OLDER shared-formulation operators (the same
# class of bug the benford dense-grid fix came from).
# ---------------------------------------------------------------------------

def test_chi2_cramers_vs_python(spark, frame):
    from dataprofiler_spark.operators.correlation import (chi2_matrix_pair,
                                                          cramers_v_pair)

    rows = [(x[1], x[2]) for x in _rows(99)
            if x[1] is not None and x[2] is not None]
    ra, cb = Counter(a for a, _ in rows), Counter(b for _, b in rows)
    joint = Counter(rows)
    n = len(rows)
    chi2 = 0.0
    for a in ra:
        for b in cb:                      # DENSE grid incl. zero cells
            e = ra[a] * cb[b] / n
            chi2 += (joint.get((a, b), 0) - e) ** 2 / e
    r = chi2_matrix_pair(frame, "a", "b").collect()[0]
    assert r["chi2"] == pytest.approx(chi2, rel=1e-6)
    assert r["dof"] == (len(ra) - 1) * (len(cb) - 1)
    v = cramers_v_pair(frame, "a", "b").collect()[0]
    m = min(len(ra) - 1, len(cb) - 1)
    assert v["v"] == pytest.approx(
        math.sqrt(round(chi2, 6) / n / m), abs=1e-5)


def test_mutual_info_vs_python(spark, frame):
    from dataprofiler_spark.operators.correlation import mutual_info_pair

    rows = [("(null)" if x[1] is None else x[1],
             "(null)" if x[2] is None else x[2]) for x in _rows(99)]
    n = len(rows)
    ra, cb, joint = (Counter(a for a, _ in rows),
                     Counter(b for _, b in rows), Counter(rows))
    mi = sum(c / n * math.log(c * n / (ra[a] * cb[b]))
             for (a, b), c in joint.items())
    h_a = -sum(k / n * math.log(k / n) for k in ra.values())
    h_b = -sum(k / n * math.log(k / n) for k in cb.values())
    r = mutual_info_pair(frame, "a", "b").collect()[0]
    assert r["mi"] == pytest.approx(mi, abs=1e-5)
    assert r["nmi"] == pytest.approx(mi / min(h_a, h_b), abs=1e-5)


def test_quality_score_vs_python(spark):
    from dataprofiler_spark.operators.textanalysis import (STOP_WORDS,
                                                           quality_features)

    texts = ["the quick brown fox, with punctuation!!! and the stops",
             "x", "", "a b c d " * 40, None]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, text string")
    got = {r["id"]: r for r in
           quality_features(df, "id", "text").collect()}
    for i, t in enumerate(texts):
        if t is None:
            assert got[i]["quality_score"] == 0.0
            continue
        toks = t.lower().split()
        nt, nc = len(toks), len(t)
        npunct = sum(1 for ch in t
                     if not (ch.isalnum() or ch == "_" or ch.isspace()))
        ns = sum(1 for w in toks if w in STOP_WORDS)
        pr = npunct / nc if nc else 0.0
        sr = ns / nt if nt else 0.0
        score = (min(nt / 100, 1.0) * 0.4
                 + (1 - min(pr * 5, 1.0)) * 0.3 + min(sr * 4, 1.0) * 0.3)
        assert got[i]["quality_score"] == pytest.approx(score, abs=1e-5), t


def test_minhash_jaccard_vs_python(spark):
    """The LSH verify stage's exact jaccard equals a from-scratch
    char-shingle jaccard for pairs the banding surfaces."""
    from dataprofiler_spark.operators.dedup import minhash_lsh_pairs

    docs = [(0, "the quick brown fox jumps over the lazy dog"),
            (1, "the quick brown fox jumps over the lazy dot"),
            (2, "completely different content here entirely")]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {(r["id1"], r["id2"]): r["jaccard"] for r in
           minhash_lsh_pairs(df, "doc_id", "text", threshold=0.0,
                             bands=12, num_hashes=12).collect()}

    def shingles(t, k=3):
        return {t[i:i + k] for i in range(len(t) - k + 1)}

    s0, s1 = shingles(docs[0][1]), shingles(docs[1][1])
    truth = len(s0 & s1) / len(s0 | s1)
    assert (0, 1) in got
    assert got[(0, 1)] == pytest.approx(truth, abs=1e-6)
