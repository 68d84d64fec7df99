"""Round-7 operators vs INDEPENDENT pure-Python reference
implementations on seeded random data — the third opinion besides the
DuckDB oracle (which shares the formulation; a shared-formulation bug
passes parity but not a from-scratch Python fold). Pattern proven in r6:
it caught the Benford dense-grid bug on day one.
"""

from __future__ import annotations

import datetime
import math
import random
from collections import Counter, defaultdict

import pytest


def _num_rows(seed, n=500):
    rng = random.Random(seed)
    out = []
    for i in range(n):
        a = rng.choice([None] + list(range(1, 13)))
        b = rng.choice([None, 0.0, 1.5, 2.5, 7.0, 9.0])
        v = rng.choice([None, 0.0, round(rng.uniform(-40, 900), 2)])
        out.append((i, a, b, v))
    return out


@pytest.fixture(scope="module")
def nframe(spark):
    return spark.createDataFrame(
        _num_rows(7), "id long, a int, b double, v double")


def _event_rows(seed, n=600):
    rng = random.Random(seed)
    base = datetime.datetime(2024, 3, 1)
    out = []
    for i in range(n):
        u = rng.randrange(40)
        ts = base + datetime.timedelta(
            days=rng.randrange(25), seconds=rng.randrange(86400))
        et = rng.choice(["view", "click", "purchase", "refund"])
        out.append((u, ts, et))
    return out


@pytest.fixture(scope="module")
def eframe(spark):
    return spark.createDataFrame(
        _event_rows(11), "user_id long, ts timestamp, event_type string")


def test_kendall_tau_b_vs_scipy_formula(spark, nframe):
    from dataprofiler_spark.operators.correlation import kendall_tau_b

    r = kendall_tau_b(nframe, "a", "b").collect()[0]
    rows = [(x[1], float(x[2])) for x in _num_rows(7)
            if x[1] is not None and x[2] is not None]
    n = len(rows)
    C = D = 0
    for i in range(n):
        for j in range(i + 1, n):
            da = rows[i][0] - rows[j][0]
            db = rows[i][1] - rows[j][1]
            s = da * db
            if s > 0:
                C += 1
            elif s < 0:
                D += 1
    n0 = n * (n - 1) // 2
    ta = Counter(a for a, _ in rows)
    tb = Counter(b for _, b in rows)
    n1 = sum(t * (t - 1) // 2 for t in ta.values())
    n2 = sum(t * (t - 1) // 2 for t in tb.values())
    tau = (C - D) / math.sqrt((n0 - n1) * (n0 - n2))
    assert r["n"] == n
    assert r["concordant"] == C and r["discordant"] == D
    assert r["tau_b"] == pytest.approx(tau, abs=1e-6)


def test_kendall_tau_b_perfect_orderings(spark):
    from dataprofiler_spark.operators.correlation import kendall_tau_b

    df = spark.createDataFrame(
        [(i, float(i), float(-i)) for i in range(30)],
        "x int, y double, z double")
    up = kendall_tau_b(df, "x", "y").collect()[0]
    dn = kendall_tau_b(df, "x", "z").collect()[0]
    assert up["tau_b"] == pytest.approx(1.0)
    assert dn["tau_b"] == pytest.approx(-1.0)


def test_kendall_tau_b_cell_gate(spark):
    from dataprofiler_spark.operators.correlation import kendall_tau_b

    df = spark.createDataFrame(
        [(float(i), float(i * 7 % 101)) for i in range(200)],
        "x double, y double")
    with pytest.raises(ValueError, match="cells"):
        kendall_tau_b(df, "x", "y", max_cells=50).collect()


def test_markov_transitions_vs_python(spark, eframe):
    from dataprofiler_spark.operators.events import markov_transitions

    got = {(r["from_type"], r["to_type"]): r for r in
           markov_transitions(eframe).collect()}
    seqs = defaultdict(list)
    for u, ts, et in _event_rows(11):
        seqs[u].append((ts, et))
    trans = Counter()
    for u, evs in seqs.items():
        evs.sort()  # (ts, type) — the documented deterministic order
        for (_ta, a), (_tb, b) in zip(evs, evs[1:]):
            trans[(a, b)] += 1
    outdeg = Counter()
    for (a, _), c in trans.items():
        outdeg[a] += c
    assert set(got) == set(trans)
    for k, c in trans.items():
        assert got[k]["n_trans"] == c
        assert got[k]["prob"] == pytest.approx(c / outdeg[k[0]], abs=1e-6)


def test_calendar_gaps_vs_python(spark, eframe):
    from dataprofiler_spark.operators.events import calendar_gaps

    got = {r["group"]: r for r in
           calendar_gaps(eframe, group_col="event_type").collect()}
    per = defaultdict(set)
    for u, ts, et in _event_rows(11):
        per[et].add(ts.date())
    for et, days in per.items():
        lo, hi = min(days), max(days)
        expected = (hi - lo).days + 1
        missing = sorted(set(lo + datetime.timedelta(days=i)
                             for i in range(expected)) - days)
        g = got[et]
        assert g["n_days_present"] == len(days)
        assert g["n_days_expected"] == expected
        assert g["n_days_missing"] == len(missing)
        if missing:
            assert g["first_missing_day"] == missing[0].isoformat()
            assert g["last_missing_day"] == missing[-1].isoformat()
        else:
            assert g["first_missing_day"] is None


def test_decile_stats_vs_python(spark, nframe):
    from dataprofiler_spark.operators.histogram import decile_stats

    got = {r["bucket"]: r for r in
           decile_stats(nframe, "v", n_buckets=10).collect()}
    vals = sorted(float(x[3]) for x in _num_rows(7) if x[3] is not None)
    n = len(vals)
    for d in range(1, 11):
        lo = n * (d - 1) // 10
        hi = n * d // 10
        part = vals[lo:hi]
        g = got[d]
        assert g["n"] == len(part)
        if part:
            assert g["lo"] == pytest.approx(part[0], abs=1e-6)
            assert g["hi"] == pytest.approx(part[-1], abs=1e-6)
            assert g["mean"] == pytest.approx(
                sum(round(v, 6) for v in part) / len(part), abs=1e-5)


def test_woe_iv_vs_python(spark, nframe):
    from dataprofiler_spark.operators.validators import woe_iv

    lab = nframe.selectExpr("a", "v is not null and v > 100 as y")
    got = {r["category"]: r for r in woe_iv(lab, "a", "y").collect()}
    rows = [( "(null)" if x[1] is None else str(x[1]),
              x[3] is not None and x[3] > 100) for x in _num_rows(7)]
    cats = sorted(set(c for c, _ in rows))
    k = len(cats)
    P = sum(1 for _, y in rows if y)
    N = len(rows) - P
    for c in cats:
        np_ = sum(1 for cc, y in rows if cc == c and y)
        nn = sum(1 for cc, y in rows if cc == c and not y)
        ps = (np_ + 0.5) / (P + 0.5 * k)
        ns = (nn + 0.5) / (N + 0.5 * k)
        woe = math.log(ps / ns)
        g = got[c]
        assert g["n"] == np_ + nn
        assert g["n_pos"] == np_
        assert g["woe"] == pytest.approx(woe, abs=1e-6)
        assert g["iv_contrib"] == pytest.approx((ps - ns) * woe, abs=1e-6)


def test_roc_auc_vs_sklearn_formula(spark, nframe):
    from dataprofiler_spark.operators.validators import roc_auc

    lab = nframe.selectExpr("a as score", "v is not null and v > 100 as y")
    r = roc_auc(lab, "score", "y").collect()[0]
    rows = [(x[1], x[3] is not None and x[3] > 100)
            for x in _num_rows(7) if x[1] is not None]
    # Mann-Whitney with average ranks on ties (sklearn roc_auc_score)
    rows.sort(key=lambda t: t[0])
    ranks = {}
    i = 0
    while i < len(rows):
        j = i
        while j < len(rows) and rows[j][0] == rows[i][0]:
            j += 1
        avg = (i + 1 + j) / 2
        for k in range(i, j):
            ranks[k] = avg
        i = j
    n_pos = sum(1 for _, y in rows if y)
    n_neg = len(rows) - n_pos
    rsum = sum(ranks[k] for k, (_, y) in enumerate(rows) if y)
    auc = (rsum - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
    assert r["n_pos"] == n_pos and r["n_neg"] == n_neg
    assert r["auc"] == pytest.approx(auc, abs=1e-6)


def test_roc_auc_perfect_and_degenerate(spark):
    from dataprofiler_spark.operators.validators import roc_auc

    df = spark.createDataFrame(
        [(float(i), i >= 50) for i in range(100)], "s double, y boolean")
    assert roc_auc(df, "s", "y").collect()[0]["auc"] == pytest.approx(1.0)
    one = spark.createDataFrame([(1.0, True), (2.0, True)],
                                "s double, y boolean")
    assert roc_auc(one, "s", "y").collect()[0]["auc"] is None


def test_calibration_curve_vs_python(spark, nframe):
    from dataprofiler_spark.operators.validators import calibration_curve

    lab = nframe.selectExpr("(a - 1) / 11.0 as score",
                            "v is not null and v > 100 as y")
    got = {r["bin"]: r for r in
           calibration_curve(lab, "score", "y", n_bins=10).collect()}
    rows = [((x[1] - 1) / 11.0, x[3] is not None and x[3] > 100)
            for x in _num_rows(7) if x[1] is not None]
    from collections import defaultdict
    bins = defaultdict(list)
    for s, y in rows:
        b = min(int(s * 10), 9)
        bins[b].append((s, y))
    for b, part in bins.items():
        g = got[b]
        assert g["n"] == len(part)
        assert g["n_pos"] == sum(1 for _, y in part if y)
        assert g["mean_score"] == pytest.approx(
            sum(round(s, 6) for s, _ in part) / len(part), abs=1e-5)
        assert g["pos_rate"] == pytest.approx(
            sum(1 for _, y in part if y) / len(part), abs=1e-6)


def test_streaming_markov_fold_equals_batch(spark):
    """Event-time-ordered micro-batches fold to EXACTLY the batch
    transition counts (seam pairs stitched from carried per-user
    state)."""
    from dataprofiler_spark.operators.events import markov_transitions
    from dataprofiler_spark.streaming.markov import StreamingMarkov

    rows = sorted(_event_rows(23), key=lambda r: r[1])  # event time
    schema = "user_id long, ts timestamp, event_type string"
    full = spark.createDataFrame(rows, schema)
    want = {(r["from_type"], r["to_type"]): r["n_trans"]
            for r in markov_transitions(full).collect()}

    mon = StreamingMarkov()
    step = len(rows) // 4 + 1
    for i in range(0, len(rows), step):
        mon.update(spark.createDataFrame(rows[i:i + step], schema), i)
    got = {(d["from_type"], d["to_type"]): d["n_trans"]
           for d in mon.snapshot()}
    assert got == want
    assert mon.seam_skipped == 0
    # probabilities row-normalize identically (up to rounding style)
    probs = {(d["from_type"], d["to_type"]): d["prob"]
             for d in mon.snapshot()}
    for r in markov_transitions(full).collect():
        assert probs[(r["from_type"], r["to_type"])] == pytest.approx(
            r["prob"], abs=1e-6)


def test_streaming_markov_user_cap(spark):
    from dataprofiler_spark.streaming.markov import StreamingMarkov

    schema = "user_id long, ts timestamp, event_type string"
    mon = StreamingMarkov(max_users=2)
    base = datetime.datetime(2024, 1, 1)
    b1 = [(u, base + datetime.timedelta(minutes=u), "a")
          for u in range(5)]
    b2 = [(u, base + datetime.timedelta(hours=1, minutes=u), "b")
          for u in range(5)]
    mon.update(spark.createDataFrame(b1, schema), 0)
    mon.update(spark.createDataFrame(b2, schema), 1)
    # only the 2 tracked users contribute seam pairs; each untracked
    # user counts one refusal PER BATCH it appears in (3 in each of the
    # two batches) — the counter reports loss events, not unique users
    snap = {(d["from_type"], d["to_type"]): d["n_trans"]
            for d in mon.snapshot()}
    assert snap == {("a", "b"): 2}
    assert mon.seam_skipped == 6


def test_streaming_markov_out_of_order_batch(spark):
    """A batch whose first event predates the carried last event must
    NOT fabricate a seam transition — it is counted in
    seam_out_of_order and the later state is kept (ADVICE r7)."""
    from dataprofiler_spark.streaming.markov import StreamingMarkov

    schema = "user_id long, ts timestamp, event_type string"
    base = datetime.datetime(2024, 1, 1)
    mon = StreamingMarkov()
    b1 = [(1, base + datetime.timedelta(hours=2), "c")]
    b2 = [(1, base + datetime.timedelta(hours=1), "a"),
          (1, base + datetime.timedelta(hours=1, minutes=30), "b")]
    mon.update(spark.createDataFrame(b1, schema), 0)
    mon.update(spark.createDataFrame(b2, schema), 1)  # out of order
    snap = {(d["from_type"], d["to_type"]): d["n_trans"]
            for d in mon.snapshot()}
    # within-batch a->b still counts; the seam c->a is refused
    assert snap == {("a", "b"): 1}
    assert mon.seam_out_of_order == 1
    # carried state stays at the LATER event ("c" at hour 2): an
    # in-order third batch stitches from "c", not "b"
    b3 = [(1, base + datetime.timedelta(hours=3), "d")]
    mon.update(spark.createDataFrame(b3, schema), 2)
    snap = {(d["from_type"], d["to_type"]): d["n_trans"]
            for d in mon.snapshot()}
    assert snap == {("a", "b"): 1, ("c", "d"): 1}


def test_embedding_spectrum_known_spectrum(spark):
    """Axis-aligned synthetic embeddings with known per-dimension
    variances: the spectrum must recover them analytically."""
    from dataprofiler_spark.operators.vectorstats import \
        embedding_spectrum

    rng = random.Random(3)
    rows = []
    # dim variances ~ [9, 4, 1, 0]: x0 in {-3,3}, x1 in {-2,2},
    # x2 in {-1,1}, x3 = 0 — exactly zero means, exact variances
    for _ in range(400):
        rows.append(([rng.choice([-3.0, 3.0]), rng.choice([-2.0, 2.0]),
                      rng.choice([-1.0, 1.0]), 0.0],))
    df = spark.createDataFrame(rows, "v array<double>")
    r = embedding_spectrum(df, "v").collect()[0]
    # population covariance estimates converge to diag(9,4,1,0) but the
    # SAMPLE covariance with random signs wobbles; eigenvalues of an
    # (almost) diagonal matrix ~ the diagonal
    assert r["dim"] == 4 and r["n"] == 400
    assert r["total_var"] == pytest.approx(14.0, rel=0.15)
    assert r["top1_ratio"] == pytest.approx(9 / 14, rel=0.15)
    # 3 directions carry variance -> effective rank between 2 and 3.2
    assert 2.0 < r["effective_rank"] < 3.2
    assert 1.5 < r["participation_ratio"] < 2.5


def test_embedding_spectrum_rank1(spark):
    from dataprofiler_spark.operators.vectorstats import \
        embedding_spectrum

    rows = [([float(i % 5), 2.0 * (i % 5), 3.0 * (i % 5)],)
            for i in range(100)]
    df = spark.createDataFrame(rows, "v array<double>")
    r = embedding_spectrum(df, "v").collect()[0]
    # perfectly collinear dims -> rank-1 spectrum
    assert r["top1_ratio"] == pytest.approx(1.0, abs=1e-6)
    assert r["effective_rank"] == pytest.approx(1.0, abs=1e-3)


def test_iv_summary_vs_python(spark, nframe):
    from dataprofiler_spark.operators.validators import iv_summary

    lab = nframe.selectExpr("a", "b", "v is not null and v > 100 as y")
    got = {r["feature"]: r for r in
           iv_summary(lab, ["a", "b"], "y").collect()}
    rows = [(x[1], x[2], x[3] is not None and x[3] > 100)
            for x in _num_rows(7)]
    for fi, fname in ((0, "a"), (1, "b")):
        cats = Counter(("(null)" if r[fi] is None else str(r[fi]))
                       for r in rows)
        k = len(cats)
        P = sum(1 for r in rows if r[2])
        N = len(rows) - P
        iv = 0.0
        for c in cats:
            np_ = sum(1 for r in rows
                      if ("(null)" if r[fi] is None else str(r[fi])) == c
                      and r[2])
            nn = cats[c] - np_
            ps = (np_ + 0.5) / (P + 0.5 * k)
            ns = (nn + 0.5) / (N + 0.5 * k)
            iv += (ps - ns) * math.log(ps / ns)
        g = got[fname]
        assert g["k"] == k
        assert g["iv"] == pytest.approx(iv, abs=1e-5)


def test_lm_divergence_vs_python(spark):
    from dataprofiler_spark.operators.textanalysis import lm_divergence

    rng = random.Random(31)
    wa = ["alpha", "beta", "gamma", "delta", "eps"]
    wb = ["alpha", "beta", "zeta", "eta"]
    rows_a = [(i, " ".join(rng.choice(wa) for _ in range(20)))
              for i in range(40)]
    rows_b = [(i, " ".join(rng.choice(wb) for _ in range(15)))
              for i in range(30)]
    schema = "id long, text string"
    da = spark.createDataFrame(rows_a, schema)
    db = spark.createDataFrame(rows_b, schema)
    r = lm_divergence(da, db, "text").collect()[0]

    ca, cb = Counter(), Counter()
    for _, t in rows_a:
        ca.update(t.split())
    for _, t in rows_b:
        cb.update(t.split())
    vocab = sorted(set(ca) | set(cb))
    k = len(vocab)
    na, nb = sum(ca.values()), sum(cb.values())
    pa = {w: (ca.get(w, 0) + 0.5) / (na + 0.5 * k) for w in vocab}
    pb = {w: (cb.get(w, 0) + 0.5) / (nb + 0.5 * k) for w in vocab}
    kl_ab = sum(pa[w] * math.log(pa[w] / pb[w]) for w in vocab)
    kl_ba = sum(pb[w] * math.log(pb[w] / pa[w]) for w in vocab)
    js = 0.0
    for w in vocab:
        m = (pa[w] + pb[w]) / 2
        js += 0.5 * pa[w] * math.log(pa[w] / m) \
            + 0.5 * pb[w] * math.log(pb[w] / m)
    assert r["vocab"] == k
    assert r["n_tokens_a"] == na and r["n_tokens_b"] == nb
    assert r["kl_ab"] == pytest.approx(kl_ab, abs=1e-5)
    assert r["kl_ba"] == pytest.approx(kl_ba, abs=1e-5)
    assert r["js"] == pytest.approx(js, abs=1e-5)
    # identical corpora -> zero divergence
    z = lm_divergence(da, da, "text").collect()[0]
    assert z["kl_ab"] == 0.0 and z["js"] == 0.0


def test_grouped_quantiles_vs_python(spark, nframe):
    from dataprofiler_spark.operators.histogram import grouped_quantiles

    lab = nframe.selectExpr("cast(a % 3 as string) as g", "v")
    got = {(r["group"], r["prob"]): r["value"] for r in
           grouped_quantiles(lab, "g", "v", [0.25, 0.5, 0.75]).collect()}
    per = defaultdict(list)
    for x in _num_rows(7):
        g = "(null)" if x[1] is None else str(x[1] % 3)
        if x[3] is not None:
            per[g].append(float(x[3]))
    for g, vals in per.items():
        vals.sort()
        n = len(vals)
        for p in (0.25, 0.5, 0.75):
            i = (n - 1) * p
            lo, hi = int(math.floor(i)), int(math.ceil(i))
            want = vals[lo] + (vals[hi] - vals[lo]) * (i - lo)
            assert got[(g, p)] == pytest.approx(want, abs=1e-6), (g, p)


def test_type_cooccurrence_vs_python(spark, eframe):
    from dataprofiler_spark.operators.events import type_cooccurrence

    got = {(r["type_a"], r["type_b"]): r for r in
           type_cooccurrence(eframe).collect()}
    per_user = defaultdict(set)
    for u, ts, et in _event_rows(11):
        per_user[u].add(et)
    n_users = len(per_user)
    solo = Counter()
    both = Counter()
    for u, types in per_user.items():
        for t in types:
            solo[t] += 1
        ts_ = sorted(types)
        for i in range(len(ts_)):
            for j in range(i + 1, len(ts_)):
                both[(ts_[i], ts_[j])] += 1
    assert set(got) == set(both)
    for (a, b), nb in both.items():
        g = got[(a, b)]
        assert g["n_users_both"] == nb
        assert g["n_users_a"] == solo[a] and g["n_users_b"] == solo[b]
        assert g["support"] == pytest.approx(nb / n_users, abs=1e-6)
        lift = (nb / n_users) / ((solo[a] / n_users) * (solo[b] / n_users))
        assert g["lift"] == pytest.approx(lift, abs=1e-4)


def test_type_cooccurrence_single_type_user(spark):
    # Regression (ADVICE r7): a user with exactly ONE distinct type made
    # sequence(1, size-1) = sequence(1, 0) -> descending [1, 0], and the
    # pair expansion threw INVALID_ARRAY_INDEX_IN_ELEMENT_AT. Such users
    # must simply contribute no pairs (oracle self-join a.t < b.t agrees).
    from dataprofiler_spark.operators.events import type_cooccurrence

    df = spark.createDataFrame(
        [("u1", "click"), ("u1", "click"),          # single-type user
         ("u2", "click"), ("u2", "view"),
         ("u3", "view")],                            # single-type user
        "user_id string, event_type string")
    rows = type_cooccurrence(df).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["type_a"], r["type_b"]) == ("click", "view")
    assert r["n_users_a"] == 2 and r["n_users_b"] == 2
    assert r["n_users_both"] == 1
    # all-single-type input: zero pairs, no crash
    solo_only = spark.createDataFrame(
        [("u1", "a"), ("u2", "b")], "user_id string, event_type string")
    assert type_cooccurrence(solo_only).count() == 0


def test_quantile_shift_vs_python(spark, nframe):
    from dataprofiler_spark.operators.drift import quantile_shift

    a = nframe.where("id % 2 = 0").select("v")
    b = nframe.where("id % 2 = 1").select("v")
    got = {r["prob"]: r for r in
           quantile_shift(a, b, "v", [0.25, 0.5, 0.75]).collect()}
    va = sorted(float(x[3]) for x in _num_rows(7)
                if x[0] % 2 == 0 and x[3] is not None)
    vb = sorted(float(x[3]) for x in _num_rows(7)
                if x[0] % 2 == 1 and x[3] is not None)

    def q(vals, p):
        i = (len(vals) - 1) * p
        lo, hi = int(math.floor(i)), int(math.ceil(i))
        return vals[lo] + (vals[hi] - vals[lo]) * (i - lo)

    for p in (0.25, 0.5, 0.75):
        qa, qb = q(va, p), q(vb, p)
        g = got[p]
        assert g["q_a"] == pytest.approx(qa, abs=1e-6)
        assert g["q_b"] == pytest.approx(qb, abs=1e-6)
        assert g["shift"] == pytest.approx(qb - qa, abs=1e-6)
        if qa == 0:
            assert g["rel_shift"] is None      # undefined at q_a = 0
        else:
            assert g["rel_shift"] == pytest.approx(
                (qb - qa) / abs(qa), abs=1e-5)


def test_null_rate_by_day_vs_python(spark):
    from dataprofiler_spark.operators.events import null_rate_by_day

    rng = random.Random(41)
    base = datetime.datetime(2024, 5, 1)
    rows = []
    for i in range(400):
        ts = base + datetime.timedelta(days=rng.randrange(6),
                                       seconds=rng.randrange(86400))
        v = rng.choice([None, 1.0, 2.0])
        u = rng.choice([None, rng.randrange(5)])
        rows.append((u, ts, v))
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
    got = {(r["day"], r["column"]): r for r in
           null_rate_by_day(df, "ts", ["user_id", "value"]).collect()}
    per = defaultdict(lambda: defaultdict(lambda: [0, 0]))
    for u, ts, v in rows:
        d = ts.date().isoformat()
        for col, x in (("user_id", u), ("value", v)):
            per[d][col][0] += 1
            per[d][col][1] += (x is None)
    for d, cols in per.items():
        for col, (n, nn) in cols.items():
            g = got[(d, col)]
            assert g["n"] == n and g["n_null"] == nn
            assert g["null_rate"] == pytest.approx(nn / n, abs=1e-6)


def test_session_stats_vs_python(spark, eframe):
    from dataprofiler_spark.operators.events import session_stats

    r = session_stats(eframe, gap_minutes=30).collect()[0]
    seqs = defaultdict(list)
    for u, ts, et in _event_rows(11):
        seqs[u].append(ts)
    sessions = []
    for u, tss in seqs.items():
        tss.sort()
        start = prev = tss[0]
        n = 1
        for t in tss[1:]:
            if (t - prev).total_seconds() > 1800:
                sessions.append((n, (prev - start).total_seconds()))
                start = t
                n = 0
            n += 1
            prev = t
        sessions.append((n, (prev - start).total_seconds()))
    n_sessions = len(sessions)
    evs = [n for n, _ in sessions]
    durs = sorted(d for _, d in sessions)

    def q(vals, p):
        i = (len(vals) - 1) * p
        lo, hi = int(math.floor(i)), int(math.ceil(i))
        return vals[lo] + (vals[hi] - vals[lo]) * (i - lo)

    assert r["n_sessions"] == n_sessions
    assert r["n_users"] == len(seqs)
    assert r["mean_events"] == pytest.approx(
        sum(evs) / n_sessions, abs=1e-6)
    assert r["median_duration_s"] == pytest.approx(q(durs, 0.5), abs=1e-4)
    assert r["p95_duration_s"] == pytest.approx(q(durs, 0.95), abs=1e-4)


def test_top_terms_by_group_vs_python(spark):
    from dataprofiler_spark.operators.textanalysis import \
        top_terms_by_group

    rng = random.Random(53)
    vocab = ["data", "spark", "model", "train", "eval", "loss"]
    rows = []
    for i in range(200):
        src = f"s{i % 3}"
        rows.append((i, src,
                     " ".join(rng.choice(vocab) for _ in range(12))))
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {(r["group"], r["rank"]): r for r in
           top_terms_by_group(df, "source", "text", k=3).collect()}
    per = defaultdict(Counter)
    tot = Counter()
    for _, src, t in rows:
        per[src].update(t.split())
        tot[src] += len(t.split())
    for src, c in per.items():
        ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        for i, (term, n) in enumerate(ranked, 1):
            g = got[(src, i)]
            assert g["term"] == term and g["tf"] == n
            assert g["share"] == pytest.approx(n / tot[src], abs=1e-6)


def test_counts_cdf_parallel_matches_global_window(spark, monkeypatch):
    """r12/r13: BOTH counts_cdf arms (small single-window, large
    range-chunked parallel prefix sum) must reproduce the single-task
    global ordered window EXACTLY (long arithmetic), keyed and unkeyed,
    including duplicate counts, negative values and rider columns —
    and the large arm must stay correct with exchange reuse DISABLED
    (r12 ADVICE high/medium: the r12 shape silently corrupted offsets
    whenever the two range exchanges didn't physically unify, which
    rider-column pruning guaranteed)."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from dataprofiler_spark.operators import histogram as H

    rng = np.random.default_rng(3)
    rows = [(["a", "b", "c"][int(i % 3)], float(v), int(c))
            for i, (v, c) in enumerate(zip(
                np.round(rng.normal(0, 100, 500), 2),
                rng.integers(1, 9, 500)))]
    df = spark.createDataFrame(rows, "k string, v double, cnt long")

    def ref_keyed(vc):
        win = Window.partitionBy("k").orderBy("v")
        e = (vc.withColumn("c_end", F.sum("cnt").over(win))
             .withColumn("c_start", F.col("c_end") - F.col("cnt"))
             .withColumn("n", F.sum("cnt").over(Window.partitionBy("k"))))
        return {(r["k"], r["v"]): (r["c_start"], r["c_end"], r["n"])
                for r in e.collect()}

    def ref_unkeyed(vc, rider=None):
        e = (vc.withColumn("c_end", F.sum("cnt").over(Window.orderBy("v")))
             .withColumn("c_start", F.col("c_end") - F.col("cnt"))
             .withColumn("n", F.sum("cnt").over(
                 Window.partitionBy(F.lit(1)))))
        return {r["v"]: (r["c_start"], r["c_end"], r["n"])
                + ((r[rider],) if rider else ())
                for r in e.collect()}

    vc = df.groupBy("k", "v").agg(F.sum("cnt").alias("cnt"))
    vc1 = df.groupBy("v").agg(F.sum("cnt").alias("cnt"))
    # rider column (the roc_auc shape: an extra aggregate riding the
    # counts frame through the CDF)
    vcr = df.groupBy("v").agg(F.sum("cnt").alias("cnt"),
                              F.count(F.lit(1)).alias("pos"))

    for small_max in (65_536, 8):   # 8 forces the range-chunked arm
        monkeypatch.setattr(H, "CDF_SMALL_MAX_ROWS", small_max)
        act = {(r["k"], r["v"]): (r["c_start"], r["c_end"], r["n"])
               for r in H.counts_cdf(vc, keys=["k"]).collect()}
        assert act == ref_keyed(vc), f"keyed, small_max={small_max}"
        act1 = {r["v"]: (r["c_start"], r["c_end"], r["n"])
                for r in H.counts_cdf(vc1).collect()}
        assert act1 == ref_unkeyed(vc1), f"unkeyed, small_max={small_max}"
        actr = {r["v"]: (r["c_start"], r["c_end"], r["n"], r["pos"])
                for r in H.counts_cdf(vcr).collect()}
        assert actr == ref_unkeyed(vcr, "pos"), \
            f"rider, small_max={small_max}"

    # structural safety: the large arm may not depend on Spark unifying
    # the two range-exchange references — disable reuse and re-check
    monkeypatch.setattr(H, "CDF_SMALL_MAX_ROWS", 8)
    spark.conf.set("spark.sql.exchange.reuse", "false")
    try:
        actr = {r["v"]: (r["c_start"], r["c_end"], r["n"], r["pos"])
                for r in H.counts_cdf(vcr).collect()}
        assert actr == ref_unkeyed(vcr, "pos"), "rider, reuse disabled"
    finally:
        spark.conf.unset("spark.sql.exchange.reuse")
