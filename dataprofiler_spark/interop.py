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
            g2 = _f(p.get("_biased_kurtosis"), 0.0)
            m3 = g1 * n * (m2 / n) ** 1.5
            m4 = ((g2 + 3.0) * n * (m2 / n) ** 2) if g2 is not None else 0.0
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
    selected = None
    for t in _TYPE_ORDER:  # exact-ratio pass (compiler report semantics)
        if t in type_counts and sample_size and \
                type_counts[t] == sample_size:
            selected = t
            break
    if selected is None and type_counts:
        best = max(type_counts.values())
        selected = next(t for t in _TYPE_ORDER
                        if type_counts.get(t, -1) == best)

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
    if selected == "datetime" or (_i((prim_data.get("datetime") or {})
                                     .get("match_count")) and
                                  selected == "datetime"):
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
