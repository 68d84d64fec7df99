"""Oracle comparison mirroring the driver's check: row-count + schema
(column names) + order-insensitive value comparison."""

from __future__ import annotations

import math

import pandas as pd


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype(float)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name=""):
    a, b = normalize(spark_pdf), normalize(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: schema mismatch {list(a.columns)} vs {list(b.columns)}")
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for c in a.columns:
        if pd.api.types.is_float_dtype(a[c]) or pd.api.types.is_float_dtype(b[c]):
            av, bv = a[c].astype(float), b[c].astype(float)
            bad = [
                (i, x, y) for i, (x, y) in enumerate(zip(av, bv))
                if not (x == y or (math.isnan(x) and math.isnan(y)))
            ]
        else:
            bad = [(i, x, y) for i, (x, y) in enumerate(zip(a[c], b[c])) if x != y]
        assert not bad, f"{name}: column {c} mismatches (first 5): {bad[:5]}"
