"""Naive-Bayes document classifier (operators/nbclassify.py): fit
semantics (priors, vocabulary cutoff, OOV smoothing), prediction
argmax/tie rules, NULL handling, and the label cap. Cross-engine hash
parity is covered by test_oracle_parity via
``nb_source_confusion_documents``."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.operators import nbclassify as nbc


def _toy(spark):
    rows = [
        (0, "cat cat purr", "pet"),
        (1, "cat purr purr", "pet"),
        (2, "stock stock yield", "fin"),
        (3, "stock yield yield", "fin"),
    ]
    return spark.createDataFrame(rows, "id long, text string, lbl string")


def test_fit_and_predict_separable(spark):
    df = _toy(spark)
    model = nbc.nb_fit(df, "text", "lbl", vocab_cap=100)
    assert model["labels"] == ["fin", "pet"]
    assert set(model["vocab"]) == {"cat", "purr", "stock", "yield"}
    preds = {r["id"]: r["pred_label"] for r in
             nbc.nb_predict(df, "id", "text", model).collect()}
    assert preds == {0: "pet", 1: "pet", 2: "fin", 3: "fin"}


def test_oov_and_empty_text_fall_back_to_priors(spark):
    df = _toy(spark)
    # skew priors: 3 pet docs vs 1 fin doc
    skew = df.union(spark.createDataFrame(
        [(4, "cat", "pet")], "id long, text string, lbl string")) \
        .where(F.col("id") != 3)
    model = nbc.nb_fit(skew, "text", "lbl", vocab_cap=100)
    unseen = spark.createDataFrame(
        [(10, "zebra quantum"), (11, ""), (12, None)],
        "id long, text string")
    preds = {r["id"]: r["pred_label"] for r in
             nbc.nb_predict(unseen, "id", "text", model).collect()}
    # all-OOV and empty/NULL texts follow the majority prior
    assert preds == {10: "pet", 11: "pet", 12: "pet"}


def test_vocab_cutoff_is_frequency_then_token(spark):
    df = _toy(spark)
    model = nbc.nb_fit(df, "text", "lbl", vocab_cap=2)
    # counts: purr=3, stock=3, yield=3, cat=3 → all tie at 3; token
    # asc breaks it: cat, purr
    assert model["vocab"] == ["cat", "purr"]


def test_null_labels_excluded_and_cap(spark):
    df = _toy(spark).union(spark.createDataFrame(
        [(9, "noise words", None)], "id long, text string, lbl string"))
    model = nbc.nb_fit(df, "text", "lbl", vocab_cap=100)
    assert "noise" not in model["vocab"]

    old = nbc.MAX_LABELS
    nbc.MAX_LABELS = 1
    try:
        with pytest.raises(ValueError, match="MAX_LABELS"):
            nbc.nb_fit(df, "text", "lbl")
    finally:
        nbc.MAX_LABELS = old
    with pytest.raises(ValueError, match="no labeled rows"):
        nbc.nb_fit(df.where(F.col("lbl").isNull()), "text", "lbl")


def test_confusion_diagonal_on_separable(spark):
    df = _toy(spark)
    out = {(r["label"], r["pred_label"]): r["n"] for r in
           nbc.nb_confusion(df, "id", "text", "lbl",
                            vocab_cap=100).collect()}
    assert out == {("pet", "pet"): 2, ("fin", "fin"): 2}


def test_state_cell_cap(spark):
    df = _toy(spark)
    old = nbc.MAX_STATE_CELLS
    nbc.MAX_STATE_CELLS = 3
    try:
        with pytest.raises(ValueError, match="MAX_STATE_CELLS"):
            nbc.nb_fit(df, "text", "lbl", vocab_cap=100)
    finally:
        nbc.MAX_STATE_CELLS = old
