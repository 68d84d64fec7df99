"""Labeler evaluation surface (labeler/evaluation.py) — the reference's
evaluate_accuracy / classification_report semantics
(labelers/labeler_utils.py:80-215,
labelers/classification_report_utils.py:57-407) over a distributed
confusion aggregation."""

from __future__ import annotations

import math

import numpy as np
import pytest

from dataprofiler_spark.labeler import evaluation as ev


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "truth string, pred string")


# Worked example (sklearn's own doc example):
# y_true = [0 1 2 2 2], y_pred = [0 0 2 2 1] with labels a/b/c.
_PAIRS = [("a", "a"), ("b", "a"), ("c", "c"), ("c", "c"), ("c", "b")]


def test_confusion_counts_and_matrix(spark):
    counts = ev.confusion_counts(_pairs_df(spark, _PAIRS), "truth", "pred")
    assert counts == [("a", "a", 1), ("b", "a", 1), ("c", "b", 1),
                      ("c", "c", 2)]
    conf = ev.confusion_matrix(counts, ["a", "b", "c"])
    assert conf.tolist() == [[1, 0, 0], [1, 0, 0], [0, 1, 2]]
    # pairs outside the label universe are dropped (reference encodes
    # labels to indexes first — unknown labels never reach the matrix)
    conf2 = ev.confusion_matrix(counts + [("z", "a", 5)], ["a", "b", "c"])
    assert conf2.sum() == 5


def test_classification_report_sklearn_example(spark):
    """Exact values from sklearn's classification_report doc example
    (the reference's report is sklearn's math re-hosted)."""
    conf = ev.confusion_matrix(
        ev.confusion_counts(_pairs_df(spark, _PAIRS), "truth", "pred"),
        ["a", "b", "c"])
    rep = ev.classification_report(conf, ["a", "b", "c"])
    assert rep["a"] == {"precision": 0.5, "recall": 1.0,
                        "f1-score": pytest.approx(2 / 3), "support": 1}
    assert rep["b"] == {"precision": 0.0, "recall": 0.0,
                        "f1-score": 0.0, "support": 1}
    assert rep["c"]["precision"] == 1.0
    assert rep["c"]["recall"] == pytest.approx(2 / 3)
    assert rep["c"]["f1-score"] == pytest.approx(0.8)
    # full label set -> micro row is the scalar accuracy (3/5)
    assert rep["accuracy"] == pytest.approx(0.6)
    assert rep["macro avg"]["precision"] == pytest.approx(0.5)
    assert rep["macro avg"]["f1-score"] == pytest.approx(
        (2 / 3 + 0.0 + 0.8) / 3)
    assert rep["weighted avg"]["f1-score"] == pytest.approx(
        (2 / 3 * 1 + 0 * 1 + 0.8 * 3) / 5)
    assert rep["weighted avg"]["support"] == 5


def test_omitted_labels_micro_avg_key(spark):
    """With a label subset the micro row is keyed 'micro avg' (a dict),
    not 'accuracy' — reference micro_is_accuracy logic (:316-320)."""
    conf = ev.confusion_matrix(
        ev.confusion_counts(_pairs_df(spark, _PAIRS), "truth", "pred"),
        ["a", "b", "c"])
    rep = ev.classification_report(conf, ["a", "b", "c"],
                                   included=["a", "c"])
    assert "accuracy" not in rep
    # kept labels a, c: tp=1+2, pred=2+2, true=1+3
    assert rep["micro avg"]["precision"] == pytest.approx(3 / 4)
    assert rep["micro avg"]["recall"] == pytest.approx(3 / 4)
    assert rep["micro avg"]["support"] == 4
    assert "b" not in rep


def test_evaluate_accuracy_macro_adjustment(spark):
    """The positive-support macro rescale (labeler_utils.py:180-200):
    a fitted label with ZERO support must not drag the macro average;
    sklearn would average its 0.0 row in, the reference divides it
    back out."""
    pairs = [("a", "a")] * 3 + [("b", "a")] + [("b", "b")] * 2
    f1, rep = ev.evaluate_accuracy(
        _pairs_df(spark, pairs), "truth", "pred",
        labels=["a", "b", "zero_support"], omitted_labels=())
    # per-label: a P=3/4 R=1 F1=6/7; b P=1 R=2/3 F1=0.8; zero 0/0/0
    raw_macro_f1 = (6 / 7 + 0.8 + 0.0) / 3
    assert rep["macro avg"]["f1-score"] == pytest.approx(
        raw_macro_f1 * 3 / 2)
    assert f1 == pytest.approx(raw_macro_f1 * 3 / 2)
    assert rep["zero_support"]["support"] == 0


def test_evaluate_accuracy_omits_default_labels(spark):
    pairs = [("a", "a"), ("UNKNOWN", "a"), ("a", "UNKNOWN"),
             ("UNKNOWN", "UNKNOWN")]
    f1, rep = ev.evaluate_accuracy(_pairs_df(spark, pairs), "truth",
                                   "pred")
    assert "UNKNOWN" not in rep
    assert "micro avg" in rep          # subset -> not accuracy-keyed
    assert rep["a"]["precision"] == pytest.approx(0.5)
    assert rep["a"]["recall"] == pytest.approx(0.5)


def test_evaluate_accuracy_no_positive_support_is_nan(spark):
    pairs = [("UNKNOWN", "a"), ("UNKNOWN", "UNKNOWN")]
    f1, rep = ev.evaluate_accuracy(
        _pairs_df(spark, pairs), "truth", "pred", labels=["a", "UNKNOWN"])
    assert math.isnan(rep["macro avg"]["f1-score"])
    assert math.isnan(f1)


def test_f1_report_str_layout():
    rep = {
        "a": {"precision": 0.5, "recall": 1.0, "f1-score": 2 / 3,
              "support": 1},
        "accuracy": 0.6,
        "macro avg": {"precision": 0.5, "recall": 0.5, "f1-score": 0.33,
                      "support": 5},
        "weighted avg": {"precision": 0.75, "recall": 0.5,
                         "f1-score": 0.6, "support": 5},
    }
    s = ev.f1_report_dict_to_str(rep, ["a"])
    lines = [ln for ln in s.splitlines() if ln.strip()]
    assert lines[0].split() == ["precision", "recall", "f1-score",
                                "support"]
    assert lines[1].split() == ["a", "0.50", "1.00", "0.67", "1"]
    assert lines[2].split() == ["accuracy", "0.60"]
    assert lines[-1].split()[:2] == ["weighted", "avg"]


def test_fit_returns_f1_report(spark):
    from dataprofiler_spark.labeler.trainable import TrainableDataLabeler

    rows = ([(f"{i}", "num") for i in range(100, 160)]
            + [(f"w{i}x", "word") for i in range(60)])
    df = spark.createDataFrame(rows, "x string, y string")
    m = TrainableDataLabeler()
    out = m.fit(df, "x", "y", validation_split=0.0)
    assert set(out) >= {"train_acc", "f1", "f1_report"}
    assert out["f1"] == pytest.approx(1.0)
    assert out["f1_report"]["num"]["support"] == 60
    # the standalone evaluate API (the reference's evaluate_accuracy)
    f1, rep = m.evaluate(df, "x", "y")
    assert f1 == pytest.approx(1.0)
    assert rep["word"]["f1-score"] == pytest.approx(1.0)


def test_confusion_guard_categorical(spark):
    df = spark.createDataFrame(
        [(str(i), str(i + 1)) for i in range(40)],
        "truth string, pred string")
    counts = ev.confusion_counts(df, "truth", "pred", max_labels=7)
    assert len(counts) == 40          # 40 <= 7^2: below the guard
    with pytest.raises(ValueError, match="categorical"):
        ev.confusion_counts(df, "truth", "pred", max_labels=2)


def test_confusion_matrix_file(spark, tmp_path):
    """confusion_matrix_file writes the reference's CSV layout
    (labeler_utils.py:155-175: 'true:' rows x 'pred:' columns)."""
    import pandas as pd

    p = str(tmp_path / "sub" / "conf.csv")
    ev.evaluate_accuracy(_pairs_df(spark, _PAIRS), "truth", "pred",
                         labels=["a", "b", "c"], omitted_labels=(),
                         confusion_matrix_file=p)
    m = pd.read_csv(p, index_col=0)
    assert list(m.columns) == ["pred:a", "pred:b", "pred:c"]
    assert list(m.index) == ["true:a", "true:b", "true:c"]
    assert m.loc["true:c", "pred:c"] == 2
    assert m.loc["true:b", "pred:a"] == 1
    assert int(m.to_numpy().sum()) == len(_PAIRS)
