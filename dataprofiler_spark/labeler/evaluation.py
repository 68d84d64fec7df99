"""Labeler evaluation surface — distributed confusion matrix +
classification report (per-label precision/recall/F1/support with
micro/macro/weighted averages).

Reference: labelers/labeler_utils.py:80-215 ``evaluate_accuracy``
(confusion matrix over flattened predicted/true label sequences, the
omitted-labels filter, the positive-support macro adjustment, and the
returned ``(f1, f1_report)``), labelers/classification_report_utils.py
(``convert_confusion_matrix_to_MCM:11``, ``precision_recall_fscore_
support:57``, ``classification_report:227`` — sklearn's math re-hosted
onto a precomputed confusion matrix), and ``f1_report_dict_to_str``
(labeler_utils.py:23-78).

Spark design: the reference flattens every predicted/true sequence into
two giant NumPy vectors on one node and builds the confusion matrix in
scipy batches — O(corpus) driver memory. Here the confusion matrix IS a
``groupBy(truth, predicted).count()``: one map-side-combined shuffle
whose result is bounded by n_labels² regardless of corpus size, so a
100 TB evaluation collects at most MAX_LABELS² tiny rows. All the
P/R/F1 arithmetic then runs on that driver-side matrix exactly as the
reference does (same zero-division-to-0 rules, same micro/macro/
weighted formulas, same positive-support macro adjustment).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_LABELS = 1000


def confusion_counts(df: DataFrame, truth_col: str, pred_col: str,
                     max_labels: int = MAX_LABELS) -> list[tuple[str, str, int]]:
    """Distributed confusion counts: ``groupBy(truth, pred).count()``.

    Returns [(truth, pred, n)] sorted by (truth, pred). NULL cells in
    either column are excluded (the reference evaluates aligned encoded
    sequences, where unlabeled positions don't exist). The collect is
    bounded by max_labels² by construction.
    """
    counts = (df.select(F.col(truth_col).cast("string").alias("t"),
                        F.col(pred_col).cast("string").alias("p"))
              .where(F.col("t").isNotNull() & F.col("p").isNotNull())
              .groupBy("t", "p").agg(F.count(F.lit(1)).alias("n"))
              .limit(max_labels * max_labels + 1)
              .collect())
    if len(counts) > max_labels * max_labels:
        raise ValueError(
            f"confusion_counts: more than {max_labels}^2 distinct "
            f"(truth, predicted) pairs — the label columns must be "
            f"categorical")
    return sorted((r["t"], r["p"], int(r["n"])) for r in counts)


def confusion_matrix(counts: list[tuple[str, str, int]],
                     labels: list[str]) -> np.ndarray:
    """Square matrix C with C[i, j] = count(truth=labels[i],
    pred=labels[j]) — sklearn orientation (labeler_utils.py:137-139).
    Pairs whose truth or pred is outside ``labels`` are dropped, as the
    reference's index-encoded matrix never sees them."""
    idx = {l: i for i, l in enumerate(labels)}
    mat = np.zeros((len(labels), len(labels)), dtype=np.int64)
    for t, p, n in counts:
        i, j = idx.get(t), idx.get(p)
        if i is not None and j is not None:
            mat[i, j] += n
    return mat


def _prf_from_conf(conf: np.ndarray, keep: list[int]):
    """Per-label (precision, recall, f1, support) over the kept label
    indexes — classification_report_utils.py:57-225 semantics: MCM from
    the confusion matrix, zero-division → 0."""
    tp = np.diag(conf).astype(np.float64)
    pred_sum = conf.sum(axis=0).astype(np.float64)   # tp + fp
    true_sum = conf.sum(axis=1).astype(np.float64)   # tp + fn
    tp, pred_sum, true_sum = tp[keep], pred_sum[keep], true_sum[keep]
    with np.errstate(divide="ignore", invalid="ignore"):
        precision = np.where(pred_sum > 0, tp / np.where(pred_sum > 0,
                                                         pred_sum, 1), 0.0)
        recall = np.where(true_sum > 0, tp / np.where(true_sum > 0,
                                                      true_sum, 1), 0.0)
    denom = precision + recall
    denom_safe = np.where(denom == 0.0, 1.0, denom)
    f1 = 2 * precision * recall / denom_safe
    return precision, recall, f1, true_sum


def classification_report(conf: np.ndarray, labels: list[str],
                          included: list[str] | None = None) -> dict:
    """The reference's ``classification_report(output_dict=True)``
    (classification_report_utils.py:227-407): per-label rows plus
    micro/macro/weighted averages. ``included`` restricts the report to
    a label subset (the omitted-labels path); when it covers every
    label the micro row is keyed ``accuracy`` and holds the scalar
    accuracy, exactly as the reference emits it."""
    if included is None:
        included = list(labels)
    keep = [i for i, l in enumerate(labels) if l in set(included)]
    if not keep:   # every label omitted: degenerate all-zero report
        zero = {"precision": 0.0, "recall": 0.0, "f1-score": 0.0,
                "support": 0}
        return {"micro avg": dict(zero), "macro avg": dict(zero),
                "weighted avg": dict(zero)}
    kept_names = [labels[i] for i in keep]
    p, r, f1, s = _prf_from_conf(conf, keep)
    report: dict = {}
    for i, name in enumerate(kept_names):
        report[name] = {"precision": float(p[i]), "recall": float(r[i]),
                        "f1-score": float(f1[i]), "support": int(s[i])}
    support_total = int(s.sum())

    # micro: summed sufficient statistics over the kept labels
    tp_all = np.diag(conf).astype(np.float64)
    micro_tp = float(tp_all[keep].sum())
    micro_pred = float(conf.sum(axis=0).astype(np.float64)[keep].sum())
    micro_true = float(conf.sum(axis=1).astype(np.float64)[keep].sum())
    mp = micro_tp / micro_pred if micro_pred > 0 else 0.0
    mr = micro_tp / micro_true if micro_true > 0 else 0.0
    mf = 2 * mp * mr / (mp + mr) if (mp + mr) > 0 else 0.0
    micro_is_accuracy = len(keep) == len(labels)
    if micro_is_accuracy:
        report["accuracy"] = mp   # scalar, reference :403-405
    else:
        report["micro avg"] = {"precision": mp, "recall": mr,
                               "f1-score": mf, "support": support_total}
    report["macro avg"] = {
        "precision": float(np.average(p)), "recall": float(np.average(r)),
        "f1-score": float(np.average(f1)), "support": support_total}
    if s.sum() == 0:
        wavg = {"precision": 0.0, "recall": 0.0, "f1-score": 0.0,
                "support": 0}
    else:
        wavg = {"precision": float(np.average(p, weights=s)),
                "recall": float(np.average(r, weights=s)),
                "f1-score": float(np.average(f1, weights=s)),
                "support": support_total}
    report["weighted avg"] = wavg
    return report


def accuracy_from_counts(counts: list[tuple[str, str, int]]) -> float:
    """Scalar accuracy from confusion counts: diag / total — the same
    IEEE division ``F.avg`` of 0/1 ints performs, so a caller holding a
    confusion pass already paid for accuracy (no second scoring scan)."""
    total = sum(n for _, _, n in counts)
    if total == 0:
        return 0.0
    diag = sum(n for t, p, n in counts if t == p)
    return round(float(diag) / float(total), 6)


def evaluate_accuracy(df: DataFrame, truth_col: str, pred_col: str,
                      labels: list[str] | None = None,
                      omitted_labels: tuple[str, ...] = ("PAD", "UNKNOWN"),
                      verbose: bool = False,
                      confusion_matrix_file: str | None = None,
                      precomputed_counts: list[tuple[str, str, int]]
                      | None = None) -> tuple[float, dict]:
    """The reference's ``evaluate_accuracy`` (labeler_utils.py:80-215)
    over a DataFrame of (truth, predicted) label columns.

    One distributed ``groupBy(truth, pred).count()`` replaces the
    driver-side scipy confusion build; the report math is identical:
    omitted labels are excluded from the report rows AND from the micro
    average, and the macro average is rescaled onto the labels with
    positive support (reference :180-200 — sklearn keeps 0.0 rows for
    0-support labels in the mean; the reference divides them back out).
    Returns (f1, f1_report) with f1 = the adjusted macro-avg F1.
    ``precomputed_counts`` skips the scan when the caller already ran
    ``confusion_counts`` on the same frame (e.g. to derive accuracy).
    """
    counts = (precomputed_counts if precomputed_counts is not None
              else confusion_counts(df, truth_col, pred_col))
    if labels is None:
        labels = sorted({t for t, _, _ in counts}
                        | {p for _, p, _ in counts})
    conf = confusion_matrix(counts, labels)
    if confusion_matrix_file:
        # reference labeler_utils.py:155-175: CSV with 'true:'-prefixed
        # index rows and 'pred:'-prefixed columns, over ALL labels
        import os

        import pandas as pd
        d = os.path.dirname(confusion_matrix_file)
        if d and not os.path.isdir(d):
            os.makedirs(d)
        pd.DataFrame(conf,
                     index=[f"true:{l}" for l in labels],
                     columns=[f"pred:{l}" for l in labels]
                     ).to_csv(confusion_matrix_file)
    included = [l for l in labels if l not in set(omitted_labels)]
    report = classification_report(conf, labels, included)

    n_pos = sum(1 for k, v in report.items()
                if k not in ("accuracy", "macro avg", "weighted avg",
                             "micro avg") and v["support"])
    for metric in ("precision", "recall", "f1-score"):
        if not n_pos:
            report["macro avg"][metric] = float("nan")
        elif not included:
            report["macro avg"][metric] = 0
        else:
            report["macro avg"][metric] *= float(len(included)) / n_pos

    f1 = (report["macro avg"]["f1-score"] if "macro avg" in report
          else report["accuracy"])
    if verbose:
        print(f1_report_dict_to_str(report, included or [""]))
        print(f"F1 Score: {f1}")
    return float(f1), report


def f1_report_dict_to_str(f1_report: dict, label_names: list[str]) -> str:
    """Formatted report printout — labeler_utils.py:23-78 layout."""
    sig_figs = 2
    headers = ["precision", "recall", "f1-score", "support"]
    width = max(max((len(n) for n in label_names), default=0),
                len("weighted avg"), sig_figs)
    head_fmt = "{:>{width}s} " + " {:>9}" * len(headers)
    report = head_fmt.format("", *headers, width=width) + "\n\n"
    row_fmt = ("{:>{width}s} " + " {:>9.{sig_figs}f}" * 3
               + " {:>9}\n")
    tail = "\n"
    for key, row in f1_report.items():
        if key not in ("accuracy", "macro avg", "weighted avg",
                       "micro avg"):
            report += row_fmt.format(
                key, row["precision"], row["recall"], row["f1-score"],
                row["support"], width=width, sig_figs=sig_figs)
        elif key == "accuracy":
            acc_fmt = ("{:>{width}s} " + " {:>9}" * 2
                       + " {:>9.{sig_figs}f}" + " {:>9}\n")
            tail += acc_fmt.format(key, "", "", row, "", width=width,
                                   sig_figs=sig_figs)
        else:
            tail += row_fmt.format(
                key, row["precision"], row["recall"], row["f1-score"],
                row["support"], width=width, sig_figs=sig_figs)
    return report + tail
