"""CNN entity-labeler adapter (mapInPandas).

Reference: labelers/character_level_cnn_model.py — char-level CNN
(45-dim char embedding, Conv1D stack, softmax over 24 labels,
thresholded argmax; :204-920) driven through preprocessor/postprocessor
(data_processing.py). TensorFlow is NOT available in this environment, so
the model call is STUBBED; everything Spark-side is real:

* the sample bound (≤1000 rows/column, data_labeler_column_profile.py:33)
* Arrow-batched ``mapInPandas`` with the exact UDF signature a TF model
  needs (iterator of pandas DataFrames → per-cell label + confidence)
* the rank-vote column aggregation shared with the regex labeler

Swapping ``_stub_model_predict`` for a broadcast TF SavedModel changes no
Spark code — the weights broadcast once per executor, batches arrive as
pandas Series, predictions return per cell.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from dataprofiler_spark.labeler.regex_labeler import (LABEL_PATTERNS,
                                                      MAX_SAMPLE,
                                                      MIN_TOP_RATIO)

PRED_SCHEMA = "column string, cell string, label string, confidence double"


def _stub_model_predict(cells: pd.Series) -> pd.DataFrame:
    """STUB for the TF CharacterLevelCnnModel forward pass.

    Deterministic stand-in: regex label with confidence 1.0, UNKNOWN with
    0.0 otherwise — same output contract (label + confidence per cell) the
    CNN produces after its ThreshArgMax layer.
    """
    import re

    labels, confs = [], []
    compiled = [(lbl, re.compile(pat)) for lbl, pat in LABEL_PATTERNS.items()]
    for v in cells.astype(str):
        for lbl, rx in compiled:
            if rx.match(v):
                labels.append(lbl)
                confs.append(1.0)
                break
        else:
            labels.append("UNKNOWN")
            confs.append(0.0)
    return pd.DataFrame({"label": labels, "confidence": confs})


def predict_cells(df: DataFrame, cols: list[str],
                  max_sample: int = MAX_SAMPLE) -> DataFrame:
    """Per-cell predictions for ≤max_sample rows per column via ONE
    mapInPandas over a melted sample (column, cell)."""
    samples = None
    for c in cols:
        s = (df.select(F.lit(c).alias("column"),
                       F.col(c).cast("string").alias("cell"))
             .where(F.col(c).isNotNull()).limit(max_sample))
        samples = s if samples is None else samples.unionAll(s)

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            preds = _stub_model_predict(pdf["cell"])
            yield pd.DataFrame({
                "column": pdf["column"].values,
                "cell": pdf["cell"].values,
                "label": preds["label"].values,
                "confidence": preds["confidence"].values,
            })

    return samples.mapInPandas(infer, schema=PRED_SCHEMA)


def column_label_vote(preds: DataFrame) -> DataFrame:
    """(column, label, avg_confidence): rank vote over per-cell predictions
    (data_labeler_column_profile.py:395-440 semantics — top label by vote
    count; 'could not determine' below the 0.35 ratio)."""
    counts = (preds.groupBy("column", "label")
              .agg(F.count(F.lit(1)).alias("votes"),
                   F.avg("confidence").alias("avg_confidence")))
    totals = preds.groupBy("column").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql.window import Window
    w = Window.partitionBy("column").orderBy(F.desc("votes"), F.asc("label"))
    top = (counts.withColumn("rank", F.row_number().over(w))
           .where(F.col("rank") == 1)
           .join(totals, "column"))
    return top.select(
        "column",
        F.when(F.col("votes") / F.col("n") < MIN_TOP_RATIO,
               "could not determine").otherwise(F.col("label")).alias("label"),
        F.round("avg_confidence", 6).alias("avg_confidence"),
    )
