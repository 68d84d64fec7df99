"""CNN entity-labeler adapter (mapInPandas) — REAL inference, no TF.

Reference: labelers/character_level_cnn_model.py — char-level CNN
(64-dim char embedding, 4×Conv1D(48,k=13)+BN, 2×Dense(96), softmax over
24 labels, thresholded argmax; :204-920) driven through preprocessor/
postprocessor (data_processing.py). TensorFlow is absent here, so the
forward pass runs in pure NumPy (labeler/np_cnn.py) on the reference's
OWN trained weights (resources/labelers/structured_model/model.keras,
read via the in-repo mini HDF5 parser) — detecting PERSON / ADDRESS /
US_STATE and the other learned labels the regexes cannot express.

Spark side:
* the sample bound (≤1000 rows/column, data_labeler_column_profile.py:33)
* Arrow-batched ``mapInPandas``: each python worker loads the ~700 KB
  weights once per process (lru_cache) and scores its batches; at scale
  the weight file must be visible to executors (ship it or point
  DATAPROFILER_SPARK_CNN_WEIGHTS at a shared path)
* the rank-vote column aggregation shared with the regex labeler

When the weight file is unreadable the adapter degrades to the regex
stand-in (``_stub_model_predict``) with the same output contract.
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


def _model_predict(cells: pd.Series,
                   model_path: str | None = None) -> pd.DataFrame:
    """CharacterLevelCnnModel forward pass in NumPy — the packaged
    reference weights, or a USER model directory (CharLoadTFModel
    parity) when ``model_path`` is given. A missing user model raises
    (the user asked for that model by name); only the packaged default
    degrades to the regex stand-in."""
    from dataprofiler_spark.labeler.np_cnn import (load_default_model,
                                                   load_user_model_cached)

    model = (load_user_model_cached(model_path) if model_path
             else load_default_model())
    if model is None:
        return _stub_model_predict(cells)
    preds = model.predict_cells(list(cells.astype(str)))
    return pd.DataFrame({"label": [p[0] for p in preds],
                         "confidence": [round(p[1], 6) for p in preds]})


def _stub_model_predict(cells: pd.Series) -> pd.DataFrame:
    """Regex stand-in for the CNN forward pass (used only when the weight
    file is unreadable): regex label with confidence 1.0, UNKNOWN with
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
                  max_sample: int = MAX_SAMPLE,
                  model_path: str | None = None) -> DataFrame:
    """Per-cell predictions for ≤max_sample rows per column via ONE
    mapInPandas over a melted sample (column, cell). ``model_path``
    selects a user-supplied CharLoadTFModel-style directory (must be
    visible to executors at scale — ship it or use a shared path)."""
    samples = None
    for c in cols:
        s = (df.select(F.lit(c).alias("column"),
                       F.col(c).cast("string").alias("cell"))
             .where(F.col(c).isNotNull()).limit(max_sample))
        samples = s if samples is None else samples.unionAll(s)

    def infer(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            preds = _model_predict(pdf["cell"], model_path)
            yield pd.DataFrame({
                "column": pdf["column"].values,
                "cell": pdf["cell"].values,
                "label": preds["label"].values,
                "confidence": preds["confidence"].values,
            })

    from dataprofiler_spark.session import ensure_parallelism
    # compute-bound inference: spread the (small, limit-bounded) sample
    # across workers instead of one python process per source split
    return ensure_parallelism(samples).mapInPandas(infer, schema=PRED_SCHEMA)


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
