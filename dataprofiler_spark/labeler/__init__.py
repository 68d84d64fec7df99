"""DataLabeler facade — the reference's §3.3 entry point.

Reference: ``dp.DataLabeler(labeler_type=...)`` loads a packaged model
(labelers/data_labelers.py:89-131) and ``predict(data)`` runs
preprocess → model → postprocess (base_data_labeler.py:276-326). Here
the same surface dispatches over the Spark-native backends:

- ``model="cnn"`` — pure-NumPy forward pass of the reference's trained
  CharacterLevelCnnModel weights (np_cnn.py) via an Arrow-batched
  ``mapInPandas`` (cnn_adapter.py); falls back to regex when the
  weight file is absent.
- ``model="regex"`` — the 21-label RegexModel as Catalyst expressions
  (regex_labeler.py), JVM-side, no Python in the hot path.
- ``model="column_name"`` — header-only ColumnNameModel
  (column_name_model.py).

``labeler_type="structured"`` predicts per column and rank-votes a
label per column; ``"unstructured"`` extracts entity counts from a
text column. Training (`fit`) is out of scope (SURVEY §2.7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class DataLabeler:
    """Reference call shape::

        labeler = DataLabeler(labeler_type="structured")
        votes = labeler.predict(df)           # (column, label, ...)
    """

    def __init__(self, labeler_type: str = "structured",
                 model: str = "regex", model_path: str | None = None):
        if labeler_type not in ("structured", "unstructured"):
            raise ValueError(
                f"labeler_type must be structured|unstructured, "
                f"got {labeler_type!r}")
        if model not in ("regex", "cnn", "column_name"):
            raise ValueError(
                f"model must be regex|cnn|column_name, got {model!r}")
        if model_path is not None and model != "cnn":
            raise ValueError("model_path is only valid with model='cnn'")
        self.labeler_type = labeler_type
        self.model = model
        # CharLoadTFModel parity (reference char_load_tf_model.py):
        # a directory with the user's own trained same-family keras
        # artifact + label_mapping.json (+ model_parameters.json)
        self.model_path = model_path

    @property
    def labels(self) -> list[str]:
        from dataprofiler_spark.labeler.regex_labeler import LABEL_PATTERNS
        if self.model == "cnn":
            from dataprofiler_spark.labeler.np_cnn import (
                load_default_model, load_user_model_cached)
            m = (load_user_model_cached(self.model_path)
                 if self.model_path else load_default_model())
            if m is not None:
                return sorted(m.label_mapping)
        return sorted(LABEL_PATTERNS)

    def predict(self, df: DataFrame, cols: list[str] | None = None,
                text_col: str | None = None) -> DataFrame:
        """Structured: (column, label, avg_confidence)-style votes per
        column. Unstructured: (label, n_matches, pct) entity counts over
        ``text_col`` (default: first string column)."""
        if self.labeler_type == "unstructured":
            from dataprofiler_spark.labeler.regex_labeler import (
                unstructured_entity_counts)
            tc = text_col or next(
                (c for c, t in df.dtypes if t == "string"), None)
            if tc is None:
                raise ValueError(
                    "unstructured predict needs a text column: none of "
                    f"{df.columns} is a string column and text_col was "
                    "not given")
            return unstructured_entity_counts(df, tc)
        cols = cols or df.columns
        if self.model == "column_name":
            from dataprofiler_spark.labeler.column_name_model import (
                label_columns_by_name)
            rows = [(c, lab, round(conf, 6)) for c, (lab, conf)
                    in label_columns_by_name(cols).items()]
            return df.sparkSession.createDataFrame(
                rows, "column string, label string, confidence double")
        if self.model == "cnn":
            from dataprofiler_spark.labeler.cnn_adapter import (
                column_label_vote, predict_cells)
            return column_label_vote(
                predict_cells(df, cols, model_path=self.model_path))
        from dataprofiler_spark.labeler.regex_labeler import column_labels
        return column_labels(df, cols)


__all__ = ["DataLabeler"]
