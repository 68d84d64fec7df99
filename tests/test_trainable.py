"""Trainable labeler surface (labeler/trainable.py): fit/predict on
Spark frames, label editing, persistence round-trip and the
train_structured_labeler entry point — the reference's
TrainableDataLabeler API (base_data_labeler.py:252-279,763-870;
data_labelers.py:17-76) over a distributed closed-form estimator."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from dataprofiler_spark.labeler.trainable import (TrainableDataLabeler,
                                                  train_structured_labeler)


def _training_frame(spark, n=300):
    rows = []
    for i in range(n):
        rows.append((f"{1000 + i * 7}", "INTEGER"))
        rows.append((f"{i}.{i % 97:02d}", "FLOAT"))
        rows.append((f"user{i}@mail{i % 5}.com", "EMAIL"))
        rows.append((f"Alice Bob{i} Smith", "NAME"))
    return spark.createDataFrame(rows, ["x", "y"])


def test_fit_predict_roundtrip(spark):
    df = _training_frame(spark)
    m = TrainableDataLabeler()
    out = m.fit(df, "x", "y")
    assert out["train_acc"] > 0.9, out
    assert out["cv_acc"] > 0.8, out
    preds = m.predict(["4217", "3.14", "bob@example.com", "Alice Smith"])
    assert preds == ["INTEGER", "FLOAT", "EMAIL", "NAME"], preds


def test_fit_is_deterministic(spark):
    df = _training_frame(spark, n=100)
    a, b = TrainableDataLabeler(), TrainableDataLabeler()
    a.fit(df, "x", "y")
    b.fit(df, "x", "y")
    cells = ["12", "9.99", "x@y.de", "Dan Lee"]
    assert a.predict(cells) == b.predict(cells)
    assert a.vocab == b.vocab and a.label_mapping == b.label_mapping


def test_dataframe_predict_maps_in_pandas(spark):
    df = _training_frame(spark, n=100)
    m = TrainableDataLabeler()
    m.fit(df, "x", "y")
    probe = spark.createDataFrame(
        [("123",), ("2.50",), ("a@b.org",)], ["cell"])
    got = {r["cell"]: r["label"]
           for r in m.predict(probe, "cell").collect()}
    assert got == {"123": "INTEGER", "2.50": "FLOAT", "a@b.org": "EMAIL"}


def test_add_label_same_as_and_refit_path(spark):
    df = _training_frame(spark, n=100)
    m = TrainableDataLabeler()
    m.fit(df, "x", "y", validation_split=0.0)
    m.add_label("WORK_EMAIL", same_as="EMAIL")
    assert "WORK_EMAIL" in m.label_mapping
    # scores like EMAIL (tie broken by lower index => EMAIL still wins),
    # and predicting doesn't crash with the extended mapping
    assert m.predict(["x@y.com"])[0] in ("EMAIL", "WORK_EMAIL")
    with pytest.raises(ValueError, match="already exists"):
        m.add_label("EMAIL")
    with pytest.raises(ValueError, match="unknown"):
        m.add_label("Z", same_as="NOPE")


def test_set_labels_clears_fit(spark):
    m = TrainableDataLabeler()
    m.fit(_training_frame(spark, n=50), "x", "y", validation_split=0.0)
    m.set_labels(["A", "B"])
    assert m.log_probs is None
    with pytest.raises(ValueError, match="not fitted"):
        m.predict(["x"])


def test_save_load_round_trip(spark, tmp_path):
    df = _training_frame(spark, n=100)
    m = TrainableDataLabeler()
    m.fit(df, "x", "y", validation_split=0.0)
    m.save_to_disk(str(tmp_path / "lab"))
    m2 = TrainableDataLabeler.load_from_disk(str(tmp_path / "lab"))
    cells = ["77", "8.01", "p@q.net", "Eve Stone"]
    assert m2.predict(cells) == m.predict(cells)


def test_train_structured_labeler_spark_frame(spark, sf_dir):
    import os

    cust = (spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
            .select("c_name", "c_acctbal", "c_mktsegment").limit(400))
    lab = train_structured_labeler(cust)
    assert set(lab.labels) == {"c_name", "c_acctbal", "c_mktsegment"}
    assert lab.predict(["Customer#000000042"])[0] == "c_name"
    assert lab.predict(["HOUSEHOLD"])[0] == "c_mktsegment"


def test_train_structured_labeler_pandas_frame(spark):
    import pandas as pd

    pdf = pd.DataFrame({"num": [str(i) for i in range(50)],
                        "word": [f"tok{i}" for i in range(50)]})
    lab = train_structured_labeler(pdf)
    assert set(lab.labels) == {"num", "word"}


def test_trained_labeler_votes_golden(spark):
    """The driver-checked trained_labeler_customer golden. Regenerate
    after a testdata change:

        rows = _trained_labeler_votes(spark, '/root/testdata/sf0.01')
        json.dump([[r['column'], r['label'], r['votes']] for r in
                   rows.collect()],
                  open('fixtures/trained_labeler_sf001.json', 'w'))
    """
    import json
    import os

    from dataprofiler_spark.queries import _trained_labeler_votes

    p = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                     "fixtures", "trained_labeler_sf001.json")
    with open(p) as fh:
        golden = [tuple(r) for r in json.load(fh)]
    rows = _trained_labeler_votes(spark, "/root/testdata/sf0.01").collect()
    got = [(r["column"], r["label"], r["votes"]) for r in rows]
    assert got == golden
    # self-train on clean columns must be (near-)diagonal
    assert all(c == l for c, l, _ in got)


def test_empty_fit_raises(spark):
    empty = spark.createDataFrame([], "x string, y string")
    with pytest.raises(ValueError, match="No data"):
        TrainableDataLabeler().fit(empty, "x", "y")
