"""Labeler surface tests: regex votes, column vote thresholds, CNN
adapter plumbing, column-name model, plugins."""

from __future__ import annotations

import os

from dataprofiler_spark.labeler.column_name_model import label_columns_by_name
from dataprofiler_spark.labeler.regex_labeler import column_labels
from dataprofiler_spark.plugins import get_plugins, plugin


def test_regex_column_labels(spark):
    df = spark.createDataFrame(
        [("a@b.com", "192.168.0.1", "123-45-6789", "hello")] * 10,
        "email string, ip string, ssn string, txt string")
    labels = dict((r["column"], r["label"])
                  for r in column_labels(df, df.columns).collect())
    assert labels["email"] == "EMAIL_ADDRESS"
    assert labels["ip"] == "IPV4"
    assert labels["ssn"] == "SSN"
    assert labels["txt"] == "UNKNOWN"


def test_cnn_adapter_pipeline(spark, sf_dir):
    from dataprofiler_spark.labeler.cnn_adapter import (column_label_vote,
                                                        predict_cells)
    df = spark.read.parquet(os.path.join(sf_dir, "customer.parquet"))
    preds = predict_cells(df, ["c_custkey", "c_name"])
    assert preds.columns == ["column", "cell", "label", "confidence"]
    votes = dict((r["column"], r["label"])
                 for r in column_label_vote(preds).collect())
    assert votes["c_custkey"] == "INTEGER"
    # real trained model: "Customer#000000001"-style strings vote BAN
    # (digit-dominated account-number shape); regex fallback votes UNKNOWN
    assert votes["c_name"] in ("BAN", "could not determine", "UNKNOWN")


def test_column_name_model():
    out = label_columns_by_name(
        ["customer_email", "o_orderdate", "l_quantity", "weird_blob"])
    assert out["customer_email"][0] == "EMAIL_ADDRESS"
    assert out["o_orderdate"][0] == "DATE"
    assert out["l_quantity"][0] == "INTEGER"
    assert out["weird_blob"][0] == "UNKNOWN"


def test_plugins(tmp_path):
    @plugin("preset", "inline")
    def inline_preset():
        return 42

    assert get_plugins("preset")["inline"]() == 42

    (tmp_path / "my_plugin.py").write_text(
        "from dataprofiler_spark.plugins import plugin\n"
        "@plugin('preset', 'from_file')\n"
        "def fp():\n    return 'loaded'\n")
    from dataprofiler_spark.plugins import load_plugins
    assert load_plugins(str(tmp_path)) == 1
    assert get_plugins("preset")["from_file"]() == "loaded"


def test_report_graphs(spark, sf_dir, tmp_path):
    import pytest
    pytest.importorskip("matplotlib")
    from dataprofiler_spark import Profiler
    from dataprofiler_spark.reports_graphs import (plot_col_histogram,
                                                   plot_histograms,
                                                   plot_missing_values_matrix)
    df = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    state = Profiler(df).profile()
    p = str(tmp_path / "h.png")
    plot_col_histogram(state, "l_quantity", save_path=p)
    assert os.path.getsize(p) > 0
    plot_missing_values_matrix(state, save_path=str(tmp_path / "m.png"))


def test_new_regex_labels(spark):
    """ADDRESS / DRIVERS_LICENSE / BAN / HASH_OR_KEY coverage (the
    reference's remaining regex-able labels, label_mapping.json)."""
    from dataprofiler_spark.labeler.regex_labeler import label_votes

    df = spark.createDataFrame(
        [("123 Main Street", "D1234567", "12345678901", "d41d8cd98f00b204e9800998ecf8427e"),
         ("9 Elm Ave", "AB123456", "987654321", "da39a3ee5e6b4b0d3255bfef95601890afd80709")],
        "addr string, dl string, acct string, hashes string")
    votes = {(r["column"], r["label"]): r["votes"]
             for r in label_votes(df, df.columns).collect()}
    assert votes[("addr", "ADDRESS")] == 2
    assert votes[("dl", "DRIVERS_LICENSE")] == 2
    assert votes[("acct", "BAN")] == 2
    assert votes[("acct", "INTEGER")] == 2  # deliberate overlap, both voted
    assert votes[("hashes", "HASH_OR_KEY")] == 2
