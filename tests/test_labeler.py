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


def test_column_name_model_reference_parity():
    """Golden vectors from the reference's own test suite
    (tests/labelers/test_column_name_model.py:18-63, 168-191): same
    parameter dicts, same data, same pred/conf — plus the exact
    token_sort_ratio mid-range scores rapidfuzz arithmetic yields
    (ratio = 100·2·LCS/(|a|+|b|) after lowercase token sort), proving
    the 50/85 thresholds transfer."""
    import math

    from dataprofiler_spark.labeler.column_name_model import (
        ColumnNameModel, token_sort_ratio)

    # exact scorer arithmetic on the reference's own fixture strings
    assert token_sort_ratio("ssn", "ssn") == 100.0
    assert math.isclose(token_sort_ratio("role_name", "role"),
                        200.0 * 4 / 13)          # 61.538…, ≥ neg 50
    assert math.isclose(token_sort_ratio("wallet_address", "send_address"),
                        200.0 * 9 / 26)          # 69.23…, ≥ neg 50
    assert math.isclose(token_sort_ratio("ssn", "contract_number"),
                        200.0 * 1 / 18)          # 11.1…, < neg 50
    # token sort: order-insensitive on whitespace tokens
    assert token_sort_ratio("home my address", "my home address") == 100.0
    # case-insensitive via the reference's lowercase processor
    assert token_sort_ratio("SSN", "ssn") == 100.0

    params = {
        "true_positive_dict": [
            {"attribute": "ssn", "label": "ssn"},
            {"attribute": "suffix", "label": "name"},
            {"attribute": "my_home_address", "label": "address"},
        ],
        "false_positive_dict": [
            {"attribute": "contract_number", "label": "ssn"},
            {"attribute": "role", "label": "name"},
            {"attribute": "send_address", "label": "address"},
        ],
        "negative_threshold_config": 50,
        "positive_threshold_config": 85,
        "include_label": True,
    }
    model = ColumnNameModel(
        label_mapping={"ssn": 1, "name": 2, "address": 3},
        parameters=params)
    out = model.predict(["ssn", "role_name", "wallet_address"])
    assert out["pred"] == ["ssn"]        # reference expected_output
    assert out["conf"] == [100.0]

    # no false-positive filter: wallet_address scores vs
    # my_home_address = 200·10/29 = 68.9 < 85 → still only ssn passes
    model2 = ColumnNameModel(
        label_mapping={"ssn": 1, "name": 2, "address": 3},
        parameters={**params, "false_positive_dict": None,
                    "negative_threshold_config": None})
    assert model2.predict(["ssn", "wallet_address"])["pred"] == ["ssn"]

    import pytest
    with pytest.raises(ValueError, match="true_positive_dict"):
        ColumnNameModel({"a": 1}, {"positive_threshold_config": 85})
    with pytest.raises(ValueError, match="negative_threshold_config"):
        ColumnNameModel({"ssn": 1, "name": 2, "address": 3},
                        {**params, "negative_threshold_config": None})


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


def test_report_graphs_svg_backend(spark, sf_dir, tmp_path):
    """The dependency-free SVG backend renders all three figures with
    the expected structure (works whether or not matplotlib exists)."""
    from dataprofiler_spark import Profiler
    from dataprofiler_spark.reports_graphs import (plot_col_histogram,
                                                   plot_histograms,
                                                   plot_missing_values_matrix)
    df = spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
    state = Profiler(df).profile()

    p = str(tmp_path / "h.svg")
    svg = plot_col_histogram(state, "l_quantity", save_path=p, backend="svg")
    assert svg.startswith("<svg") and svg.endswith("</svg>")
    assert "histogram: l_quantity" in svg
    ns = state.columns["l_quantity"].numeric
    n_nonzero = sum(1 for c in ns.histogram["bin_counts"] if c > 0)
    assert svg.count('fill="#2a78d6"') == n_nonzero  # one bar per bin
    assert os.path.getsize(p) > 0
    with open(p, encoding="utf-8") as f:
        assert f.read() == svg

    multi = plot_histograms(state, backend="svg")
    n_hist_cols = sum(1 for c in state.column_order
                      if state.columns[c].numeric
                      and state.columns[c].numeric.histogram)
    assert multi.count("<g transform=") == n_hist_cols

    matrix = plot_missing_values_matrix(state, backend="svg")
    assert "null ratio by column" in matrix
    for c in state.column_order:
        assert str(c) in matrix


def test_report_graphs_svg_escapes_column_names(spark):
    from dataprofiler_spark import Profiler
    from dataprofiler_spark.reports_graphs import plot_missing_values_matrix
    df = spark.createDataFrame([(1.0,), (2.0,)], ["a<b&c"])
    state = Profiler(df).profile()
    svg = plot_missing_values_matrix(state, backend="svg")
    assert "a&lt;b&amp;c" in svg and "a<b&c" not in svg


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


def test_datalabeler_facade(spark):
    """The reference's DataLabeler(labeler_type=...).predict(data) call
    shape over all three backends + the unstructured mode."""
    import pytest

    from dataprofiler_spark.labeler import DataLabeler

    df = spark.createDataFrame(
        [("a.b@example.com", 42), ("c.d@example.org", 7)],
        "email string, count int")

    lab = DataLabeler(labeler_type="structured", model="regex")
    out = {r["column"]: r["label"] for r in lab.predict(df).collect()}
    assert out["email"] == "EMAIL_ADDRESS"
    assert "EMAIL_ADDRESS" in lab.labels

    byname = DataLabeler(model="column_name").predict(df)
    got = {r["column"]: r["label"] for r in byname.collect()}
    assert got["email"] == "EMAIL_ADDRESS"

    un = DataLabeler(labeler_type="unstructured")
    ents = {r["label"]: r for r in un.predict(
        spark.createDataFrame(
            [("mail a@b.co or call 12-345-678-9012",)], "text string")
    ).collect()}
    assert "EMAIL_ADDRESS" in ents

    with pytest.raises(ValueError, match="labeler_type"):
        DataLabeler(labeler_type="nope")
    with pytest.raises(ValueError, match="model"):
        DataLabeler(model="nope")
