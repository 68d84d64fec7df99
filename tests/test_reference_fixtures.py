"""The reference's OWN adversarial reader fixtures through the sniffing
layer (VERDICT r7 item 2): encoding variants (utf-8/16/32), mislabeled
extensions in every direction (csv-as-json, avro-as-parquet, ...),
exotic delimiters, graph-vs-plain CSV differentiation, and
HTML-that-looks-like-CSV confusion. Ground truth comes from the
reference's reader tests (tests/data_readers/test_csv_data.py,
test_json_data.py, test_avro_data.py, test_parquet_data.py) — format is
decided by CONTENT, never extension.

Skipped wholesale when the reference checkout is absent (CI safety).
"""

from __future__ import annotations

import os

import pytest

from dataprofiler_spark.sources.sniff import read_data, sniff

REF = "/root/reference/dataprofiler/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference fixture tree not present")


# (relative path, expected sniffed format) — expected values mirror the
# reference's reader-test ground truth, not the file extension.
FORMAT_CASES = [
    # encoding variants (test_csv_data.py: iris count=150, 6 cols)
    ("csv/iris.csv", "csv"),
    ("csv/iris-utf-8.csv", "csv"),
    ("csv/iris-utf-16.csv", "csv"),
    ("csv/iris-utf-32.csv", "csv"),
    # mislabeled extensions: content wins (test_csv_data.py:58-90)
    ("csv/iris_intentionally_mislabled_file.json", "csv"),
    ("csv/iris_intentionally_mislabled_file.parquet", "csv"),
    ("csv/iris_intentionally_mislabled_file.txt", "csv"),
    ("json/honeypot_intentially_mislabeled_file.csv", "json"),
    ("json/honeypot_intentially_mislabeled_file.parquet", "json"),
    ("avro/userdata1.avro", "avro"),
    ("avro/userdata1_intentionally_mislabled_file.csv", "avro"),
    ("avro/userdata1_intentionally_mislabled_file.json", "avro"),
    ("avro/userdata1_intentionally_mislabled_file.parquet", "avro"),
    ("avro/userdata1_intentionally_mislabled_file.txt", "avro"),
    ("parquet/iris.parq", "parquet"),
    ("parquet/nation.dict.parquet", "parquet"),
    ("parquet/nation.plain.intentionally_mislabled_file.csv", "parquet"),
    ("parquet/nation.plain.intentionally_mislabled_file.json", "parquet"),
    ("parquet/nation.plain.intentionally_mislabled_file.txt", "parquet"),
    # nested json (test_json_data.py)
    ("json/complex_nested.json", "json"),
    ("json/iris-utf-8.json", "json"),
    # exotic delimiter + quotechar (test_csv_data.py daily-activity rows)
    ("csv/daily-activity-sheet-@.csv", "csv"),
    ("csv/daily-activity-sheet-@-singlequote.csv", "csv"),
    ("csv/daily-activity-sheet-tab.csv", "csv"),
    # graph differentiation (test_graph_data.py)
    ("csv/graph-differentiator-input-positive.csv", "graph_csv"),
    ("csv/graph-differentiator-input-standard-positive.csv", "graph_csv"),
    # prose / markup must NOT sniff as csv (test_text_data.py)
    ("txt/code.txt", "text"),
    ("txt/sentence.txt", "text"),
    ("txt/html-csv-confusion.html", "text"),
]


@pytest.mark.parametrize("rel,expected",
                         FORMAT_CASES, ids=[c[0] for c in FORMAT_CASES])
def test_sniff_format(rel, expected):
    res = sniff(f"{REF}/{rel}")
    assert res.format == expected, res


# (relative path, expected rows, expected columns) — counts from the
# reference reader tests; rows exclude the header for headered CSVs.
READ_CASES = [
    ("csv/iris.csv", 150, 6),
    ("csv/iris-utf-8.csv", 150, 6),
    ("csv/iris-utf-16.csv", 150, 6),
    ("csv/iris-utf-32.csv", 150, 6),
    ("csv/iris_intentionally_mislabled_file.json", 150, 6),
    ("csv/iris_intentionally_mislabled_file.parquet", 150, 6),
    ("csv/iris_no_header.csv", 20, 6),
    ("csv/aws_honeypot_marx_geo.csv", 2999, 16),
    ("csv/diamonds.csv", 53940, 10),
    ("csv/daily-activity-sheet-@.csv", 30, 4),       # banner line skipped
    ("csv/daily-activity-sheet-tab.csv", 30, 4),
    ("parquet/iris.parq", 150, 5),
    ("parquet/gzip-nation.impala.parquet", 25, 4),
    ("parquet/nation.dict.parquet", 25, 4),
    ("avro/userdata1.avro", 1000, 13),
]


@pytest.mark.parametrize("rel,rows,cols",
                         READ_CASES, ids=[c[0] for c in READ_CASES])
def test_read_shape(spark, rel, rows, cols):
    df, res = read_data(spark, f"{REF}/{rel}")
    assert len(df.columns) == cols, (res, df.columns)
    assert df.count() == rows, res


def test_csv_encoding_detected():
    assert sniff(f"{REF}/csv/iris-utf-16.csv").options["encoding"] == "UTF-16"
    assert sniff(f"{REF}/csv/iris-utf-32.csv").options["encoding"] == "UTF-32"
    assert sniff(f"{REF}/csv/iris-utf-8.csv").options["encoding"] == "UTF-8"


def test_at_delimiter_and_quotechar():
    res = sniff(f"{REF}/csv/daily-activity-sheet-@.csv")
    assert res.format == "csv" and res.options["sep"] == "@"
    res = sniff(f"{REF}/csv/daily-activity-sheet-@-singlequote.csv")
    assert res.format == "csv" and res.options["sep"] == "@"
    assert res.options["quote"] == "'"
    res = sniff(f"{REF}/csv/daily-activity-sheet-tab.csv")
    assert res.format == "csv" and res.options["sep"] == "\t"


def test_empty_files_do_not_crash(spark):
    for rel in ("csv/empty.csv", "txt/empty.txt"):
        res = sniff(f"{REF}/{rel}")
        assert res.format in ("csv", "text")
        df, _ = read_data(spark, f"{REF}/{rel}")
        assert df.count() == 0


def test_profile_reference_fixture_end_to_end(spark):
    """Full Data() -> Profiler -> report flow over the reference's
    README example fixture (aws_honeypot_marx_geo.csv)."""
    from dataprofiler_spark import Profiler
    from dataprofiler_spark.data import Data

    data = Data(f"{REF}/csv/aws_honeypot_marx_geo.csv")
    report = Profiler(data).report(
        report_options={"output_format": "compact"})
    gs = report["global_stats"]
    assert gs["column_count"] == 16
    assert gs["row_count"] == 2999


def test_profile_nested_json_flattens(spark):
    df, res = read_data(spark, f"{REF}/json/complex_nested.json")
    assert res.format == "json"
    from dataprofiler_spark.sources.sniff import flatten_struct_columns
    flat = flatten_struct_columns(df)
    # nested structs flattened to dotted leaf columns
    assert all("." in c or not isinstance(t, dict)
               for c, t in zip(flat.columns, flat.schema))
    assert flat.count() >= 1
