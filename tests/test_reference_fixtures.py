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


def test_detect_encoding_heuristics(tmp_path, spark):
    """Beyond-BOM detection (VERDICT r9 item 5; reference
    data_utils.py:590-678 chardet behaviors re-derived as deterministic
    rules): BOM-less UTF-16/32 via NUL cadence, cp1252 punctuation in
    the latin1 C1 range, kana/CJK-validated Shift-JIS and Big5, latin1
    accents NOT misrouted to the east-asian decoders."""
    from dataprofiler_spark.sources.sniff import detect_encoding

    txt = "id,name\n1,Alice\n2,Bob\n3,Carol\n"
    assert detect_encoding(txt.encode("utf-16-le")) == "UTF-16LE"
    assert detect_encoding(txt.encode("utf-16-be")) == "UTF-16BE"
    assert detect_encoding(txt.encode("utf-32-le")) == "UTF-32LE"
    assert detect_encoding(txt.encode("utf-32-be")) == "UTF-32BE"
    # cp1252 smart punctuation (0x91-0x94, 0x85, 0x97) = C1 controls in
    # latin1 — decisive for WINDOWS-1252
    cp = "id,quote\n1,“smart”\n2,café – bar\n"
    assert detect_encoding(cp.encode("cp1252")) == "WINDOWS-1252"
    # plain latin1 accents (no C1 bytes) stay latin1, even though the
    # 'é' byte is a Shift-JIS lead byte
    assert detect_encoding("id,v\n1,café mocha\n2,naïve née\n"
                           .encode("latin1")) == "ISO-8859-1"
    # Japanese (kana present) → Shift-JIS; Chinese → Big5
    jp = "id,text\n1,こんにちは世界\n2,ありがとう東京\n"
    assert detect_encoding(jp.encode("shift_jis")) == "SHIFT_JIS"
    zh = "id,text\n1,中文測試資料\n2,台北市信義區\n"
    assert detect_encoding(zh.encode("big5")) == "BIG5"
    # encoding long tail (VERDICT r10 item 6; reference
    # data_utils.py:590-678): EUC-KR via hangul syllables, EUC-JP via
    # kana under the euc_jp decode, KOI8-R via lowercase-dominant
    # cyrillic
    kr = "id,text\n1,안녕하세요 세계\n2,감사합니다 서울\n"
    assert detect_encoding(kr.encode("euc_kr")) == "EUC-KR"
    assert detect_encoding(jp.encode("euc_jp")) == "EUC-JP"
    ru = "id,text\n1,привет мир и добро\n2,спасибо за рыбу\n"
    assert detect_encoding(ru.encode("koi8_r")) == "KOI8-R"
    # ISO-2022-JP/KR: ESC designation sequences are decisive and must
    # win over the UTF-8 pass (ISO-2022 bodies are 7-bit ASCII)
    assert detect_encoding(jp.encode("iso2022_jp")) == "ISO-2022-JP"
    assert detect_encoding(kr.encode("iso2022_kr")) == "ISO-2022-KR"
    # the new codepages must not poach each other's or the old rules'
    # fixtures: Japanese stays SJIS when SJIS-encoded (checked above),
    # and an UPPERCASE-heavy cyrillic head (cp1251-shaped) does not
    # claim KOI8-R
    assert detect_encoding("ПРИВЕТ МИР И ДОБРО ПОЖАЛОВАТЬ\n"
                           .encode("koi8_r")) != "KOI8-R"
    # ascii/utf-8 unchanged
    assert detect_encoding(txt.encode()) == "UTF-8"
    assert detect_encoding("héllo wörld ünïcode\n".encode()) == "UTF-8"
    # a UTF-8 head truncated mid-multibyte-char is still UTF-8
    assert detect_encoding("über"[:3].encode() + "ü".encode()[:1]) == "UTF-8"

    # end-to-end: a BOM-less UTF-16LE csv and a cp1252 csv read
    # correctly through the sniff → spark.read path
    p16 = tmp_path / "bomless16.csv"
    p16.write_bytes("a,b\n1,x\n2,y\n3,z\n".encode("utf-16-le"))
    res = sniff(str(p16))
    assert res.options["encoding"] == "UTF-16LE"
    from dataprofiler_spark.sources.sniff import read_data
    df, _ = read_data(spark, str(p16))
    assert df.count() == 3 and df.columns == ["a", "b"]
    pcp = tmp_path / "cp1252.csv"
    pcp.write_bytes("a,b\n1,“q”\n2,café\n".encode("cp1252"))
    res = sniff(str(pcp))
    assert res.options["encoding"] == "WINDOWS-1252"
    df, _ = read_data(spark, str(pcp))
    vals = [r["b"] for r in df.collect()]
    assert "“q”" in vals and "café" in vals
    # per-codepage round trips for the r11 long tail (the detected
    # names are Java charset names, so spark.read decodes them)
    for codec, cell in (("euc_kr", "안녕하세요"), ("euc_jp", "こんにちは"),
                        ("koi8_r", "привет мир")):
        p = tmp_path / f"{codec}.csv"
        p.write_bytes(f"a,b\n1,{cell}\n2,{cell}{cell}\n".encode(codec))
        df, _ = read_data(spark, str(p))
        assert [r["b"] for r in df.collect()] == [cell, cell + cell], codec


def test_text_samples_per_line(tmp_path, spark):
    """Text reader ``samples_per_line`` (VERDICT r10 item 7; reference
    text_data.py:62,86-101): the file's text re-chunks into fixed-size
    character samples of min(max(len,1), samples_per_line); newlines
    stay inside chunks; an empty file yields zero samples; without the
    option the reader stays one-row-per-line."""
    from dataprofiler_spark.sources.sniff import read_data

    text = "The quick brown fox\njumps over\nthe lazy dog.\n"
    p = tmp_path / "sample.txt"
    p.write_text(text)

    def reference_chunks(data: str, spl: int) -> list[str]:
        n = min(max(len(data), 1), spl)
        return [data[i * n:(i + 1) * n]
                for i in range((len(data) + n - 1) // n)]

    for spl in (7, 10, 1, 1000):
        df, res = read_data(spark, str(p), fmt="text",
                            samples_per_line=spl)
        assert res.format == "text"
        got = [r["value"] for r in df.collect()]
        # per-file chunking has no cross-row order guarantee at scale;
        # compare as multisets and re-check the boundary layout
        assert sorted(got) == sorted(reference_chunks(text, spl)), spl
    # spl >= len(text) → exactly one sample, the whole text
    df, _ = read_data(spark, str(p), fmt="text", samples_per_line=10**9)
    assert [r["value"] for r in df.collect()] == [text]
    # empty file → zero samples (reference range((0+1-1)//1) == [])
    pe = tmp_path / "empty.txt"
    pe.write_text("")
    df, _ = read_data(spark, str(pe), fmt="text", samples_per_line=5)
    assert df.count() == 0
    # option absent → unchanged one-row-per-line scan
    df, _ = read_data(spark, str(p), fmt="text")
    assert df.count() == 3
    with pytest.raises(ValueError, match="samples_per_line"):
        read_data(spark, str(p), fmt="text", samples_per_line=0)


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


def test_json_document_payload_math(spark):
    """math.json (reference test_json_data.py
    test_flattened_dataframe_format): a pretty-printed API document —
    the 'data' payload becomes positional columns, the exact cell the
    reference asserts matches, and the rest lands in metadata."""
    from dataprofiler_spark.sources.sniff import read_data, sniff

    p = f"{REF}/json/math.json"
    r = sniff(p)
    assert r.format == "json" and r.options.get("multiline") is True
    df, res = read_data(spark, p)
    assert "data.22" in df.columns
    assert df.count() == 168
    assert df.collect()[167]["data.22"] == "77.9"
    assert res.metadata_df is not None
    assert any(c.startswith("meta.view.") for c in res.metadata_df.columns)


def test_json_document_dual_payload_picks_larger(spark):
    """dual_payloads.json: the LARGER payload list wins (reference
    test_flattened_dataframe_format_with_dual_payload)."""
    from dataprofiler_spark.sources.sniff import read_data

    df, _ = read_data(spark, f"{REF}/json/dual_payloads.json")
    assert "payload.bigger_list_of_things.id" in df.columns
    assert len(df.columns) == 2


def test_json_document_complex_nested(spark):
    """complex_nested.json: a dict-shaped payload — every nested record
    list explodes and unions (reference coalesces to the same rows for
    disjoint shapes)."""
    from dataprofiler_spark.sources.sniff import read_data

    df, _ = read_data(spark, f"{REF}/json/complex_nested.json")
    cols = set(df.columns)
    assert "payload.Lion.medical_condition" in cols
    vals = [r["payload.Lion.medical_condition"] for r in df.collect()
            if r["payload.Lion.medical_condition"] is not None]
    assert "Depression" in vals


def test_json_document_payload_keys_option(spark):
    """hits.json via explicit payload_keys (reference test_payload_key):
    the hits list becomes data, processingTimeMS stays metadata."""
    from dataprofiler_spark.sources.sniff import read_data

    df, res = read_data(spark, f"{REF}/json/hits.json",
                        payload_keys=["hits"])
    assert any(c.startswith("hits.") for c in df.columns)
    assert "processingTimeMS" not in df.columns
    assert "processingTimeMS" in res.metadata_df.columns


def test_json_utf16_lines(spark):
    """UTF-16 json-lines (denied by Spark's line-mode json scan):
    the binaryFiles decode path reads all 150 records."""
    from dataprofiler_spark.sources.sniff import read_data

    df, _ = read_data(spark, f"{REF}/json/iris-utf-16.json")
    assert df.count() == 150 and "SepalLengthCm" in df.columns


def test_data_facade_metadata_property(spark):
    from dataprofiler_spark.data import Data

    d = Data(f"{REF}/json/math.json", spark=spark)
    assert d.data_type == "json"
    assert d.metadata is not None and d.metadata.count() == 1
    # non-document sources expose no metadata
    d2 = Data(f"{REF}/csv/iris.csv", spark=spark)
    assert d2.metadata is None


def test_profile_nested_json_flattens(spark):
    df, res = read_data(spark, f"{REF}/json/complex_nested.json")
    assert res.format == "json"
    from dataprofiler_spark.sources.sniff import flatten_struct_columns
    flat = flatten_struct_columns(df)
    # nested structs flattened to dotted leaf columns
    assert all("." in c or not isinstance(t, dict)
               for c, t in zip(flat.columns, flat.schema))
    assert flat.count() >= 1


# The reference's FULL header matrix (test_csv_data.py:18-440
# `has_header` annotations): expected index of the detected header row,
# None = headerless, a list = any member accepted (the reference itself
# accepts several). Two documented divergences from the reference's
# anything-goes delimiter vocab scan (which admits '.' and ' ' as
# delimiters): sentence-4x.txt stays text here (prose -> unstructured
# profiler), quote-test.txt may resolve headerless.
HEADER_MATRIX = [
    ("csv/diamonds.csv", [0]),
    ("csv/iris.csv", [0]),
    ("csv/iris_no_header.csv", [None]),
    ("csv/wisconsin_cancer_train.csv", [0]),
    ("csv/aws_honeypot_marx_geo.csv", [0]),
    ("csv/small-num.csv", [0]),
    ("csv/small-num-spaces.csv", [0]),
    ("csv/small-num-negative.csv", [None]),
    ("csv/names-col.txt", [0]),
    ("csv/names-col-empty.txt", [0]),
    ("csv/log_data_long.txt", [None]),
    ("csv/sparse-last-column.txt", [0]),
    ("csv/sparse-first-column.txt", [0]),
    ("csv/sparse-first-and-last-column.txt", [0]),
    ("csv/sparse-first-and-last-column-no-header.txt", [None]),
    ("csv/log_data_sparse.txt", [None]),
    ("csv/log_data_super_sparse.txt", [None]),
    ("csv/sparse-columns-test.csv", [0]),
    ("csv/quote-test.txt", [0, None]),
    ("csv/quote-test-singlequote.txt", [0, None]),
    ("csv/multiple-col-delimiter-last.txt", [0]),
    ("csv/names-col-without-space.txt", [0]),
    ("csv/sparse-first-and-last-column-two-headers.txt", [1]),
    ("csv/sparse-interchange-none.txt", [0]),
    ("csv/blogposts.csv", [0]),
    ("csv/all-strings-standard-header.csv", [0]),
    ("csv/all-strings-standard-header-quotes.csv", [0]),
    ("csv/all-strings-standard-header-data-quotes.csv", [0]),
    ("csv/all-strings-skip-header.csv", [1]),
    ("csv/all-strings-skip-header-author.csv", [1]),
    ("csv/all-strings-skip-partial-header.csv", [None, 1]),
    ("csv/num-negative-title.csv", [None]),
    ("csv/num-negative-title-large.csv", [None]),
    ("csv/daily-activity-sheet-@.csv", [1]),
    ("csv/daily-activity-sheet-int-description.csv", [1]),
    ("csv/daily-activity-sheet-@-singlequote.csv", [1]),
    ("csv/daily-activity-sheet-tab.csv", [0]),
    ("csv/preferred-check-small-num.csv", [None]),
    ("csv/sparse-first-and-last-column-empty-first-row.txt", [1]),
    ("csv/sparse-first-and-last-column-header-and-author.txt", [1]),
    ("csv/sparse-first-and-last-column-header-and-author-description.txt",
     [3]),
    ("csv/flight_delays.csv", [0]),
]


@pytest.mark.parametrize("rel,want", HEADER_MATRIX,
                         ids=[c[0] for c in HEADER_MATRIX])
def test_header_matrix(rel, want):
    """Header index reproduced for every reference CSV fixture
    (csv_data.py:347-542 _guess_header_row semantics, reimplemented as
    sniff.guess_header_row): sniffed header index = skiprows when a
    header was detected, None otherwise."""
    res = sniff(f"{REF}/{rel}")
    assert res.format in ("csv", "graph_csv"), (rel, res)
    got = (res.options.get("skiprows", 0)
           if res.options.get("header") else None)
    assert got in want, (rel, res.options)


def test_single_column_fixtures_read(spark):
    """Delimiter-None fixtures read as ONE string column with the
    header stripped (reference num_columns=1 ground truth)."""
    df, res = read_data(spark, f"{REF}/csv/names-col.txt")
    assert res.options["sep"] is None
    assert df.columns == ["NAMES"]
    rows = [r["NAMES"] for r in df.collect()]
    assert "George Washington" in rows and "NAMES" not in rows
    df2, _ = read_data(spark, f"{REF}/csv/small-num.csv")
    assert df2.columns == ["NUM"] and df2.count() == 5


def test_data_accepts_bytesio_buffer(spark):
    """Reference filepath_or_buffer contract (test_csv_data.py BytesIO
    cases): a BytesIO of a CSV parses exactly like the file path."""
    import io

    from dataprofiler_spark.data import Data

    with open(f"{REF}/csv/iris.csv", "rb") as fh:
        buf = io.BytesIO(fh.read())
    d = Data(buf, spark=spark)
    assert d.data_type == "csv"
    assert len(d.df.columns) == 6 and d.df.count() == 150
    # StringIO json-lines
    sio = io.StringIO('{"x": 1, "y": 2}\n{"x": 3, "y": 4}\n')
    d2 = Data(sio, spark=spark)
    assert d2.data_type == "json" and d2.df.count() == 2
    # open file handle
    with open(f"{REF}/csv/iris_no_header.csv", "rb") as fh:
        d3 = Data(fh, spark=spark)
        assert d3.data_type == "csv" and d3.df.count() == 20


def test_data_in_memory_contract(spark):
    """Reference data.py:30-63 argument contract for in-memory data."""
    import pandas as pd
    import pytest

    from dataprofiler_spark.data import Data

    pdf = pd.DataFrame({"a": [1, 2, 3], "b": ["x", "y", "z"]})
    d = Data(data=pdf, data_type="csv", spark=spark)
    assert d.data_type == "csv" and d.df.count() == 3
    assert d.metadata is None
    with pytest.raises(ValueError, match="data type"):
        Data(data=pdf, spark=spark)
    with pytest.raises(ValueError, match="at least need to pass|At least"):
        Data(spark=spark)
    with pytest.raises(ValueError, match="Cannot do both"):
        Data(f"{REF}/csv/iris.csv", data=pdf, data_type="csv",
             spark=spark)


# r9 sweep: every remaining reader fixture in the reference tree that
# the batteries above didn't touch — extensionless json, scalar-list
# json, compressed avro/parquet with misleading .csv extensions,
# mixed-type parquet columns. (path, format, rows, cols).
REMAINING_FIXTURES = [
    ("json/simple.json", "json", 2, 2),
    ("json/simple-list.json", "json", 3, 1),
    ("json/honeypot", "json", 14, 6),            # no extension at all
    ("json/iris-utf-32.json", "json", 150, 6),
    ("avro/deflate_compressed_intentionally_mislabeled_file.csv",
     "avro", 4, 3),
    ("avro/snappy_compressed_intentionally_mislabeled_file.csv",
     "avro", 4, 3),
    ("avro/users.avro", "avro", 4, 4),
    ("parquet/brotli_compressed_intentionally_mislabeled_parquet_file.csv",
     "parquet", 2999, 16),
    ("parquet/gzip_compressed_intentionally_mislabeled_parquet_file.csv",
     "parquet", 2999, 16),
    ("parquet/mixed_datetime_data_col.parquet", "parquet", 4, 2),
    ("parquet/mixed_string_data_col.parquet", "parquet", 4, 2),
]


@pytest.mark.parametrize("rel,fmt,rows,cols", REMAINING_FIXTURES,
                         ids=[c[0] for c in REMAINING_FIXTURES])
def test_remaining_reference_fixtures(spark, rel, fmt, rows, cols):
    res = sniff(f"{REF}/{rel}")
    assert res.format == fmt, (rel, res)
    df, _ = read_data(spark, f"{REF}/{rel}")
    assert df.count() == rows and len(df.columns) == cols, (rel, res)


def test_samples_per_line_guards(tmp_path, spark):
    """ADVICE r11: samples_per_line materializes whole files per task —
    (a) an over-limit file is refused loudly at plan time (driver-side
    stat, overridable via max_file_bytes); (b) bytes that don't decode
    under the chosen encoding raise instead of silently mangling into
    U+FFFD samples."""
    from dataprofiler_spark.sources.sniff import read_data

    p = tmp_path / "big.txt"
    p.write_text("x" * 1000)
    with pytest.raises(ValueError, match="max_file_bytes"):
        read_data(spark, str(p), fmt="text", samples_per_line=5,
                  max_file_bytes=100)
    # raising the cap reads fine
    df, _ = read_data(spark, str(p), fmt="text", samples_per_line=400,
                      max_file_bytes=10_000)
    assert df.count() == 3

    bad = tmp_path / "bad.txt"
    bad.write_bytes(b"ok so far \xff\xfe not utf8")
    df, _ = read_data(spark, str(bad), fmt="text", samples_per_line=5,
                      encoding="utf-8")
    import py4j.protocol
    with pytest.raises(Exception, match="does not decode"):
        df.collect()


def test_iso2022_kr_requires_valid_decode(tmp_path):
    """ADVICE r11: the ISO-2022-KR designation bytes inside a BINARY
    blob must not win the encoding sniff — the branch now requires a
    strict iso2022_kr decode like the JP branch always did."""
    from dataprofiler_spark.sources.sniff import detect_encoding

    # real ISO-2022-KR: designation + SO/SI shifted hangul
    real = "안녕하세요 hello".encode("iso2022_kr")
    assert b"\x1b$)C" in real
    assert detect_encoding(real) == "ISO-2022-KR"
    # binary junk containing the 4-byte run: NOT ISO-2022-KR
    junk = b"\x00\x01\x1b$)C\x96\xff\x80\x81" + bytes(range(200, 256))
    got = detect_encoding(junk)
    assert got != "ISO-2022-KR"
