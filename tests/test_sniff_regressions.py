"""Regressions from the round-8 self-review of the new sniff/read
paths: headerless whitespace tables, blank lines inside a banner,
bracket-led logs vs JSON documents, timestamp colons vs delimiters,
legacy-encoding whitespace files."""

from __future__ import annotations

from dataprofiler_spark.sources.sniff import read_data, sniff


def test_headerless_tab_table_keeps_width(spark, tmp_path):
    """A headerless TSV (numeric first row, so guess_header=False) must
    parse at full width through the keep-blank path — it used to
    collapse to one column because ncols was only recorded for
    bannered files."""
    p = tmp_path / "noheader.tsv"
    p.write_text("1\ta\t0.5\n2\tb\t1.5\n3\tc\t2.5\n")
    r = sniff(str(p))
    assert r.format == "csv" and r.options["sep"] == "\t"
    assert r.options["header"] is False
    df, _ = read_data(spark, str(p))
    assert len(df.columns) == 3
    assert df.count() == 3


def test_blank_line_inside_banner_drops_no_data(spark, tmp_path):
    """skiprows counts raw head lines, but the read paths drop blank
    lines BEFORE the positional filter — a blank line between banner
    and header must not shift the drop onto a real data row."""
    p = tmp_path / "banner_blank.csv"
    p.write_text("Report Title\n\nA,B\n1,2\n3,4\n")
    r = sniff(str(p))
    assert r.format == "csv"
    assert r.options.get("skiprows") == 2          # raw line index
    df, _ = read_data(spark, str(p))
    assert df.columns == ["A", "B"]
    assert df.count() == 2                          # BOTH data rows
    assert {row["A"] for row in df.collect()} == {"1", "3"}
    # same contract through the keep-blank (whitespace-delim) path
    p2 = tmp_path / "banner_blank.tsv"
    p2.write_text("Report Title\n\nA\tB\n1\t2\n3\t4\n")
    df2, _ = read_data(spark, str(p2))
    assert df2.columns == ["A", "B"] and df2.count() == 2


def test_bracket_led_log_is_not_json(tmp_path):
    """'[2024-01-01 12:00:00] msg=\"started\"' starts with '[' and
    contains quotes/colons — it must NOT sniff as json/multiline (which
    would profile a _corrupt_record column). Uniform log lines now
    dispatch as a single-column table (reference CSVData.is_match
    accepts delimiter-None files by line-shape consistency,
    csv_data.py:563-640) — one string column, no mis-split."""
    p = tmp_path / "app.log"
    p.write_text("\n".join(
        f'[2024-01-01 12:00:{i:02d}] msg="started" level=info'
        for i in range(40)) + "\n")
    r = sniff(str(p))
    assert r.format == "csv" and r.options["sep"] is None
    assert r.options["ncols"] == 1


def test_timestamp_colons_not_a_delimiter(spark, tmp_path):
    """A plain log of 'HH:MM:SS message' lines has perfectly consistent
    colon counts — ':' must not be admitted as a DELIMITER (not in the
    candidate set). The uniform lines land in ONE unsplit column via
    the reference's no-delimiter single-column acceptance."""
    p = tmp_path / "times.log"
    p.write_text("\n".join(
        f"12:00:{i:02d} worker heartbeat ok" for i in range(30)) + "\n")
    r = sniff(str(p))
    assert r.format == "csv" and r.options["sep"] is None
    df, _ = read_data(spark, str(p))
    assert len(df.columns) == 1 and df.count() == 30
    assert df.collect()[0][0] == "12:00:00 worker heartbeat ok"


def test_keyvalue_equals_not_a_delimiter(tmp_path):
    p = tmp_path / "kv.log"
    p.write_text("\n".join(
        f"host=web{i} status=ok latency=3ms" for i in range(30)) + "\n")
    r = sniff(str(p))
    assert r.format == "csv" and r.options["sep"] is None   # not '='


def test_prose_and_code_stay_text(tmp_path):
    """Variable-shaped lines (real prose, code) fail the consistency
    bar and stay text — the single-column acceptance must not swallow
    documents."""
    p = tmp_path / "essay.txt"
    p.write_text(
        "The quick brown fox jumps over the lazy dog near the bank.\n"
        "It was the best of times, it was the worst of times in Paris "
        "and London that year.\nCall me Ishmael.\nSome years ago - "
        "never mind how long precisely - having little money.\n"
        "A short one.\nAnd now for something completely different, a "
        "man with three legs and a very long sentence indeed.\n")
    assert sniff(str(p)).format == "text"
    p2 = tmp_path / "two_lines.txt"
    p2.write_text("just one line of text\nand another\n")
    assert sniff(str(p2)).format == "text"   # <=3 lines: never a table


def test_latin1_tab_file_keeps_encoding(spark, tmp_path):
    """Legacy-encoded whitespace-delimited files must take the native
    csv path (spark.read.text has no charset option) so characters
    survive; the all-empty-row preservation is the documented
    tradeoff."""
    p = tmp_path / "latin.tsv"
    p.write_bytes("name\tcity\ncaf\xe9\tZ\xfcrich\n".encode("latin-1"))
    r = sniff(str(p))
    assert r.format == "csv" and r.options["sep"] == "\t"
    assert r.options["encoding"] == "ISO-8859-1"
    df, _ = read_data(spark, str(p))
    rows = df.collect()
    assert rows[0]["name"] == "caf\xe9"
    assert rows[0]["city"] == "Z\xfcrich"


def test_at_banner_blank_combination(spark, tmp_path):
    """Banner + blank + '@' delimiter + trailing blank data row: the
    exotic-delimiter path composes with banner skipping."""
    p = tmp_path / "at.csv"
    p.write_text("Sheet Title\n\nTime@Task\n06:00@Breakfast\n"
                 "07:00@Walk\n")
    r = sniff(str(p))
    assert r.format == "csv" and r.options["sep"] == "@"
    df, _ = read_data(spark, str(p))
    assert df.columns == ["Time", "Task"]
    assert df.count() == 2


def test_profile_diff_one_empty_slice_matches_oracle(spark, tmp_path):
    """All timestamps equal -> snapshot A (ts < midpoint == min) is
    EMPTY. The tri-state contract ('incomparable' when one side has no
    matches, null_count coalesced to 0) must hold cross-engine."""
    import duckdb
    import pandas as pd

    from dataprofiler_spark import Profiler
    from dataprofiler_spark.report import (deterministic_diff_rows,
                                           diff_profiles,
                                           oracle_profile_diff_sql)
    from pyspark.sql import functions as F

    p = str(tmp_path / "ev.parquet")
    spark.createDataFrame(
        [(i, float(i), "t", "2024-03-01 00:00:00") for i in range(6)],
        "event_id long, value double, event_type string, ts_s string"
    ).select("event_id", "value", "event_type",
             F.to_timestamp("ts_s").alias("ts")
             ).write.mode("overwrite").parquet(p)

    base = spark.read.parquet(p).where(F.col("ts").isNotNull())
    row = base.agg(F.min(F.unix_micros("ts")).alias("mn"),
                   F.max(F.unix_micros("ts")).alias("mx")).collect()[0]
    mid = (row["mn"] + row["mx"]) // 2
    sa = Profiler(base.where(F.unix_micros("ts") < F.lit(mid))).profile()
    sb = Profiler(base.where(F.unix_micros("ts") >= F.lit(mid))).profile()
    rows = deterministic_diff_rows(diff_profiles(sa, sb), sa, sb)
    got = pd.DataFrame(rows, columns=["column", "stat", "value_num",
                                      "value_str"])
    # numeric columns read 'incomparable' for min/max (empty side)
    mins = got[(got["stat"] == "min")]
    assert set(mins["value_str"]) == {"incomparable"}

    con = duckdb.connect()
    con.sql(f"CREATE VIEW ev AS SELECT * FROM '{p}/*.parquet'")
    # data_type rows diverge by construction here (an empty slice
    # infers 'text' for everything; the oracle literal asserts
    # stability on REAL data) — compare every other stat.
    want = con.sql(oracle_profile_diff_sql(
        "ev", "ts", ["event_id", "value"], ["event_type"])).df()
    g = (got[got["stat"] != "data_type"]
         .sort_values(["column", "stat"]).reset_index(drop=True))
    w = (want[want["stat"] != "data_type"]
         .sort_values(["column", "stat"]).reset_index(drop=True))
    assert list(g["column"]) == list(w["column"])
    assert list(g["stat"]) == list(w["stat"])
    assert list(g["value_str"].fillna("~")) == \
        list(w["value_str"].fillna("~"))
    gn = g["value_num"].fillna(-9e9)
    wn = w["value_num"].fillna(-9e9)
    assert list(gn) == list(wn)


def test_selected_columns_option(spark, tmp_path):
    """Reference csv_data.py:85 selected_columns / json selected_keys:
    a projection Catalyst pushes into the scan (column pruning)."""
    import pytest

    p = tmp_path / "wide.csv"
    p.write_text("a,b,c,d\n1,2,3,4\n5,6,7,8\n")
    df, _ = read_data(spark, str(p), selected_columns=["a", "c"])
    assert df.columns == ["a", "c"] and df.count() == 2
    # parquet: pruning reaches the scan (ReadSchema shows only a, c)
    pq = str(tmp_path / "wide.parquet")
    spark.read.csv(str(p), header=True).write.parquet(pq)
    df2, _ = read_data(spark, pq, selected_columns=["a", "c"])
    assert df2.columns == ["a", "c"]
    plan = df2._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema: struct<a:string,c:string>" in plan
    with pytest.raises(ValueError, match="selected_columns"):
        read_data(spark, str(p), selected_columns=["a", "zz"])
    # json alias
    j = tmp_path / "rows.json"
    j.write_text('{"x": 1, "y": 2, "z": 3}\n{"x": 4, "y": 5, "z": 6}\n')
    df3, _ = read_data(spark, str(j), selected_keys=["x", "z"])
    assert df3.columns == ["x", "z"] and df3.count() == 2


def test_sniff_read_property(spark, tmp_path):
    """Generative guard over the new reader paths: random tables with
    random delimiter / banner / interior blank lines / header presence
    round-trip through sniff+read with exact row and column counts.
    Deterministic seed — this is a fixed battery, not flaky fuzzing."""
    import random

    rng = random.Random(88)
    delims = [",", "\t", ";", "|", "@", "#"]
    for case in range(30):
        delim = rng.choice(delims)
        ncols = rng.randint(2, 6)
        nrows = rng.randint(3, 40)
        header = rng.random() < 0.7
        banner = rng.random() < 0.4
        blank_after_banner = banner and rng.random() < 0.5
        lines = []
        if banner:
            lines.append("Some Report Title")
            if blank_after_banner:
                lines.append("")
        if header:
            lines.append(delim.join(f"col_{i}" for i in range(ncols)))
        n_blank_rows = 0
        for r in range(nrows):
            if delim == "\t" and rng.random() < 0.1:
                lines.append(delim * (ncols - 1))   # all-empty row
                n_blank_rows += 1
            else:
                lines.append(delim.join(
                    str(rng.randint(0, 999)) if i == 0
                    else f"v{r}_{i}" for i in range(ncols)))
        p = tmp_path / f"case_{case}.csv"
        p.write_text("\n".join(lines) + "\n")

        res = sniff(str(p))
        assert res.format == "csv", (case, delim, res)
        assert res.options["sep"] == delim, (case, delim, res)
        assert res.options["header"] is header, (case, delim, res)
        df, _ = read_data(spark, str(p))
        assert len(df.columns) == ncols, (case, delim, res, df.columns)
        # all-empty rows are only injected for \t, where the keep-blank
        # path preserves them — so every generated data row survives
        assert df.count() == nrows, (case, delim, res)


def test_multifile_headered_dataset_no_header_leak(spark, tmp_path):
    """ADVICE r8 (high): a Spark-written 3-file headered TSV dataset
    must not leak the other part files' header lines into the data —
    the positional single-file drop used to yield 17 rows, not 15."""
    ds = str(tmp_path / "tsvds")
    spark.createDataFrame(
        [(i, f"n{i}", float(i)) for i in range(15)],
        "id int, name string, val double"
    ).repartition(3).write.csv(ds, sep="\t", header=True)
    import os
    parts = [f for f in os.listdir(ds)
             if f.startswith("part-") and f.endswith(".csv")]
    assert len(parts) == 3
    r = sniff(ds)
    assert r.format == "csv" and r.options["sep"] == "\t"
    assert r.options.get("multifile") is True
    assert "skiprows" not in r.options and "banner_lines" not in r.options
    df, _ = read_data(spark, ds)
    assert sorted(df.columns) == ["id", "name", "val"]
    assert df.count() == 15                       # not 17
    assert df.where(df["id"] == "id").count() == 0  # no header-as-data
    # comma dataset through the native path keeps the same contract
    ds2 = str(tmp_path / "csvds")
    spark.createDataFrame(
        [(i, f"n{i}") for i in range(12)], "id int, name string"
    ).repartition(4).write.csv(ds2, header=True)
    df2, _ = read_data(spark, ds2)
    assert df2.count() == 12 and sorted(df2.columns) == ["id", "name"]


def test_empty_dataset_directory_raises(tmp_path):
    """ADVICE r8: an empty dataset directory must raise a clear error,
    not sniff as parquet (whose scan fails with a misleading
    'unable to infer schema')."""
    import pytest

    d = tmp_path / "empty_ds"
    d.mkdir()
    (d / "_SUCCESS").write_text("")   # marker files don't count
    with pytest.raises(ValueError, match="empty dataset directory"):
        sniff(str(d))


def test_selected_columns_and_keys_both_popped(spark, tmp_path):
    """ADVICE r8: selected_columns must not leave selected_keys behind
    (double projection), and an empty list is a loud error, not a
    silent no-op that lets the other key win."""
    import pytest

    p = tmp_path / "t.csv"
    p.write_text("a,b,c\n1,2,3\n")
    # both present: selected_columns wins, selected_keys is consumed
    df, _ = read_data(spark, str(p), selected_columns=["a", "b"],
                      selected_keys=["c"])
    assert df.columns == ["a", "b"]
    # empty list: explicit error either way
    with pytest.raises(ValueError, match="empty"):
        read_data(spark, str(p), selected_columns=[])
    with pytest.raises(ValueError, match="empty"):
        read_data(spark, str(p), selected_columns=[],
                  selected_keys=["c"])


def test_quoted_header_cell_with_delimiter(spark, tmp_path):
    """ADVICE r8: a quoted header cell containing the delimiter must
    parse as ONE name — the naive split used to widen the schema and
    manufacture phantom all-null columns (keep-blank path)."""
    p = tmp_path / "q.tsv"
    p.write_text('id\t"name\tfull"\tval\n1\talice\t0.5\n2\tbob\t1.5\n')
    r = sniff(str(p))
    assert r.format == "csv" and r.options["header"] is True
    assert r.options["header_names"] == ["id", "name\tfull", "val"]
    assert r.options["ncols"] == 3
    df, _ = read_data(spark, str(p))
    assert len(df.columns) == 3
    assert df.count() == 2
    # comma variant through the native reader
    p2 = tmp_path / "q.csv"
    p2.write_text('id,"name,full",val\n1,alice,0.5\n2,bob,1.5\n')
    r2 = sniff(str(p2))
    assert r2.options["header_names"] == ["id", "name,full", "val"]
    df2, _ = read_data(spark, str(p2))
    assert len(df2.columns) == 3 and df2.count() == 2


def test_reference_option_names(spark, tmp_path):
    """Reference csv option spellings pass through Data()/read_data:
    delimiter/quotechar aliases, header as a ROW INDEX, header='auto'
    (keep the sniffed guess) — csv_data.py options contract."""
    p = tmp_path / "opts.csv"
    p.write_text("Report for Q3\na;b;c\n1;'x;y';3\n4;z;6\n")
    # explicit delimiter + quotechar + header index
    df, _ = read_data(spark, str(p), fmt="csv", delimiter=";",
                      quotechar="'", header=1)
    assert df.columns == ["a", "b", "c"]
    assert df.count() == 2
    assert df.collect()[0]["b"] == "x;y"     # quoted delimiter survives
    # header='auto' keeps the sniffed decision (banner + header found)
    p2 = tmp_path / "auto.csv"
    p2.write_text("Title Line\ncol1,col2\n1,2\n3,4\n")
    df2, _ = read_data(spark, str(p2), header="auto")
    assert df2.columns == ["col1", "col2"] and df2.count() == 2
    # header index 0 routes through the native header read
    p3 = tmp_path / "h0.csv"
    p3.write_text("x,y\n1,2\n")
    df3, _ = read_data(spark, str(p3), fmt="csv", header=0)
    assert df3.columns == ["x", "y"] and df3.count() == 1


def test_header_auto_with_forced_format(spark, tmp_path):
    """header='auto' + explicit fmt= still GUESSES (the reference's
    default always guesses; it never means 'headerless')."""
    p = tmp_path / "f.csv"
    p.write_text("Quarterly Totals\nname,amount\nalice,3\nbob,5\n")
    df, _ = read_data(spark, str(p), fmt="csv", header="auto")
    assert df.columns == ["name", "amount"]
    assert df.count() == 2
    p2 = tmp_path / "nh.csv"
    p2.write_text("1,2\n3,4\n")
    df2, _ = read_data(spark, str(p2), fmt="csv", header="auto")
    assert df2.count() == 2 and df2.columns == ["_c0", "_c1"]
