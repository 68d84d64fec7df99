"""Generative JSON round-trip battery (VERDICT r8 item 7 — the JSON
twin of the r8 CSV battery in test_sniff_regressions): random
documents with random payload-key placement, nesting depth,
list-of-lists vs record payloads, json-lines vs pretty documents,
interior blank lines, and UTF-16/32 json-lines must sniff+read back
with exact row/column/value fidelity. Deterministic seed — a fixed
battery, not flaky fuzzing."""

from __future__ import annotations

import json
import random

from dataprofiler_spark.sources.sniff import read_data, sniff


def _record(rng, keys):
    return {k: (rng.randint(0, 999) if i % 2 == 0
                else f"v{rng.randint(0, 99)}")
            for i, k in enumerate(keys)}


def test_json_lines_battery(spark, tmp_path):
    """json-lines: flat and nested records, random key sets, interior
    blank lines, and legacy encodings all parse with exact counts."""
    rng = random.Random(99)
    for case in range(12):
        nkeys = rng.randint(2, 5)
        keys = [f"k{case}_{i}" for i in range(nkeys)]
        nested = rng.random() < 0.4
        blanks = rng.random() < 0.3
        enc = rng.choice(["utf-8", "utf-8", "utf-8", "utf-16", "utf-32"])
        nrows = rng.randint(3, 25)
        lines = []
        rows = []
        for r in range(nrows):
            rec = _record(rng, keys)
            if nested:
                rec = {"outer": rec, "id": r}
            rows.append(rec)
            lines.append(json.dumps(rec))
            if blanks and rng.random() < 0.2:
                lines.append("")
        p = tmp_path / f"lines_{case}.json"
        p.write_bytes(("\n".join(lines) + "\n").encode(enc))

        res = sniff(str(p))
        assert res.format == "json", (case, res)
        assert res.options.get("multiline") is not True, (case, res)
        df, _ = read_data(spark, str(p))
        assert df.count() == nrows, (case, enc, nested)
        if nested:
            assert "outer" in df.columns and "id" in df.columns
            probe = df.where(df["id"] == 0).collect()[0]
            assert probe["outer"].asDict() == rows[0]["outer"], case
        else:
            assert sorted(df.columns) == sorted(keys), (case, df.columns)
            a = sorted(json.dumps(r.asDict(recursive=True), sort_keys=True)
                       for r in df.collect())
            b = sorted(json.dumps(r, sort_keys=True) for r in rows)
            assert a == b, case


def test_json_document_battery(spark, tmp_path):
    """Pretty-printed documents: the payload list (records OR
    list-of-lists) under a default payload key becomes the data — at
    random metadata nesting depths — and the metadata lands in the
    metadata frame."""
    rng = random.Random(77)
    for case in range(12):
        payload_key = rng.choice(["data", "payload"])
        list_of_lists = rng.random() < 0.35
        nrows = rng.randint(2, 20)
        meta_depth = rng.randint(1, 3)
        if list_of_lists:
            width = rng.randint(2, 5)
            payload = [[str(rng.randint(0, 99)) for _ in range(width)]
                       for _ in range(nrows)]
        else:
            keys = [f"f{i}" for i in range(rng.randint(2, 4))]
            payload = [_record(rng, keys) for _ in range(nrows)]
        meta: dict = {"kind": f"case{case}", "n": nrows}
        for d in range(meta_depth):
            meta = {f"level{d}": meta}
        doc = {payload_key: payload, "meta": meta}
        p = tmp_path / f"doc_{case}.json"
        p.write_text(json.dumps(doc, indent=2))

        res = sniff(str(p))
        assert res.format == "json", (case, res)
        assert res.options.get("multiline") is True, (case, res)
        df, res2 = read_data(spark, str(p))
        assert df.count() == nrows, case
        if list_of_lists:
            assert len(df.columns) == width, (case, df.columns)
            first = df.collect()[0]
            assert list(first) == payload[0], case
        else:
            assert sorted(df.columns) == sorted(
                f"{payload_key}.{k}" for k in keys), (case, df.columns)
        meta_df = res2.metadata_df
        assert meta_df is not None and meta_df.count() == 1
        deep_col = ("meta." + ".".join(f"level{d}" for d in
                                       reversed(range(meta_depth)))
                    + ".kind")
        assert deep_col in meta_df.columns, (case, meta_df.columns)
        assert meta_df.collect()[0][deep_col] == f"case{case}"
        assert payload_key not in meta_df.columns


def test_json_document_dual_payload_battery(spark, tmp_path):
    """Both default payload keys present: the LARGER list wins,
    whichever key holds it (reference dual-payload rule)."""
    rng = random.Random(55)
    for case in range(6):
        big_key = rng.choice(["data", "payload"])
        small_key = "payload" if big_key == "data" else "data"
        n_big = rng.randint(5, 15)
        n_small = rng.randint(1, n_big - 1)
        doc = {
            big_key: [{"a": i, "b": f"x{i}"} for i in range(n_big)],
            small_key: [{"c": i} for i in range(n_small)],
        }
        p = tmp_path / f"dual_{case}.json"
        p.write_text(json.dumps(doc, indent=2))
        df, res = read_data(spark, str(p))
        assert df.count() == n_big, (case, big_key)
        assert all(c.startswith(f"{big_key}.") for c in df.columns), case
        assert f"{small_key}.0.c" in res.metadata_df.columns \
            or any(c.startswith(small_key) for c in
                   res.metadata_df.columns), case


def test_json_dict_payload_union(spark, tmp_path):
    """Dict-of-record-lists payload: every nested list explodes and
    unions by name (documented divergence from the reference's
    coalesce — same rows for disjoint shapes)."""
    doc = {"data": {"cats": [{"name": "a", "age": 3},
                             {"name": "b", "age": 4}],
                    "dogs": [{"name": "c", "weight": 30.0}]},
           "version": 7}
    p = tmp_path / "zoo.json"
    p.write_text(json.dumps(doc, indent=2))
    df, res = read_data(spark, str(p))
    assert df.count() == 3
    assert "data.cats.name" in df.columns
    assert "data.dogs.weight" in df.columns
    assert res.metadata_df.collect()[0]["version"] == 7
