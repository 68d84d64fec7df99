"""Reference-format profile import (interop.py): a profile saved by the
REFERENCE library's own JSON encoder (fixture regenerated in-container by
scripts/make_ref_profile_fixture.py) loads into a DatasetState whose
stats match what this engine computes over the same rows, and the
imported state participates in the merge/diff algebra."""

from __future__ import annotations

import math
import os

import pytest

from dataprofiler_spark.interop import load_reference_profile
from dataprofiler_spark.report import deterministic_report_rows, diff_profiles

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FIXTURE = os.path.join(REPO, "fixtures", "ref_profile_lineitem_sf0001.json.gz")
SF0001 = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def ref_state():
    return load_reference_profile(FIXTURE)


def test_import_basic_shape(ref_state):
    st = ref_state
    assert st.row_count == 6000
    assert st.unique_row_count == 6000
    assert len(st.column_order) == 11
    assert st.column_order[0] == "l_orderkey"
    rf = st.columns["l_returnflag"]
    assert rf.inferred_type == "text"
    assert rf.categorical.categories == {"N": 2070, "R": 1968, "A": 1962}
    assert rf.text.vocab == ["A", "N", "R"]
    sd = st.columns["l_shipdate"]
    assert sd.inferred_type == "datetime"
    assert sd.datetime.min_ts == "1995-01-02 00:00:00"
    assert sd.datetime.max_ts == "2001-11-04 00:00:00"
    assert sd.datetime.formats == ["%Y-%m-%d %H:%M:%S"]
    ok = st.columns["l_orderkey"]
    assert ok.inferred_type == "int"
    assert ok.type_counts == {"datetime": 0, "int": 6000, "float": 6000,
                              "text": 6000}


def test_import_moment_inversion(ref_state):
    """Biased-moment inversion reproduces the reference's own corrected
    stats (values read from the reference's serializable report on the
    same data — see scripts/make_ref_profile_fixture.py)."""
    n = ref_state.columns["l_quantity"].numeric
    assert n.n == 6000
    assert n.min == 1.0 and n.max == 50.0 and n.sum == 152257.0
    assert math.isclose(n.variance, 210.86447605156414, rel_tol=1e-12)
    assert math.isclose(n.skewness, -0.006336271964706753, rel_tol=1e-9)
    assert math.isclose(n.kurtosis, -1.208974530101909, rel_tol=1e-12)
    assert n.histogram and len(n.histogram["bin_counts"]) == 1000


def test_imported_matches_engine_profile(ref_state, spark):
    """The engine profiling the SAME rows produces the same deterministic
    report slice — the migration contract: stats from a loaded legacy
    profile agree with freshly computed Spark stats."""
    from dataprofiler_spark import Profiler

    df = spark.read.parquet(os.path.join(SF0001, "lineitem.parquet"))
    ours = {(c, s): (vn, vs) for c, s, vn, vs in
            deterministic_report_rows(Profiler(df).profile())}
    theirs = {(c, s): (vn, vs) for c, s, vn, vs in
              deterministic_report_rows(ref_state)}
    shared = set(ours) & set(theirs)
    # every engine-side stat family must appear in the imported slice
    assert {"min", "max", "null_count", "len_sum", "min_ts", "row_count"} \
        <= {s for _, s in shared}
    mismatched = {k: (ours[k], theirs[k]) for k in shared
                  if ours[k] != theirs[k]}
    assert not mismatched, mismatched


def test_imported_merge_and_diff(ref_state, spark):
    """Imported state participates in the + algebra and in diff()."""
    from dataprofiler_spark import Profiler

    df = spark.read.parquet(os.path.join(SF0001, "lineitem.parquet"))
    mine = Profiler(df).profile()
    merged = ref_state + mine
    assert merged.row_count == 12000
    assert merged.columns["l_quantity"].numeric.sum == 2 * 152257.0
    assert merged.columns["l_returnflag"].categorical.categories["N"] == 4140

    d = diff_profiles(ref_state, mine)
    assert d["global_stats"]["row_count"] == "unchanged"
    qty = next(c for c in d["data_stats"] if c["column_name"] == "l_quantity")
    stats = qty["statistics"]
    assert stats["min"] == "unchanged" and stats["max"] == "unchanged"
    assert stats["mean"] == "unchanged"
    # variance survives the biased-moment inversion to ~1e-12 relative
    v = stats["variance"]
    assert v == "unchanged" or abs(v) < 1e-9


def test_unstructured_rejected(tmp_path):
    import gzip
    import json
    bad = {"class": "UnstructuredProfiler", "data": {}}
    p = tmp_path / "u.json"
    p.write_text(json.dumps(bad))
    with pytest.raises(NotImplementedError):
        load_reference_profile(str(p))
    with pytest.raises(ValueError):
        load_reference_profile({"class": "SomethingElse", "data": {}})
