"""Regenerate fixtures/ref_profile_lineitem_sf0001.json.gz.

Runs the REFERENCE library (capitalone/DataProfiler, /root/reference)
in-container via baseline_harness's dependency stubs, profiles
sf0.001 lineitem with the labeler disabled, and saves the profile with
the reference's own JSON encoder (profile_builder.py:1141-1156) — the
exact on-disk format a migrating user's saved profiles are in. The
fixture is what tests/test_interop.py and the
``imported_profile_diff_lineitem`` driver query import.

Usage: python scripts/make_ref_profile_fixture.py
"""

from __future__ import annotations

import gzip
import os
import shutil
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from baseline_harness import install_stubs  # noqa: E402


def main() -> None:
    install_stubs()
    sys.path.insert(0, "/root/reference")
    import pandas as pd  # noqa: F401

    import dataprofiler as dp

    df = pd.read_parquet("/root/testdata/sf0.001/lineitem.parquet")
    opts = dp.ProfilerOptions()
    opts.set({"data_labeler.is_enabled": False})
    prof = dp.Profiler(df, samples_per_update=len(df), options=opts)

    out = os.path.join(REPO, "fixtures", "ref_profile_lineitem_sf0001.json.gz")
    with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as tmp:
        path = tmp.name
    try:
        prof.save(path, save_method="json")
        with open(path, "rb") as fi, gzip.open(out, "wb") as fo:
            shutil.copyfileobj(fi, fo)
    finally:
        os.unlink(path)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)")


if __name__ == "__main__":
    main()
