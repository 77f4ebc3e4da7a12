"""Every registered query with an oracle must match DuckDB exactly
(the local mimic of the driver's CORRECTNESS gate). Oracle-less queries
get a rows-run smoke check."""

from __future__ import annotations

import pytest

from pgcp_spark.registry import all_queries
from tests.conftest import SF_DIR_CORRECTNESS
from tests.oracle_check import compare

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    q = QUERIES[name]
    if q.oracle is None:
        df = q.fn(spark, SF_DIR_CORRECTNESS)
        n = df.count()
        assert n >= 0
    else:
        compare(spark, SF_DIR_CORRECTNESS, name, q.fn, q.oracle)
