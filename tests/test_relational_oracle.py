"""Every relational registry query must match its DuckDB oracle at sf0.01 —
the same check the driver's CORRECTNESS gate runs."""

from __future__ import annotations

import pytest

from realestate_scraper_spark.plans.relational import REGISTRY
from tests.duck_compare import compare

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    fn, sql = REGISTRY[name]
    if sql is None:
        df = fn(spark, SF_DIR)
        assert df.count() >= 0
        return
    compare(fn(spark, SF_DIR), sql, SF_DIR)
