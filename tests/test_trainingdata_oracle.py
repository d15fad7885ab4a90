"""Training-data operator queries vs DuckDB oracles at sf0.01."""

from __future__ import annotations

import pytest

from realestate_scraper_spark.plans.trainingdata import REGISTRY
from tests.duck_compare import compare

SF_DIR = "/root/testdata/sf0.01"


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_query_matches_oracle(spark, name):
    fn, sql = REGISTRY[name]
    if sql is None:
        assert fn(spark, SF_DIR).count() >= 0
        return
    compare(fn(spark, SF_DIR), sql, SF_DIR)


def test_band_pairs_nonempty(spark):
    """The constructed near-dups must actually collide in the LSH band —
    otherwise q32/q33 are vacuous."""
    fn, _ = REGISTRY["q32_minhash_band_pairs"]
    assert fn(spark, SF_DIR).count() > 0


def test_embedding_near_dup_finds_copies(spark):
    fn, _ = REGISTRY["q41_embedding_near_dup"]
    rows = fn(spark, SF_DIR).collect()
    assert len(rows) >= 20  # 500/25 = 20 injected copies
    assert all(r["vec_b"] - r["vec_a"] == 100000 or r["vec_b"] >= 100000 for r in rows)
