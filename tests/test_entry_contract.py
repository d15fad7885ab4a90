"""The driver contract: entry() smoke, every queries() entry runs, every
oracle key exists in queries()."""

from __future__ import annotations

import importlib.util
import sys
from pathlib import Path

import pytest

spec = importlib.util.spec_from_file_location(
    "__spark_entry__", Path(__file__).resolve().parents[1] / "__spark_entry__.py"
)
entry_mod = importlib.util.module_from_spec(spec)
spec.loader.exec_module(entry_mod)


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    rows = df.collect()
    assert len(rows) >= 1
    assert set(df.columns) == {"region_name", "n_customers", "total_acctbal"}


def test_registry_is_exactly_fifty_keys():
    """Registry hygiene guard (VERDICT r5 ask #8): the driver's board caps
    at 50 rows — a future merge must extend an existing key, never append
    past 50; and no key may sort past q54 (the board's last slot)."""
    q = entry_mod.queries()
    assert len(q) == 50, f"registry must stay at exactly 50 keys, got {len(q)}"
    assert max(q) <= "q55", f"key past the board cap: {max(q)}"
    assert all(k.startswith("q") and k[1:3].isdigit() for k in q)


def test_oracle_keys_subset_of_queries():
    q = entry_mod.queries()
    o = entry_mod.oracle_sql()
    assert set(o) <= set(q)
    assert len(q) >= 40
    # rows-only (non-SQL-expressible) entries are the image/crawl paths only
    rows_only = set(q) - set(o)
    assert rows_only == {
        "q50_image_decode_meta",
        "q51_phash_near_dup",
        "q52_crawl_end_to_end",
        "q54_image_thumbnails",
    }


@pytest.mark.parametrize(
    "name",
    [
        "q50_image_decode_meta",
        "q51_phash_near_dup",
        "q52_crawl_end_to_end",
        "q54_image_thumbnails",
    ],
)
def test_rows_only_queries_run(spark, name):
    df = entry_mod.queries()[name](spark, "/root/testdata/sf0.001")
    assert df.count() > 0
