"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` aggregates the engine's operator registries (SURVEY.md §2
inventory + training-data operators + rows-only image/crawl paths);
``oracle_sql()`` returns the matching DuckDB SQL for every SQL-expressible
query. See realestate_scraper_spark/plans/ for the implementations.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))


def _registry() -> dict:
    from realestate_scraper_spark.plans import images_queries, relational, trainingdata

    merged: dict = {}
    merged.update(relational.REGISTRY)
    merged.update(trainingdata.REGISTRY)
    merged.update(images_queries.REGISTRY)
    return merged


def entry(spark: SparkSession) -> DataFrame:
    """Flagship smoke: region rollup (3-table broadcast-join + agg) at
    sf0.001."""
    from realestate_scraper_spark.plans.relational import q04_region_rollup

    return q04_region_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: fn for name, (fn, _sql) in sorted(_registry().items())}


def oracle_sql() -> dict[str, str]:
    return {
        name: sql
        for name, (_fn, sql) in sorted(_registry().items())
        if sql is not None
    }
