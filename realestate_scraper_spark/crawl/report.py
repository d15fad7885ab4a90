"""Coverage report — the reference's "mierzalnosc" measurability study
(data/mierzalnosc_final/mierzalnosc_excel.py:90-110) as one DataFrame query.

urls ⟕ offers by canonical URL (J1), unmatched rows annotated from the
quarantine table (J2, replacing the debug-JSONL error map), rolled up per
source: discovered / parsed / yield / reject-reason breakdown. The reference
computed this offline into an Excel sheet; here it is a live query over the
engine's own tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def coverage_report(
    frontier: DataFrame, offers: DataFrame, quarantine: DataFrame
) -> DataFrame:
    """Per-source coverage: n_urls, n_parsed, yield_pct, per-reason rejects.

    Matches the reference's per-adapter sheet shape (urls, offers, diff,
    error annotation), aggregated instead of row-listed.
    """
    urls = frontier.filter(F.col("kind") == "offer").select(
        "source", "url_canon", "status"
    )
    parsed = offers.select(
        F.col("source").alias("o_source"), F.col("url").alias("o_url")
    )
    from realestate_scraper_spark.functions.urlnorm import canonicalize_url

    parsed = parsed.withColumn("o_canon", canonicalize_url(F.col("o_url")))
    q = quarantine.select(
        canonicalize_url(F.col("url")).alias("q_canon"),
        F.col("reject_reason"),
    )
    joined = (
        urls.join(parsed, urls.url_canon == parsed.o_canon, "left")
        .join(q, urls.url_canon == F.col("q_canon"), "left")
        .withColumn(
            "outcome",
            F.when(F.col("o_canon").isNotNull(), F.lit("parsed"))
            .when(F.col("reject_reason").isNotNull(), F.col("reject_reason"))
            .when(F.col("status") == "FAILED", F.lit("fetch_fail"))
            .otherwise(F.lit("pending")),
        )
    )
    per_outcome = joined.groupBy("source").pivot("outcome").count().na.fill(0)
    totals = joined.groupBy("source").agg(
        F.count("*").alias("n_urls"),
        F.sum(F.when(F.col("outcome") == "parsed", 1).otherwise(0)).alias("n_parsed"),
    )
    return (
        totals.join(per_outcome, "source")
        .withColumn(
            "yield_pct",
            F.round(F.col("n_parsed") * 100.0 / F.col("n_urls"), 1),
        )
        .orderBy("source")
    )
