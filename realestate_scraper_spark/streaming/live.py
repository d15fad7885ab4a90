"""Streaming pipelines — the `live` mode's continuous semantics (ST1-ST9).

The reference's live pipeline (scrapper/pipelines/stream.py:140-157) is an
unbounded generator with at-least-once external effects and no event-time
handling. The Spark-native upgrade expressed here:

- file-source `readStream` over a landing directory of offer-row parquet
  (each crawl round's staged output is a natural micro-batch),
- event-time tumbling windows + watermark for late data,
- `foreachBatch` idempotent sink (MERGE-by-offer_id semantics — the
  reference dedups by semantic check at the backend, stream.py:59-69),
- `Trigger.AvailableNow` for run-to-completion tests (no long-lived daemon
  in the sandbox).

Every transformation is the same DataFrame expression used in batch mode —
the batch/streaming unification is the point of Structured Streaming.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def stream_offers(spark: SparkSession, landing_dir: str, schema) -> DataFrame:
    """Unbounded offers stream from a landing directory."""
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 4)
        .parquet(landing_dir)
    )


def windowed_city_stats(
    offers_stream: DataFrame,
    event_time_col: str = "seen_at",
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time windowed rollup with late-data watermark:
    per (window, city): offer count + mean price_per_m2.

    The watermark bounds state (ST: late rows beyond it are dropped) — the
    reference has no equivalent; it processes in ingestion order only.
    """
    return (
        offers_stream.withWatermark(event_time_col, watermark)
        .groupBy(F.window(F.col(event_time_col), window).alias("w"), "city")
        .agg(
            F.count("*").alias("n_offers"),
            F.avg("price_per_m2").alias("avg_ppm2"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "city",
            "n_offers",
            "avg_ppm2",
        )
    )


def run_available_now(
    stream_df: DataFrame,
    checkpoint_dir: str,
    output_table: list,
    output_mode: str = "update",
) -> None:
    """Drain the stream with AvailableNow into a driver-side list via
    foreachBatch (test/sandbox sink; production = Iceberg MERGE INTO).

    Default mode is ``update``: each micro-batch emits changed windows and
    the idempotent MERGE-by-key sink keeps the latest value — matching the
    reference's at-least-once + semantic-dedup behavior (stream.py:59-69).
    (``append`` would hold back windows the watermark hasn't closed.)
    """

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        output_table.extend((batch_id, *r) for r in batch_df.collect())

    (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode(output_mode)
        .start()
        .awaitTermination()
    )
