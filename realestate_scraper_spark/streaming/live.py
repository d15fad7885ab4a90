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

from pyspark.sql import DataFrame, SparkSession, Window
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
    foreachBatch (TEST-ONLY sink — the production shape is
    :func:`run_merge_sink`, which MERGEs micro-batches into a
    manifest-committed table; Iceberg: MERGE INTO).

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


def run_merge_sink(
    stream_df: DataFrame,
    checkpoint_dir: str,
    table,
    key_cols: list[str],
    output_mode: str = "update",
) -> None:
    """Production-shaped sink: MERGE each micro-batch into a
    manifest-committed parquet table (sources/tables.ParquetTable) by key.

    Write side is O(micro-batch): each batch lands as one delta snapshot
    stamped with its ``_batch_id`` — never a table rewrite inside the hot
    loop. Resolution is merge-on-read: :func:`merged_table` reconciles the
    deltas latest-wins with a window over (batch id, commit order) — the
    exact machinery the crawl engine's ``frontier()``/``offers()`` views
    use (``tables.read_versioned``; Iceberg: ``MERGE INTO`` with snapshot
    ordering / position deletes).

    Idempotent under foreachBatch's at-least-once replay (the reference's
    at-least-once + semantic-dedup contract, stream.py:59-69): a replayed
    batch re-appends value-identical rows for the same keys and batch id,
    and the latest-wins window collapses them — the merged view is
    replay-invariant."""

    def sink(batch_df: DataFrame, batch_id: int) -> None:
        table.append(
            batch_df.withColumn("_batch_id", F.lit(batch_id)),
            stage=f"stream_merge:{batch_id}",
        )

    (
        stream_df.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .outputMode(output_mode)
        .start()
        .awaitTermination()
    )


def merged_table(
    spark: SparkSession, table, key_cols: list[str]
) -> DataFrame | None:
    """Latest-wins view over a :func:`run_merge_sink` table: one row per
    key, the most recent micro-batch's value (ties broken by commit order —
    a replayed batch's re-append is value-identical, so the pick is
    semantically deterministic)."""
    df = table.read_versioned(spark)
    if df is None:
        return None
    w = Window.partitionBy(*key_cols).orderBy(
        F.desc("_batch_id"), F.desc("_seq")
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_batch_id", "_seq")
    )
