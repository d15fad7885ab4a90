"""Structured Streaming: windowed city stats over an offers landing dir,
drained with AvailableNow; results equal the identical batch expression."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from realestate_scraper_spark.streaming.live import (
    run_available_now,
    stream_offers,
    windowed_city_stats,
)

SCHEMA = T.StructType(
    [
        T.StructField("offer_id", T.StringType()),
        T.StructField("city", T.StringType()),
        T.StructField("price_per_m2", T.DoubleType()),
        T.StructField("seen_at", T.TimestampType()),
    ]
)


def _make_landing(spark, path: str):
    import datetime as dt

    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = []
    for i in range(200):
        rows.append(
            (
                f"o{i}",
                ["Gdansk", "Sopot", "Gdynia"][i % 3],
                8000.0 + i,
                base + dt.timedelta(minutes=i % 45),
            )
        )
    df = spark.createDataFrame(rows, SCHEMA)
    # several files → several micro-batches with maxFilesPerTrigger
    df.repartition(8).write.mode("overwrite").parquet(path)
    return df


def test_streaming_windowed_stats_equal_batch(spark, tmp_path):
    landing = str(tmp_path / "landing")
    ckpt = str(tmp_path / "ckpt")
    batch_df = _make_landing(spark, landing)

    out: list = []
    stream = windowed_city_stats(stream_offers(spark, landing, SCHEMA))
    run_available_now(stream, ckpt, out)

    # update-mode emissions, MERGE-by-key keeping the latest (rows are
    # (batch_id, window_start, window_end, city, n_offers, avg_ppm2))
    got: dict = {}
    for r in sorted(out, key=lambda r: r[0]):
        got[(r[1], r[2], r[3])] = r[4]
    want_rows = windowed_city_stats(batch_df).collect()
    want = {
        (r["window_start"], r["window_end"], r["city"]): r["n_offers"]
        for r in want_rows
    }
    assert len(want) > 0
    assert got == want
