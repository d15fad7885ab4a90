"""SparkSession factory with scale-appropriate defaults.

Settings chosen for the 100 TB design point (SURVEY.md §4):

- AQE on (runtime re-plan, skew-join splitting) — the Otodom hot-domain skew
  named in BASELINE.json is handled by domain-salting *plus* AQE skew joins.
- Arrow on — every Python-side stage is an Arrow-batched pandas UDF; raw
  per-row Python UDFs are banned in this codebase.
- ``maxRecordsPerBatch`` bounded so ~100 KB binary image payloads cannot blow
  executor memory inside an Arrow batch (SURVEY.md §7.5 item 5).
- shuffle partitions default to a multiple of local cores; on a real cluster
  this is set per-job (2-3× total cores) and AQE coalesces down.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Arrow batches carry `bytes` image blobs; 512 rows × ~100 KB ≈ 50 MB/batch,
# comfortably inside a 4 GB executor even with a few batches in flight.
ARROW_MAX_RECORDS_PER_BATCH = 512


def get_spark(
    app_name: str = "realestate-scraper-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession with the engine's tuned defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default all
    cores) in the sandbox; on a cluster the caller passes ``None`` and lets
    spark-submit own it.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.sql.session.timeZone", "UTC")
        # Deterministic float formatting across JVM/Python boundaries.
        .config("spark.sql.legacy.allowUntypedScalaUDF", "false")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
    )
    if shuffle_partitions is not None:
        builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    else:
        builder = builder.config("spark.sql.shuffle.partitions", "32")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()


def local_df(spark: SparkSession, rows, schema, n_partitions: int = 1):
    """Driver-local literal rows → DataFrame via the Arrow batch path.

    ``spark.createDataFrame(list, schema)`` builds a pickled-Python RDD with
    ``defaultParallelism`` partitions — on local[32] a 4-row seed list becomes
    32 tasks, each forking a Python worker, so every downstream action on the
    tiny literal costs ~5 s. Routing through pandas makes the driver build
    Arrow batches once and the JVM execute them without any Python worker;
    with ``coalesce(1)`` the same action costs ~0.2 s. Use for metadata-scale
    literals only (seed lists, dim tables, checkpoint/metrics rows) — bulk
    data belongs in parquet, never in a driver list.
    """
    import pandas as pd

    if not rows:
        # the empty-literal path never schedules real work; keep the plain API
        return spark.createDataFrame([], schema)
    pdf = pd.DataFrame.from_records(list(rows))
    # positional mapping: pandas columns are 0..n-1; the explicit schema
    # names+types them (verified: None → NULL, bytes → binary, int → int)
    return spark.createDataFrame(pdf, schema=schema).coalesce(n_partitions)
