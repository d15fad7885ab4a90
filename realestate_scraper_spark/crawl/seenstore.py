"""Bucketed URL-seen store — the O(1)-exchange side of the J4/O1 anti-join.

The round-2 design scanned every frontier insert delta and SHUFFLED that
whole seen side through the per-round anti-join — O(total frontier) exchange
per round, the one flagged scale-killer at 10^10 URLs. This store fixes the
physics:

- the seen set lives in a Spark **bucketed table** (``CLUSTERED BY
  (url_canon) … INTO n BUCKETS``, hash = Spark's murmur3 bucketing): the scan
  reports ``HashPartitioning(url_canon, n)`` so the anti-join needs **no
  exchange and no re-sort of the seen side** — only the (small) maybe-seen
  candidate batch is shuffled, into n partitions that line up with the
  buckets. ``Bucketed: true`` + exactly one Exchange is asserted in
  tests/test_seen_store.py.
- per-round inserts are O(new URLs) bucketed appends (``coalesce(1)`` → ≤ n
  files per round at metadata scale; on a cluster the coalesce is dropped and
  each append is task-parallel);
- every ``compact_every`` appends the store is rewritten to one file per
  bucket, so the per-round file count — and with it the seen-scan's open/plan
  cost — stays O(appends-since-compaction), never O(rounds).

Durability: the data lives under ``run_dir/seen_bucketed`` (survives the
session); the bucketing METADATA lives in the session catalog, so resume in a
fresh session re-registers the table with a ``CREATE TABLE … CLUSTERED BY …
LOCATION`` DDL over the existing files (``ensure_registered``). If the
directory is absent entirely (pre-upgrade run dirs), the store is rebuilt
from the frontier's insert-delta snapshots.

In production this maps to an Iceberg table with a bucket partition transform
(``bucket(n, url_canon)``) + storage-partitioned joins; compaction is
``rewrite_data_files``. The sandbox has no Iceberg jar, so Spark's native
bucketed tables stand in — same join physics.

Replaces: the reference's in-memory DedupeSet (scrapper/core/dedup.py:17-27)
as the durable half of the dedupe-before-fetch gate; the Bloom prefilter
(crawl/bloom.py) remains the cheap first pass in front of this exact check.
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession


class BucketedSeenStore:
    def __init__(
        self,
        spark: SparkSession,
        run_dir: str,
        *,
        n_buckets: int = 8,
        compact_every: int = 8,
        coalesce_appends: bool = True,
    ):
        self.spark = spark
        self.dir = os.path.join(run_dir, "seen_bucketed")
        # catalog names are session-global; key them by run_dir so parallel
        # engines in one session can't collide
        self.table = (
            "seen_" + hashlib.md5(os.path.abspath(run_dir).encode()).hexdigest()[:12]
        )
        self.n_buckets = n_buckets
        self.compact_every = compact_every
        self.coalesce_appends = coalesce_appends
        self._appends_since_compact = 0

    # ------------------------------------------------------------ lifecycle
    def registered(self) -> bool:
        return self.spark.catalog.tableExists(self.table)

    def _has_files(self) -> bool:
        if not os.path.isdir(self.dir):
            return False
        return any(f.endswith(".parquet") for f in os.listdir(self.dir))

    def reset(self) -> None:
        """Fresh start (seed time): drop catalog entry + data files."""
        if self.registered():
            self.spark.sql(f"DROP TABLE {self.table}")
        shutil.rmtree(self.dir, ignore_errors=True)
        self._appends_since_compact = 0

    def ensure_registered(self, rebuild_from: DataFrame | None = None) -> None:
        """Make the catalog know the table. Existing files → DDL-register the
        bucket spec over them; no files → bucketed rewrite of
        ``rebuild_from`` (the frontier insert-delta scan) if given."""
        if self.registered():
            return
        if self._has_files():
            self.spark.sql(
                f"CREATE TABLE {self.table} (url_canon STRING) USING PARQUET "
                f"CLUSTERED BY (url_canon) SORTED BY (url_canon) "
                f"INTO {self.n_buckets} BUCKETS LOCATION '{self.dir}'"
            )
        elif rebuild_from is not None:
            self.append(rebuild_from)

    # ------------------------------------------------------------------- io
    def append(self, df: DataFrame) -> None:
        """O(new URLs) bucketed append; periodic compaction keeps the file
        count O(compact_every × n_buckets)."""
        out = df.select("url_canon")
        if self.coalesce_appends:
            # toy-scale appends are a few rows; one task → ≤ n_buckets files.
            # On a cluster, drop the coalesce: appends stay task-parallel.
            out = out.coalesce(1)
        (
            out.write.mode("append")
            .format("parquet")
            .bucketBy(self.n_buckets, "url_canon")
            .sortBy("url_canon")
            .option("path", self.dir)
            .saveAsTable(self.table)
        )
        self._appends_since_compact += 1
        if self._appends_since_compact >= self.compact_every:
            self.compact()

    def df(self) -> DataFrame:
        """The seen set as a bucketed scan (url_canon only)."""
        return self.spark.table(self.table).select("url_canon")

    def compact(self) -> None:
        """Merge delta files to one file per bucket (Iceberg
        rewrite_data_files). Materializes to a temp dir first — Spark can't
        overwrite a table it is reading. Rows are unique by construction
        (every insert passed the anti-join), so this is a pure file merge."""
        if not self.registered():
            return
        tmp = self.dir + ".compact.tmp"
        self.spark.table(self.table).write.mode("overwrite").parquet(tmp)
        comp = self.spark.read.parquet(tmp)
        (
            comp.coalesce(1)
            .write.mode("overwrite")
            .format("parquet")
            .bucketBy(self.n_buckets, "url_canon")
            .sortBy("url_canon")
            .option("path", self.dir)
            .saveAsTable(self.table)
        )
        shutil.rmtree(tmp, ignore_errors=True)
        self._appends_since_compact = 0

    def n_files(self) -> int:
        if not os.path.isdir(self.dir):
            return 0
        return sum(1 for f in os.listdir(self.dir) if f.endswith(".parquet"))
