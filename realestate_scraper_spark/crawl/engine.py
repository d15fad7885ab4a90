"""The crawl round loop — ST1-ST9 (SURVEY.md §2.9) as rounds-as-batch-jobs.

One round =
  1. pick the next pending listing page per source (sequential pagination,
     parallel across sources/domains) + all pending offer pages,
  2. politeness-governed fetch (mapInPandas, partitioned by domain_salt),
  3. listings → link extraction → classify → canonicalize → Bloom+anti-join
     dedupe (O1) → new PENDING frontier rows,
  4. offers → parse cascade → refine (expressions) → offers/photos/quarantine
     appends,
  5. frontier status transitions + checkpoint + Bloom snapshot + metrics.

Termination (ST2): per-source done when no pending listing pages remain
(no_links), two consecutive pages yield no new offer URLs (no_new, A5 —
morizon.py:703-709), or max_pages (L2). A global offer limit (ST3) brakes the
whole crawl. Failed regions stay not-done and re-enter on the next run (ST5).

Resume (ST4): CrawlEngine.resume() rebuilds frontier + checkpoint + Bloom
from the run directory and continues where the previous process stopped —
kill-and-resume yields the same final tables as an uninterrupted run
(idempotent re-dedup makes overlap harmless).

The driver-side loop is the one intentionally imperative piece (the crawl is
inherently iterative — same as the reference's `while True` pagination,
otodom.py:484-617); every step inside a round is a declarative DataFrame op.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestate_scraper_spark.crawl import fetch as fetch_mod
from realestate_scraper_spark.crawl import frontier as frontier_mod
from realestate_scraper_spark.crawl import parse as parse_mod
from realestate_scraper_spark.crawl import refine as refine_mod
from realestate_scraper_spark.crawl.bloom import ShardedBloom
from realestate_scraper_spark.schemas import (
    CHECKPOINT_SCHEMA,
    METRICS_SCHEMA,
    STATUS_DONE,
    STATUS_FAILED,
    STATUS_PENDING,
)
from realestate_scraper_spark.sources.tables import ParquetTable


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        run_dir: str,
        graph_rows: list[dict],
        *,
        n_salts: int = 4,
        max_pages: int | None = None,
        offer_limit: int | None = None,
        photo_limit: int | None = None,
        no_new_stop: int = 2,
        real_sleep: bool = False,
        bloom_fpp: float = 0.01,
    ):
        self.spark = spark
        self.run_dir = run_dir
        self.n_salts = n_salts
        self.max_pages = max_pages
        self.offer_limit = offer_limit
        self.photo_limit = photo_limit
        self.no_new_stop = no_new_stop
        self.real_sleep = real_sleep
        self.bloom_fpp = bloom_fpp

        os.makedirs(run_dir, exist_ok=True)
        self.t_frontier = ParquetTable(run_dir, "frontier")
        self.t_offers = ParquetTable(run_dir, "offers")
        self.t_photos = ParquetTable(run_dir, "photos")
        self.t_quarantine = ParquetTable(run_dir, "quarantine")
        self.t_metrics = ParquetTable(run_dir, "metrics")
        self.t_checkpoint = ParquetTable(run_dir, "checkpoint")
        self.bloom_path = os.path.join(run_dir, "bloom.npz")

        self.page_store_bc = spark.sparkContext.broadcast(
            fetch_mod.build_page_store(graph_rows)
        )
        self.bloom = ShardedBloom(fpp=bloom_fpp)
        # per-source streak of consecutive listing pages with zero new offers
        self._no_new_streak: dict[str, int] = {}
        self._stopped: dict[str, str] = {}  # source → stop_reason
        self._offers_total = 0
        self.round_idx = 0

    # ------------------------------------------------------------- seeding
    def seed(self, seeds: list[tuple[str, str]]) -> None:
        df = frontier_mod.seed_frontier(self.spark, seeds, self.n_salts)
        frontier_mod.assert_frontier_schema(df)
        self.t_frontier.overwrite(df, round_idx=0, stage="seed")
        self.bloom = ShardedBloom(fpp=self.bloom_fpp)
        self._merge_bloom(df)
        self._write_checkpoint()

    # -------------------------------------------------------------- resume
    @classmethod
    def resume(cls, spark: SparkSession, run_dir: str, graph_rows: list[dict], **kw):
        eng = cls(spark, run_dir, graph_rows, **kw)
        cp = eng.t_checkpoint.read(spark)
        if cp is not None:
            for r in cp.collect():
                eng.round_idx = max(eng.round_idx, r["round"])
                if r["done"] and r["stop_reason"]:
                    eng._stopped[r["source"]] = r["stop_reason"]
            off = eng.t_offers.read(spark)
            eng._offers_total = off.count() if off is not None else 0
        if os.path.exists(eng.bloom_path):
            eng.bloom = ShardedBloom.load(eng.bloom_path, fpp=eng.bloom_fpp)
        else:
            fr = eng.t_frontier.read(spark)
            if fr is not None:
                eng.bloom = ShardedBloom.build(fr, fpp=eng.bloom_fpp)
        return eng

    # ---------------------------------------------------------- round loop
    def run(self, max_rounds: int = 1000) -> dict:
        stats = {"rounds": 0, "pages_fetched": 0, "offers_parsed": 0}
        for _ in range(max_rounds):
            progressed, fetched_n, offers_n = self._one_round()
            if not progressed:
                break
            stats["rounds"] += 1
            stats["pages_fetched"] += fetched_n
            stats["offers_parsed"] += offers_n
            if self.offer_limit and self._offers_total >= self.offer_limit:
                for src in self._active_sources():
                    self._stopped.setdefault(src, "offer_limit")
                self._write_checkpoint()
                break
        return stats

    def _active_sources(self) -> list[str]:
        fr = self.t_frontier.read(self.spark)
        if fr is None:
            return []
        return [r["source"] for r in fr.select("source").distinct().collect()]

    def _one_round(self) -> tuple[bool, int, int]:
        t_start = time.monotonic()
        self.round_idx += 1
        fr = self.t_frontier.read(self.spark)
        if fr is None:
            return False, 0, 0
        fr = fr.cache()

        pending = fr.filter(F.col("status") == STATUS_PENDING)
        if self.max_pages is not None:
            pending = pending.filter(
                (F.col("kind") != "listing") | (F.col("page_idx") <= self.max_pages)
            )
        if self._stopped:
            stopped = list(self._stopped)
            pending = pending.filter(~F.col("source").isin(stopped))

        # Sequential pagination per source: only the lowest pending listing
        # page is eligible this round (its successor is discovered on it).
        next_pages = (
            pending.filter(F.col("kind") == "listing")
            .groupBy("source")
            .agg(F.min("page_idx").alias("page_idx"))
        )
        listing_batch = pending.filter(F.col("kind") == "listing").join(
            F.broadcast(next_pages), on=["source", "page_idx"], how="left_semi"
        )
        offer_batch = pending.filter(F.col("kind") == "offer")
        batch = listing_batch.unionByName(offer_batch).cache()
        batch_n = batch.count()
        if batch_n == 0:
            # nothing pending → finalize done flags
            self._finalize_done(fr)
            fr.unpersist()
            return False, 0, 0

        fetched = fetch_mod.fetch(
            batch, self.page_store_bc, self.n_salts, real_sleep=self.real_sleep
        ).cache()

        # ---- listings → new frontier candidates
        listings = fetched.filter(F.col("kind") == "listing")
        links = listings.select(
            "source", "page_idx", "url", "html"
        ).mapInPandas(parse_mod.extract_links_batches, schema=parse_mod.LINKS_FIELDS)
        candidates = frontier_mod.classify_and_key_links(links, self.n_salts)
        fresh = frontier_mod.anti_join_seen(candidates, fr, self.bloom)
        new_rows = frontier_mod.finish_new_rows(fresh, self.round_idx).cache()
        new_n = new_rows.count()

        # per-source new-offer counts for the no_new stop rule (A5/A6)
        new_offer_counts = {
            r["source"]: r["n"]
            for r in new_rows.filter(F.col("kind") == "offer")
            .groupBy("source")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        listing_sources = [
            r["source"] for r in listings.select("source").distinct().collect()
        ]

        # ---- offers → parse → refine → sinks
        offers_fetched = fetched.filter(
            (F.col("kind") == "offer") & (F.col("fetch_status") == fetch_mod.FETCH_OK)
        )
        parsed = offers_fetched.select(
            "url", "url_canon", "source", "page_idx", "slot", "sub_slot", "html"
        ).mapInPandas(parse_mod.parse_offer_batches, schema=parse_mod.OFFER_FIELDS)
        valid, quarantine = refine_mod.refine_offers(parsed)
        photos = refine_mod.explode_photos(parsed, self.photo_limit)

        offers_n = self.t_offers.append(
            valid, round_idx=self.round_idx, stage="offers"
        )
        self.t_photos.append(photos, round_idx=self.round_idx, stage="photos")
        self.t_quarantine.append(
            quarantine, round_idx=self.round_idx, stage="quarantine"
        )
        self._offers_total += offers_n

        # ---- frontier transitions: fetched rows leave PENDING
        status_map = fetched.select(
            "url_hash64",
            F.when(F.col("fetch_status") == fetch_mod.FETCH_OK, STATUS_DONE)
            .otherwise(STATUS_FAILED)
            .alias("new_status"),
        )
        updated = (
            fr.join(F.broadcast(status_map), on="url_hash64", how="left")
            .withColumn("status", F.coalesce("new_status", "status"))
            .drop("new_status")
        )
        next_frontier = updated.unionByName(new_rows)
        self.t_frontier.overwrite(
            next_frontier, round_idx=self.round_idx, stage="frontier"
        )
        self._merge_bloom(new_rows)
        self.bloom.save(self.bloom_path)

        # ---- stop rules
        for src in listing_sources:
            if new_offer_counts.get(src, 0) == 0:
                streak = self._no_new_streak.get(src, 0) + 1
                self._no_new_streak[src] = streak
                if streak >= self.no_new_stop:
                    self._stopped[src] = "no_new"
            else:
                self._no_new_streak[src] = 0

        # ---- metrics (per-partition lineage: per domain_salt counters)
        per_part = (
            fetched.groupBy("domain_salt")
            .agg(
                F.count("*").alias("rows_in"),
                F.sum(
                    F.when(F.col("fetch_status") == fetch_mod.FETCH_OK, 1).otherwise(0)
                ).alias("rows_out"),
                F.sum(
                    F.when(F.col("fetch_status") != fetch_mod.FETCH_OK, 1).otherwise(0)
                ).alias("failures"),
            )
            .collect()
        )
        wall_ms = (time.monotonic() - t_start) * 1000
        metrics_rows = [
            (
                self.round_idx, "fetch", i, r["domain_salt"],
                int(r["rows_in"]), int(r["rows_out"]), int(r["failures"]), wall_ms,
            )
            for i, r in enumerate(per_part)
        ] + [(self.round_idx, "discover", -1, None, int(batch_n), int(new_n), 0, wall_ms),
         (self.round_idx, "offers", -1, None, int(batch_n), int(offers_n), 0, wall_ms)]
        self.t_metrics.append(
            self.spark.createDataFrame(metrics_rows, METRICS_SCHEMA),
            round_idx=self.round_idx,
            stage="metrics",
        )

        self._write_checkpoint()
        fetched.unpersist()
        batch.unpersist()
        new_rows.unpersist()
        fr.unpersist()
        return True, batch_n, offers_n

    # ------------------------------------------------------------ teardown
    def _finalize_done(self, fr: DataFrame) -> None:
        for src in [r["source"] for r in fr.select("source").distinct().collect()]:
            self._stopped.setdefault(src, "no_links")
        self._write_checkpoint()

    def _merge_bloom(self, df: DataFrame) -> None:
        if df.isEmpty():
            return
        add = ShardedBloom.build(df, fpp=self.bloom_fpp)
        self.bloom.merge(add)

    def _write_checkpoint(self) -> None:
        fr = self.t_frontier.read(self.spark)
        rows = []
        if fr is not None:
            prog = (
                fr.filter((F.col("kind") == "listing") & (F.col("status") == STATUS_DONE))
                .groupBy("source")
                .agg(F.max("page_idx").alias("last_page_done"))
                .collect()
            )
            pending_src = {
                r["source"]
                for r in fr.filter(F.col("status") == STATUS_PENDING)
                .select("source")
                .distinct()
                .collect()
            }
            last = {r["source"]: r["last_page_done"] for r in prog}
            srcs = {r["source"] for r in fr.select("source").distinct().collect()}
            for src in sorted(srcs):
                reason = self._stopped.get(src)
                done = reason is not None or src not in pending_src
                rows.append(
                    (
                        src, src, done, int(last.get(src, 0)),
                        reason if reason else ("no_links" if done else None),
                        int(self._offers_total), self.round_idx,
                        self.bloom_path if os.path.exists(self.bloom_path) else None,
                    )
                )
        self.t_checkpoint.overwrite(
            self.spark.createDataFrame(rows, CHECKPOINT_SCHEMA),
            round_idx=self.round_idx,
            stage="checkpoint",
        )

    # ------------------------------------------------------------- results
    def offers(self) -> DataFrame | None:
        return self.t_offers.read(self.spark)

    def photos(self) -> DataFrame | None:
        return self.t_photos.read(self.spark)

    def frontier(self) -> DataFrame | None:
        return self.t_frontier.read(self.spark)
