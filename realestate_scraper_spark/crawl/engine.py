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

Driver-job budget: a round is expensive at 10^10 scale only through its
Spark actions, so the loop runs a FIXED, small number of them —
  (a) one fetch+summary aggregation (politeness metrics, per-partition
      lineage counters, listing sources — one collect),
  (b) one collect of the round's NEW frontier rows (bounded by the round's
      link yield, not frontier size) which also feeds the Bloom shards
      driver-side,
  (c) ONE staged append of the refined parse output (the raw zone;
      offers/photos/quarantine are views over it, materialized once per
      run) and the frontier rewrite (Iceberg MERGE INTO in production —
      the rewrite here is the sandbox stand-in).
Checkpoint progress (pending pages/offers, last page done) is tracked
driver-side in lockstep with the table and written as atomic JSON, so no
read-back aggregation runs per round; metrics rows buffer and flush once.
Row counts come from parquet footers (no counting jobs). The driver-side
loop is the one intentionally imperative piece (the crawl is inherently
iterative — same as the reference's `while True` pagination,
otodom.py:484-617); every step inside a round is a declarative DataFrame op.
"""

from __future__ import annotations

import os
import time
from collections import defaultdict

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from realestate_scraper_spark.crawl import fetch as fetch_mod
from realestate_scraper_spark.crawl import frontier as frontier_mod
from realestate_scraper_spark.crawl import parse as parse_mod
from realestate_scraper_spark.crawl import refine as refine_mod
from realestate_scraper_spark.crawl.bloom import ShardedBloom
from realestate_scraper_spark.schemas import (
    CHECKPOINT_SCHEMA,
    FRONTIER_SCHEMA,
    METRICS_SCHEMA,
    STATUS_DONE,
    STATUS_FAILED,
    STATUS_PENDING,
)
from realestate_scraper_spark.sources.tables import ParquetTable, _rows_from_footers


def _rows_under(path: str) -> int:
    return _rows_from_footers(path) if os.path.isdir(path) else 0


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
        append_coalesce: int | None = 4,
        robots_rules: dict | None = None,
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
        # small per-round appends get coalesced at toy scale; None = leave
        # the write parallelism alone (the 100 TB setting).
        self.append_coalesce = append_coalesce
        # domain → RobotsRules; when set, robots gating runs as a pure
        # expression BEFORE any politeness budget is spent (crawl/politeness)
        self.robots_rules = robots_rules

        os.makedirs(run_dir, exist_ok=True)
        self.t_frontier = ParquetTable(run_dir, "frontier")
        # raw zone: one staged append per round (refined parse output,
        # partitioned by validity so counts come from parquet footers);
        # curated offers/photos/quarantine are views over it, durably
        # materialized once per run in _finalize_curated().
        self.t_staged = ParquetTable(run_dir, "staged")
        self.t_offers = ParquetTable(run_dir, "offers")
        self.t_photos = ParquetTable(run_dir, "photos")
        self.t_quarantine = ParquetTable(run_dir, "quarantine")
        self.t_metrics = ParquetTable(run_dir, "metrics")
        self.bloom_path = os.path.join(run_dir, "bloom.npz")
        # checkpoint state is tiny driver state → atomic JSON, exactly the
        # reference's *_state.json pattern (cli.py:128-139)
        self.checkpoint_path = os.path.join(run_dir, "checkpoint.json")

        self.page_store_bc = spark.sparkContext.broadcast(
            fetch_mod.build_page_store(graph_rows)
        )
        self.bloom = ShardedBloom(fpp=bloom_fpp)
        # per-source streak of consecutive listing pages with zero new offers
        self._no_new_streak: dict[str, int] = {}
        self._stopped: dict[str, str] = {}  # source → stop_reason
        self._sources: set[str] = set()
        self._offers_total = 0
        self.round_idx = 0
        # Driver-tracked frontier progress (kept in lockstep with the table
        # so checkpointing never needs a read-back aggregation):
        self._pending_listing_pages: dict[str, set[int]] = {}
        self._pending_offers: dict[str, int] = {}
        self._last_page_done: dict[str, int] = {}
        self._had_fetch_fail: dict[str, bool] = {}  # listing-page failures
        self._metrics_buf: list[tuple] = []

    # ------------------------------------------------------------- seeding
    def seed(self, seeds: list[tuple[str, str]]) -> None:
        if self.robots_rules is None:
            self._bootstrap_robots(seeds)
        df = frontier_mod.seed_frontier(self.spark, seeds, self.n_salts)
        frontier_mod.assert_frontier_schema(df)
        rows = df.collect()
        self.t_frontier.overwrite(
            self.spark.createDataFrame(rows, FRONTIER_SCHEMA).coalesce(1),
            round_idx=0,
            stage="seed",
        )
        self.bloom = ShardedBloom(fpp=self.bloom_fpp)
        self._bloom_add_rows(rows)
        self._track_new_rows(rows)
        self._write_checkpoint()

    def _bootstrap_robots(self, seeds: list[tuple[str, str]]) -> None:
        """Fetch + parse each seed domain's /robots.txt from the page store
        before the first crawl round (the standard pre-crawl handshake; the
        reference never does this — robots handling is a north_rule add)."""
        from urllib.parse import urlsplit

        from realestate_scraper_spark.crawl.politeness import parse_robots_txt

        store = self.page_store_bc.value
        rules = {}
        for _source, url in seeds:
            domain = urlsplit(url).netloc
            if domain in rules:
                continue
            rec = store.get(f"https://{domain}/robots.txt")
            if rec is not None:
                rules[domain] = parse_robots_txt(domain, rec[0])
        if rules:
            self.robots_rules = rules

    # -------------------------------------------------------------- resume
    @classmethod
    def resume(cls, spark: SparkSession, run_dir: str, graph_rows: list[dict], **kw):
        import json

        eng = cls(spark, run_dir, graph_rows, **kw)
        if os.path.exists(eng.checkpoint_path):
            with open(eng.checkpoint_path) as f:
                state = json.load(f)
            for src, v in state.items():
                eng.round_idx = max(eng.round_idx, v["round"])
                if v["done"] and v["stop_reason"] not in (None, "no_links"):
                    eng._stopped[src] = v["stop_reason"]
                eng._offers_total = max(
                    eng._offers_total, v["processed_offers_last_run"]
                )
        if os.path.exists(eng.bloom_path):
            eng.bloom = ShardedBloom.load(eng.bloom_path, fpp=eng.bloom_fpp)
        else:
            fr = eng.t_frontier.read(spark)
            if fr is not None:
                eng.bloom = ShardedBloom.build(fr, fpp=eng.bloom_fpp)
        fr = eng.t_frontier.read(spark)
        if fr is not None:
            for r in fr.collect():
                eng._sources.add(r["source"])
                if r["status"] == STATUS_PENDING:
                    if r["kind"] == "listing":
                        eng._pending_listing_pages.setdefault(
                            r["source"], set()
                        ).add(r["page_idx"])
                    else:
                        eng._pending_offers[r["source"]] = (
                            eng._pending_offers.get(r["source"], 0) + 1
                        )
                elif r["kind"] == "listing" and r["status"] == STATUS_DONE:
                    eng._last_page_done[r["source"]] = max(
                        eng._last_page_done.get(r["source"], 0), r["page_idx"]
                    )
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
                for src in self._sources:
                    self._stopped.setdefault(src, "offer_limit")
                self._write_checkpoint()
                break
        self._flush_metrics()
        self.finalize_curated()
        return stats

    def _flush_metrics(self) -> None:
        if not self._metrics_buf:
            return
        self.t_metrics.append(
            self.spark.createDataFrame(self._metrics_buf, METRICS_SCHEMA).coalesce(1),
            round_idx=self.round_idx,
            stage="metrics",
        )
        self._metrics_buf = []

    def retry_failed(self) -> int:
        """ST5 retry rounds: re-enqueue FAILED rows (except robots-blocked)
        as PENDING with attempts+1 — the reference's \'retry only fetch_fail
        regions\' loop (cli.py:731-816) at URL granularity. Returns the
        number of re-enqueued rows."""
        fr = self.t_frontier.read(self.spark)
        if fr is None:
            return 0
        retryable = F.col("status") == STATUS_FAILED
        reset = fr.withColumn(
            "attempts",
            F.when(retryable, F.col("attempts") + 1).otherwise(F.col("attempts")),
        ).withColumn(
            "status",
            F.when(retryable, STATUS_PENDING).otherwise(F.col("status")),
        )
        rows = reset.select(*[f.name for f in FRONTIER_SCHEMA.fields]).collect()
        self.t_frontier.overwrite(
            self.spark.createDataFrame(rows, FRONTIER_SCHEMA),
            round_idx=self.round_idx,
            stage="retry_reset",
        )
        n = 0
        # rebuild driver-tracked pending state for the re-enqueued rows
        for r in rows:
            if r["status"] == STATUS_PENDING and r["attempts"] > 0:
                n += 1
                if r["kind"] == "listing":
                    self._pending_listing_pages.setdefault(
                        r["source"], set()
                    ).add(r["page_idx"])
                else:
                    self._pending_offers[r["source"]] = (
                        self._pending_offers.get(r["source"], 0) + 1
                    )
        # failed sources get another chance at their stop state
        self._stopped = {
            k: v for k, v in self._stopped.items() if v in ("no_new", "offer_limit")
        }
        self._no_new_streak.clear()
        self._had_fetch_fail.clear()
        return n

    def refresh_offers(self) -> int:
        """Re-enqueue DONE offer pages for a refresh pass (the reference's
        repeated `detail` runs over an existing urls.csv re-parse every URL;
        first_seen/last_seen split on the merge, detail.py:83,89-90).
        attempts bumps so flaky pages don't re-fail."""
        fr = self.t_frontier.read(self.spark)
        if fr is None:
            return 0
        target = (F.col("status") == STATUS_DONE) & (F.col("kind") == "offer")
        reset = fr.withColumn(
            "status", F.when(target, STATUS_PENDING).otherwise(F.col("status"))
        ).withColumn(
            "attempts",
            F.when(target, F.col("attempts") + 1).otherwise(F.col("attempts")),
        )
        rows = reset.select(*[f.name for f in FRONTIER_SCHEMA.fields]).collect()
        self.t_frontier.overwrite(
            self.spark.createDataFrame(rows, FRONTIER_SCHEMA),
            round_idx=self.round_idx,
            stage="refresh_reset",
        )
        n = 0
        for r in rows:
            if r["status"] == STATUS_PENDING and r["kind"] == "offer":
                n += 1
                self._pending_offers[r["source"]] = (
                    self._pending_offers.get(r["source"], 0) + 1
                )
        self._stopped = {
            k: v for k, v in self._stopped.items() if v == "offer_limit"
        }
        self._no_new_streak.clear()
        return n

    def _coalesced(self, df: DataFrame) -> DataFrame:
        return df.coalesce(self.append_coalesce) if self.append_coalesce else df

    def _one_round(self) -> tuple[bool, int, int]:
        t_start = time.monotonic()
        self.round_idx += 1
        fr = self.t_frontier.read(self.spark)
        if fr is None:
            return False, 0, 0

        pending = fr.filter(F.col("status") == STATUS_PENDING)
        if self.max_pages is not None:
            pending = pending.filter(
                (F.col("kind") != "listing") | (F.col("page_idx") <= self.max_pages)
            )
        if self._stopped:
            pending = pending.filter(~F.col("source").isin(list(self._stopped)))

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
        # offers AND investment pages drain every round (leaves + 2nd hop)
        offer_batch = pending.filter(F.col("kind") != "listing")
        batch = listing_batch.unionByName(offer_batch)

        if self.robots_rules:
            from realestate_scraper_spark.crawl import politeness

            gated = politeness.apply_robots(batch, self.robots_rules)
            allowed = gated.filter(F.col("robots_allowed")).drop("robots_allowed")
            blocked = gated.filter(~F.col("robots_allowed"))
            fetched_ok = fetch_mod.fetch(
                allowed, self.page_store_bc, self.n_salts,
                real_sleep=self.real_sleep,
            )
            blocked_rows = blocked.select(
                "url", "url_canon", "url_hash64", "source", "domain",
                "domain_salt", "kind", "page_idx", "slot", "sub_slot",
                "attempts",
                F.lit(None).cast("string").alias("html"),
                F.lit(fetch_mod.FETCH_ROBOTS).alias("fetch_status"),
                F.lit(-1.0).alias("fetched_at_ms"),
            )
            fetched = fetched_ok.unionByName(blocked_rows).cache()
        else:
            fetched = fetch_mod.fetch(
                batch, self.page_store_bc, self.n_salts,
                real_sleep=self.real_sleep,
            ).cache()

        # ---- ACTION 1: fetch summary (batch size, lineage counters,
        #      listing sources, status mix) in one aggregation.
        summary = (
            fetched.groupBy("source", "domain_salt", "kind", "fetch_status", "page_idx")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        batch_n = sum(r["n"] for r in summary)
        if batch_n == 0:
            fetched.unpersist()
            self._finalize_done(fr)
            return False, 0, 0
        listing_sources = {r["source"] for r in summary if r["kind"] == "listing"}
        self._sources.update(r["source"] for r in summary)
        self._track_fetched(summary)

        # ---- listings + investment pages → new frontier candidates
        listings = fetched.filter(F.col("kind").isin("listing", "investment"))
        links = listings.select(
            "source", "page_idx", "url", "slot", "kind", "html"
        ).mapInPandas(parse_mod.extract_links_batches, schema=parse_mod.LINKS_FIELDS)
        candidates = frontier_mod.classify_and_key_links(links, self.n_salts)
        fresh = frontier_mod.anti_join_seen(candidates, fr, self.bloom)

        # ---- ACTION 2: collect the round's new rows (bounded by link yield)
        new_rows_local = frontier_mod.finish_new_rows(fresh, self.round_idx).collect()
        new_n = len(new_rows_local)
        new_df = self.spark.createDataFrame(new_rows_local, FRONTIER_SCHEMA)
        self._bloom_add_rows(new_rows_local)
        self._track_new_rows(new_rows_local)

        new_offer_counts: dict[str, int] = defaultdict(int)
        for r in new_rows_local:
            if r["kind"] != "listing":  # offers + investments count as yield
                new_offer_counts[r["source"]] += 1

        # ---- offers → parse → refine → ONE staged append (raw zone);
        #      curated tables are views finalized once per run.
        offers_fetched = fetched.filter(
            (F.col("kind") == "offer") & (F.col("fetch_status") == fetch_mod.FETCH_OK)
        )
        parsed = offers_fetched.select(
            "url", "url_canon", "source", "page_idx", "slot", "sub_slot", "html"
        ).mapInPandas(parse_mod.parse_offer_batches, schema=parse_mod.OFFER_FIELDS)
        staged = refine_mod.refined(parsed).withColumn(
            "round", F.lit(self.round_idx)
        )
        self.t_staged.append(
            self._coalesced(staged),
            round_idx=self.round_idx,
            stage="staged",
            partition_by=["is_valid"],
        )
        snap_path = self.t_staged.lineage()[-1]["path"]
        offers_n = _rows_under(os.path.join(snap_path, "is_valid=true"))
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
        cols = [f.name for f in FRONTIER_SCHEMA.fields]
        next_frontier = updated.select(*cols).unionByName(new_df)
        self.t_frontier.overwrite(
            next_frontier, round_idx=self.round_idx, stage="frontier"
        )
        self.bloom.save(self.bloom_path)

        # ---- stop rules (A5 no-new streak)
        for src in listing_sources:
            if new_offer_counts.get(src, 0) == 0:
                streak = self._no_new_streak.get(src, 0) + 1
                self._no_new_streak[src] = streak
                if streak >= self.no_new_stop:
                    self._stopped[src] = "no_new"
            else:
                self._no_new_streak[src] = 0

        # ---- metrics (per-partition lineage: per domain_salt counters)
        wall_ms = (time.monotonic() - t_start) * 1000
        per_part: dict[str, list[int]] = defaultdict(lambda: [0, 0, 0])
        for r in summary:
            acc = per_part[r["domain_salt"]]
            acc[0] += r["n"]
            if r["fetch_status"] == fetch_mod.FETCH_OK:
                acc[1] += r["n"]
            else:
                acc[2] += r["n"]
        self._metrics_buf.extend(
            [
                (self.round_idx, "fetch", i, salt, a[0], a[1], a[2], wall_ms)
                for i, (salt, a) in enumerate(sorted(per_part.items()))
            ]
            + [
                (self.round_idx, "discover", -1, None, batch_n, new_n, 0, wall_ms),
                (self.round_idx, "offers", -1, None, batch_n, offers_n, 0, wall_ms),
            ]
        )

        # checkpoint from driver-tracked progress — no read-back aggregation
        self._write_checkpoint()
        fetched.unpersist()
        return True, batch_n, offers_n

    # ------------------------------------------------------------ teardown
    def _finalize_done(self, fr: DataFrame) -> None:
        for src in sorted(self._sources) or [
            r["source"] for r in fr.select("source").distinct().collect()
        ]:
            if self._had_fetch_fail.get(src):
                continue  # retryable — stays not-done with fetch_fail (ST5)
            self._stopped.setdefault(src, "no_links")
        self._write_checkpoint()
        self._flush_metrics()

    def _bloom_add_rows(self, rows) -> None:
        by_salt: dict[str, list[int]] = defaultdict(list)
        for r in rows:
            by_salt[r["domain_salt"]].append(r["url_hash64"])
        for salt, hashes in by_salt.items():
            self.bloom.add_local(salt, hashes)

    def _track_new_rows(self, rows) -> None:
        for r in rows:
            self._sources.add(r["source"])
            if r["kind"] == "listing":
                pages = self._pending_listing_pages.setdefault(r["source"], set())
                pages.add(r["page_idx"])
            else:
                self._pending_offers[r["source"]] = (
                    self._pending_offers.get(r["source"], 0) + 1
                )

    def _track_fetched(self, summary) -> None:
        for r in summary:
            src = r["source"]
            if r["kind"] == "listing":
                self._pending_listing_pages.get(src, set()).discard(r["page_idx"])
                if r["fetch_status"] == fetch_mod.FETCH_OK:
                    self._last_page_done[src] = max(
                        self._last_page_done.get(src, 0), r["page_idx"]
                    )
                else:
                    # a listing page failed → the region ends as fetch_fail,
                    # NOT done/no_links (the reference retries exactly these
                    # regions next round, cli.py:799-806)
                    self._had_fetch_fail[src] = True
            else:
                self._pending_offers[src] = max(
                    0, self._pending_offers.get(src, 0) - r["n"]
                )

    def _n_pending(self, src: str) -> int:
        pages = self._pending_listing_pages.get(src, set())
        if self.max_pages is not None:
            pages = {p for p in pages if p <= self.max_pages}
        return len(pages) + self._pending_offers.get(src, 0)

    def _write_checkpoint(self) -> None:
        import json

        state = {}
        for src in sorted(self._sources):
            reason = self._stopped.get(src)
            drained = self._n_pending(src) == 0
            if reason is None and drained and self._had_fetch_fail.get(src):
                # drained only because pages failed → retryable, not done
                # (ST5: fetch_fail regions stay not-done and re-enter)
                state[src] = {
                    "region": src,
                    "done": False,
                    "last_page_done": int(self._last_page_done.get(src, 0)),
                    "stop_reason": "fetch_fail",
                    "processed_offers_last_run": int(self._offers_total),
                    "round": self.round_idx,
                    "bloom_snapshot": self.bloom_path
                    if os.path.exists(self.bloom_path)
                    else None,
                }
                continue
            done = reason is not None or drained
            state[src] = {
                "region": src,
                "done": done,
                "last_page_done": int(self._last_page_done.get(src, 0)),
                "stop_reason": reason if reason else ("no_links" if done else None),
                "processed_offers_last_run": int(self._offers_total),
                "round": self.round_idx,
                "bloom_snapshot": self.bloom_path
                if os.path.exists(self.bloom_path)
                else None,
            }
        tmp = self.checkpoint_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(state, f, indent=1)
        os.replace(tmp, self.checkpoint_path)

    def checkpoint_df(self) -> DataFrame:
        import json

        with open(self.checkpoint_path) as f:
            state = json.load(f)
        rows = [
            (
                src, v["region"], v["done"], v["last_page_done"],
                v["stop_reason"], v["processed_offers_last_run"], v["round"],
                v["bloom_snapshot"],
            )
            for src, v in sorted(state.items())
        ]
        return self.spark.createDataFrame(rows, CHECKPOINT_SCHEMA)

    # ------------------------------------------------------- image pipeline
    def process_images(self, images_input: DataFrame) -> DataFrame:
        """The input_hint image stage: photos discovered by the crawl are
        joined to their binary payloads, decoded + verified in Arrow batches
        (sniff, w/h, sha256, pHash — functions/images.py), captioned from the
        owning offer, and written to the partitioned ``images`` table in the
        EXACT input_hint shape (image_id, bytes, w, h, fmt, caption, phash).

        ``images_input`` carries (image_id, bytes) at minimum — the stand-in
        for the image-fetch stage (scrapper/core/images.py:48-91); rows whose
        bytes fail to decode are dropped the way the reference marks
        status=failed and skips the write (images.py:66-76).
        """
        from realestate_scraper_spark.functions.images import (
            IMAGE_META_FIELDS,
            decode_meta_batches,
        )

        photos = self.photos().filter(F.col("image_id").isNotNull())
        # caption (FIXTURES.md §1 template) travels with images_input when
        # present; otherwise falls back to the owning offer id.
        linked = photos.join(
            images_input.select("image_id", "bytes"), "image_id", "inner"
        )
        meta = (
            linked.select("image_id", "bytes")
            .mapInPandas(decode_meta_batches, schema=IMAGE_META_FIELDS)
            .filter(F.col("decode_ok"))
            .drop("decode_ok", "sha256")
        )
        caption_src = (
            images_input.select("image_id", "caption")
            if "caption" in images_input.columns
            else photos.select(
                "image_id", F.col("offer_id").alias("caption")
            )
        )
        out = (
            linked.select("image_id", "bytes")
            .join(meta, "image_id")
            .join(caption_src, "image_id", "left")
            .select("image_id", "bytes", "w", "h", "fmt", "caption", "phash")
        )
        self.t_images = ParquetTable(self.run_dir, "images")
        self.t_images.overwrite(
            self._coalesced(out), round_idx=self.round_idx, stage="images"
        )
        return self.t_images.read(self.spark)

    # ------------------------------------------------------------- results
    def staged(self) -> DataFrame | None:
        st = self.t_staged.read(self.spark)
        if st is None:
            return None
        # is_valid is a directory partition column → inferred as string
        return st.withColumn("is_valid", F.col("is_valid").cast("boolean"))

    def offers(self) -> DataFrame | None:
        """Curated offers view: latest parse wins per offer_id (idempotent
        MERGE semantics, ST6 — re-crawls update rather than duplicate),
        first_seen/last_seen carried as crawl rounds (F14 stamping, made
        deterministic by using logical time)."""
        from pyspark.sql import Window

        from realestate_scraper_spark.schemas import OFFER_COLUMNS

        st = self.staged()
        if st is None:
            return None
        valid = st.filter(F.col("is_valid"))
        w = Window.partitionBy("offer_id_k").orderBy(F.desc("round"))
        keyed = valid.withColumn(
            "offer_id_k", F.coalesce(F.col("offer_id"), F.col("url_canon"))
        )
        seen = keyed.groupBy("offer_id_k").agg(
            F.min("round").alias("first_seen_round"),
            F.max("round").alias("last_seen_round"),
        )
        latest = (
            keyed.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
        )
        return (
            latest.join(seen, "offer_id_k")
            .select(*OFFER_COLUMNS, "first_seen_round", "last_seen_round")
        )

    def offers_wide(self) -> DataFrame | None:
        """The 20-column wide storage variant (scrapper/core/storage.py:13-20):
        canonical 11 + title/district/street/floor/floors/market_type/
        property_type + first/last_seen (as crawl rounds), same latest-wins
        merge as offers()."""
        base = self.offers()
        if base is None:
            return None
        st = self.staged().filter(F.col("is_valid"))
        from pyspark.sql import Window

        w = Window.partitionBy("offer_id").orderBy(F.desc("round"))
        wide = (
            st.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
            .select(
                "offer_id",
                F.col("raw_title").alias("title"),
                F.col("raw_district").alias("district"),
                F.col("raw_street").alias("street"),
                F.col("raw_floor").alias("floor"),
                F.col("raw_floors").alias("floors"),
                F.col("raw_market").alias("market_type"),
                F.col("raw_ptype").alias("property_type"),
            )
        )
        return base.join(wide, "offer_id")

    def photos(self) -> DataFrame | None:
        st = self.staged()
        if st is None:
            return None
        return refine_mod.explode_photos(st, self.photo_limit)

    def quarantine(self) -> DataFrame | None:
        st = self.staged()
        if st is None:
            return None
        return st.filter(~F.col("is_valid")).select(
            "url", "source", "page_idx", "slot", "reject_reason"
        )

    def frontier(self) -> DataFrame | None:
        return self.t_frontier.read(self.spark)

    def finalize_curated(self) -> None:
        """Materialize the curated offers/photos/quarantine tables from the
        raw staged zone — one write each per run (the reference's batched
        flush, O4, at run granularity)."""
        for table, df in (
            (self.t_offers, self.offers()),
            (self.t_photos, self.photos()),
            (self.t_quarantine, self.quarantine()),
        ):
            if df is not None:
                table.overwrite(
                    self._coalesced(df), round_idx=self.round_idx, stage="curated"
                )
