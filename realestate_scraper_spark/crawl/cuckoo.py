"""Cuckoo filter — the deletable fallback to the Bloom filter (north_rule:
"bloom/cuckoo URL-seen ... cuckoo-filter fallback for deletable entries").

Consumer: the frontier-eviction path (``CrawlEngine.evict_seen``, re-crawl-
after-TTL): a DONE offer URL older than the TTL is removed from the durable
seen store AND from the in-memory prefilter, so the next listing sweep that
links it re-admits it as a fresh PENDING row. A Bloom filter cannot delete;
a cuckoo filter can — ``CrawlEngine(..., prefilter="cuckoo")`` swaps
:class:`ShardedCuckoo` in for ``ShardedBloom`` with the same interface.

Standard (2,4)-cuckoo filter with 16-bit fingerprints over numpy:
fingerprint f = 16 low bits of the key (never 0); bucket i1 = h mod nb,
i2 = i1 XOR (fp * 0x5bd1e995) mod nb. Vectorized lookup; insert/delete are
driver/partition-local loops (insertion volume per round is bounded by the
round's new-URL count, not the frontier size).

Deletion semantics under fingerprint collisions: delete removes ONE matching
(bucket, fp) entry. If a colliding URL shared it, that URL may read as
definitely-new afterwards — harmless, because the EXACT anti-join backstop
(crawl/frontier.anti_join_seen) still holds it in the durable store; a
prefilter false negative costs one anti-join probe, never a duplicate fetch.
"""

from __future__ import annotations

import io
import os

import numpy as np
import pandas as pd

_FP_SEED = np.uint64(0x5BD1E995)
SLOTS = 4
MAX_KICKS = 500


class CuckooFilter:
    def __init__(self, capacity: int):
        nb = 1
        while nb * SLOTS < capacity * 1.25:
            nb <<= 1
        self.nb = nb
        self.table = np.zeros((nb, SLOTS), dtype=np.uint16)
        self._rng = np.random.default_rng(0xC0FFEE)

    # ----------------------------------------------------------- internals
    def _fp(self, h64: np.ndarray) -> np.ndarray:
        fp = (h64.astype(np.uint64) & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1
        return fp

    def _i1(self, h64: np.ndarray) -> np.ndarray:
        return ((h64.astype(np.uint64) >> np.uint64(16)) % np.uint64(self.nb)).astype(
            np.int64
        )

    def _i2(self, i1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        return (
            (i1.astype(np.uint64) ^ (fp.astype(np.uint64) * _FP_SEED))
            % np.uint64(self.nb)
        ).astype(np.int64)

    def _alt(self, i: int, fp: int) -> int:
        return int(
            (np.uint64(i) ^ (np.uint64(fp) * _FP_SEED)) % np.uint64(self.nb)
        )

    # ------------------------------------------------------------------ api
    def insert_fp(self, i1: int, fp: int) -> bool:
        """Insert a fingerprint given EITHER of its buckets (the cuckoo
        partial-key property: the alternate is i ^ h(fp)) — lets shard
        tables of equal size merge without the original keys."""
        i2 = self._alt(i1, fp)
        for i in (i1, i2):
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # cuckoo kicks
        i = i1 if self._rng.integers(2) else i2
        cur = fp
        for _ in range(MAX_KICKS):
            slot = int(self._rng.integers(SLOTS))
            cur, self.table[i, slot] = int(self.table[i, slot]), cur
            i = self._alt(i, cur)
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return True
        return False  # table full — caller should grow/rebuild

    def insert(self, h64: int) -> bool:
        arr = np.array([h64], dtype=np.int64)
        return self.insert_fp(int(self._i1(arr)[0]), int(self._fp(arr)[0]))

    def add_hashes(self, h64: np.ndarray) -> int:
        """Bulk insert; returns the number that could NOT be placed (0 when
        the table was sized for the load)."""
        arr = np.asarray(h64, dtype=np.int64)
        if len(arr) == 0:
            return 0
        fps = self._fp(arr)
        i1s = self._i1(arr)
        return sum(
            0 if self.insert_fp(int(i), int(f)) else 1
            for i, f in zip(i1s, fps)
        )

    def delete_hashes(self, h64: np.ndarray) -> int:
        arr = np.asarray(h64, dtype=np.int64)
        return sum(1 for h in arr if self.delete(int(h)))

    def merge(self, other: "CuckooFilter") -> None:
        """Union by re-homing every stored fingerprint (same table size
        required — the partial-key property only preserves bucket pairs
        across equal nb)."""
        assert self.nb == other.nb, "cuckoo merge requires equal table size"
        for i, slot in zip(*np.nonzero(other.table)):
            self.insert_fp(int(i), int(other.table[i, slot]))

    def delete(self, h64: int) -> bool:
        arr = np.array([h64], dtype=np.int64)
        fp = int(self._fp(arr)[0])
        i1 = int(self._i1(arr)[0])
        i2 = int(self._i2(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
        for i in (i1, i2):
            hits = np.where(self.table[i] == fp)[0]
            if len(hits):
                self.table[i, hits[0]] = 0
                return True
        return False

    def maybe_contains(self, h64: np.ndarray) -> np.ndarray:
        arr = np.asarray(h64, dtype=np.int64)
        if len(arr) == 0:
            return np.zeros(0, dtype=bool)
        fp = self._fp(arr)
        i1 = self._i1(arr)
        i2 = self._i2(i1, fp)
        in1 = (self.table[i1] == fp[:, None]).any(axis=1)
        in2 = (self.table[i2] == fp[:, None]).any(axis=1)
        return in1 | in2


class ShardedCuckoo:
    """dict[domain_salt → CuckooFilter] — the deletable twin of
    bloom.ShardedBloom, duck-type compatible with every engine call site
    (build / merge / add_local / filter_maybe_seen / save / load) plus
    ``delete_df`` for the eviction path.

    All shards share one table size (derived from ``expected_per_shard``) so
    per-round delta filters merge into the run filter by fingerprint
    re-homing. ``fpp`` is accepted for interface parity; the (2,4)-cuckoo
    false-positive rate is ≈ 2·SLOTS/2^16 ≈ 0.012 %, far below the Bloom's
    1 % default.
    """

    def __init__(
        self,
        shards: dict[str, CuckooFilter] | None = None,
        expected_per_shard: int = 1 << 16,
        fpp: float = 0.01,
    ):
        self.shards: dict[str, CuckooFilter] = shards or {}
        self.expected_per_shard = expected_per_shard
        self.fpp = fpp

    # ---------------------------------------------------------------- build
    @classmethod
    def build(
        cls,
        df,
        key_col: str = "url_hash64",
        shard_col: str = "domain_salt",
        expected_per_shard: int = 1 << 16,
        fpp: float = 0.01,
    ) -> "ShardedCuckoo":
        """Build shard tables distributed: one Arrow group per shard (the
        ShardedBloom.build shape); tables come back as ~KB binary blobs."""
        cap = expected_per_shard

        def _build(pdf: pd.DataFrame) -> pd.DataFrame:
            f = CuckooFilter(cap)
            fails = f.add_hashes(pdf[key_col].to_numpy())
            return pd.DataFrame(
                {
                    "shard": [pdf[shard_col].iloc[0]],
                    "table": [f.table.tobytes()],
                    "nb": [f.nb],
                    "fails": [fails],
                }
            )

        rows = (
            df.select(shard_col, key_col)
            .groupBy(shard_col)
            .applyInPandas(_build, schema="shard string, table binary, nb long, fails long")
            .collect()
        )
        overflow = sum(r["fails"] for r in rows)
        if overflow:
            raise RuntimeError(
                f"cuckoo shard overflow ({overflow} keys unplaced): raise "
                "expected_per_shard above the per-shard key volume"
            )
        shards = {}
        for r in rows:
            f = CuckooFilter(cap)
            f.table = (
                np.frombuffer(bytes(r["table"]), dtype=np.uint16)
                .reshape(int(r["nb"]), SLOTS)
                .copy()
            )
            f.nb = int(r["nb"])
            shards[r["shard"]] = f
        return cls(shards, expected_per_shard, fpp)

    def merge(self, other: "ShardedCuckoo") -> None:
        for key, f in other.shards.items():
            if key in self.shards:
                self.shards[key].merge(f)
            else:
                self.shards[key] = f

    def add_local(self, shard_key: str, hashes) -> None:
        f = self.shards.setdefault(shard_key, CuckooFilter(self.expected_per_shard))
        f.add_hashes(np.fromiter(hashes, dtype=np.int64))

    # ----------------------------------------------------------------- test
    def filter_maybe_seen(
        self,
        df,
        key_col: str = "url_hash64",
        shard_col: str = "domain_salt",
        out_col: str = "maybe_seen",
    ):
        """Attach ``maybe_seen`` via a broadcast of the shard tables —
        identical plan shape to ShardedBloom.filter_maybe_seen (narrow Arrow
        pandas UDF, no shuffle)."""
        from pyspark.sql import functions as F

        spark = df.sparkSession
        payload = {k: (f.nb, f.table.tobytes()) for k, f in self.shards.items()}
        bc = spark.sparkContext.broadcast(payload)

        @F.pandas_udf("boolean")
        def _maybe(h64: pd.Series, shard: pd.Series) -> pd.Series:
            local: dict[str, CuckooFilter] = {}
            out = np.zeros(len(h64), dtype=bool)
            hv = h64.to_numpy()
            sv = shard.to_numpy()
            for key in pd.unique(sv):
                blob = bc.value.get(key)
                if blob is None:
                    continue
                if key not in local:
                    nb, table = blob
                    f = CuckooFilter(1)
                    f.nb = int(nb)
                    f.table = np.frombuffer(table, dtype=np.uint16).reshape(
                        int(nb), SLOTS
                    )
                    local[key] = f
                mask = sv == key
                out[mask] = local[key].maybe_contains(hv[mask])
            return pd.Series(out)

        return df.withColumn(out_col, _maybe(F.col(key_col), F.col(shard_col)))

    # --------------------------------------------------------------- delete
    def delete_df(
        self,
        df,
        key_col: str = "url_hash64",
        shard_col: str = "domain_salt",
    ) -> int:
        """Remove the rows' fingerprints from their shards — the eviction
        volume is an aggregate per (shard, key) collect (O(evicted), bounded
        by the TTL window's new-URL mass; at production scale the same
        per-shard deletion runs inside applyInPandas and ships tables, not
        rows). Returns the number of entries removed."""
        removed = 0
        for r in df.select(shard_col, key_col).distinct().collect():
            f = self.shards.get(r[shard_col])
            if f is not None:
                removed += f.delete_hashes(np.array([r[key_col]]))
        return removed

    # ------------------------------------------------------------- snapshot
    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        buf = io.BytesIO()
        arrays = {}
        meta = []
        for i, (key, f) in enumerate(sorted(self.shards.items())):
            arrays[f"table_{i}"] = f.table
            meta.append(key)
        arrays["meta_keys"] = np.array(meta, dtype=object)
        arrays["kind"] = np.array(["cuckoo"], dtype=object)
        np.savez_compressed(buf, allow_pickle=True, **arrays)
        tmp = path + ".tmp"
        with open(tmp, "wb") as fh:
            fh.write(buf.getvalue())
        os.replace(tmp, path)

    @classmethod
    def load(
        cls, path: str, expected_per_shard: int = 1 << 16, fpp: float = 0.01
    ) -> "ShardedCuckoo":
        z = np.load(path, allow_pickle=True)
        shards = {}
        for i, key in enumerate(z["meta_keys"]):
            table = z[f"table_{i}"].copy()
            f = CuckooFilter(1)
            f.nb = table.shape[0]
            f.table = table
            shards[str(key)] = f
        return cls(shards, expected_per_shard, fpp)
