"""Cuckoo filter — the deletable fallback to the Bloom filter (north_rule:
"bloom/cuckoo URL-seen").

Used for the frontier-eviction path: when a URL must be *removed* from the
seen-set (e.g. a FAILED fetch re-enqueued after Retry-After, ST8 — the
reference simply refetches because its set only ever grows), a Bloom filter
cannot delete; a cuckoo filter can.

Standard (2,4)-cuckoo filter with 16-bit fingerprints over numpy:
fingerprint f = 16 low bits of the key (never 0); bucket i1 = h mod nb,
i2 = i1 XOR (fp * 0x5bd1e995) mod nb. Vectorized lookup; insert/delete are
driver/partition-local loops (insertion volume per round is bounded by the
round's new-URL count, not the frontier size).
"""

from __future__ import annotations

import numpy as np

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

    # ------------------------------------------------------------------ api
    def insert(self, h64: int) -> bool:
        arr = np.array([h64], dtype=np.int64)
        fp = int(self._fp(arr)[0])
        i1 = int(self._i1(arr)[0])
        i2 = int(self._i2(np.array([i1]), np.array([fp], dtype=np.uint16))[0])
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
            i = int(
                self._i2(np.array([i]), np.array([cur], dtype=np.uint16))[0]
            )
            row = self.table[i]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return True
        return False  # table full — caller should grow/rebuild

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
