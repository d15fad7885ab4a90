"""Bloom filter math at scale: measured fpp tracks the configured bound and
shard memory matches the 10^10 sizing story (SURVEY.md §4 spill row)."""

from __future__ import annotations

import numpy as np

from realestate_scraper_spark.crawl.bloom import BloomShard, _params
from realestate_scraper_spark.crawl.cuckoo import CuckooFilter


def test_bloom_fpp_measured():
    n = 200_000
    m, k = _params(n, 0.01)
    shard = BloomShard(m, k)
    rng = np.random.default_rng(7)
    keys = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
    shard.add_hashes(keys)
    # all inserted keys must hit (no false negatives, ever)
    assert shard.maybe_contains(keys).all()
    probe = rng.integers(-(2**62), 2**62, size=n, dtype=np.int64)
    fresh = probe[~np.isin(probe, keys)]
    fpp = shard.maybe_contains(fresh).mean()
    assert fpp < 0.02, fpp  # 1% target, 2x headroom for variance


def test_bloom_sizing_at_frontier_scale():
    """10^10 keys / 1024 shards ≈ 10^7 per shard → ~12 MB of bits per shard
    at 1% fpp: broadcastable per-partition, unshippable as a monolith."""
    per_shard = 10_000_000
    m, k = _params(per_shard, 0.01)
    bytes_per_shard = m // 8
    assert 8 * 2**20 < bytes_per_shard < 16 * 2**20
    assert 5 <= k <= 9
    # monolithic filter would be ~12 GB — the sharding rationale
    m_mono, _ = _params(10_000_000_000, 0.01)
    assert m_mono // 8 > 10 * 2**30


def test_cuckoo_insert_delete_contains():
    cf = CuckooFilter(capacity=10_000)
    rng = np.random.default_rng(11)
    keys = rng.integers(-(2**62), 2**62, size=5_000, dtype=np.int64)
    for key in keys.tolist():
        assert cf.insert(key)
    assert cf.maybe_contains(keys).all()
    # deletability — the property Bloom lacks (frontier eviction path)
    for key in keys[:1000].tolist():
        assert cf.delete(key)
    assert cf.maybe_contains(keys[1000:]).all()
    removed_hits = cf.maybe_contains(keys[:1000]).mean()
    assert removed_hits < 0.05  # residual = fingerprint collisions only
