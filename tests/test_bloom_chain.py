"""BloomBroadcastChain: the incremental prefilter broadcast (O(new URLs)
per-round deltas + worker-side cumulative fold) must be verdict-identical to
re-broadcasting the full filter every round — same bits, same fpp behavior —
and must reset correctly after an eviction (the one mutation an append-only
chain cannot express)."""

from __future__ import annotations

import numpy as np
import pyspark.sql.functions as F

from realestate_scraper_spark.crawl.bloom import (
    BloomBroadcastChain,
    ShardedBloom,
)


def _keys_df(spark, rows):
    return spark.createDataFrame(
        [(int(h), s) for h, s in rows], "url_hash64 long, domain_salt string"
    )


def _verdicts(df):
    return sorted(
        (r["url_hash64"], r["domain_salt"], r["maybe_seen"])
        for r in df.collect()
    )


def test_chain_matches_full_broadcast_across_rounds(spark):
    rng = np.random.default_rng(7)
    full = ShardedBloom(expected_per_shard=1 << 10, fpp=0.01)
    chain = BloomBroadcastChain(spark, 1 << 10, 0.01)

    # round 0: wholesale seed (the "full" chain entry)
    seed = {
        "a#0": rng.integers(-(2**62), 2**62, 50, dtype=np.int64),
        "b#1": rng.integers(-(2**62), 2**62, 50, dtype=np.int64),
    }
    for k, arr in seed.items():
        full.add_local(k, arr)
    chain.reset(full)

    probes = []
    for rnd in range(3):  # three append-only rounds, incl. a brand-new shard
        delta = {
            "a#0": rng.integers(-(2**62), 2**62, 30, dtype=np.int64),
            f"c#{rnd}": rng.integers(-(2**62), 2**62, 20, dtype=np.int64),
        }
        for k, arr in delta.items():
            full.add_local(k, arr)
        chain.append_hashes(delta)
        probes.extend((int(h), k) for k, arr in delta.items() for h in arr[:5])
    inserted = set(probes)  # everything probed so far was inserted

    assert len(chain._handles) == 1 + 3
    # probe inserted keys, unseen keys, and keys in absent shards
    probes += [(int(h), "a#0") for h in rng.integers(-(2**62), 2**62, 200)]
    probes += [(12345, "zz#9")]
    df = _keys_df(spark, probes)
    got = _verdicts(chain.filter_maybe_seen(df))
    want = _verdicts(full.filter_maybe_seen(df))
    assert got == want
    # every inserted key must read maybe_seen (no false negatives)
    for h, s, v in got:
        if (h, s) in inserted:
            assert v


def test_chain_reset_after_delete_mirrors_rebuilt_filter(spark):
    rng = np.random.default_rng(11)
    full = ShardedBloom(expected_per_shard=1 << 10, fpp=0.01)
    chain = BloomBroadcastChain(spark, 1 << 10, 0.01)
    full.add_local("a#0", rng.integers(-(2**62), 2**62, 40, dtype=np.int64))
    chain.reset(full)
    d = {"a#0": rng.integers(-(2**62), 2**62, 10, dtype=np.int64)}
    full.add_local("a#0", d["a#0"])
    chain.append_hashes(d)

    # "evict" the shard wholesale: rebuild driver filter without it, reset
    rebuilt = ShardedBloom(expected_per_shard=1 << 10, fpp=0.01)
    rebuilt.add_local("b#1", rng.integers(-(2**62), 2**62, 5, dtype=np.int64))
    chain.reset(rebuilt)
    assert len(chain._handles) == 1
    probes = [(int(h), "a#0") for h in d["a#0"]] + [(1, "b#1")]
    df = _keys_df(spark, probes)
    got = _verdicts(chain.filter_maybe_seen(df))
    want = _verdicts(rebuilt.filter_maybe_seen(df))
    assert got == want
    # the evicted shard's keys now read definitely-new through the chain
    assert all(not v for h, s, v in got if s == "a#0")


def test_engine_grows_chain_one_broadcast_per_round(spark, tmp_path):
    from realestate_scraper_spark.crawl.engine import CrawlEngine
    from realestate_scraper_spark.sources.synth import (
        build_corpus,
        seed_urls,
    )

    offers, images, graph = build_corpus(seed=42, n_pages=3, cards_per_page=4)
    eng = CrawlEngine(spark, str(tmp_path / "run"), graph, n_salts=2)
    eng.seed(seed_urls())
    assert len(eng._bloom_chain._handles) == 1  # the seed "full" entry
    stats = eng.run()
    assert stats["rounds"] > 1
    # one hash-delta broadcast per round that inserted rows; never more
    assert 2 <= len(eng._bloom_chain._handles) <= 1 + stats["rounds"]
    # the chain and the driver filter agree on the whole seen set + noise
    fr = eng.frontier().select(
        F.col("url_hash64"), F.col("domain_salt")
    )
    got = _verdicts(eng._bloom_chain.filter_maybe_seen(fr))
    want = _verdicts(eng.bloom.filter_maybe_seen(fr))
    assert got == want
    # everything in the frontier is seen: zero false negatives end-to-end
    assert all(v for _, _, v in got)
