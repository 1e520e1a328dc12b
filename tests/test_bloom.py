"""Sharded bloom: no false negatives ever; false-positive guard; delta merge."""

import numpy as np
import pandas as pd
import pytest

from webcrawler_spark.operators.bloom import BloomTable, ShardedBloom
from webcrawler_spark.urlnorm import sha1_hex


def _hashes(n, prefix):
    return [sha1_hex(f"{prefix}-{i}") for i in range(n)]


def test_no_false_negatives(spark):
    keys = _hashes(5000, "in")
    df = spark.createDataFrame([(k,) for k in keys], ["url_sha1"]).repartition(8)
    bloom = ShardedBloom.build(df, expected_per_shard=10000, fpp=0.01)
    hits = bloom.might_contain(pd.Series(keys))
    assert hits.all(), "bloom false negative — would lose URLs"


def test_false_positive_rate_bounded(spark):
    keys = _hashes(5000, "in")
    df = spark.createDataFrame([(k,) for k in keys], ["url_sha1"]).repartition(8)
    bloom = ShardedBloom.build(df, expected_per_shard=10000, fpp=0.01)
    probes = pd.Series(_hashes(20000, "out"))
    fpr = bloom.might_contain(probes).mean()
    assert fpr < 0.05, f"fp rate {fpr} too high"


def test_sharded_variant(spark):
    keys = _hashes(4000, "in")
    df = spark.createDataFrame([(k,) for k in keys], ["url_sha1"]).repartition(4)
    bloom = ShardedBloom.build(df, expected_per_shard=2000, fpp=0.01, shard_bits=4)
    assert len(bloom.shards) > 1  # keys spread over shards
    assert bloom.might_contain(pd.Series(keys)).all()
    fpr = bloom.might_contain(pd.Series(_hashes(10000, "out"))).mean()
    assert fpr < 0.05


def test_delta_merge(spark):
    a = _hashes(1000, "a")
    b = _hashes(1000, "b")
    df_a = spark.createDataFrame([(k,) for k in a], ["url_sha1"])
    df_b = spark.createDataFrame([(k,) for k in b], ["url_sha1"])
    bl_a = ShardedBloom.build(df_a, expected_per_shard=4000, fpp=0.01)
    bl_b = ShardedBloom.build(df_b, expected_per_shard=4000, fpp=0.01)
    merged = bl_a.merged_with(bl_b)
    assert merged.might_contain(pd.Series(a + b)).all()


def test_auto_sizing_bounds_shard_bitmaps():
    """plan() must keep every shard's bitmap <= MAX_SHARD_BYTES across the
    whole target range (10^4 .. 10^10 keys) while preserving total capacity."""
    import math

    for n in [10_000, 10**6, 10**7, 10**8, 10**10]:
        sb, expected = ShardedBloom.plan(n, fpp=0.01)
        m = ShardedBloom._optimal_m(expected, 0.01)
        assert m // 8 <= ShardedBloom.MAX_SHARD_BYTES, (n, sb, m // 8)
        # capacity: shards x expected_per_shard covers n with the safety factor
        assert (1 << sb) * expected >= n
        # never over-sharded: one fewer bit would blow the cap (when sb > 0)
        if sb > 0:
            m_total = -n * 1.2 * math.log(0.01) / (math.log(2) ** 2)
            assert m_total / (1 << (sb - 1)) > ShardedBloom.MAX_SHARD_BYTES * 8


def test_auto_build_small_input(spark):
    """build() with only n_seen derives sizing itself and keeps the
    no-false-negative guarantee."""
    keys = _hashes(3000, "auto")
    df = spark.createDataFrame([(k,) for k in keys], ["url_sha1"]).repartition(8)
    bloom = ShardedBloom.build(df, n_seen=3000)
    assert bloom.shard_bits == 0  # tiny input -> single shard
    assert bloom.might_contain(pd.Series(keys)).all()


def test_sharded_build_distributed_merge(spark):
    """Sharded build repartitions by shard id and merges in-cluster: the
    result must still be exact (no false negatives) with multiple shards."""
    keys = _hashes(6000, "dist")
    df = spark.createDataFrame([(k,) for k in keys], ["url_sha1"]).repartition(16)
    bloom = ShardedBloom.build(df, expected_per_shard=1000, fpp=0.01, shard_bits=3)
    assert len(bloom.shards) == 8
    assert bloom.might_contain(pd.Series(keys)).all()
    fpr = bloom.might_contain(pd.Series(_hashes(10000, "out"))).mean()
    assert fpr < 0.05


def test_empty_seen(spark):
    df = spark.createDataFrame([], "url_sha1 string")
    bloom = ShardedBloom.build(df, expected_per_shard=1000, fpp=0.01)
    probes = pd.Series(_hashes(100, "x"))
    assert not bloom.might_contain(probes).any()  # everything definitely new


# ---------------------------------------------------------------------------
# BloomTable: the sharded DISTRIBUTED probe (no whole-filter broadcast)
# ---------------------------------------------------------------------------

def _cand_df(spark, keys):
    return spark.createDataFrame(
        [(k, f"u{i}") for i, k in enumerate(keys)], ["url_sha1", "url"]
    ).repartition(8)


def test_bloomtable_split_no_false_negatives(spark):
    seen_keys = _hashes(5000, "in")
    seen = spark.createDataFrame([(k,) for k in seen_keys], ["url_sha1"]).repartition(8)
    table = BloomTable.build(seen, expected_per_shard=2000, fpp=0.01, shard_bits=4)
    try:
        scratch: list = []
        maybe, new = table.split(_cand_df(spark, seen_keys), scratch=scratch)
        # every seen key must land in maybe (a false negative loses URLs)
        assert maybe.count() == 5000
        assert new.count() == 0
        for df in scratch:
            df.unpersist()
    finally:
        table.unpersist()


def test_bloomtable_split_fp_bounded_and_schema(spark):
    seen = spark.createDataFrame(
        [(k,) for k in _hashes(5000, "in")], ["url_sha1"]
    ).repartition(8)
    table = BloomTable.build(seen, expected_per_shard=2000, fpp=0.01, shard_bits=4)
    try:
        out_keys = _hashes(20000, "out")
        maybe, new = table.split(_cand_df(spark, out_keys))
        n_maybe, n_new = maybe.count(), new.count()
        assert n_maybe + n_new == 20000
        assert n_maybe / 20000 < 0.05  # fp rate
        assert maybe.columns == ["url_sha1", "url"]  # passthrough schema
    finally:
        table.unpersist()


def test_bloomtable_one_shard_per_task(spark):
    """The scale invariant (round-2 verdict item 1): no probe call ever
    holds more than one shard bitmap, and every shard bitmap respects the
    per-shard byte cap — so peak task memory is ONE <=16 MB bitmap no
    matter how many keys the fleet has seen. The >1-bitmap case raises
    inside the probe, so the split()s above double as the negative test;
    here we also check the bitmap table's shape directly at a simulated
    larger shard count."""
    seen = spark.createDataFrame(
        [(k,) for k in _hashes(20000, "big")], ["url_sha1"]
    ).repartition(16)
    table = BloomTable.build(seen, expected_per_shard=1000, fpp=0.01, shard_bits=5)
    try:
        rows = table.bitmaps.collect()
        assert 1 < len(rows) <= 32
        assert len({r["shard"] for r in rows}) == len(rows)  # one bitmap/shard
        for r in rows:
            assert len(r["bitmap"]) <= ShardedBloom.MAX_SHARD_BYTES
        # probing still exact through the cogroup path
        maybe, new = table.split(_cand_df(spark, _hashes(20000, "big")))
        assert new.count() == 0
    finally:
        table.unpersist()


def test_bloomtable_merge_delta_bit_exact(spark):
    """merge_delta(old, delta) must equal a FULL build over old ∪ delta at
    the same geometry — byte-for-byte, since every bitmap is the OR of its
    keys' bit patterns regardless of insertion grouping."""
    a, b = _hashes(3000, "a"), _hashes(1500, "b")
    df_a = spark.createDataFrame([(k,) for k in a], ["url_sha1"]).repartition(8)
    df_b = spark.createDataFrame([(k,) for k in b], ["url_sha1"]).repartition(4)
    table = BloomTable.build(df_a, expected_per_shard=2000, fpp=0.01, shard_bits=3)
    merged = table.merge_delta(df_b)
    try:
        assert merged.capacity_keys == table.capacity_keys
        assert (merged.shard_bits, merged.m, merged.k) == (
            table.shard_bits, table.m, table.k
        )
        full = ShardedBloom._bitmap_table(
            df_a.unionByName(df_b), "url_sha1",
            merged.shard_bits, merged.m, merged.k,
        )
        got = {r["shard"]: bytes(r["bitmap"]) for r in merged.bitmaps.collect()}
        want = {r["shard"]: bytes(r["bitmap"]) for r in full.collect()}
        assert got == want
        # and the probe path still has zero false negatives over old ∪ delta
        maybe, new = merged.split(_cand_df(spark, a + b))
        assert new.count() == 0
    finally:
        merged.unpersist()


def test_crawl_builds_bloom_once_then_merges_deltas(spark, fixture_web, tmp_path):
    """The round loop must never rebuild the bloom from the full seen set:
    ONE full build when the threshold is crossed, then one merge_delta per
    committed round whose input is exactly that round's seen_delta."""
    import webcrawler_spark.plans.crawl as crawl_mod
    from webcrawler_spark.fixtures import WHITELIST
    from webcrawler_spark.plans.crawl import CrawlConfig, run_crawl

    builds: list[int] = []
    merges: list[int] = []
    orig_build, orig_merge = BloomTable.build.__func__, BloomTable.merge_delta

    def counting_build(cls, seen, **kw):
        builds.append(seen.count())
        return orig_build(cls, seen, **kw)

    def counting_merge(self, delta, **kw):
        merges.append(delta.count())
        return orig_merge(self, delta, **kw)

    paths = fixture_web["paths"]
    pages = spark.read.parquet(paths["pages"])
    seeds = spark.read.parquet(paths["seeds"])
    cfg = CrawlConfig(whitelist=WHITELIST, max_depth=2, max_rounds=8,
                      parsers="combined", bloom_min_seen=1)
    ref_cfg = CrawlConfig(whitelist=WHITELIST, max_depth=2, max_rounds=8,
                          parsers="combined", use_bloom=False)
    ref = run_crawl(spark, pages, seeds, ref_cfg,
                    checkpoint_dir=str(tmp_path / "ref"))
    want = sorted((r["round"], r["url"]) for r in ref.order(spark).collect())

    try:
        crawl_mod.BloomTable.build = classmethod(counting_build)
        crawl_mod.BloomTable.merge_delta = counting_merge
        res = run_crawl(spark, pages, seeds, cfg,
                        checkpoint_dir=str(tmp_path / "bloom"))
    finally:
        crawl_mod.BloomTable.build = classmethod(orig_build)
        crawl_mod.BloomTable.merge_delta = orig_merge

    got = sorted((r["round"], r["url"]) for r in res.order(spark).collect())
    assert got == want  # bloom is an optimization, never a semantic change
    assert len(builds) == 1, f"full bloom build ran {len(builds)} times"
    assert builds[0] == res.store.manifest(0)["counts"]["seen_delta"]
    # merge inputs are exactly the per-round deltas, NOT the growing seen
    # set: round 0 has no bloom (seen empty), the build at round 1 covers
    # rounds <= 0, and every later round with a non-empty delta merges it
    deltas = [
        res.store.manifest(r)["counts"]["seen_delta"]
        for r in res.store.committed_rounds()
    ]
    assert merges == [d for d in deltas[1:] if d > 0]


def test_bloomtable_empty_seen(spark):
    seen = spark.createDataFrame([], "url_sha1 string")
    table = BloomTable.build(seen, expected_per_shard=1000, fpp=0.01)
    try:
        maybe, new = table.split(_cand_df(spark, _hashes(200, "x")))
        assert maybe.count() == 0
        assert new.count() == 200
    finally:
        table.unpersist()
