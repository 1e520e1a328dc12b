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


def test_bloomtable_empty_seen(spark):
    seen = spark.createDataFrame([], "url_sha1 string")
    table = BloomTable.build(seen, expected_per_shard=1000, fpp=0.01)
    try:
        maybe, new = table.split(_cand_df(spark, _hashes(200, "x")))
        assert maybe.count() == 0
        assert new.count() == 200
    finally:
        table.unpersist()
