"""Sharded bloom: no false negatives ever; false-positive guard; delta merge."""

import numpy as np
import pandas as pd
import pytest

from webcrawler_spark.operators.bloom import ShardedBloom
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


def test_empty_seen(spark):
    df = spark.createDataFrame([], "url_sha1 string")
    bloom = ShardedBloom.build(df, expected_per_shard=1000, fpp=0.01)
    probes = pd.Series(_hashes(100, "x"))
    assert not bloom.might_contain(probes).any()  # everything definitely new
