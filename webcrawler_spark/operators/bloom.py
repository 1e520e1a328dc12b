"""Sharded broadcast bloom filter over the URL-seen set (NEW per north_rule).

The reference's seen set is an O(1) in-process concurrent map
(cmap/cmap.go); at 10^10 URLs the Spark equivalent — an exact anti-join
against a 10^10-row table — shuffles every candidate every round. This
bloom is the front filter: candidates that are *definitely new* skip the
anti-join entirely; only bloom-positive ("maybe seen") candidates reach the
exact join, which remains the source of truth — a bloom false positive can
therefore never lose a URL, and false negatives are impossible by
construction.

Design (scales to 10^10 keys):

* the key space is sharded by the first hex nibbles of url_sha1 into
  2^shard_bits independent filters, so each shard's bit array stays small
  enough to broadcast and filters can be built/updated per partition of a
  seen table bucketed the same way;
* per-partition build: mapInArrow computes a partial bitmap per input
  partition (these are the "per-partition delta filters" — each round only
  the seen-DELTA's partials are rebuilt and OR-ed into the broadcast);
* k hash positions derive from the sha1 hex itself (Kirsch-Mitzenmacher:
  pos_i = h1 + i*h2 mod m), vectorized with numpy — no per-row Python.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ShardedBloom:
    """Immutable sharded bloom built from partial bitmaps."""

    def __init__(self, shard_bits: int, m_bits_per_shard: int, k: int,
                 shards: dict[int, np.ndarray]):
        self.shard_bits = shard_bits
        self.m = m_bits_per_shard
        self.k = k
        self.shards = shards  # shard id -> uint8 bitmap array (m/8 bytes)

    # -- hashing ----------------------------------------------------------
    @staticmethod
    def _hashes(sha1_hex: pd.Series) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """(shard_key_u32, h1, h2) — all derived from the hex digest itself,
        vectorized via fixed-width byte views (no per-row Python)."""
        a = sha1_hex.to_numpy(dtype="U40")
        # U40 -> 4 bytes per char little-endian codepoints
        codes = a.view(np.uint32).reshape(len(a), 40)
        # hex char -> value: '0'-'9' => c-48, 'a'-'f' => c-87
        vals = np.where(codes >= 97, codes - 87, codes - 48).astype(np.uint64)
        def slice_val(lo: int, hi: int) -> np.ndarray:
            out = np.zeros(len(a), dtype=np.uint64)
            for i in range(lo, hi):
                out = out * np.uint64(16) + vals[:, i]
            return out
        shard_key = slice_val(0, 8)     # first 32 bits
        h1 = slice_val(8, 23)           # 60 bits
        h2 = slice_val(23, 38) | np.uint64(1)  # odd
        return shard_key, h1, h2

    def _positions(self, h1: np.ndarray, h2: np.ndarray) -> list[np.ndarray]:
        m = np.uint64(self.m)
        return [(h1 + np.uint64(i) * h2) % m for i in range(self.k)]

    def might_contain(self, sha1_hex: pd.Series) -> np.ndarray:
        """Vectorized membership probe -> bool ndarray."""
        n = len(sha1_hex)
        if n == 0:
            return np.zeros(0, dtype=bool)
        shard_key, h1, h2 = self._hashes(sha1_hex)
        shard_ids = (shard_key >> np.uint64(32 - self.shard_bits)).astype(np.int64) \
            if self.shard_bits else np.zeros(n, dtype=np.int64)
        result = np.zeros(n, dtype=bool)
        positions = self._positions(h1, h2)
        for sid in np.unique(shard_ids):
            bitmap = self.shards.get(int(sid))
            if bitmap is None:
                continue  # empty shard -> definitely new
            mask = shard_ids == sid
            hit = np.ones(mask.sum(), dtype=bool)
            for pos in positions:
                p = pos[mask]
                byte = bitmap[(p >> np.uint64(3)).astype(np.int64)]
                bit = (byte >> (p & np.uint64(7)).astype(np.uint8)) & 1
                hit &= bit.astype(bool)
            result[mask] = hit
        return result

    # -- construction ------------------------------------------------------
    @classmethod
    def build(cls, seen: DataFrame, key_col: str = "url_sha1",
              expected_per_shard: int = 1_000_000, fpp: float = 0.01,
              shard_bits: int = 0) -> "ShardedBloom":
        """Build from a seen table: per-partition partial bitmaps
        (mapInArrow), OR-merged on the driver. At 10^10 scale, raise
        shard_bits so each shard's bitmap stays ~MBs and per-partition
        deltas only touch their shard."""
        m = cls._optimal_m(expected_per_shard, fpp)
        k = max(1, round(m / max(1, expected_per_shard) * math.log(2)))
        proto = cls(shard_bits, m, k, {})

        m_bytes = m // 8
        sb = shard_bits

        def build_partials(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            local: dict[int, np.ndarray] = {}
            for batch in batches:
                s = pd.Series(batch.column(0).to_pandas())
                if len(s) == 0:
                    continue
                shard_key, h1, h2 = cls._hashes(s)
                shard_ids = (shard_key >> np.uint64(32 - sb)).astype(np.int64) \
                    if sb else np.zeros(len(s), dtype=np.int64)
                positions = proto._positions(h1, h2)
                for sid in np.unique(shard_ids):
                    bitmap = local.setdefault(int(sid), np.zeros(m_bytes, dtype=np.uint8))
                    mask = shard_ids == sid
                    for pos in positions:
                        p = pos[mask]
                        np.bitwise_or.at(
                            bitmap,
                            (p >> np.uint64(3)).astype(np.int64),
                            (np.uint8(1) << (p & np.uint64(7)).astype(np.uint8)),
                        )
            for sid, bitmap in local.items():
                yield pa.RecordBatch.from_pydict(
                    {"shard": pa.array([sid], type=pa.int64()),
                     "bitmap": pa.array([bitmap.tobytes()], type=pa.binary())}
                )

        partials = seen.select(F.col(key_col).cast("string")).mapInArrow(
            build_partials, "shard long, bitmap binary"
        ).collect()
        shards: dict[int, np.ndarray] = {}
        for row in partials:
            arr = np.frombuffer(row["bitmap"], dtype=np.uint8)
            if row["shard"] in shards:
                shards[row["shard"]] = shards[row["shard"]] | arr
            else:
                shards[row["shard"]] = arr.copy()
        return cls(shard_bits, m, k, shards)

    @staticmethod
    def _optimal_m(n: int, fpp: float) -> int:
        m = int(-n * math.log(fpp) / (math.log(2) ** 2))
        return max(64, (m + 63) // 64 * 64)  # byte/word aligned

    def merged_with(self, other: "ShardedBloom") -> "ShardedBloom":
        """OR-merge two blooms with identical parameters (delta update)."""
        assert (self.shard_bits, self.m, self.k) == (other.shard_bits, other.m, other.k)
        shards = dict(self.shards)
        for sid, bm in other.shards.items():
            shards[sid] = (shards[sid] | bm) if sid in shards else bm
        return ShardedBloom(self.shard_bits, self.m, self.k, shards)


def bloom_split(spark: SparkSession, bloom: ShardedBloom):
    """Returns a callable df -> (maybe_seen, definitely_new) using a
    broadcast of the bloom's shard bitmaps and an Arrow-vectorized probe."""
    bc = spark.sparkContext.broadcast(
        {"shard_bits": bloom.shard_bits, "m": bloom.m, "k": bloom.k,
         "shards": {sid: bm.tobytes() for sid, bm in bloom.shards.items()}}
    )

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("boolean")
    def might_contain_udf(sha1_hex: pd.Series) -> pd.Series:
        st = bc.value
        bl = ShardedBloom(
            st["shard_bits"], st["m"], st["k"],
            {sid: np.frombuffer(b, dtype=np.uint8) for sid, b in st["shards"].items()},
        )
        return pd.Series(bl.might_contain(sha1_hex))

    def split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
        tagged = df.withColumn("_maybe_seen", might_contain_udf(F.col("url_sha1")))
        maybe = tagged.filter(F.col("_maybe_seen")).drop("_maybe_seen")
        new = tagged.filter(~F.col("_maybe_seen")).drop("_maybe_seen")
        return maybe, new

    return split
