"""Mergeable sketches — HyperLogLog registers and count-min heavy hitters.

At 10^10 URLs / 10^12 tokens, "how many distinct?" and "which items are
frequent?" can't afford exact groupBys per question; production engines
keep SKETCHES — tiny mergeable summaries built in one pass. The reference
holds its whole seen-set exactly in RAM (cmap/, scheduler.go:132); these
are the scale-path summaries of the same information.

Both sketches here are built from md5-derived hash values, which makes
them fully DETERMINISTIC: the register/counter tables are integer-exact
in any engine (DuckDB oracle hash-checks them), independent of
partitioning, row order, and cluster size — unlike Spark's built-in
approx_count_distinct whose HLL++ internals aren't reproducible outside
the JVM. Determinism is what makes a sketch auditable and incrementally
mergeable across days of crawl snapshots.

* **HLL registers**: bucket = first 8 md5 bits (m=256 registers), rho =
  leading-zero count of the next 56 bits + 1; register = max(rho) per
  bucket — ONE groupBy with a map-side max. Registers merge across
  shards/days by elementwise max (same groupBy again). The cardinality
  estimate (alpha·m²/Σ2^-rho, the classic formula) is a 256-row driver
  fold — the distributed work IS the register build.
* **count-min**: d=4 rows × width w of counters; counter[(j, h_j(key))]
  += weight, h_j = md5 salted by row index. Build = explode d rows +
  ONE groupBy — map-side combined, mergeable by addition. Point estimate
  = min over the d counters (biased high, never low); heavy_hitters
  joins candidate keys back through the sketch and keeps est >= T.

rho needs integer log2: both engines expose ``bin(x)`` (binary string,
no leading zeros), so bit_length(v) = length(bin(v)) and
rho = 57 - bit_length(v) — no floating log anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

HLL_BUCKETS = 256  # 2^8: bucket from the first 2 hex digits
CMS_DEPTH = 4
CMS_WIDTH = 1024


def _hll_parts(key: Column) -> tuple[Column, Column]:
    """(bucket, rho) for one key. rho in [1, 57]."""
    h = F.md5(key.cast("string"))
    bucket = F.conv(F.substring(h, 1, 2), 16, 10).cast("long")
    v = F.conv(F.substring(h, 3, 14), 16, 10).cast("long")  # 56 bits
    rho = F.when(v == 0, F.lit(57)).otherwise(
        F.lit(57) - F.length(F.bin(v))
    ).cast("long")
    return bucket, rho


def hll_registers(
    df: DataFrame, key_col: str, group_cols: list[str] | None = None
) -> DataFrame:
    """(group..., bucket, max_rho) — the HLL sketch as a table; one
    groupBy, map-side max. Merge two sketches by unioning and running the
    same groupBy again (max is idempotent/commutative)."""
    bucket, rho = _hll_parts(F.col(key_col))
    groups = list(group_cols or [])
    return (
        df.select(*groups, bucket.alias("bucket"), rho.alias("rho"))
        .groupBy(*groups, "bucket")
        .agg(F.max("rho").cast("long").alias("max_rho"))
    )


def hll_estimate(registers: list[tuple[int, int]], m: int = HLL_BUCKETS) -> float:
    """Classic HLL estimate from (bucket, max_rho) rows — a driver-side
    fold over <= m rows (small-range correction included)."""
    import math

    rho = {b: r for b, r in registers}
    s = sum(2.0 ** -rho.get(b, 0) for b in range(m))
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / s
    zeros = m - len(rho)
    if est <= 2.5 * m and zeros:
        est = m * math.log(m / zeros)
    return est


def cms_hash(key: Column, row: int, width: int = CMS_WIDTH) -> Column:
    """Row-``row`` counter index for a key (salted md5, uniform)."""
    h = F.md5(F.concat_ws("|", F.lit(str(row)), key.cast("string")))
    return F.conv(F.substring(h, 1, 14), 16, 10).cast("long") % width


def cms_build(
    df: DataFrame,
    key_col: str,
    weight_col: str | None = None,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(row, bucket, cnt) count-min counters: d hash rows exploded from
    each key, ONE map-side-combined groupBy. Mergeable by summing."""
    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    rows = [
        df.select(
            F.lit(j).cast("long").alias("row"),
            cms_hash(F.col(key_col), j, width).alias("bucket"),
            w.alias("w"),
        )
        for j in range(depth)
    ]
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.groupBy("row", "bucket").agg(F.sum("w").alias("cnt"))


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """(key, est) for keys whose count-min estimate >= threshold.

    est = min over the d counters — never under the true count, so recall
    is exact (every true heavy hitter survives); collisions can only let
    a near-threshold key through. Candidate keys are the distinct keys
    probed THROUGH the sketch (d small joins against the d·w-row counter
    table — broadcastable at any real width)."""
    sketch = cms_build(df, key_col, depth=depth, width=width)
    keys = df.select(F.col(key_col).alias("key")).distinct()
    probes = [
        keys.select(
            "key",
            F.lit(j).cast("long").alias("row"),
            cms_hash(F.col("key"), j, width).alias("bucket"),
        )
        for j in range(depth)
    ]
    allp = probes[0]
    for p in probes[1:]:
        allp = allp.unionByName(p)
    return (
        allp.join(F.broadcast(sketch), ["row", "bucket"])
        .groupBy("key")
        .agg(F.min("cnt").cast("long").alias("est"))
        .filter(F.col("est") >= threshold)
    )
