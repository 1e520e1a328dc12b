"""Deterministic sampling for training-data mixtures.

A 100-TB corpus is never used whole: pretraining mixes are built by
sampling each source/language/quality stratum at its own rate (e.g. 3
epochs of wiki-like, 0.3 of raw crawl). The reference has no analog
(it crawls everything it admits); these are §2.8 pipeline operators.

Design rules that matter at scale:

* **hash-based, not RNG-based** — keep a row iff a hash of its stable key
  falls under the rate. No ``rand()``: the sample is reproducible across
  reruns, engines, partitionings and cluster sizes, membership is stable
  under corpus growth (a doc's fate never changes when other docs are
  added), and the oracle can verify it exactly. ``TABLESAMPLE``/
  ``df.sample`` give none of that.
* **one scan, zero shuffles** for rate sampling — the predicate is a pure
  projection; Catalyst pushes it into the scan.
* **exact-k per stratum** is a top-k by hash order — the deterministic
  analog of reservoir sampling; one shuffle on the stratum key. Hash
  order is uniform-random-like but fixed, so "first k by hash" IS a
  uniform k-sample, just a replayable one.

Hash: first 14 hex digits of md5(key || '|' || salt) as an integer,
uniform on [0, 2^56); bucket = that mod 1_000_000 (micro-rate units).
Same expression in DuckDB: ('0x' || substr(md5(..), 1, 14))::BIGINT.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RATE_DENOM = 1_000_000


def hash_bucket(key: Column, salt: str = "") -> Column:
    """Uniform deterministic bucket in [0, 1e6) from a stable key."""
    h = F.md5(F.concat_ws("|", key.cast("string"), F.lit(salt)))
    return F.conv(F.substring(h, 1, 14), 16, 10).cast("long") % RATE_DENOM


def hash_sample(
    df: DataFrame, key_col: str, fraction: float, salt: str = ""
) -> DataFrame:
    """Bernoulli(fraction) sample, deterministic in the key. Pure filter:
    no shuffle, pushed into the scan."""
    thresh = int(round(fraction * RATE_DENOM))
    return df.filter(hash_bucket(F.col(key_col), salt) < thresh)


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict[str, float],
    default_fraction: float = 0.0,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Per-stratum Bernoulli rates (the mixture sampler). The rate map
    compiles to ONE CASE expression — still a pure scan-side filter, no
    join, no shuffle, any number of strata."""
    thresh: Column = F.lit(int(round(default_fraction * RATE_DENOM)))
    for value, frac in sorted(fractions.items()):
        thresh = F.when(
            F.col(strata_col) == value, F.lit(int(round(frac * RATE_DENOM)))
        ).otherwise(thresh)
    return df.filter(hash_bucket(F.col(key_col), salt) < thresh)


def temperature_mixture(
    df: DataFrame,
    strata_col: str,
    target_rows: int,
    alpha: float = 0.5,
    key_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Temperature-flattened mixture sampling — stratum g's share of the
    ``target_rows`` budget is proportional to n_g^alpha (alpha < 1 damps
    head strata and boosts the tail, the standard multilingual/domain
    rebalancing move; alpha = 1 is plain proportional). Rates are then
    per-stratum Bernoulli via the deterministic hash, so membership stays
    reproducible and engine-exact.

    Exactness discipline: alpha is restricted to {0.5, 1.0} so the weight
    is floor(sqrt(n)) or n — IEEE-754 sqrt is correctly rounded in every
    engine, making the whole rate computation integer-deterministic (no
    cross-engine pow drift). All arithmetic after the weight is integer
    (shares = T*w div SUM(w); micro-rates capped at 1).

    Plan: one map-side-combined count per stratum, a 1-row total joined
    back by broadcast, one broadcast join of the (tiny) rate table onto
    the corpus, one scan-side filter — no corpus shuffle."""
    if alpha not in (0.5, 1.0):
        raise ValueError("alpha must be 0.5 or 1.0 (engine-exact weights)")
    counts = df.groupBy(strata_col).agg(F.count(F.lit(1)).alias("_n"))
    w = (
        F.floor(F.sqrt(F.col("_n"))).cast("long")
        if alpha == 0.5
        else F.col("_n")
    )
    weights = counts.select(strata_col, "_n", w.alias("_w"))
    total = weights.agg(F.sum("_w").alias("_tw"))
    # all-integer arithmetic (DIV, not /): bit-identical to the SQL twin
    rates = weights.crossJoin(F.broadcast(total)).selectExpr(
        strata_col,
        f"least(CAST({RATE_DENOM} AS BIGINT), "
        f"((CAST({int(target_rows)} AS BIGINT) * _w) DIV _tw) "
        f"* {RATE_DENOM} DIV _n) AS _rate",
    )
    return df.join(F.broadcast(rates), on=strata_col).filter(
        hash_bucket(F.col(key_col), salt) < F.col("_rate")
    ).drop("_rate")


def stratified_topk(
    df: DataFrame,
    strata_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "",
) -> DataFrame:
    """Exactly k rows per stratum, chosen by hash order (deterministic
    reservoir analog). One shuffle on the stratum; ties broken by the key
    itself so the result is total-order stable. Adds ``sample_rank``.

    Skew note: the window partitions by stratum — with few, huge strata
    prefer rate sampling first (this is a final exact-size trim, applied
    AFTER hash_sample has cut each stratum to ~k·c rows)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(strata_col).orderBy(
        hash_bucket(F.col(key_col), salt).asc(), F.col(key_col).asc()
    )
    return (
        df.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )
