"""Deduplication operators for crawled-text training-data pipelines.

Five strategies over the ``documents`` table, each Spark-first:

* exact       — one hash-groupBy on md5(text); map-side partial agg, one
                shuffle on the hash key.
* n-gram Jaccard — word-shingle inverted index (explode + self-equi-join on
                the shingle), blocked by a key (e.g. ``source``) so the
                pair space never goes quadratic globally.
* MinHash+LSH — k min-hashes per doc from ONE explode + k min-aggregates
                (single shuffle), banded into b buckets; candidate pairs
                come from a bucket equi-join, then verified with true
                Jaccard. The min-hash value is the first 15 hex digits of
                ``md5(seed || '|' || shingle)`` as a BIGINT — numeric so
                the k min-aggregates stay in codegen'd HashAggregate
                (string buffers would force SortAggregate), uniform, and
                bit-identical in any engine with md5 + hex→int.
* SimHash     — 64-bit signature from per-token md5 nibbles, computed as 64
                conditional sums in a single groupBy (no bit-position
                explode ⇒ one shuffle); near-dup pairs via a 4×16-bit
                banded chunk equi-join + bit_count(xor) <= h verify
                (complete for h <= 3 by pigeonhole).
* embedding   — cosine >= threshold pairs within a block, reusing
                similarity.cosine (strict-left-fold double, oracle-exact).

All hash/bit arithmetic is integer or md5-string based so every operator
has an exact DuckDB oracle twin in ``__spark_entry__.oracle_sql()``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import tokens

HEX = "0123456789abcdef"


def _widen(df: DataFrame) -> DataFrame:
    """Repartition up to defaultParallelism when the source is narrower.

    Shingling/hashing is per-ROW CPU over byte-small rows: a compact
    parquet file arrives as 1-2 partitions (maxPartitionBytes never splits
    small files) and would pin the whole stage to as many cores. The
    repartition shuffle moves only the small source bytes — measured 3-5x
    faster end-to-end at local[32] even at sf0.1. At real 100 TB scale the
    scan is already wide and this is a no-op."""
    sc = df.sparkSession.sparkContext
    target = sc.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


# ---------------------------------------------------------------- exact ----

def exact_dedup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Group by content hash; keeper = min id (deterministic winner, same
    rule as the crawl's in-round dedup — never 'first task wins')."""
    return (
        df.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.count("*").alias("n_copies"),
            F.min(id_col).alias("keeper_id"),
        )
    )


def drop_exact_dups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Keep exactly the keeper row of every content group."""
    keepers = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keeper_id").alias(id_col)
    )
    return df.join(keepers, on=id_col, how="left_semi")


# -------------------------------------------------------------- shingles ----

def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined). Empty array below n tokens."""
    toks = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(0), F.size(toks) - n),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
        ),
    )
    return F.when(F.size(toks) >= n, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )


def _exploded_shingles(
    df: DataFrame, id_col: str, text_col: str, n: int, extra: list[str] | None = None
) -> DataFrame:
    cols = [F.col(id_col)] + [F.col(c) for c in (extra or [])]
    return _widen(df).select(
        *cols, F.explode(shingles(F.col(text_col), n)).alias("shingle")
    )


# Default stop-shingle document-frequency cap: far above any real
# near-duplicate cluster's size at test scale (so results are identical to
# the exact-quadratic path on the fixtures) while bounding the worst-case
# join fan-out per shingle to DF^2/2 rows at corpus scale — one boilerplate
# shingle shared by 10^6 docs would otherwise alone contribute ~10^12/2
# candidate rows.
DEFAULT_MAX_SHINGLE_DF = 256


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    block_col: str | None = "source",
    n: int = 3,
    threshold: float = 0.05,
    max_shingle_df: int | None | str = "auto",
) -> DataFrame:
    """True n-gram Jaccard for every in-block pair with >=1 shared shingle.

    Inverted-index join: |A∩B| from the shingle equi-join, |A|,|B| from a
    per-doc count. Counts are integers; the single final division is
    double ⇒ cross-engine exact after round(…, 6).

    max_shingle_df: stop-shingle cap. A shingle present in more than this
    many documents is excluded from CANDIDATE generation; candidate pairs
    are then scored with the EXACT Jaccard over the full per-doc shingle
    arrays, so only recall through hot shingles is traded, never score
    accuracy. The DEFAULT is "auto" (= DEFAULT_MAX_SHINGLE_DF): the
    scale-safe candidate-pruned plan is what you get unless you opt out.
    Pass None explicitly to accept the exact-quadratic inverted-index
    self-join (safe only when no shingle is shared by ~thousands of docs).
    """
    if max_shingle_df == "auto":
        max_shingle_df = DEFAULT_MAX_SHINGLE_DF
    if max_shingle_df is not None:
        return _jaccard_pairs_capped(
            df, id_col, text_col, block_col, n, threshold, max_shingle_df
        )
    extra = [block_col] if block_col else []
    ex = _exploded_shingles(df, id_col, text_col, n, extra)
    sizes = ex.groupBy(id_col).agg(F.count("*").alias("n_sh"))

    left = ex.select(
        F.col(id_col).alias("id1"),
        *[F.col(c).alias(f"_b1_{c}") for c in extra],
        "shingle",
    )
    right = ex.select(
        F.col(id_col).alias("id2"),
        *[F.col(c).alias(f"_b2_{c}") for c in extra],
        F.col("shingle").alias("shingle2"),
    )
    cond = [F.col("shingle") == F.col("shingle2"), F.col("id1") < F.col("id2")]
    for c in extra:
        cond.append(F.col(f"_b1_{c}") == F.col(f"_b2_{c}"))
    inter = (
        left.join(right, cond)
        .groupBy("id1", "id2")
        .agg(F.count("*").alias("n_inter"))
    )
    out = (
        inter.join(sizes.select(F.col(id_col).alias("id1"), F.col("n_sh").alias("n1")), "id1")
        .join(sizes.select(F.col(id_col).alias("id2"), F.col("n_sh").alias("n2")), "id2")
        .select(
            "id1",
            "id2",
            F.round(
                F.col("n_inter").cast("double")
                / (F.col("n1") + F.col("n2") - F.col("n_inter")).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )
    return out.filter(F.col("jaccard") >= threshold)


def _jaccard_pairs_capped(
    df: DataFrame,
    id_col: str,
    text_col: str,
    block_col: str | None,
    n: int,
    threshold: float,
    max_shingle_df: int,
) -> DataFrame:
    """Stop-shingle variant: candidates from the df-capped inverted index,
    exact verify via per-doc shingle arrays (same shape as the MinHash
    verify path — candidate ids semi-join-prune the array table).

    Candidate generation is ONE shuffle: group the inverted index by
    shingle, drop hot shingles by postings-list size (== global doc
    frequency; shingles are distinct per doc), and emit in-block id pairs
    from each surviving postings list with a nested higher-order transform
    (<= cap ids -> <= cap^2/2 pairs, all inside codegen). This replaces the
    earlier hot-set groupBy + anti-join + inverted-index self-join — three
    shuffles folded into one, and the pair fan-out is bounded BY
    CONSTRUCTION, not just filtered after the fact."""
    extra = [block_col] if block_col else []
    ex = _exploded_shingles(df, id_col, text_col, n, extra)
    posting = F.struct(
        *[F.col(c).alias(f"_b_{c}") for c in extra], F.col(id_col).alias("_id")
    )
    # Hot shingles are pruned BEFORE the postings lists are collected: a
    # post-hoc filter(size(_xs) <= cap) bounds the pair fan-out but not
    # executor memory — a boilerplate shingle shared by 10^6 docs would
    # still build a 10^6-element collect_list buffer in one group. The
    # count aggregate's buffer is one long (map-side combined, tiny
    # shuffle); the semi-join shares the postings groupBy's hash
    # partitioning on `shingle`, so no extra exchange on the heavy side.
    ok_shingles = (
        ex.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_shingle_df)
        .select("shingle")
    )
    grouped = (
        ex.join(ok_shingles, on="shingle", how="left_semi")
        .groupBy("shingle")
        .agg(F.collect_list(posting).alias("_xs"))
    )

    def _pairs_with(a):
        def ok(b):
            c = a["_id"] < b["_id"]
            for col in extra:
                c = c & (a[f"_b_{col}"] == b[f"_b_{col}"])
            return c

        return F.transform(
            F.filter(F.col("_xs"), ok),
            lambda b: F.struct(a["_id"].alias("id1"), b["_id"].alias("id2")),
        )

    pair_arr = F.flatten(F.transform(F.col("_xs"), _pairs_with))
    cand = (
        grouped.select(F.explode(pair_arr).alias("_p"))
        .select(F.col("_p.id1").alias("id1"), F.col("_p.id2").alias("id2"))
        .distinct()
    )
    cand_ids = (
        cand.select(F.col("id1").alias(id_col))
        .unionByName(cand.select(F.col("id2").alias(id_col)))
        .distinct()
    )
    sh_arr = (
        _widen(df).select(F.col(id_col), shingles(F.col(text_col), n).alias("_sh"))
        .join(cand_ids, on=id_col, how="left_semi")
        .withColumn("_n_sh", F.size("_sh"))
    )
    a = sh_arr.select(
        F.col(id_col).alias("id1"), F.col("_sh").alias("_sh1"), F.col("_n_sh").alias("_n1")
    )
    b = sh_arr.select(
        F.col(id_col).alias("id2"), F.col("_sh").alias("_sh2"), F.col("_n_sh").alias("_n2")
    )
    inter = F.size(F.array_intersect(F.col("_sh1"), F.col("_sh2")))
    return (
        cand.join(a, on="id1")
        .join(b, on="id2")
        .select(
            "id1",
            "id2",
            F.round(
                inter.cast("double")
                / (F.col("_n1") + F.col("_n2") - inter).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# -------------------------------------------------------------- minhash ----

def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    n: int = 3,
) -> DataFrame:
    """(id, h0..h{k-1}): k numeric min-hashes from ONE explode and ONE
    shuffle — BIGINT buffers keep all k min-aggregates in HashAggregate
    with map-side combine.

    Hash family is Kirsch-Mitzenmacher over ONE md5 per shingle:
    h_i = h1 + i*h2 with h1 = first 14 hex digits (56 bits) and
    h2 = next 14 digits | 1 (odd). One digest instead of k — md5 is the
    dominant per-shingle cost — and the sums stay < 2^60, overflow-free
    in signed 64-bit on any engine (exact DuckDB twin)."""
    ex = _exploded_shingles(df, id_col, text_col, n)
    full = F.md5(F.col("shingle"))
    h1 = F.conv(F.substring(full, 1, 14), 16, 10).cast("long")
    h2 = F.conv(F.substring(full, 15, 14), 16, 10).cast("long").bitwiseOR(F.lit(1))
    ex = ex.select(F.col(id_col), h1.alias("_h1"), h2.alias("_h2"))
    aggs = [
        F.min(F.col("_h1") + F.lit(i) * F.col("_h2")).alias(f"h{i}")
        for i in range(k)
    ]
    return ex.groupBy(id_col).agg(*aggs)


def lsh_bands(
    sigs: DataFrame, id_col: str = "doc_id", bands: int = 4, rows_per_band: int = 3
) -> DataFrame:
    """(id, band_id, band_key): hash r consecutive signature components per
    band. A pair collides iff all r components of some band match."""
    rows = []
    for b in range(bands):
        cols = [
            F.col(f"h{b * rows_per_band + r}").cast("string")
            for r in range(rows_per_band)
        ]
        rows.append(
            F.struct(
                F.lit(b).alias("band_id"),
                F.md5(F.concat_ws("|", *cols)).alias("band_key"),
            )
        )
    return sigs.select(
        F.col(id_col), F.explode(F.array(*rows)).alias("band")
    ).select(id_col, F.col("band.band_id").alias("band_id"), F.col("band.band_key").alias("band_key"))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 12,
    n: int = 3,
    bands: int = 4,
    threshold: float = 0.05,
) -> DataFrame:
    """LSH candidates (bucket equi-join on (band_id, band_key)) verified
    with true Jaccard >= threshold.

    The verify side scores ONLY candidate pairs: candidate doc ids
    semi-join-prune the per-doc shingle-ARRAY table (no explode), then
    |A∩B| = size(array_intersect) per candidate pair. The quadratic
    co-shingled pair space never materializes — at 10^9 docs the shuffles
    are explode→min-agg (signatures), the bucket join (candidates), and
    an id-keyed join of candidates against the pruned array table (AQE
    broadcasts the pruned side when candidates are few)."""
    rows_per_band = k // bands
    sigs = minhash_signatures(df, id_col, text_col, k=k, n=n)
    bd = lsh_bands(sigs, id_col, bands=bands, rows_per_band=rows_per_band)
    cand = (
        bd.alias("a")
        .join(bd.alias("b"), on=["band_id", "band_key"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id1"), F.col(f"b.{id_col}").alias("id2")
        )
        .distinct()
    )
    cand_ids = (
        cand.select(F.col("id1").alias(id_col))
        .unionByName(cand.select(F.col("id2").alias(id_col)))
        .distinct()
    )
    sh_arr = (
        _widen(df).select(F.col(id_col), shingles(F.col(text_col), n).alias("_sh"))
        .join(cand_ids, on=id_col, how="left_semi")
        .withColumn("_n_sh", F.size("_sh"))
    )
    a = sh_arr.select(
        F.col(id_col).alias("id1"), F.col("_sh").alias("_sh1"), F.col("_n_sh").alias("_n1")
    )
    b = sh_arr.select(
        F.col(id_col).alias("id2"), F.col("_sh").alias("_sh2"), F.col("_n_sh").alias("_n2")
    )
    inter = F.size(F.array_intersect(F.col("_sh1"), F.col("_sh2")))
    return (
        cand.join(a, on="id1")
        .join(b, on="id2")
        .select(
            "id1",
            "id2",
            F.round(
                inter.cast("double")
                / (F.col("_n1") + F.col("_n2") - inter).cast("double"),
                6,
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


# -------------------------------------------------------------- simhash ----

SIMHASH_BITS = 64
SIMHASH_BANDS = 4
_BAND_WIDTH = SIMHASH_BITS // SIMHASH_BANDS  # 16-bit chunks

_I64_MIN = -9223372036854775807 - 1  # two's-complement bit 63


def _token_bit(j: int) -> Column:
    """Bit j (0..63) of the token's 64-bit md5 prefix, held as two 32-bit
    halves `_v_hi`/`_v_lo` — integer shift+mask, no per-bit string work."""
    if j < 32:
        return F.shiftright(F.col("_v_lo"), j).bitwiseAND(F.lit(1)).cast("int")
    return F.shiftright(F.col("_v_hi"), j - 32).bitwiseAND(F.lit(1)).cast("int")


def _simhash_sums(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """(id, s0..s63): signed per-bit sums — one explode + one groupBy(id)
    with 64 conditional sums; a single shuffle, map-side combined. The
    64-bit token value decodes once into two non-negative 32-bit halves
    (hi = first 8 hex chars), so each bit costs one shift+and."""
    full = F.md5(F.col("token"))
    tok = (
        _widen(df)
        .select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("token"))
        .withColumn("_v_hi", F.conv(F.substring(full, 1, 8), 16, 10).cast("long"))
        .withColumn("_v_lo", F.conv(F.substring(full, 9, 8), 16, 10).cast("long"))
    )
    aggs = [
        F.sum(_token_bit(j) * 2 - 1).alias(f"s{j}")
        for j in range(SIMHASH_BITS)
    ]
    return tok.groupBy(id_col).agg(*aggs)


def _sig_from_sums() -> Column:
    """64-bit signature as signed two's complement: bit 63 contributes
    I64_MIN (no engine-specific unsigned shifts), bits 0..62 their power."""
    sig = F.when(F.col("s63") > 0, F.lit(_I64_MIN)).otherwise(F.lit(0)).cast("long")
    for j in range(SIMHASH_BITS - 1):
        sig = sig + F.when(F.col(f"s{j}") > 0, F.lit(1 << j)).otherwise(F.lit(0)).cast("long")
    return sig


def _band_chunk_from_sums(band: int) -> Column:
    """16-bit chunk `band` of the signature (0..65535, sign-free) — band
    keys are built from the per-bit sums directly, never by shifting the
    signed signature (arithmetic >> would sign-extend)."""
    chunk = F.lit(0).cast("long")
    for r in range(_BAND_WIDTH):
        j = band * _BAND_WIDTH + r
        chunk = chunk + F.when(F.col(f"s{j}") > 0, F.lit(1 << r)).otherwise(F.lit(0)).cast("long")
    return chunk


def simhash(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash over whitespace tokens (with multiplicity).

    Bit j of the signature is set iff the signed sum of token bit-j
    contributions is > 0 (token bits come from the first 16 hex chars of
    md5(token)). At 10^9 docs a 16-bit signature saturates (~2^16 distinct
    values); 64 bits keep hamming distance meaningful."""
    summed = _simhash_sums(df, id_col, text_col)
    return summed.select(F.col(id_col), _sig_from_sums().alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance, found by BANDING —
    4×16-bit chunk equi-join, never an in-block all-pairs product.

    Recall guarantee (pigeonhole): hamming(a,b) <= SIMHASH_BANDS-1 = 3
    implies at least one chunk is identical, so with the default
    max_hamming=3 this returns ALL pairs within distance 3 (the classic
    64-bit near-dup setting, cf. Manku et al., WWW'07 — public
    literature). For max_hamming > 3 the band join bounds recall; the
    semantics are then 'shares >=1 band AND hamming <= h', deterministic
    and oracle-matched. The chunk join is a shuffle on (band_id, chunk);
    hot chunks split by AQE."""
    summed = _simhash_sums(df, id_col, text_col)
    sh = summed.select(
        F.col(id_col),
        _sig_from_sums().alias("simhash"),
        *[_band_chunk_from_sums(b).alias(f"c{b}") for b in range(SIMHASH_BANDS)],
    )
    bands_rows = F.array(*[
        F.struct(F.lit(b).alias("band_id"), F.col(f"c{b}").alias("chunk"))
        for b in range(SIMHASH_BANDS)
    ])
    bd = sh.select(
        F.col(id_col), F.col("simhash"), F.explode(bands_rows).alias("band")
    ).select(
        id_col, "simhash",
        F.col("band.band_id").alias("band_id"),
        F.col("band.chunk").alias("chunk"),
    )
    a = bd.select(
        F.col(id_col).alias("id1"), F.col("simhash").alias("sh1"),
        "band_id", "chunk",
    )
    b = bd.select(
        F.col(id_col).alias("id2"), F.col("simhash").alias("sh2"),
        F.col("band_id").alias("band_id2"), F.col("chunk").alias("chunk2"),
    )
    return (
        a.join(
            b,
            [
                F.col("band_id") == F.col("band_id2"),
                F.col("chunk") == F.col("chunk2"),
                F.col("id1") < F.col("id2"),
            ],
        )
        .select(
            "id1", "id2",
            F.bit_count(F.expr("sh1 ^ sh2")).cast("int").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


# ------------------------------------------------------------ embeddings ----

def embedding_neardup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    block_col: str | None = None,
    threshold: float = 0.8,
    lsh_nbits: int = 8,
) -> DataFrame:
    """Cosine >= threshold pairs within a block; the cosine itself is
    oracle-exact double math (strict left fold).

    block_col=None (the default) blocks by ``similarity.sign_bucket`` —
    the deterministic random-hyperplane-LSH degenerate — so the operator
    NEVER runs an unblocked all-pairs product: at 10^9 vectors the join is
    a shuffle on the bucket key, recall bounded by the LSH trade (near-dup
    pairs with cosine ~1 almost always share all nbits signs). A caller-
    supplied block_col (label, shard, ...) replaces the LSH blocks."""
    from .similarity import sign_bucket

    from .similarity import dot, norm2

    if block_col is None:
        emb = emb.withColumn("_lsh_block", sign_bucket(F.col(vec_col), lsh_nbits))
        block_col = "_lsh_block"
    extra = [block_col]
    # norms once per vector, not per pair (per-pair would redo the O(dim)
    # fold |block| times per row); double math unchanged -> oracle-exact
    a = emb.select(
        F.col(id_col).alias("id1"),
        F.col(vec_col).alias("v1"),
        norm2(F.col(vec_col)).alias("_n1"),
        *[F.col(c).alias(f"_b1_{c}") for c in extra],
    )
    b = emb.select(
        F.col(id_col).alias("id2"),
        F.col(vec_col).alias("v2"),
        norm2(F.col(vec_col)).alias("_n2"),
        *[F.col(c).alias(f"_b2_{c}") for c in extra],
    )
    cond = [F.col("id1") < F.col("id2")]
    for c in extra:
        cond.append(F.col(f"_b1_{c}") == F.col(f"_b2_{c}"))
    return (
        a.join(b, cond)
        .withColumn(
            "cos_sim",
            F.round(
                dot(F.col("v1"), F.col("v2")) / (F.col("_n1") * F.col("_n2")), 6
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
        .select("id1", "id2", "cos_sim")
    )


# ----------------------------------------------------- cluster resolution ----

def duplicate_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    max_iters: int = 8,
) -> DataFrame:
    """Near-duplicate PAIRS -> CLUSTERS: connected components by iterative
    min-label propagation (cluster_id = min doc id in the component) — the
    step a training-data pipeline runs after pair mining to pick one
    keeper per duplicate group. Output: (id_col, cluster_id) for EVERY row
    of ``df``; docs in no pair are their own cluster.

    Spark-iterative done right at 10^10 docs:

    * only edge-TOUCHED nodes iterate (duplicate docs are a small fraction
      of the corpus); the untouched majority is appended once at the end
      with cluster_id = own id — no per-iteration work scales with corpus
      size, only with duplicate count;
    * one edge join + one min-aggregate per round, plus a pointer-jumping
      compression join (label <- previous label OF the label — valid
      because every label is itself a touched node's id), so rounds scale
      with log(diameter) instead of diameter: a chain-shaped component of
      length 2^max_iters still resolves, where plain propagation would
      silently split it;
    * labels localCheckpoint()ed each round so the plan/lineage stays O(1)
      instead of growing per iteration (swap for checkpoint(dir) on a real
      cluster);
    * the convergence probe reads a _chg flag computed INSIDE the label
      round (no extra join) and runs only every 2nd round — at 10^10 docs
      a per-round count job is real money;
    * if the loop exhausts max_iters without converging, a warning is
      raised (never a silent component split).

    Deterministic: min-label is order-free and compression preserves the
    same fixpoint (the component min), so any engine agrees; the DuckDB
    twin unrolls plain propagation max_iters times (a fixpoint is stable
    under extra iterations, so faster convergence still matches).
    """
    edges = pairs.select(
        F.col("id1").alias("src"), F.col("id2").alias("dst")
    ).unionByName(
        pairs.select(F.col("id2").alias("src"), F.col("id1").alias("dst"))
    )
    touched = edges.select(F.col("src").alias("node")).distinct()
    labels = touched.withColumn("label", F.col("node")).localCheckpoint()
    edges = edges.localCheckpoint()

    changed = 0
    for it in range(max_iters):
        neigh = (
            edges.join(labels, edges["dst"] == labels["node"])
            .groupBy("src")
            .agg(F.min("label").alias("_nl"))
            .select(F.col("src").alias("node"), "_nl")
        )
        stepped = labels.join(neigh, on="node", how="left").select(
            "node",
            F.col("label").alias("_old"),
            F.least(
                F.col("label"), F.coalesce(F.col("_nl"), F.col("label"))
            ).alias("label"),
        )
        # pointer jumping against the (checkpointed) previous labels:
        # label <- min(label, previous_label[label])
        parents = labels.select(
            F.col("node").alias("_pnode"), F.col("label").alias("_plabel")
        )
        new_labels = (
            stepped.join(parents, stepped["label"] == parents["_pnode"], "left")
            .select(
                "node",
                F.least(
                    F.col("label"), F.coalesce(F.col("_plabel"), F.col("label"))
                ).alias("label"),
                (
                    F.least(
                        F.col("label"),
                        F.coalesce(F.col("_plabel"), F.col("label")),
                    )
                    != F.col("_old")
                ).alias("_chg"),
            )
            .localCheckpoint()
        )
        labels = new_labels.select("node", "label")
        if it % 2 == 1 or it == max_iters - 1:
            changed = new_labels.filter(F.col("_chg")).limit(1).count()
            if changed == 0:
                break
    if changed != 0:
        import warnings

        warnings.warn(
            f"duplicate_clusters did not converge within max_iters="
            f"{max_iters}; some components may be split across cluster_ids",
            RuntimeWarning,
            stacklevel=2,
        )

    rest = (
        df.select(F.col(id_col).alias("node"))
        .join(touched, on="node", how="left_anti")
        .withColumn("label", F.col("node"))
    )
    return labels.unionByName(rest).select(
        F.col("node").alias(id_col), F.col("label").alias("cluster_id")
    )
