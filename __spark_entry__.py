"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` exposes every operator family from SURVEY.md §2 plus the
training-data-pipeline operators (dedup / similarity / text analysis /
multimodal) over the driver's TPC-H-ish tables; each entry reuses the real
``webcrawler_spark`` operator implementations on the Spark side, and
``oracle_sql()`` carries a DuckDB twin generated from the SAME constants
(domain regexes, marker lists, hash formulas) so both engines compute
bit-identical values.

Cross-engine parity rules used throughout (validated in tests):
  * hashes are md5 hex strings (DuckDB 1.0 has no sha1);
  * every float is produced by a strict left fold of double math and
    rounded once (Spark ``aggregate`` ≡ DuckDB ``list_reduce`` — both
    start the fold at the first element's value);
  * every integer output is cast to BIGINT on both sides.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from webcrawler_spark.functions import urls as U
from webcrawler_spark.functions.urls import _DOMAIN_PATTERNS, _IP_PATTERN
from webcrawler_spark import streaming
from webcrawler_spark.operators import (
    admission, asof, dedup, graph, multimodal, packing, sampling, sessions,
    similarity, sketches, snapshot, textindex, textstats,
)
from webcrawler_spark.operators.politeness import ranked
from webcrawler_spark.operators.textstats import BPE_PATTERN, LANG_MARKERS

WHITELIST = ["example.com", "example.com.cn", "example.net"]


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


# ---------------------------------------------------------------------------
# shared URL-synthesis (frontier candidates derived from the orders keys) —
# the Spark exprs and the SQL fragment below are the same formulas.
# ---------------------------------------------------------------------------

def _synth_host(key):
    m = key % 10
    return (
        F.when(m.isin(0, 1, 2, 3), F.concat(F.lit("www.shop"), (key % 5).cast("string"), F.lit(".example.com")))
        .when(m.isin(4, 5), F.concat(F.lit("img"), (key % 3).cast("string"), F.lit(".cdn.example.com.cn")))
        .when(m == 6, F.lit("static.example.net"))
        .when(m == 7, F.lit("evil.offsite.biz"))
        .when(m == 8, F.lit("www.shop1.example.com"))
        .otherwise(F.concat(F.lit("192.168.0."), (key % 256).cast("string")))
    )


def _synth_scheme(key):
    m = key % 10
    return (
        F.when(m.isin(4, 5), F.lit("https"))
        .when(m == 8, F.lit("ftp"))
        .otherwise(F.lit("http"))
    )


def _synth_url(key):
    return F.concat(
        _synth_scheme(key), F.lit("://"), _synth_host(key), F.lit("/o/"), key.cast("string")
    )


_SQL_HOST = """CASE
    WHEN {k} % 10 IN (0,1,2,3) THEN 'www.shop' || ({k} % 5)::VARCHAR || '.example.com'
    WHEN {k} % 10 IN (4,5) THEN 'img' || ({k} % 3)::VARCHAR || '.cdn.example.com.cn'
    WHEN {k} % 10 = 6 THEN 'static.example.net'
    WHEN {k} % 10 = 7 THEN 'evil.offsite.biz'
    WHEN {k} % 10 = 8 THEN 'www.shop1.example.com'
    ELSE '192.168.0.' || ({k} % 256)::VARCHAR END"""

_SQL_SCHEME = """CASE WHEN {k} % 10 IN (4,5) THEN 'https'
    WHEN {k} % 10 = 8 THEN 'ftp' ELSE 'http' END"""

_SQL_URL = f"({_SQL_SCHEME} || '://' || {_SQL_HOST} || '/o/' || {{k}}::VARCHAR)"


def _sql_primary_domain(host: str) -> str:
    """DuckDB twin of functions.urls.primary_domain (scheduler/domain.go:32-60),
    generated from the same ordered pattern list."""
    suffix = "coalesce(" + ", ".join(
        f"nullif(regexp_extract({host}, '{p}', 1), '')" for p in _DOMAIN_PATTERNS
    ) + ")"
    first_len = f"(length({host}) - length({suffix}) - 1)"
    first_part = f"substring({host}, 1, {first_len})"
    last_label = f"regexp_extract({first_part}, '([^.]*)$', 1)"
    return f"""CASE
      WHEN trim({host}) = '' THEN NULL
      WHEN regexp_matches({host}, '{_IP_PATTERN}') THEN {host}
      WHEN {suffix} IS NULL OR {first_len} <= 0 THEN NULL
      ELSE {last_label} || '.' || {suffix} END"""


_WL_SQL = "(" + ", ".join(f"'{d}'" for d in WHITELIST) + ")"


# ---------------------------------------------------------------------------
# queries — crawl relational skeleton
# ---------------------------------------------------------------------------

def q_frontier_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SendReq admission conjunction (scheduler/scheduler.go:528-576):
    scheme -> whitelist(primary domain) -> depth -> in-round dedup ->
    anti-join seen, over URL candidates synthesized from orders+lineitem
    keys (two sources ⇒ real in-round duplicates)."""
    orders = _t(spark, sf_dir, "orders")
    lineitem = _t(spark, sf_dir, "lineitem")
    a = orders.select(
        F.col("o_orderkey").alias("key"), (F.col("o_custkey") % 13).cast("long").alias("link_pos")
    )
    b = lineitem.select(
        F.col("l_orderkey").alias("key"), (F.lit(100) + F.col("l_linenumber")).cast("long").alias("link_pos")
    )
    raw = a.unionByName(b)
    k = F.col("key")
    cand = raw.select(
        _synth_url(k).alias("url"),
        (k % 8).cast("long").alias("depth"),
        F.lit("").alias("parent_url"),
        "link_pos",
    )
    # synthesized URLs are canonical by construction -> byte-scan host/path
    # (java.util.regex stops scaling past ~8 threads on allocation-heavy
    # per-row matches; instr/substring stay linear)
    cand = (
        cand.withColumn("url_sha1", F.md5(F.col("url")))
        .withColumn("host", U.url_host_canonical(F.col("url")))
        .withColumn("path", U.url_path_canonical(F.col("url")))
    )
    filt = admission.admission_filters(cand, WHITELIST, max_depth=5)
    winners = admission.dedup_in_round(filt)
    seen = orders.filter(F.col("o_orderkey") % 5 == 0).select(
        F.md5(_synth_url(F.col("o_orderkey"))).alias("url_sha1")
    )
    out = admission.anti_join_seen(winners, seen)
    return out.select("url", "host", F.col("depth").cast("long").alias("depth"), "parent_url", "link_pos")


def _sql_frontier_admission() -> str:
    url = _SQL_URL.format(k="key")
    host = _SQL_HOST.format(k="key")
    pd = _sql_primary_domain("host")
    seen_url = _SQL_URL.format(k="o_orderkey")
    return f"""
WITH raw AS (
  SELECT o_orderkey AS key, (o_custkey % 13)::BIGINT AS link_pos FROM orders
  UNION ALL
  SELECT l_orderkey AS key, (100 + l_linenumber)::BIGINT AS link_pos FROM lineitem
), cand AS (
  SELECT {url} AS url, {_SQL_SCHEME.format(k="key")} AS scheme, {host} AS host,
         (key % 8)::BIGINT AS depth, '' AS parent_url, link_pos
  FROM raw
), filt AS (
  SELECT * FROM cand
  WHERE scheme IN ('http','https') AND ({pd}) IN {_WL_SQL} AND depth <= 5
), win AS (
  SELECT url, host, depth, parent_url, link_pos,
         row_number() OVER (PARTITION BY url ORDER BY depth, parent_url, link_pos) AS rn
  FROM filt
), seen AS (
  SELECT md5({seen_url}) AS url_md5 FROM orders WHERE o_orderkey % 5 = 0
)
SELECT url, host, depth, parent_url, link_pos FROM win
WHERE rn = 1 AND md5(url) NOT IN (SELECT url_md5 FROM seen)
"""


def q_seed_list_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seed-list JSON decode (InitReqList, exampes/finder/bm1365Model/
    JcUx.go:47-85) through sources.seedlist.decode_listing: the listing
    API's JSON body -> from_json with
    page:struct<list:array<struct<create_id,id>>> -> exploded product URLs
    at depth 0 (URL shape of JcUx.go:72-73)."""
    from webcrawler_spark.sources import seedlist

    orders = _t(spark, sf_dir, "orders")
    k1 = F.col("o_custkey").cast("string")
    i1 = F.col("o_orderkey").cast("string")
    k2 = (F.col("o_custkey") + 1).cast("string")
    i2 = (F.col("o_orderkey") + 1).cast("string")
    js = F.concat(
        F.lit('{"page":{"list":[{"create_id":'), k1, F.lit(',"id":'), i1,
        F.lit('},{"create_id":'), k2, F.lit(',"id":'), i2, F.lit("}]}}"),
    )
    listing = orders.select(
        F.col("o_orderkey").cast("long").alias("okey"), js.alias("body")
    )
    dec = seedlist.decode_listing(listing)
    return dec.select("okey", "url", F.lit(0).cast("long").alias("depth"))


def q_round_order_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical global round ordering + top-k (SURVEY §2.7 sorts/limits:
    ORDER BY depth, host, url — the deterministic within-round order the
    crawl commits). TakeOrderedAndProject in Spark; keys are unique so the
    limit is well-defined cross-engine."""
    out = q_frontier_admission(spark, sf_dir)
    return (
        out.orderBy(F.col("depth").asc(), F.col("host").asc(), F.col("url").asc())
        .limit(100)
        .select("depth", "host", "url")
    )


def q_seen_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The urlMap test-and-set as relational algebra (scheduler.go:551-574):
    left_anti of candidates vs seen — here customers with no orders."""
    customer = _t(spark, sf_dir, "customer")
    seen = _t(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 3 == 0)
    return (
        customer.join(seen, customer["c_custkey"] == seen["o_custkey"], "left_anti")
        .select(F.col("c_custkey").cast("long").alias("c_custkey"), "c_name")
    )


def q_politeness_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host politeness slots: priority-queue rank per host, budget=3
    (operators/politeness.ranked — window row_number over (depth, hash))."""
    orders = _t(spark, sf_dir, "orders")
    queue = orders.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 50).cast("string")).alias("host"),
        (F.col("o_orderkey") % 4).cast("long").alias("depth"),
        F.md5(F.col("o_orderkey").cast("string")).alias("url_sha1"),
        F.col("o_orderkey").cast("long").alias("okey"),
    )
    return (
        ranked(queue)
        .filter(F.col("slot_rank") <= 3)
        .select("host", F.col("slot_rank").cast("long").alias("slot_rank"), "okey")
    )


def q_host_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host frontier aggregation (the reference's only aggregations are
    counters, module/stub/stub.go:101-119 → groupBy counts)."""
    events = _t(spark, sf_dir, "events")
    return events.groupBy("event_type").agg(
        F.count("*").alias("n_events"),
        F.countDistinct("user_id").alias("n_users"),
    )


def q_parser_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analyzer output concat (analyzer.go:92-111): unionByName of
    per-parser projections with a kind discriminator."""
    part = _t(spark, sf_dir, "part")
    supplier = _t(spark, sf_dir, "supplier")
    links = part.select(
        F.lit("link").alias("kind"), F.col("p_partkey").cast("long").alias("key"),
        F.col("p_name").alias("name"),
    )
    imgs = supplier.select(
        F.lit("img").alias("kind"), F.col("s_suppkey").cast("long").alias("key"),
        F.col("s_name").alias("name"),
    )
    return links.unionByName(imgs)


def q_content_type_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-type → format + file name (bmParser.go:137-153) over
    synthesized image URLs."""
    part = _t(spark, sf_dir, "part")
    ext = (
        F.when(F.col("p_partkey") % 4 == 0, F.lit("jpg"))
        .when(F.col("p_partkey") % 4 == 1, F.lit("png"))
        .when(F.col("p_partkey") % 4 == 2, F.lit("gif"))
        .otherwise(F.lit("html"))
    )
    df = part.select(
        F.col("p_partkey").cast("long").alias("p_partkey"),
        F.concat(
            F.lit("http://static.example.net/img/"),
            F.col("p_partkey").cast("string"), F.lit("."), ext,
        ).alias("url"),
    )
    ct = U.content_type_for(F.col("url"))
    return df.select(
        "p_partkey", "url",
        ct.alias("content_type"),
        U.image_format(ct).alias("format"),
        U.url_basename(U.url_path(F.col("url"))).alias("file_name"),
    )


def q_primary_domain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """getPrimaryDomain (scheduler/domain.go:32-60) native pipeline over a
    zoo of synthesized hosts (TLD patterns + IP passthrough)."""
    nation = _t(spark, sf_dir, "nation")
    supplier = _t(spark, sf_dir, "supplier")
    k = F.col("s_suppkey")
    host = (
        F.when(k % 7 == 0, F.concat(F.lit("a"), (k % 9).cast("string"), F.lit(".example.com")))
        .when(k % 7 == 1, F.concat(F.lit("b"), (k % 9).cast("string"), F.lit(".shop.example.com.cn")))
        .when(k % 7 == 2, F.lit("cdn.example.net"))
        .when(k % 7 == 3, F.lit("x.example.org"))
        .when(k % 7 == 4, F.concat(F.lit("10.0."), (k % 200).cast("string"), F.lit(".1")))
        .when(k % 7 == 5, F.lit("weird.example.xy"))
        .otherwise(F.lit("nosuffix"))
    )
    df = supplier.select(F.col("s_suppkey").cast("long").alias("key"), host.alias("host"))
    _ = nation  # unused; keeps signature uniform
    return df.select("key", "host", U.primary_domain(F.col("host")).alias("primary_domain"))


# ---------------------------------------------------------------------------
# queries — text analysis
# ---------------------------------------------------------------------------

def _token_stats_select(docs: DataFrame) -> DataFrame:
    """Shared by the batch query and its streaming twin — the streaming
    plan IS the batch plan (same Column exprs), which is what makes the
    drained stream hash-match the same oracle."""
    t = F.col("text")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        textstats.token_count(t).cast("long").alias("n_tokens"),
        textstats.bpe_token_count(t).cast("long").alias("n_bpe_tokens"),
        textstats.punct_count(t).cast("long").alias("n_punct"),
        textstats.mean_word_len(t).alias("mean_word_len"),
    )


def q_text_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _token_stats_select(_t(spark, sf_dir, "documents"))


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        textstats.quality_score(F.col("text")).alias("quality"),
    )


def q_text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        textstats.lang_id(F.col("text")).alias("lang_pred"),
    )


def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals: top-bigram fraction +
    distinct-bigram ratio per document."""
    docs = _t(spark, sf_dir, "documents")
    out = textstats.repetition_stats(docs, n=2)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "top_ngram_frac",
        "distinct_ngram_frac",
    )


def _sql_text_repetition(n: int = 2) -> str:
    gram = " || ' ' || ".join(f"toks[i+{j + 1}]" for j in range(n))
    return f"""
WITH toksrc AS (
  SELECT doc_id, {_SQL_TOKS} AS toks FROM documents
), grams AS (
  SELECT doc_id, unnest(list_transform(range(len(toks) - {n - 1}), i -> {gram})) AS gram
  FROM toksrc WHERE len(toks) >= {n}
), cnt AS (
  SELECT doc_id, gram, count(*) AS c FROM grams GROUP BY doc_id, gram
)
SELECT doc_id::BIGINT AS doc_id,
       round(max(c)::DOUBLE / sum(c)::DOUBLE, 6) AS top_ngram_frac,
       round(count(*)::DOUBLE / sum(c)::DOUBLE, 6) AS distinct_ngram_frac
FROM cnt GROUP BY doc_id
"""


def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        textstats.fingerprint(F.col("text")).cast("long").alias("fp"),
    )


_SQL_TOKS = "regexp_split_to_array(trim(text), '\\s+')"


def _sql_token_stats() -> str:
    return f"""
SELECT doc_id::BIGINT AS doc_id,
       (CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len({_SQL_TOKS}) END)::BIGINT AS n_tokens,
       len(regexp_extract_all(text, '{BPE_PATTERN}'))::BIGINT AS n_bpe_tokens,
       len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::BIGINT AS n_punct,
       CASE WHEN len({_SQL_TOKS}) = 0 THEN 0.0
            ELSE round(list_reduce(list_transform({_SQL_TOKS}, t -> length(t)::BIGINT),
                                   (a, b) -> a + b)::DOUBLE / len({_SQL_TOKS})::DOUBLE, 4)
       END AS mean_word_len
FROM documents
"""


def _sql_stop_hits(words: list[str]) -> str:
    inlist = ", ".join(f"'{w}'" for w in words)
    return f"len(list_filter({_SQL_TOKS}, t -> t IN ({inlist})))"


def _sql_quality() -> str:
    n_tok = f"len({_SQL_TOKS})::DOUBLE"
    n_punct = "len(regexp_extract_all(text, '[^A-Za-z0-9\\s]'))::DOUBLE"
    n_stop = _sql_stop_hits(textstats.EN_STOPWORDS) + "::DOUBLE"
    n_char = "length(text)::DOUBLE"
    len_term = f"(CASE WHEN {n_tok} >= 10 AND {n_tok} <= 5000 THEN 1.0 ELSE 0.0 END)"
    punct_term = f"(1.0 - least(1.0, (CASE WHEN {n_char} = 0 THEN 0.0 ELSE {n_punct} / {n_char} END) * 5.0))"
    stop_term = f"least(1.0, (CASE WHEN {n_tok} = 0 THEN 0.0 ELSE {n_stop} / {n_tok} END) * 10.0)"
    return f"""
SELECT doc_id::BIGINT AS doc_id,
       round(0.4 * {len_term} + 0.3 * {punct_term} + 0.3 * {stop_term}, 4) AS quality
FROM documents
"""


def _sql_lang_id() -> str:
    scores = {lang: _sql_stop_hits(words) for lang, words in LANG_MARKERS.items()}
    best = "greatest(" + ", ".join(scores.values()) + ")"
    case = "'und'"
    for lang in ["zh", "es", "fr", "de", "en"]:
        case = f"CASE WHEN {best} > 0 AND {scores[lang]} = {best} THEN '{lang}' ELSE {case} END"
    return f"SELECT doc_id::BIGINT AS doc_id, {case} AS lang_pred FROM documents"


def _sql_fingerprint() -> str:
    # CASE guard: DuckDB list_reduce raises on an empty list, while Spark's
    # zero-initialized F.aggregate returns 0 for empty text — mirror that.
    return f"""
SELECT doc_id::BIGINT AS doc_id,
       (CASE WHEN length(text) = 0 THEN 0 ELSE
        list_reduce(list_transform(string_split(text, ''), c -> ascii(c)::BIGINT),
                    (a, b) -> (a * {textstats.FP_BASE} + b) % {textstats.FP_MOD})
        END)::BIGINT AS fp
FROM documents
"""


# ---------------------------------------------------------------------------
# queries — deduplication
# ---------------------------------------------------------------------------

def q_source_quality_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source curation rollup — the domain-level table a training-data
    pipeline curates by (keep/downweight/drop whole sources): doc count,
    exact-dup share, mean quality, language mix, in ONE map-side-combined
    groupBy over one scan. Integer-exact aggregation: per-doc quality
    (already rounded to 4 dp) converts to 1e-4 units BEFORE the sum, so
    the mean is an integer DIV — no FP summation-order drift, DuckDB
    hash-matches."""
    docs = _t(spark, sf_dir, "documents")
    q_units = F.floor(
        textstats.quality_score(F.col("text")) * 10000 + F.lit(0.5)
    ).cast("long")
    lang = textstats.lang_id(F.col("text"))
    per_doc = docs.select(
        "source",
        F.md5(F.col("text")).alias("h"),
        q_units.alias("qu"),
        lang.alias("lang"),
    )
    return per_doc.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("h").alias("n_unique"),
        (F.count(F.lit(1)) - F.countDistinct("h")).alias("n_dup"),
        F.expr("sum(qu) DIV count(1)").alias("mean_quality_x1e4"),
        F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).alias("n_en"),
        F.sum(F.when(F.col("lang") == "und", 1).otherwise(0)).alias("n_und"),
    )


def _sql_source_quality_rollup() -> str:
    lang = _sql_lang_id().strip()
    qual = _sql_quality().strip()
    return f"""
WITH lang AS ({lang}), qual AS ({qual}),
per_doc AS (
  SELECT d.source, md5(d.text) AS h,
         floor(q.quality * 10000 + 0.5)::BIGINT AS qu,
         l.lang_pred AS lang
  FROM documents d
  JOIN qual q ON q.doc_id = d.doc_id
  JOIN lang l ON l.doc_id = d.doc_id
)
SELECT source,
       count(*)::BIGINT AS n_docs,
       count(DISTINCT h)::BIGINT AS n_unique,
       (count(*) - count(DISTINCT h))::BIGINT AS n_dup,
       (sum(qu) // count(*))::BIGINT AS mean_quality_x1e4,
       sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
       sum(CASE WHEN lang = 'und' THEN 1 ELSE 0 END)::BIGINT AS n_und
FROM per_doc GROUP BY source
"""


def q_corpus_clean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed C4-style cleanup pipeline a training-data run chains:
    exact-dedup keepers only -> language gate (en) -> quality floor.
    Each stage is the same operator the standalone queries exercise; this
    entry proves they compose into one Catalyst plan (one scan, the dedup
    groupBy, and a semi-join — no operator-boundary materialization)."""
    docs = _t(spark, sf_dir, "documents")
    kept = dedup.drop_exact_dups(docs)
    return (
        kept.select(
            F.col("doc_id").cast("long").alias("doc_id"),
            textstats.lang_id(F.col("text")).alias("lang_pred"),
            textstats.quality_score(F.col("text")).alias("quality"),
        )
        .filter((F.col("lang_pred") == "en") & (F.col("quality") >= 0.5))
    )


def _sql_corpus_clean() -> str:
    lang = _sql_lang_id().strip()
    qual = _sql_quality().strip()
    return f"""
WITH keep AS (
  SELECT min(doc_id) AS doc_id FROM documents GROUP BY md5(text)
), lang AS ({lang}), qual AS ({qual})
SELECT k.doc_id::BIGINT AS doc_id, lang.lang_pred, qual.quality
FROM keep k
JOIN lang ON lang.doc_id = k.doc_id
JOIN qual ON qual.doc_id = k.doc_id
WHERE lang.lang_pred = 'en' AND qual.quality >= 0.5
"""


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = dedup.exact_dedup_groups(docs)
    return out.select(
        "content_hash",
        F.col("n_copies").cast("long").alias("n_copies"),
        F.col("keeper_id").cast("long").alias("keeper_id"),
    )


def q_dedup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Default Jaccard path — now the candidate-pruned plan (auto stop-
    shingle cap of dedup.DEFAULT_MAX_SHINGLE_DF=256, far above the
    fixture's max shingle df of 7 at sf0.01 / 25 at sf0.1, so the output
    is identical to the uncapped oracle SQL while the plan shape is the
    one that survives a boilerplate shingle shared by 10^6 docs)."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.jaccard_pairs(docs, block_col="source", n=3, threshold=0.01)
    return out.select(
        F.col("id1").cast("long").alias("id1"),
        F.col("id2").cast("long").alias("id2"),
        "jaccard",
    )


def q_dedup_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stop-shingle variant: shingles in > 3 docs are excluded from
    candidate generation (hot-shingle guard), scores stay exact."""
    docs = _t(spark, sf_dir, "documents")
    out = dedup.jaccard_pairs(
        docs, block_col="source", n=3, threshold=0.01, max_shingle_df=3
    )
    return out.select(
        F.col("id1").cast("long").alias("id1"),
        F.col("id2").cast("long").alias("id2"),
        "jaccard",
    )


def q_dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = dedup.minhash_lsh_pairs(docs, k=12, n=3, bands=4, threshold=0.01)
    return out.select(
        F.col("id1").cast("long").alias("id1"),
        F.col("id2").cast("long").alias("id2"),
        "jaccard",
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pair mining -> cluster resolution: connected components over the
    MinHash+LSH near-dup pairs by iterative min-label propagation (only
    edge-touched docs iterate; the untouched majority appends once).
    cluster_id = min doc_id of the component; singletons = own id."""
    docs = _t(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, k=12, n=3, bands=4, threshold=0.01)
    out = dedup.duplicate_clusters(docs, pairs)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("cluster_id").cast("long").alias("cluster_id"),
    )


def _sql_dedup_clusters(max_iters: int = 8) -> str:
    """Twin of duplicate_clusters over the minhash pairs: the same
    min-label iteration unrolled max_iters times (MATERIALIZED so DuckDB
    does not inline the chain exponentially); a converged Spark fixpoint
    is stable under the extra iterations, so results match exactly."""
    inner = _sql_dedup_minhash_lsh()
    parts = [f"""
pairs AS MATERIALIZED (SELECT id1, id2 FROM ({inner})),
edges AS MATERIALIZED (
  SELECT id1 AS src, id2 AS dst FROM pairs
  UNION ALL SELECT id2 AS src, id1 AS dst FROM pairs
),
lbl_0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS label FROM edges)"""]
    for i in range(max_iters):
        parts.append(f"""
lbl_{i + 1} AS MATERIALIZED (
  SELECT l.node,
         least(l.label, coalesce(min(nl.label), l.label)) AS label
  FROM lbl_{i} l
  LEFT JOIN edges e ON e.src = l.node
  LEFT JOIN lbl_{i} nl ON nl.node = e.dst
  GROUP BY l.node, l.label
)""")
    return (
        "WITH " + ",".join(parts) + f"""
SELECT d.doc_id::BIGINT AS doc_id,
       coalesce(l.label, d.doc_id)::BIGINT AS cluster_id
FROM documents d LEFT JOIN lbl_{max_iters} l ON l.node = d.doc_id
"""
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return dedup.simhash(docs).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("simhash").cast("long").alias("simhash"),
    )


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    out = dedup.simhash_pairs(docs, max_hamming=3)
    return out.select(
        F.col("id1").cast("long").alias("id1"),
        F.col("id2").cast("long").alias("id2"),
        F.col("hamming").cast("long").alias("hamming"),
    )


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    out = dedup.embedding_neardup_pairs(emb, block_col="label", threshold=0.25)
    return out.select(
        F.col("id1").cast("long").alias("id1"),
        F.col("id2").cast("long").alias("id2"),
        "cos_sim",
    )


def q_dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Default (no caller block): sign-bucket LSH blocks — the 100-TB path
    where no label exists to block on."""
    emb = _t(spark, sf_dir, "embeddings")
    out = dedup.embedding_neardup_pairs(emb, threshold=0.25)
    return out.select(
        F.col("id1").cast("long").alias("id1"),
        F.col("id2").cast("long").alias("id2"),
        "cos_sim",
    )


_SQL_SHINGLES = (
    "list_distinct(list_transform(range(len(toks) - 2),"
    " i -> toks[i+1] || ' ' || toks[i+2] || ' ' || toks[i+3]))"
)


def _sql_jaccard_core(block: bool) -> str:
    """Shared CTEs: per-doc distinct 3-gram shingles, exploded + sizes +
    intersection counts + jaccard for all pairs (threshold applied later)."""
    blk_col = ", source" if block else ""
    blk_join = " AND a.source = b.source" if block else ""
    return f"""
toksrc AS (
  SELECT doc_id{blk_col}, {_SQL_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id{blk_col}, unnest({_SQL_SHINGLES}) AS shingle FROM toksrc
  WHERE len(toks) >= 3
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id1, b.doc_id AS id2, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id{blk_join}
  GROUP BY a.doc_id, b.doc_id
), jac AS (
  SELECT id1::BIGINT AS id1, id2::BIGINT AS id2,
         round(n_inter::DOUBLE / (s1.n_sh + s2.n_sh - n_inter)::DOUBLE, 6) AS jaccard
  FROM inter
  JOIN sizes s1 ON s1.doc_id = inter.id1
  JOIN sizes s2 ON s2.doc_id = inter.id2
)"""


def _sql_dedup_jaccard() -> str:
    return f"WITH {_sql_jaccard_core(block=True)} SELECT * FROM jac WHERE jaccard >= 0.01"


def _sql_dedup_jaccard_capped(max_df: int = 3) -> str:
    """Twin of jaccard_pairs(max_shingle_df=...): global df cap on the
    candidate index; exact intersection restricted to candidate pairs."""
    return f"""
WITH toksrc AS (
  SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents
), sh AS (
  SELECT doc_id, source, unnest({_SQL_SHINGLES}) AS shingle FROM toksrc
  WHERE len(toks) >= 3
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id
), hot AS (
  SELECT shingle FROM sh GROUP BY shingle HAVING count(*) > {max_df}
), rare AS (
  SELECT * FROM sh WHERE shingle NOT IN (SELECT shingle FROM hot)
), cand AS (
  SELECT DISTINCT a.doc_id AS id1, b.doc_id AS id2
  FROM rare a JOIN rare b
    ON a.shingle = b.shingle AND a.doc_id < b.doc_id AND a.source = b.source
), inter AS (
  SELECT c.id1, c.id2, count(*) AS n_inter
  FROM cand c
  JOIN sh a ON a.doc_id = c.id1
  JOIN sh b ON b.doc_id = c.id2 AND b.shingle = a.shingle
  GROUP BY c.id1, c.id2
)
SELECT inter.id1::BIGINT AS id1, inter.id2::BIGINT AS id2,
       round(n_inter::DOUBLE / (s1.n_sh + s2.n_sh - n_inter)::DOUBLE, 6) AS jaccard
FROM inter
JOIN sizes s1 ON s1.doc_id = inter.id1
JOIN sizes s2 ON s2.doc_id = inter.id2
WHERE round(n_inter::DOUBLE / (s1.n_sh + s2.n_sh - n_inter)::DOUBLE, 6) >= 0.01
"""


def _sql_dedup_minhash_lsh(k: int = 12, bands: int = 4) -> str:
    # Kirsch-Mitzenmacher twin of dedup.minhash_signatures: one md5 per
    # shingle, h_i = h1 + i*h2 (h1/h2 = 14-hex-digit slices, h2 forced odd)
    rows = k // bands
    h1 = "('0x' || substr(md5(shingle), 1, 14))::BIGINT"
    h2 = "(('0x' || substr(md5(shingle), 15, 14))::BIGINT | 1)"
    mins = ", ".join(
        f"min({h1} + {i} * {h2}) AS h{i}" for i in range(k)
    )
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_id, md5(concat_ws('|', "
        + ", ".join(f"h{b * rows + r}::VARCHAR" for r in range(rows))
        + ")) AS band_key FROM sigs"
        for b in range(bands)
    )
    return f"""
WITH {_sql_jaccard_core(block=False)},
sigs AS (
  SELECT doc_id, {mins} FROM sh GROUP BY doc_id
), bandsrc AS ({band_rows}),
cand AS (
  SELECT DISTINCT a.doc_id::BIGINT AS id1, b.doc_id::BIGINT AS id2
  FROM bandsrc a JOIN bandsrc b
    ON a.band_id = b.band_id AND a.band_key = b.band_key AND a.doc_id < b.doc_id
)
SELECT cand.id1, cand.id2, jac.jaccard
FROM cand JOIN jac ON jac.id1 = cand.id1 AND jac.id2 = cand.id2
WHERE jac.jaccard >= 0.01
"""


def _sql_simhash_sig() -> str:
    """64-bit twin of dedup._simhash_sums/_sig_from_sums: same nibble
    extraction over 16 hex chars, two's-complement bit 63, 4×16-bit band
    chunks built from the sums (no shifts on the signed signature)."""
    nbits = dedup.SIMHASH_BITS
    sums = []
    for j in range(nbits):
        if j < 32:
            bit = f"((v_lo >> {j}) & 1)"
        else:
            bit = f"((v_hi >> {j - 32}) & 1)"
        sums.append(f"sum({bit} * 2 - 1) AS s{j}")
    sig = "(CASE WHEN s63 > 0 THEN -9223372036854775807 - 1 ELSE 0 END)::BIGINT + " + \
        " + ".join(
            f"(CASE WHEN s{j} > 0 THEN {1 << j} ELSE 0 END)::BIGINT"
            for j in range(nbits - 1)
        )
    chunks = []
    for b in range(dedup.SIMHASH_BANDS):
        w = dedup.SIMHASH_BITS // dedup.SIMHASH_BANDS
        chunk = " + ".join(
            f"(CASE WHEN s{b * w + r} > 0 THEN {1 << r} ELSE 0 END)::BIGINT"
            for r in range(w)
        )
        chunks.append(f"({chunk}) AS c{b}")
    return f"""
tok AS (
  SELECT doc_id,
         ('0x' || substring(md5(t.token), 1, 8))::BIGINT AS v_hi,
         ('0x' || substring(md5(t.token), 9, 8))::BIGINT AS v_lo
  FROM (SELECT doc_id, unnest({_SQL_TOKS}) AS token FROM documents) t
), summed AS (
  SELECT doc_id, {", ".join(sums)} FROM tok GROUP BY doc_id
), sig AS (
  SELECT doc_id::BIGINT AS doc_id, ({sig}) AS simhash, {", ".join(chunks)}
  FROM summed
)"""


def _sql_dedup_simhash() -> str:
    return f"WITH {_sql_simhash_sig()} SELECT doc_id, simhash FROM sig"


def _sql_dedup_simhash_pairs(max_hamming: int = 3) -> str:
    band_rows = " UNION ALL ".join(
        f"SELECT doc_id, simhash, {b} AS band_id, c{b} AS chunk FROM sig"
        for b in range(dedup.SIMHASH_BANDS)
    )
    return f"""
WITH {_sql_simhash_sig()},
bd AS ({band_rows})
SELECT DISTINCT a.doc_id::BIGINT AS id1, b.doc_id::BIGINT AS id2,
       bit_count(xor(a.simhash, b.simhash))::BIGINT AS hamming
FROM bd a JOIN bd b
  ON a.band_id = b.band_id AND a.chunk = b.chunk AND a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


_SQL_DOT = (
    "list_reduce(list_transform(range(len({a})), i -> {a}[i+1]::DOUBLE * {b}[i+1]::DOUBLE),"
    " (x, y) -> x + y)"
)


def _sql_cos(a: str, b: str, na: str, nb: str) -> str:
    return f"({_SQL_DOT.format(a=a, b=b)} / ({na} * {nb}))"


def _sql_dedup_embedding(block: str = "label") -> str:
    """block='label' (caller key) or 'lsh' (sign-bucket twin of
    similarity.sign_bucket over the first 8 components)."""
    norm = "sqrt(" + _SQL_DOT.format(a="embedding", b="embedding") + ")"
    if block == "lsh":
        bucket_bits = " + ".join(
            f"(CASE WHEN embedding[{i + 1}] >= 0 THEN 1 ELSE 0 END) * {1 << i}"
            for i in range(8)
        )
        blk = f"({bucket_bits})::BIGINT"
    else:
        blk = "label"
    return f"""
WITH v AS (
  SELECT vec_id, {blk} AS blk, embedding, {norm} AS nrm FROM embeddings
)
SELECT a.vec_id::BIGINT AS id1, b.vec_id::BIGINT AS id2,
       round({_sql_cos("a.embedding", "b.embedding", "a.nrm", "b.nrm")}, 6) AS cos_sim
FROM v a JOIN v b ON a.blk = b.blk AND a.vec_id < b.vec_id
WHERE round({_sql_cos("a.embedding", "b.embedding", "a.nrm", "b.nrm")}, 6) >= 0.25
"""


# ---------------------------------------------------------------------------
# queries — similarity search
# ---------------------------------------------------------------------------

def q_ann_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = similarity.topk_bruteforce(emb, queries, k=5)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("rank").cast("long").alias("rank"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "cos_sim",
    )


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    # single-probe pinned explicitly: the library DEFAULT is multiprobe=1
    # (exercised by ann_lsh_multiprobe); this contract row keeps the
    # cheapest-probe variant oracle-checked too
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = similarity.topk_lsh(emb, queries, k=5, nbits=8, multiprobe_hamming=0)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("rank").cast("long").alias("rank"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "cos_sim",
    )


def q_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hamming-1 multiprobe LSH: queries probe nbits+1 buckets (tiny-side
    explode) to climb the single-bucket recall cliff; corpus untouched."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = similarity.topk_lsh(emb, queries, k=5, nbits=8, multiprobe_hamming=1)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("rank").cast("long").alias("rank"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "cos_sim",
    )


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse-quantizer ANN (deterministic lowest-id centroids,
    nprobe=2) — the cell-probing scale path next to brute-force/LSH."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    out = similarity.topk_ivf(emb, queries, k=5, n_centroids=16, nprobe=2)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("rank").cast("long").alias("rank"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "cos_sim",
    )


def _sql_ann_ivf(n_centroids: int = 16, nprobe: int = 2, k: int = 5) -> str:
    norm = "sqrt(" + _SQL_DOT.format(a="embedding", b="embedding") + ")"
    cell_cos = _sql_cos("s.embedding", "c.cv", "s.nrm", "c.cn")
    pair_cos = _sql_cos("q.qv", "v.embedding", "q.qn", "v.nrm")
    return f"""
WITH v AS (
  SELECT vec_id, embedding, {norm} AS nrm FROM embeddings
), cent AS (
  SELECT vec_id AS cid, embedding AS cv, nrm AS cn
  FROM v ORDER BY vec_id LIMIT {n_centroids}
), corpus_cells AS (
  SELECT vid, cid FROM (
    SELECT s.vec_id AS vid, c.cid,
           row_number() OVER (PARTITION BY s.vec_id
                              ORDER BY round({cell_cos}, 6) DESC, c.cid ASC) AS cr
    FROM v s CROSS JOIN cent c
  ) WHERE cr <= 1
), probes AS (
  SELECT vid AS query_id, cid FROM (
    SELECT s.vec_id AS vid, c.cid,
           row_number() OVER (PARTITION BY s.vec_id
                              ORDER BY round({cell_cos}, 6) DESC, c.cid ASC) AS cr
    FROM v s CROSS JOIN cent c
    WHERE s.vec_id % 100 = 0
  ) WHERE cr <= {nprobe}
), scored AS (
  SELECT p.query_id, cc.vid AS neighbor_id,
         round({pair_cos}, 6) AS cos_sim
  FROM corpus_cells cc
  JOIN probes p ON p.cid = cc.cid AND cc.vid <> p.query_id
  JOIN v ON v.vec_id = cc.vid
  JOIN (SELECT vec_id, embedding AS qv, nrm AS qn FROM v) q
    ON q.vec_id = p.query_id
), rankd AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       neighbor_id::BIGINT AS neighbor_id, cos_sim
FROM rankd WHERE rank <= {k}
"""


def q_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (deterministic lowest-id init, 2
    iterations, 6-dp-rounded means) + final hard assignment — closes the
    trained-centroid seam of the IVF quantizer."""
    emb = _t(spark, sf_dir, "embeddings")
    cents = similarity.kmeans_centroids(emb, n_centroids=8, n_iters=2)
    out = similarity.kmeans_assign(emb, cents)
    return out.select(
        F.col("vec_id").cast("long").alias("vec_id"),
        F.col("cid").cast("long").alias("cid"),
        "cos_sim",
    )


def q_ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN probing k-means-TRAINED cells (the drop-in centroid table
    topk_ivf documents) instead of the untrained lowest-id quantizer."""
    emb = _t(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 100 == 0)
    cents = similarity.kmeans_centroids(emb, n_centroids=8, n_iters=2)
    out = similarity.topk_ivf(emb, queries, k=5, nprobe=2, centroids=cents)
    return out.select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("rank").cast("long").alias("rank"),
        F.col("neighbor_id").cast("long").alias("neighbor_id"),
        "cos_sim",
    )


def _sql_kmeans_ctes(n_centroids: int, n_iters: int, dim: int) -> str:
    """Unrolled Lloyd's iterations as MATERIALIZED CTEs (same fixpoint
    trick as the dedup_clusters oracle): assignment = row_number over
    round(cos, 6) DESC / cid ASC; update = per-component avg rounded to
    6 dp — the rounding is what makes the two engines' FP summation
    orders agree. Ends with ``cfin(cid, cv, cn)``."""
    norm = "sqrt(" + _SQL_DOT.format(a="embedding", b="embedding") + ")"
    cvnorm = "sqrt(" + _SQL_DOT.format(a="cv", b="cv") + ")"
    mean_list = ", ".join(
        f"round(avg(v.embedding[{i + 1}]::DOUBLE), 6)" for i in range(dim)
    )
    ctes = [
        f"v AS MATERIALIZED (\n  SELECT vec_id, embedding, {norm} AS nrm"
        " FROM embeddings)",
        "c0 AS (\n  SELECT vec_id AS cid,"
        " list_transform(embedding, x -> x::DOUBLE) AS cv\n"
        f"  FROM (SELECT * FROM v ORDER BY vec_id LIMIT {n_centroids}))",
    ]
    for t in range(1, n_iters + 1):
        cos = _sql_cos("v.embedding", "c.cv", "v.nrm", "c.cn")
        ctes.append(
            f"cn{t - 1} AS (SELECT cid, cv, {cvnorm} AS cn FROM c{t - 1})"
        )
        ctes.append(f"""a{t} AS (
  SELECT vid, cid FROM (
    SELECT v.vec_id AS vid, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
                              ORDER BY round({cos}, 6) DESC, c.cid ASC) AS rn
    FROM v CROSS JOIN cn{t - 1} c) WHERE rn = 1)""")
        ctes.append(f"""c{t} AS MATERIALIZED (
  SELECT cid, list_value({mean_list}) AS cv
  FROM a{t} JOIN v ON v.vec_id = a{t}.vid GROUP BY cid)""")
    ctes.append(
        f"cfin AS (SELECT cid, cv, {cvnorm} AS cn FROM c{n_iters})"
    )
    return ",\n".join(ctes)


def _sql_kmeans_assign(
    n_centroids: int = 8, n_iters: int = 2, dim: int = 64
) -> str:
    cos = _sql_cos("v.embedding", "c.cv", "v.nrm", "c.cn")
    return f"""
WITH {_sql_kmeans_ctes(n_centroids, n_iters, dim)}
SELECT vec_id::BIGINT AS vec_id, cid::BIGINT AS cid, cos_sim FROM (
  SELECT v.vec_id, c.cid, round({cos}, 6) AS cos_sim,
         row_number() OVER (PARTITION BY v.vec_id
                            ORDER BY round({cos}, 6) DESC, c.cid ASC) AS rn
  FROM v CROSS JOIN cfin c) WHERE rn = 1
"""


def _sql_ann_ivf_trained(
    n_centroids: int = 8, nprobe: int = 2, k: int = 5,
    n_iters: int = 2, dim: int = 64,
) -> str:
    cell_cos = _sql_cos("s.embedding", "c.cv", "s.nrm", "c.cn")
    pair_cos = _sql_cos("q.qv", "v.embedding", "q.qn", "v.nrm")
    return f"""
WITH {_sql_kmeans_ctes(n_centroids, n_iters, dim)},
corpus_cells AS (
  SELECT vid, cid FROM (
    SELECT s.vec_id AS vid, c.cid,
           row_number() OVER (PARTITION BY s.vec_id
                              ORDER BY round({cell_cos}, 6) DESC, c.cid ASC) AS cr
    FROM v s CROSS JOIN cfin c
  ) WHERE cr <= 1
), probes AS (
  SELECT vid AS query_id, cid FROM (
    SELECT s.vec_id AS vid, c.cid,
           row_number() OVER (PARTITION BY s.vec_id
                              ORDER BY round({cell_cos}, 6) DESC, c.cid ASC) AS cr
    FROM v s CROSS JOIN cfin c
    WHERE s.vec_id % 100 = 0
  ) WHERE cr <= {nprobe}
), scored AS (
  SELECT p.query_id, cc.vid AS neighbor_id,
         round({pair_cos}, 6) AS cos_sim
  FROM corpus_cells cc
  JOIN probes p ON p.cid = cc.cid AND cc.vid <> p.query_id
  JOIN v ON v.vec_id = cc.vid
  JOIN (SELECT vec_id, embedding AS qv, nrm AS qn FROM v) q
    ON q.vec_id = p.query_id
), rankd AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       neighbor_id::BIGINT AS neighbor_id, cos_sim
FROM rankd WHERE rank <= {k}
"""


def _sql_ann(bucketed: bool, multiprobe: bool = False, nbits: int = 8) -> str:
    norm = "sqrt(" + _SQL_DOT.format(a="embedding", b="embedding") + ")"
    bucket_bits = " + ".join(
        f"(CASE WHEN embedding[{i + 1}] >= 0 THEN 1 ELSE 0 END) * {1 << i}"
        for i in range(nbits)
    )
    bucket = f", ({bucket_bits})::BIGINT AS bucket" if bucketed else ""
    join_cond = "c.bucket = q.bucket AND c.vec_id <> q.vec_id" if bucketed \
        else "c.vec_id <> q.vec_id"
    if multiprobe:
        # Hamming-1 probe set: own bucket + one bit flipped per position
        q_cte = f"""q AS (
  SELECT vec_id, embedding, nrm,
         unnest(list_concat([bucket],
                list_transform(range({nbits}), i -> xor(bucket, 1 << i))))
           AS bucket
  FROM v WHERE vec_id % 100 = 0
)"""
    else:
        q_cte = "q AS (\n  SELECT * FROM v WHERE vec_id % 100 = 0\n)"
    return f"""
WITH v AS (
  SELECT vec_id, embedding, {norm} AS nrm{bucket} FROM embeddings
), {q_cte}, scored AS (
  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         round({_sql_cos("q.embedding", "c.embedding", "q.nrm", "c.nrm")}, 6) AS cos_sim
  FROM v c JOIN q ON {join_cond}
), rankd AS (
  SELECT query_id, neighbor_id, cos_sim,
         row_number() OVER (PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored
)
SELECT query_id::BIGINT AS query_id, rank::BIGINT AS rank,
       neighbor_id::BIGINT AS neighbor_id, cos_sim
FROM rankd WHERE rank <= 5
"""


# ---------------------------------------------------------------------------
# queries — multimodal plumbing (binary payload -> typed metadata)
# ---------------------------------------------------------------------------

def _docs_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _t(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("id"), F.encode(F.col("text"), "UTF-8").alias("payload")
    )


def q_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched mapInPandas decode over a binary column (codec stubbed
    deterministically — the plumbing is real; see operators/multimodal.py)."""
    meta = multimodal.decode_meta(_docs_payload(spark, sf_dir))
    return meta.select(
        F.col("id").cast("long").alias("id"),
        F.col("byte_len").cast("long").alias("byte_len"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "format",
        "content_md5",
    )


def q_multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = multimodal.decode_meta(_docs_payload(spark, sf_dir))
    out = multimodal.resize_plan(meta, max_side=256)
    return out.select(
        F.col("id").cast("long").alias("id"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("target_width").cast("long").alias("target_width"),
        F.col("target_height").cast("long").alias("target_height"),
    )


def q_multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    meta = multimodal.decode_meta(_docs_payload(spark, sf_dir))
    out = multimodal.frame_sample_plan(meta, every_n=10, fps=30)
    return out.select(
        F.col("id").cast("long").alias("id"),
        F.col("frame_idx").cast("long").alias("frame_idx"),
        "frame_ts_s",
    )


def q_multimodal_real_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL header codec end-to-end: deterministic PNG/GIF/JPEG bytes are
    synthesized per p_partkey inside a mapInPandas stage (payload synth is
    test plumbing), then decoded by the production decode_meta path —
    stdlib struct over IHDR / logical screen descriptor / SOF0, no PIL.
    The DuckDB twin computes the expected header fields from the same key
    formulas without touching bytes, so any decode defect hash-mismatches."""
    import pandas as pd

    part = _t(spark, sf_dir, "part")
    src = part.select(F.col("p_partkey").cast("long").alias("id"))

    def gen(it):
        from webcrawler_spark.fixtures import real_image_bytes

        fmts = ["png", "gif", "jpeg"]
        for pdf in it:
            ids = pdf["id"].astype("int64")
            yield pd.DataFrame(
                {
                    "id": ids,
                    "payload": [
                        real_image_bytes(
                            16 + int(i) % 1000, 16 + (int(i) * 7) % 800,
                            fmts[int(i) % 3],
                        )
                        for i in ids
                    ],
                }
            )

    payloads = src.mapInPandas(gen, "id long, payload binary")
    meta = multimodal.decode_meta(payloads)
    return meta.select(
        F.col("id").cast("long").alias("id"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        "format",
    )


_SQL_REAL_META = """
SELECT p_partkey::BIGINT AS id,
       (16 + p_partkey % 1000)::BIGINT AS width,
       (16 + (p_partkey * 7) % 800)::BIGINT AS height,
       CASE p_partkey % 3 WHEN 0 THEN 'png' WHEN 1 THEN 'gif'
            ELSE 'jpeg' END AS format
FROM part
"""


_SQL_META = """
SELECT doc_id::BIGINT AS id,
       octet_length(encode(text))::BIGINT AS byte_len,
       (1 + octet_length(encode(text)) % 640)::BIGINT AS width,
       (1 + octet_length(encode(text)) % 480)::BIGINT AS height,
       'bin' AS format,
       md5(text) AS content_md5
FROM documents
"""

_SQL_RESIZE = """
WITH meta AS (
  SELECT doc_id::BIGINT AS id,
         (1 + octet_length(encode(text)) % 640)::BIGINT AS width,
         (1 + octet_length(encode(text)) % 480)::BIGINT AS height
  FROM documents
)
SELECT id, width, height,
       greatest(1, floor(width * least(1.0, 256.0 / greatest(width, height)::DOUBLE)))::BIGINT AS target_width,
       greatest(1, floor(height * least(1.0, 256.0 / greatest(width, height)::DOUBLE)))::BIGINT AS target_height
FROM meta
"""

_SQL_FRAMES = """
WITH meta AS (
  SELECT doc_id::BIGINT AS id,
         greatest(1, octet_length(encode(text)) // 1024) AS n_frames
  FROM documents
)
SELECT id, unnest(range(0, n_frames, 10))::BIGINT AS frame_idx,
       round(unnest(range(0, n_frames, 10)) / 30.0, 4) AS frame_ts_s
FROM meta
"""


# ---------------------------------------------------------------------------
# queries — crawl end-to-end, WITH a SQL oracle: the per-row scalar
# transforms (link extraction, RFC-3986 canonicalize + sha1, content type)
# are precomputed into side tables by pure Python (fixtures.
# write_bfs_oracle_tables — same modules as the reference simulator), and
# the DuckDB twin pins the ITERATIVE relational structure as an unrolled
# per-round CTE chain: admission conjunction -> in-round dedup winner ->
# seen anti-join -> politeness ranking -> fetch join -> link explosion
# (scheduler/scheduler.go:528-576 + analyzer.go:119-132 semantics).
# ---------------------------------------------------------------------------

_BFS_DIR = "/tmp/spark_graft_bfs_fixture"
_BFS_N_PAGES, _BFS_SEED, _BFS_FIXTURE_VERSION = 80, 42, 1
_BFS_MAX_DEPTH, _BFS_MAX_ROUNDS = 3, 8
_BFS_UNLIMITED = 1 << 31  # politeness.UNLIMITED


def _ensure_bfs_fixture() -> dict:
    """Idempotent fixed-path fixture (pure pyarrow, no Spark): both the
    Spark query and the DuckDB oracle read the same deterministic web."""
    import json
    import os
    import shutil

    from webcrawler_spark import fixtures

    marker = os.path.join(_BFS_DIR, "_marker.json")
    want = {"n_pages": _BFS_N_PAGES, "seed": _BFS_SEED,
            "version": _BFS_FIXTURE_VERSION}
    if os.path.exists(marker):
        try:
            with open(marker) as f:
                if json.load(f) == want:
                    return {
                        name: os.path.join(_BFS_DIR, f"{name}.parquet")
                        for name in ("pages", "seeds", "robots")
                    }
        except (ValueError, OSError):
            pass
    shutil.rmtree(_BFS_DIR, ignore_errors=True)
    paths = fixtures.write_parquet(_BFS_DIR, n_pages=_BFS_N_PAGES, seed=_BFS_SEED)
    fixtures.write_bfs_oracle_tables(
        _BFS_DIR, n_pages=_BFS_N_PAGES, seed=_BFS_SEED
    )
    with open(marker, "w") as f:
        json.dump(want, f)
    return paths


def q_crawl_bfs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full batch-iterative crawl on the deterministic fixture web: rounds
    of admission → politeness → fetch-join → parse-UDF → explode. Returns
    the (round, host, url) crawl order straight from the committed
    checkpoint parquet (no driver-side collect round-trip)."""
    import tempfile

    from webcrawler_spark import fixtures
    from webcrawler_spark.plans.crawl import CrawlConfig, run_crawl

    paths = _ensure_bfs_fixture()
    # per-call checkpoint dir: the FIXTURE is an idempotent shared read,
    # but a shared ckpt path would let two concurrent sessions clobber
    # each other's round manifests (observed as a parquet-read flake)
    ckpt = tempfile.mkdtemp(prefix="bfs_ckpt_")
    # tiny fixture web: shrink the shuffle so the 8-round loop stays quick
    prev_shuffle = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    try:
        pages = spark.read.parquet(paths["pages"])
        seeds = spark.read.parquet(paths["seeds"])
        robots_df = spark.read.parquet(paths["robots"])
        cfg = CrawlConfig(whitelist=fixtures.WHITELIST,
                          max_depth=_BFS_MAX_DEPTH, max_rounds=_BFS_MAX_ROUNDS)
        result = run_crawl(
            spark, pages, seeds, cfg, checkpoint_dir=ckpt,
            budgets=robots_df.select("host", "budget_per_round"),
            robots=robots_df.select("host", "disallow_prefixes"),
        )
        order = result.order(spark)
        return order.select(
            F.col("round").cast("long").alias("round"), "host", "url"
        ).localCheckpoint()  # materialize so the temp ckpt can be removed
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_shuffle)
        import shutil

        shutil.rmtree(ckpt, ignore_errors=True)


def _sql_crawl_bfs() -> str:
    """DuckDB twin of q_crawl_bfs: the bounded BFS unrolled round-by-round
    (max_rounds fixed at 8). Each round repeats exactly the engine's
    admission -> dedup -> anti-join -> politeness -> fetch -> explode
    algebra; the sha1/canonical/link columns come from the precomputed
    side tables (see _ensure_bfs_fixture)."""
    d = _BFS_DIR
    wl = ", ".join(f"'{w}'" for w in ["bml365.com", "example.com.cn", "example.net"])
    parts = [f"""
canon AS MATERIALIZED (SELECT * FROM read_parquet('{d}/canon_map.parquet')),
links AS MATERIALIZED (SELECT * FROM read_parquet('{d}/page_links.parquet')),
rbr AS MATERIALIZED (SELECT host AS r_host, unnest(disallow_prefixes) AS pfx
        FROM read_parquet('{d}/robots.parquet')),
bud AS MATERIALIZED (SELECT host AS b_host, budget_per_round
        FROM read_parquet('{d}/robots.parquet')),
cand_0 AS MATERIALIZED (
  SELECT url AS raw_url, 0::BIGINT AS depth, '' AS parent,
         "order"::BIGINT AS link_pos
  FROM read_parquet('{d}/seeds.parquet')
),
seen_pre0 AS (SELECT NULL::VARCHAR AS sha1 WHERE 1 = 0),
def_pre0 AS (SELECT NULL::VARCHAR AS sha1, NULL::VARCHAR AS url,
             NULL::VARCHAR AS host, NULL::BIGINT AS depth WHERE 1 = 0)"""]
    for r in range(_BFS_MAX_ROUNDS + 1):
        prev_seen = f"seen_{r - 1}" if r else "seen_pre0"
        prev_def = f"def_{r - 1}" if r else "def_pre0"
        parts.append(f"""
adm_{r} AS MATERIALIZED (
  -- validity -> scheme -> robots -> whitelist -> depth, then the
  -- deterministic in-round winner per sha1 (min depth, parent, link_pos)
  SELECT c.sha1, c.url, c.host, cd.depth
  FROM cand_{r} cd JOIN canon c ON c.raw_url = cd.raw_url
  WHERE c.url IS NOT NULL AND c.scheme IN ('http', 'https')
    AND NOT EXISTS (SELECT 1 FROM rbr WHERE rbr.r_host = c.host
                    AND starts_with(c.path, rbr.pfx))
    AND c.primary_domain IN ({wl})
    AND cd.depth <= {_BFS_MAX_DEPTH}
  QUALIFY row_number() OVER (
    PARTITION BY c.sha1 ORDER BY cd.depth, cd.parent, cd.link_pos) = 1
),
new_{r} AS MATERIALIZED (
  SELECT a.* FROM adm_{r} a
  WHERE a.sha1 NOT IN (SELECT sha1 FROM {prev_seen})
),
seen_{r} AS MATERIALIZED (
  SELECT sha1 FROM {prev_seen} UNION ALL SELECT sha1 FROM new_{r}
),
rk_{r} AS MATERIALIZED (
  SELECT q.*, row_number() OVER (PARTITION BY q.host
                                 ORDER BY q.depth, q.sha1) AS rk,
         coalesce(b.budget_per_round, {_BFS_UNLIMITED}) AS budget
  FROM (SELECT sha1, url, host, depth FROM {prev_def}
        UNION ALL SELECT sha1, url, host, depth FROM new_{r}) q
  LEFT JOIN bud b ON b.b_host = q.host
),
fetch_{r} AS MATERIALIZED (SELECT sha1, url, host, depth FROM rk_{r} WHERE rk <= budget),
def_{r} AS MATERIALIZED (SELECT sha1, url, host, depth FROM rk_{r} WHERE rk > budget),
cand_{r + 1} AS MATERIALIZED (
  -- fetch join: only pages present AND html yield links (page_links holds
  -- exactly those); every emitted request gets depth + 1
  SELECT l.raw_url, f.depth + 1 AS depth, f.url AS parent,
         l.link_pos::BIGINT AS link_pos
  FROM fetch_{r} f JOIN links l ON l.page_url = f.url
)""")
    unions = "\n  UNION ALL ".join(
        f"SELECT {r}::BIGINT AS round, host, url FROM fetch_{r}"
        for r in range(_BFS_MAX_ROUNDS + 1)
    )
    return "WITH " + ",".join(parts) + f"\n{unions}"


# ---------------------------------------------------------------------------
# queries — Structured Streaming twins + event sessionization
# ---------------------------------------------------------------------------

def q_stream_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming ingest of the documents table drained with the
    available-now trigger: the SAME projection as text_token_stats, so
    the result hash-matches the same batch oracle — the equivalence that
    makes streaming results oracle-checkable at all."""
    sdf = streaming.stream_table(spark, f"{sf_dir}/documents.parquet")
    return streaming.drain_available_now(_token_stats_select(sdf))


def _stream_admission_winners(
    spark: SparkSession, sf_dir: str, max_files_per_trigger: int | None = None
):
    """Shared pipeline of the two streaming-admission surfaces: candidate
    synthesis over STREAMING orders+lineitem sources, stateless admission
    predicates, a stream-static anti-join against the (static) seen set,
    then the in-round dedup aggregate as the single stateful op (state =
    one row per distinct url_sha1 — frontier-sized, not stream-sized).
    The anti-join runs BEFORE dedup here (it must precede the stateful agg
    in a stream); it commutes with winner selection — both orders drop the
    same seen keys — so the drained result matches the SAME batch oracle
    SQL as frontier_admission.

    The whitelist test is admission.whitelist_host_predicate — pure byte
    scans, NO regex: the batch path's distinct-host semi-join (the other
    way to keep java.util.regex off the per-row hot path) is an agg +
    self-join, illegal before the stateful dedup in a stream; for a known
    whitelist of registrable domains the suffix fold admits the identical
    host set (property-tested against primary_domain)."""
    orders_b = _t(spark, sf_dir, "orders")
    a = streaming.stream_table(
        spark, f"{sf_dir}/orders.parquet",
        max_files_per_trigger=max_files_per_trigger,
    ).select(
        F.col("o_orderkey").alias("key"),
        (F.col("o_custkey") % 13).cast("long").alias("link_pos"),
    )
    b = streaming.stream_table(
        spark, f"{sf_dir}/lineitem.parquet",
        max_files_per_trigger=max_files_per_trigger,
    ).select(
        F.col("l_orderkey").alias("key"),
        (F.lit(100) + F.col("l_linenumber")).cast("long").alias("link_pos"),
    )
    raw = a.unionByName(b)
    k = F.col("key")
    cand = raw.select(
        _synth_url(k).alias("url"),
        (k % 8).cast("long").alias("depth"),
        F.lit("").alias("parent_url"),
        "link_pos",
    )
    cand = (
        cand.withColumn("url_sha1", F.md5(F.col("url")))
        .withColumn("host", U.url_host_canonical(F.col("url")))
        .withColumn("path", U.url_path_canonical(F.col("url")))
    )
    filt = cand.filter(
        (
            F.col("url").startswith("http://")
            | F.col("url").startswith("https://")
        )
        & admission.whitelist_host_predicate(F.col("host"), WHITELIST)
        & (F.col("depth") <= F.lit(5))
    )
    seen = orders_b.filter(F.col("o_orderkey") % 5 == 0).select(
        F.md5(_synth_url(F.col("o_orderkey"))).alias("url_sha1")
    )
    new = admission.anti_join_seen(filt, seen)
    return admission.dedup_in_round(new)


def q_stream_frontier_admission(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl's admission hot path AS A STREAM, drained in complete
    mode (the oracle twin: full final state re-emitted, hash-matching the
    batch frontier_admission SQL directly). Continuous deployments use the
    update-mode drain (q_stream_admission_update) — complete mode rewrites
    full state per trigger and is priced accordingly."""
    winners = _stream_admission_winners(spark, sf_dir)
    out = streaming.drain_available_now(winners, output_mode="complete")
    return out.select(
        "url", "host", F.col("depth").cast("long").alias("depth"),
        "parent_url", "link_pos",
    )


def q_stream_admission_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME streaming admission drained in UPDATE mode — the
    continuous-operation surface: each trigger emits only keys whose
    winner state changed, so a 10^10-key frontier never rewrites full
    state per micro-batch. Per-key emissions are monotone under the
    winner order (a key re-emits only when a strictly smaller
    (depth, parent, link_pos) arrives), so the final state is recovered
    by re-applying the same dedup aggregate over the drained emissions —
    dedup-on-read, one tiny batch agg over the sink. Hash-matches the
    SAME oracle as the complete-mode twin (same final state, proven by
    construction and by the multi-micro-batch test in
    tests/test_streaming.py)."""
    winners = _stream_admission_winners(spark, sf_dir)
    drained = streaming.drain_available_now(winners, output_mode="update")
    merged = admission.dedup_in_round(drained)
    return merged.select(
        "url", "host", F.col("depth").cast("long").alias("depth"),
        "parent_url", "link_pos",
    )


def q_stream_dedup_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact-dedup state over a documents stream (update-mode
    aggregation state keyed by content hash, one state row per DISTINCT
    hash); drained result == the batch dedup_exact groupBy."""
    sdf = streaming.stream_table(spark, f"{sf_dir}/documents.parquet")
    out = streaming.exact_dedup_counts_stream(sdf)
    drained = streaming.drain_available_now(out, output_mode="complete")
    return drained.select(
        "content_hash",
        F.col("n_copies").cast("long").alias("n_copies"),
        F.col("keeper_id").cast("long").alias("keeper_id"),
    )


def q_stream_events_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling-window aggregation with a 2h watermark over a
    streaming events source; epoch-aligned 1h windows make the batch twin
    a date_trunc. Window starts exported as epoch MICROSECONDS (integer —
    no tz/format ambiguity across engines)."""
    sdf = streaming.stream_table(spark, f"{sf_dir}/events.parquet")
    out = streaming.windowed_event_stats(sdf, window="1 hour", watermark="2 hours")
    drained = streaming.drain_available_now(out, output_mode="complete")
    return drained.select(
        sessions.epoch_us(F.col("window_start")).alias("window_start_us"),
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value",
    )


def q_events_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30 min) of the events log — integer-
    microsecond boundary math, per-user windows, one groupBy."""
    ev = _t(spark, sf_dir, "events")
    out = sessions.sessionize(ev, gap_minutes=30)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("session_idx").cast("long").alias("session_idx"),
        sessions.epoch_us(F.col("session_start")).alias("session_start_us"),
        sessions.epoch_us(F.col("session_end")).alias("session_end_us"),
        F.col("n_events").cast("long").alias("n_events"),
        "sum_value",
    )


def _sql_events_window() -> str:
    return """
SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
       event_type,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value
FROM events GROUP BY 1, 2
"""


def _sql_events_sessionize(gap_minutes: int = 30) -> str:
    gap_us = gap_minutes * 60_000_000
    return f"""
WITH e AS (
  SELECT user_id, ts, event_id, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('microsecond', lag(ts) OVER w, ts) > {gap_us}
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT *, sum(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS session_idx
  FROM e
)
SELECT user_id::BIGINT AS user_id, session_idx::BIGINT AS session_idx,
       epoch_us(min(ts)) AS session_start_us,
       epoch_us(max(ts)) AS session_end_us,
       count(*)::BIGINT AS n_events,
       round(sum(value), 6) AS sum_value
FROM s GROUP BY user_id, session_idx
"""


# ---------------------------------------------------------------------------
# queries — link graph, sampling, packing, CDC, indexing, WARC (round 3)
# ---------------------------------------------------------------------------

_PR_ITERS = 5


def q_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Integer-unit PageRank (5 iterations, damping 85/100) over the
    deterministic synthetic link graph derived from the documents table
    (operators/graph.synth_link_graph — same affine rules in the oracle).
    Engine-exact: every step is integer arithmetic."""
    docs = _t(spark, sf_dir, "documents")
    n = docs.count()
    nodes = docs.select(F.col("doc_id").cast("long").alias("node"))
    edges = graph.synth_link_graph(nodes, n)
    return graph.pagerank(nodes, edges, n, iters=_PR_ITERS).select(
        F.col("node").cast("long").alias("doc_id"),
        F.col("rank_units").cast("long").alias("rank_units"),
    )


def _sql_pagerank(iters: int = _PR_ITERS) -> str:
    """Unrolled-iteration DuckDB twin of graph.pagerank (MATERIALIZED per
    round so the optimizer does not inline the chain exponentially)."""
    n_sub = "(SELECT n FROM nn)"
    base = f"(1000000000 // {n_sub})"
    parts = [
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM documents)",
        "nodes AS MATERIALIZED (SELECT doc_id AS node FROM documents)",
        f"""edges AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT node AS src, (node * 7 + 3) % {n_sub} AS dst FROM nodes WHERE node % 2 != 0
    UNION ALL
    SELECT node, (node * 13 + 5) % {n_sub} FROM nodes WHERE node % 3 != 0
    UNION ALL
    SELECT node, (node * 31 + 11) % {n_sub} FROM nodes WHERE node % 4 != 0
  ) WHERE dst != src
)""",
        "outdeg AS MATERIALIZED (SELECT src, count(*) AS k FROM edges GROUP BY src)",
        f"r0 AS MATERIALIZED (SELECT node, {base}::BIGINT AS r FROM nodes)",
    ]
    for i in range(iters):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT coalesce(sum(r), 0)::BIGINT AS dm "
            f"FROM r{i} WHERE node NOT IN (SELECT src FROM outdeg))"
        )
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT e.dst AS node, sum(r.r // o.k)::BIGINT AS inc
  FROM edges e JOIN r{i} r ON r.node = e.src JOIN outdeg o ON o.src = e.src
  GROUP BY e.dst
)"""
        )
        parts.append(
            f"""r{i + 1} AS MATERIALIZED (
  SELECT n.node,
         ((15 * {base}) // 100
          + (85 * (coalesce(c.inc, 0) + (SELECT dm FROM d{i}) // {n_sub})) // 100
         )::BIGINT AS r
  FROM nodes n LEFT JOIN c{i} c ON c.node = n.node
)"""
        )
    return (
        "WITH " + ",\n".join(parts)
        + f"\nSELECT node::BIGINT AS doc_id, r AS rank_units FROM r{iters}"
    )


_MIX_FRACTIONS = {"src0": 0.5, "src1": 0.25, "src2": 0.125}
_MIX_DEFAULT = 0.05
_MIX_SALT = "mix1"


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Bernoulli mixture sampling — deterministic hash
    membership, pure scan-side filter (no shuffle, no RNG)."""
    docs = _t(spark, sf_dir, "documents")
    out = sampling.stratified_sample(
        docs, "source", _MIX_FRACTIONS, _MIX_DEFAULT, key_col="doc_id",
        salt=_MIX_SALT,
    )
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "source")


def _sql_sample_stratified() -> str:
    cases = " ".join(
        f"WHEN '{k}' THEN {int(round(v * sampling.RATE_DENOM))}"
        for k, v in sorted(_MIX_FRACTIONS.items())
    )
    return f"""
SELECT doc_id::BIGINT AS doc_id, source FROM documents
WHERE ('0x' || substr(md5(doc_id::VARCHAR || '|{_MIX_SALT}'), 1, 14))::BIGINT
      % {sampling.RATE_DENOM}
      < CASE source {cases} ELSE {int(round(_MIX_DEFAULT * sampling.RATE_DENOM))} END
"""


def q_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly-k-per-stratum deterministic sample (hash-ordered reservoir
    analog): 20 docs per language."""
    docs = _t(spark, sf_dir, "documents")
    out = sampling.stratified_topk(docs, "lang", k=20, key_col="doc_id",
                                   salt=_MIX_SALT)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "lang",
        F.col("sample_rank").cast("long").alias("sample_rank"),
    )


def _sql_sample_topk() -> str:
    return f"""
WITH r AS (
  SELECT doc_id, lang,
         row_number() OVER (
           PARTITION BY lang
           ORDER BY ('0x' || substr(md5(doc_id::VARCHAR || '|{_MIX_SALT}'), 1, 14))::BIGINT
                    % {sampling.RATE_DENOM} ASC, doc_id ASC
         ) AS sample_rank
  FROM documents
)
SELECT doc_id::BIGINT AS doc_id, lang, sample_rank::BIGINT AS sample_rank
FROM r WHERE sample_rank <= 20
"""


_PACK_BUDGET = 512
_PACK_SHARDS = 8


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing metadata: 8 hash shards, 512
    token windows, one window pass per shard."""
    docs = _t(spark, sf_dir, "documents")
    return packing.pack_sequences(
        docs, budget=_PACK_BUDGET, n_shards=_PACK_SHARDS
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("shard").cast("long").alias("shard"),
        "n_tokens",
        "pack_id",
        "offset_in_pack",
    )


def _sql_pack_sequences() -> str:
    return f"""
WITH t AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR || '|pack'), 1, 14))::BIGINT
           % {sampling.RATE_DENOM} % {_PACK_SHARDS} AS shard,
         (CASE WHEN length(trim(text)) = 0 THEN 0
               ELSE len({_SQL_TOKS}) END)::BIGINT AS n_tokens
  FROM documents
), w AS (
  SELECT *, sum(n_tokens) OVER (
           PARTITION BY shard ORDER BY doc_id ROWS UNBOUNDED PRECEDING
         ) - n_tokens AS before
  FROM t
)
SELECT doc_id::BIGINT AS doc_id, shard::BIGINT AS shard, n_tokens,
       (shard * {packing.PACKS_PER_SHARD} + before // {_PACK_BUDGET})::BIGINT AS pack_id,
       (before % {_PACK_BUDGET})::BIGINT AS offset_in_pack
FROM w
"""


_CHUNK_TOKENS, _CHUNK_OVERLAP = 32, 8


def q_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (RAG/context prep): 32-token windows
    advancing by 24 — one explode per doc, no shuffle; chunk_text is
    engine-exact via the standard whitespace tokenizer."""
    docs = _t(spark, sf_dir, "documents")
    return packing.chunk_documents(
        docs, chunk_tokens=_CHUNK_TOKENS, overlap=_CHUNK_OVERLAP
    ).select(
        F.col("doc_id").cast("long").alias("doc_id"),
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("start_tok").cast("long").alias("start_tok"),
        "n_tokens",
        "chunk_text",
    )


def _sql_chunk_documents() -> str:
    step = _CHUNK_TOKENS - _CHUNK_OVERLAP
    return f"""
WITH d AS (
  SELECT doc_id, {_SQL_TOKS} AS toks
  FROM documents WHERE length(trim(text)) > 0
), c AS (
  SELECT doc_id, toks,
         unnest(range(0,
           ceil(greatest(len(toks) - {_CHUNK_OVERLAP}, 1) / {step}.0)::BIGINT
         )) AS chunk_idx
  FROM d
)
SELECT doc_id::BIGINT AS doc_id, chunk_idx::BIGINT AS chunk_idx,
       (chunk_idx * {step})::BIGINT AS start_tok,
       len(toks[(chunk_idx * {step} + 1)::BIGINT
                : (chunk_idx * {step} + {_CHUNK_TOKENS})::BIGINT])::BIGINT
         AS n_tokens,
       array_to_string(
         toks[(chunk_idx * {step} + 1)::BIGINT
              : (chunk_idx * {step} + {_CHUNK_TOKENS})::BIGINT], ' ')
         AS chunk_text
FROM c
"""


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC between two synthetic corpus snapshots derived from documents
    (old = id%7!=0 with id%13==0 texts NULLed; new = id%5!=0 with id%11==0
    texts revised): one full-outer hash-compare join, changed minority
    only. The NULLed old texts pin the null-safe compare — a NULL->text
    transition must surface as 'changed', not vanish."""
    docs = _t(spark, sf_dir, "documents")
    did = F.col("doc_id")
    old = docs.filter(did % 7 != 0).withColumn(
        "text",
        F.when(did % 13 == 0, F.lit(None).cast("string"))
        .otherwise(F.col("text")),
    )
    new = docs.filter(did % 5 != 0).withColumn(
        "text",
        F.when(did % 11 == 0, F.concat(F.col("text"), F.lit(" [rev2]")))
        .otherwise(F.col("text")),
    )
    out = snapshot.snapshot_diff(old, new)
    return out.select(
        F.col("doc_id").cast("long").alias("doc_id"),
        "status", "old_hash", "new_hash",
    )


def _sql_snapshot_diff() -> str:
    return """
WITH old AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 13 = 0 THEN NULL ELSE text END) AS old_hash
  FROM documents WHERE doc_id % 7 != 0
), new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 11 = 0 THEN text || ' [rev2]' ELSE text END) AS new_hash
  FROM documents WHERE doc_id % 5 != 0
), j AS (
  SELECT coalesce(o.doc_id, n.doc_id) AS doc_id, old_hash, new_hash,
         CASE WHEN o.doc_id IS NULL THEN 'added'
              WHEN n.doc_id IS NULL THEN 'removed'
              WHEN old_hash IS DISTINCT FROM new_hash THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
)
SELECT doc_id::BIGINT AS doc_id, status, old_hash, new_hash
FROM j WHERE status != 'unchanged'
"""


def q_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """term -> (df, sorted postings string): one explode + one groupBy."""
    docs = _t(spark, sf_dir, "documents")
    return textindex.inverted_index(docs)


def _sql_inverted_index() -> str:
    return f"""
WITH pairs AS (
  SELECT DISTINCT doc_id, unnest({_SQL_TOKS}) AS term
  FROM documents WHERE length(trim(text)) > 0
)
SELECT term, count(*)::BIGINT AS df,
       string_agg(doc_id::VARCHAR, ',' ORDER BY doc_id) AS postings
FROM pairs GROUP BY term
"""


def q_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 salient terms per doc by integer-scaled tf/df."""
    docs = _t(spark, sf_dir, "documents")
    return textindex.top_terms(docs, k=3)


def _sql_tfidf_topk() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_SQL_TOKS}) AS term
  FROM documents WHERE length(trim(text)) > 0
), tf AS (
  SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok GROUP BY doc_id, term
), dfc AS (
  SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY term
), s AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfc.df,
         ((tf.tf * {textindex.SCORE_UNIT}) // dfc.df)::BIGINT AS score
  FROM tf JOIN dfc USING (term)
), r AS (
  SELECT *, row_number() OVER (
           PARTITION BY doc_id ORDER BY score DESC, term ASC
         ) AS rank
  FROM s
)
SELECT doc_id::BIGINT AS doc_id, term, tf, df, score, rank::BIGINT AS rank
FROM r WHERE rank <= 3
"""


_WARC_DIR = "/tmp/spark_graft_warc"
_WARC_FILES = 8


def _ensure_warc_fixture(sf_dir: str) -> str:
    """Stage deterministic WARC files (mixed plain + per-record-gzip)
    built from the documents table — test scaffolding; the OPERATOR under
    test is the distributed reader. Cached per sf_dir."""
    import json
    import os
    from datetime import datetime, timedelta

    import pyarrow.parquet as pq

    from webcrawler_spark.sources import warc

    out = os.path.join(_WARC_DIR, os.path.basename(sf_dir.rstrip("/")))
    marker = os.path.join(out, "_done.json")
    if os.path.exists(marker):
        return out
    os.makedirs(out, exist_ok=True)
    tbl = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"), columns=["doc_id", "text"]
    )
    rows = sorted(
        zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist())
    )
    epoch = datetime(2024, 1, 1)
    chunk = max(1, (len(rows) + _WARC_FILES - 1) // _WARC_FILES)
    total = 0
    for i in range(0, len(rows), chunk):
        gz = (i // chunk) % 2 == 1  # alternate plain / gzip-member files
        path = os.path.join(
            out, f"part-{i // chunk:03d}.warc" + (".gz" if gz else "")
        )
        total += warc.write_warc(
            (
                (
                    f"https://warc.example.org/doc/{d}",
                    (epoch + timedelta(seconds=int(d))).strftime(
                        "%Y-%m-%dT%H:%M:%SZ"
                    ),
                    t.encode("utf-8"),
                )
                for d, t in rows[i : i + chunk]
            ),
            path,
            gzip_members=gz,
        )
    with open(marker, "w") as f:
        json.dump({"records": total}, f)
    return out


def q_warc_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed WARC ingestion (binaryFile -> Arrow record parser) of a
    staged Common-Crawl-style archive of the documents table; verified
    against the documents table itself."""
    from webcrawler_spark.sources import warc

    out = _ensure_warc_fixture(sf_dir)
    recs = warc.read_warc(spark, out)
    return recs.filter(F.col("error").isNull()).select(
        "url",
        "warc_date",
        F.col("http_status").cast("long").alias("http_status"),
        "mime",
        F.length(F.col("body")).cast("long").alias("n_bytes"),
        F.md5(F.col("body")).alias("content_md5"),
    )


def _sql_warc_parse() -> str:
    return """
SELECT 'https://warc.example.org/doc/' || doc_id::VARCHAR AS url,
       strftime(TIMESTAMP '2024-01-01 00:00:00' + to_seconds(doc_id),
                '%Y-%m-%dT%H:%M:%SZ') AS warc_date,
       200::BIGINT AS http_status,
       'text/html' AS mime,
       strlen(text)::BIGINT AS n_bytes,
       md5(text) AS content_md5
FROM documents
"""


# wildcard robots fixture: one body per host, exercising anchored patterns,
# middle wildcards, Allow overrides, and the degenerate block-all
_WILDCARD_ROBOTS = [
    ("h0.example.com", "User-agent: *\nDisallow: /p/1\nAllow: /p/1/f3\n"),
    ("h1.example.com", "User-agent: *\nDisallow: /*.php$\n"),
    ("h2.example.com", "User-agent: *\nDisallow: /p/*/f1\nAllow: /p/4\n"),
    ("h3.example.com", "User-agent: *\nDisallow: /p/2*$\nAllow: /p/2/f5\n"),
    ("h4.example.com", "User-agent: *\nDisallow: *\n"),
]
# (pattern -> equivalent anchored regex) for the DuckDB twin; precedence is
# the RAW pattern length, allow wins ties — same rule the engine applies
_WILDCARD_RULES_SQL = [
    ("h0.example.com", "/p/1", "^/p/1", False),
    ("h0.example.com", "/p/1/f3", "^/p/1/f3", True),
    ("h1.example.com", "/*.php$", r"^/.*\.php$", False),
    ("h2.example.com", "/p/*/f1", "^/p/.*/f1", False),
    ("h2.example.com", "/p/4", "^/p/4", True),
    ("h3.example.com", "/p/2*$", "^/p/2.*$", False),
    ("h3.example.com", "/p/2/f5", "^/p/2/f5", True),
    ("h4.example.com", "*", "^", False),
]


def q_robots_wildcard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The RFC 9309 wildcard matcher end-to-end against an independent
    regex oracle: robots BODIES are parsed (parse_robots compiles */$
    patterns to segment arrays) and candidates run through the REAL
    admission filter; DuckDB re-decides every (host, path) with anchored
    regexes + the same longest-pattern/allow-wins precedence."""
    from webcrawler_spark.operators import admission
    from webcrawler_spark.sources.robots import parse_robots

    orders = _t(spark, sf_dir, "orders")
    okey = F.col("o_orderkey").cast("long")
    host = F.concat(F.lit("h"), okey % 5, F.lit(".example.com"))
    path = F.concat(
        F.lit("/p/"), okey % 7, F.lit("/f"), okey % 11,
        F.when(okey % 2 == 0, F.lit(".php")).otherwise(F.lit(".html")),
    )
    cand = (
        orders.select(host.alias("host"), path.alias("path"))
        .distinct()
        .select(
            F.concat(F.lit("http://"), F.col("host"), F.col("path")).alias("url"),
            "host", "path", F.lit(0).cast("long").alias("depth"),
        )
    )
    robots = parse_robots(
        spark.createDataFrame(_WILDCARD_ROBOTS, "host string, body string")
    )
    out = admission.admission_filters(cand, ["example.com"], 3, robots=robots)
    return out.select("host", "path")


def _sql_robots_wildcard() -> str:
    vals = ",\n    ".join(
        f"('{h}', '{p}', '{rx}', {str(a).lower()})"
        for h, p, rx, a in _WILDCARD_RULES_SQL
    )
    return f"""
WITH cand AS (
  SELECT DISTINCT
         'h' || (o_orderkey % 5)::VARCHAR || '.example.com' AS host,
         '/p/' || (o_orderkey % 7)::VARCHAR || '/f' || (o_orderkey % 11)::VARCHAR ||
         CASE WHEN o_orderkey % 2 = 0 THEN '.php' ELSE '.html' END AS path
  FROM orders
), rules(host, pattern, rx, allow) AS (VALUES
    {vals}
), m AS (
  SELECT c.host, c.path, r.allow, length(r.pattern) AS plen
  FROM cand c JOIN rules r
    ON c.host = r.host AND regexp_matches(c.path, r.rx)
), best AS (
  SELECT host, path, allow,
         row_number() OVER (PARTITION BY host, path
                            ORDER BY plen DESC, allow DESC) AS rn
  FROM m
)
SELECT c.host, c.path
FROM cand c
LEFT JOIN (SELECT host, path, allow FROM best WHERE rn = 1) b
  USING (host, path)
WHERE b.allow IS NULL OR b.allow
"""


_HOST_CAP = 100


def q_host_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-trap guard: per-host admission cap — deterministic row_number
    split, shallowest-first. Returns the kept side."""
    from webcrawler_spark.operators import admission

    orders = _t(spark, sf_dir, "orders")
    okey = F.col("o_orderkey").cast("long")
    cand = orders.select(
        F.concat(F.lit("h"), okey % 5, F.lit(".example.com")).alias("host"),
        F.concat(
            F.lit("/p/"), okey % 7, F.lit("/f"), okey % 11,
            F.when(okey % 2 == 0, F.lit(".php")).otherwise(F.lit(".html")),
        ).alias("path"),
    ).distinct()
    kept, _overflow = admission.cap_per_host(
        cand, _HOST_CAP, order_cols=("path",)
    )
    return kept.select("host", "path")


def _sql_host_cap() -> str:
    return f"""
WITH cand AS (
  SELECT DISTINCT
         'h' || (o_orderkey % 5)::VARCHAR || '.example.com' AS host,
         '/p/' || (o_orderkey % 7)::VARCHAR || '/f' || (o_orderkey % 11)::VARCHAR ||
         CASE WHEN o_orderkey % 2 = 0 THEN '.php' ELSE '.html' END AS path
  FROM orders
)
SELECT host, path FROM (
  SELECT host, path,
         row_number() OVER (PARTITION BY host ORDER BY path) AS rn
  FROM cand
) WHERE rn <= {_HOST_CAP}
"""


_MIX_TARGET = 200


def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened (alpha=0.5) mixture sampling over document
    sources: integer-exact shares from floor(sqrt(n)) weights, hash-
    threshold membership — reproducible and engine-identical."""
    from webcrawler_spark.operators import sampling

    docs = _t(spark, sf_dir, "documents")
    out = sampling.temperature_mixture(
        docs, "source", target_rows=_MIX_TARGET, alpha=0.5, salt="mix"
    )
    return out.select(F.col("doc_id").cast("long").alias("doc_id"), "source")


def _sql_sample_temperature() -> str:
    return f"""
WITH c AS (
  SELECT source, count(*)::BIGINT AS n FROM documents GROUP BY source
), w AS (
  SELECT source, n, floor(sqrt(n))::BIGINT AS w FROM c
), t AS (
  SELECT sum(w)::BIGINT AS tw FROM w
), r AS (
  SELECT source,
         least(1000000::BIGINT,
               (({_MIX_TARGET} * w) // tw) * 1000000 // n) AS rate
  FROM w, t
)
SELECT d.doc_id::BIGINT AS doc_id, d.source
FROM documents d JOIN r USING (source)
WHERE ('0x' || substr(md5(d.doc_id::VARCHAR || '|' || 'mix'), 1, 14))::BIGINT
      % 1000000 < r.rate
"""


def _sitemap_frags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-order sitemap <url> fragments (shared by the
    urlset and index body builders; the DuckDB twin builds the IDENTICAL
    strings)."""
    orders = _t(spark, sf_dir, "orders")
    okey = F.col("o_orderkey").cast("long")
    g = (okey % 50).alias("g")
    frag = F.concat(
        F.lit("<url><loc>http://h"), okey % 50,
        F.lit(".example.com/o/"), okey, F.lit("</loc>"),
        F.when(
            okey % 3 == 0,
            F.concat(F.lit("<lastmod>2024-01-"),
                     F.lpad(((okey % 28) + 1).cast("string"), 2, "0"),
                     F.lit("</lastmod>")),
        ).otherwise(F.lit("")),
        F.when(
            okey % 4 == 0,
            F.concat(F.lit("<priority>0."), (okey % 9) + 1,
                     F.lit("</priority>")),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    return orders.select(g, okey.alias("okey"), frag.alias("frag"))


def q_sitemap_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemaps-protocol source: synthetic urlset bodies (one per host
    group, fragments ordered by order key) plus one sitemapindex body,
    parsed by sources.sitemap.parse_sitemaps — regexp block extraction +
    explode, all native, exact DuckDB twin."""
    from webcrawler_spark.sources.sitemap import parse_sitemaps

    frags = _sitemap_frags(spark, sf_dir)
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("okey", "frag"))),
        lambda s: s["frag"],
    )
    urlsets = frags.groupBy("g").agg(
        F.concat(F.lit("<urlset>"), F.concat_ws("", ordered),
                 F.lit("</urlset>")).alias("body")
    ).select(
        F.concat(F.lit("h"), F.col("g"), F.lit(".example.com")).alias("host"),
        "body",
    )
    sm_frag = F.concat(
        F.lit("<sitemap><loc>http://h"), F.col("g"),
        F.lit(".example.com/sitemap.xml</loc></sitemap>"),
    )
    idx_ordered = F.transform(
        F.array_sort(F.collect_list(F.struct(F.col("g"), sm_frag.alias("frag")))),
        lambda s: s["frag"],
    )
    index = frags.select("g").distinct().agg(
        F.concat(F.lit("<sitemapindex>"), F.concat_ws("", idx_ordered),
                 F.lit("</sitemapindex>")).alias("body")
    ).select(F.lit("index.example.com").alias("host"), "body")
    return parse_sitemaps(urlsets.unionByName(index))


def _sql_sitemap_parse() -> str:
    return r"""
WITH frags AS (
  SELECT o_orderkey % 50 AS g, o_orderkey AS okey,
         '<url><loc>http://h' || (o_orderkey % 50)::VARCHAR ||
         '.example.com/o/' || o_orderkey::VARCHAR || '</loc>' ||
         CASE WHEN o_orderkey % 3 = 0
              THEN '<lastmod>2024-01-' ||
                   lpad(((o_orderkey % 28) + 1)::VARCHAR, 2, '0') ||
                   '</lastmod>' ELSE '' END ||
         CASE WHEN o_orderkey % 4 = 0
              THEN '<priority>0.' || ((o_orderkey % 9) + 1)::VARCHAR ||
                   '</priority>' ELSE '' END ||
         '</url>' AS frag
  FROM orders
), bodies AS (
  SELECT 'h' || g::VARCHAR || '.example.com' AS host,
         '<urlset>' || string_agg(frag, '' ORDER BY okey) || '</urlset>' AS body
  FROM frags GROUP BY g
  UNION ALL
  SELECT 'index.example.com',
         '<sitemapindex>' || string_agg(
           '<sitemap><loc>http://h' || g::VARCHAR ||
           '.example.com/sitemap.xml</loc></sitemap>', '' ORDER BY g) ||
         '</sitemapindex>'
  FROM (SELECT DISTINCT o_orderkey % 50 AS g FROM orders)
), arrs AS (
  SELECT host, 'url' AS kind,
         regexp_extract_all(body, '(?s)<url>(.*?)</url>', 1) AS l
  FROM bodies
  UNION ALL
  SELECT host, 'sitemap' AS kind,
         regexp_extract_all(body, '(?s)<sitemap>(.*?)</sitemap>', 1) AS l
  FROM bodies
), blocks AS (
  SELECT host, kind, unnest(list_zip(l, range(0, len(l)))) AS z FROM arrs
)
SELECT host, kind,
       z[2]::BIGINT AS pos,
       regexp_extract(z[1], '(?s)<loc>\s*(.*?)\s*</loc>', 1) AS loc,
       nullif(regexp_extract(z[1], '(?s)<lastmod>\s*(.*?)\s*</lastmod>', 1), '')
         AS lastmod,
       coalesce(
         try_cast(regexp_extract(z[1], '(?s)<priority>\s*(.*?)\s*</priority>', 1)
                  AS DOUBLE), 0.5) AS priority
FROM blocks
WHERE regexp_extract(z[1], '(?s)<loc>\s*(.*?)\s*</loc>', 1) != ''
"""


def _robots_discovery_bodies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic robots.txt bodies, one per host group: a DECOY non-*
    group (whose Crawl-delay: 999 must be ignored), the * group with an
    arithmetic Crawl-delay on 2/3 of hosts, a Disallow, and okey-gated
    `Sitemap:` lines scattered through the file. The DuckDB twins
    synthesize the EXPECTED extraction from the same arithmetic instead of
    re-parsing text — an independent oracle for the parser."""
    orders = _t(spark, sf_dir, "orders")
    okey = F.col("o_orderkey").cast("long")
    g = (okey % 20).alias("g")
    sm_line = F.when(
        okey % 11 == 0,
        F.concat(F.lit("Sitemap: http://h"), okey % 20,
                 F.lit(".example.com/sm"), okey % 5, F.lit(".xml")),
    )
    rows = orders.select(g, okey.alias("okey"), sm_line.alias("sm"))
    sm_block = F.concat_ws(
        "\n",
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(F.col("sm").isNotNull(), F.struct("okey", "sm"))
                )
            ),
            lambda s: s["sm"],
        ),
    )
    gc = F.col("g")
    body = F.concat_ws(
        "\n",
        F.lit("User-agent: otherbot"),
        F.lit("Crawl-delay: 999"),           # decoy: non-* group
        F.lit("Disallow: /other/"),
        F.lit("User-agent: *"),
        F.when(
            gc % 3 != 0,
            F.concat(F.lit("Crawl-delay: "), (gc % 7 + 1).cast("string")),
        ).otherwise(F.lit("")),               # blank line: parser ignores
        F.concat(F.lit("Disallow: /d"), gc),
        sm_block,
    )
    return rows.groupBy("g").agg(body.alias("body")).select(
        F.concat(F.lit("h"), F.col("g"), F.lit(".example.com")).alias("host"),
        "body",
    )


def q_warc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The distributed WARC SINK, proven through its own reader: pages
    synthesized from orders are exported as Common-Crawl-layout archives
    (range-partitioned, per-record gzip members, clock-free) and read
    back; the DuckDB twin synthesizes the expected records from the same
    arithmetic — if partitioning, record framing, HTTP splitting or the
    gzip member loop dropped or mangled anything, the hash breaks."""
    import shutil
    import tempfile

    from webcrawler_spark.sources import warc

    orders = _t(spark, sf_dir, "orders")
    okey = F.col("o_orderkey").cast("long")
    pages = orders.filter(okey % 7 == 0).select(
        F.concat(
            F.lit("http://h"), okey % 9, F.lit(".example.com/o/"), okey,
            F.when(okey % 3 == 0, F.lit(".jpg")).otherwise(F.lit(".html")),
        ).alias("url"),
        F.lit("2024-02-03 04:05:06").cast("timestamp").alias("warc_ts"),
        F.encode(
            F.concat(F.lit("body-of-"), okey, F.lit("-"),
                     F.repeat(F.lit("x"), (okey % 50).cast("int"))),
            "UTF-8",
        ).alias("html"),
    )
    out_dir = tempfile.mkdtemp(prefix="warc_rt_")
    try:
        warc.write_warc_sink(pages, out_dir, files=8).collect()  # export
        back = warc.read_warc(spark, out_dir)
        return (
            back.select(
                "url",
                "mime",
                F.col("http_status").cast("long").alias("http_status"),
                F.length("body").cast("long").alias("body_len"),
                F.col("warc_date").alias("warc_date"),
            )
            .localCheckpoint()  # materialize BEFORE the temp dir vanishes
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _sql_warc_roundtrip() -> str:
    return """
SELECT 'http://h' || (o_orderkey % 9)::VARCHAR || '.example.com/o/' ||
       o_orderkey::VARCHAR ||
       CASE WHEN o_orderkey % 3 = 0 THEN '.jpg' ELSE '.html' END AS url,
       CASE WHEN o_orderkey % 3 = 0 THEN 'image/jpeg'
            ELSE 'text/html' END AS mime,
       200::BIGINT AS http_status,
       (8 + length(o_orderkey::VARCHAR) + 1 + (o_orderkey % 50))::BIGINT
         AS body_len,
       '2024-02-03T04:05:06Z' AS warc_date
FROM orders WHERE o_orderkey % 7 = 0
"""


def q_sitemap_recrawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-driven recrawl selection: sitemap <lastmod> vs the
    corpus's last-crawl date — never-crawled URLs ('new') plus URLs whose
    site-declared lastmod postdates the crawl ('stale'), with sitemap
    priority carried in frontier units. The DuckDB twin synthesizes the
    expected set from the same arithmetic (independent oracle)."""
    from webcrawler_spark.sources.sitemap import recrawl_candidates

    parsed = q_sitemap_parse(spark, sf_dir)
    orders = _t(spark, sf_dir, "orders")
    okey = F.col("o_orderkey").cast("long")
    crawled = orders.filter(okey % 2 == 0).select(
        F.concat(
            F.lit("http://h"), okey % 50, F.lit(".example.com/o/"), okey
        ).alias("url"),
        F.lit("2024-01-15").cast("date").alias("last_crawl"),
    )
    out = recrawl_candidates(parsed, crawled)
    return out.select("url", "reason", F.col("priority").cast("long").alias("priority"))


def _sql_sitemap_recrawl() -> str:
    return """
SELECT 'http://h' || (o_orderkey % 50)::VARCHAR || '.example.com/o/' ||
       o_orderkey::VARCHAR AS url,
       CASE WHEN o_orderkey % 2 = 1 THEN 'new' ELSE 'stale' END AS reason,
       (CASE WHEN o_orderkey % 4 = 0 THEN ((o_orderkey % 9) + 1) * 10
             ELSE 50 END)::BIGINT AS priority
FROM orders
WHERE o_orderkey % 2 = 1
   OR (o_orderkey % 3 = 0 AND (o_orderkey % 28) + 1 > 15)
"""


def q_robots_sitemaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 §2.3 `Sitemap:` extraction — group-independent (lines in
    the decoy group and the * group both count), absolute-URL values kept
    intact past the first colon, deduped."""
    from webcrawler_spark.sources.robots import robots_sitemaps

    return robots_sitemaps(_robots_discovery_bodies(spark, sf_dir))


def _sql_robots_sitemaps() -> str:
    return """
SELECT DISTINCT
       'h' || (o_orderkey % 20)::VARCHAR || '.example.com' AS host,
       'http://h' || (o_orderkey % 20)::VARCHAR || '.example.com/sm' ||
       (o_orderkey % 5)::VARCHAR || '.xml' AS sitemap_url
FROM orders WHERE o_orderkey % 11 = 0
"""


def q_crawl_delay_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-delay -> politeness budgets: the * group's delay (the decoy
    group's 999 must NOT leak in) becomes floor(60/delay) slots/round."""
    from webcrawler_spark.sources.robots import (
        budgets_from_crawl_delay,
        crawl_delays,
    )

    return budgets_from_crawl_delay(
        crawl_delays(_robots_discovery_bodies(spark, sf_dir)), round_seconds=60.0
    )


def _sql_crawl_delay_budget() -> str:
    return """
SELECT 'h' || g::VARCHAR || '.example.com' AS host,
       greatest(1, floor(60.0 / (g % 7 + 1))::BIGINT) AS budget_per_round
FROM (SELECT DISTINCT o_orderkey % 20 AS g FROM orders)
WHERE g % 3 <> 0
"""


def q_politeness_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority-aware politeness ranking (SURVEY §1 `priority long`):
    budget slots go to the highest-priority URLs first — the per-host rank
    orders by (priority desc, depth asc, url_sha1 asc); top-3 kept."""
    orders = _t(spark, sf_dir, "orders")
    okey = F.col("o_orderkey").cast("long")
    queue = orders.select(
        F.concat(F.lit("h"), (F.col("o_custkey") % 50).cast("string")).alias("host"),
        (okey % 4).alias("depth"),
        ((okey % 3) * 10).alias("priority"),
        F.md5(okey.cast("string")).alias("url_sha1"),
        okey.alias("okey"),
    )
    return (
        ranked(queue)
        .filter(F.col("slot_rank") <= 3)
        .select("host", F.col("slot_rank").cast("long").alias("slot_rank"),
                "okey", F.col("priority").cast("long").alias("priority"))
    )


def _sql_politeness_priority() -> str:
    return """
WITH queue AS (
  SELECT 'h' || (o_custkey % 50)::VARCHAR AS host,
         (o_orderkey % 4)::BIGINT AS depth,
         ((o_orderkey % 3) * 10)::BIGINT AS priority,
         md5(o_orderkey::VARCHAR) AS url_md5,
         o_orderkey::BIGINT AS okey
  FROM orders
)
SELECT host, rn::BIGINT AS slot_rank, okey, priority FROM (
  SELECT host, okey, priority,
         row_number() OVER (PARTITION BY host
                            ORDER BY priority DESC, depth, url_md5) AS rn
  FROM queue
) WHERE rn <= 3
"""


# ---------------------------------------------------------------------------
# queries — sketches + as-of join (round 3, batch 2)
# ---------------------------------------------------------------------------

def q_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic HLL sketch of distinct users per event type: 256
    md5-bucket registers per group, one map-side-combined groupBy. The
    register table IS the mergeable sketch; estimate = 256-row fold."""
    ev = _t(spark, sf_dir, "events")
    return sketches.hll_registers(ev, "user_id", group_cols=["event_type"])


def _sql_hll_registers() -> str:
    return """
WITH h AS (
  SELECT event_type,
         ('0x' || substr(md5(user_id::VARCHAR), 1, 2))::BIGINT AS bucket,
         ('0x' || substr(md5(user_id::VARCHAR), 3, 14))::BIGINT AS v
  FROM events
)
SELECT event_type, bucket,
       max(CASE WHEN v = 0 THEN 57 ELSE 57 - length(bin(v)) END)::BIGINT AS max_rho
FROM h GROUP BY event_type, bucket
"""


def q_hll_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mergeability claim, hash-checked: registers built over two
    DISJOINT event snapshots (user_id % 3 split) and max-merged must be
    INTEGER-IDENTICAL to registers built over the whole table — so the
    oracle is the plain full-table register SQL. This is exactly how
    day-N crawl snapshots fold into a running distinct-URL sketch without
    ever rescanning history."""
    ev = _t(spark, sf_dir, "events")
    a = sketches.hll_registers(
        ev.filter(F.col("user_id") % 3 == 0), "user_id", group_cols=["event_type"]
    )
    b = sketches.hll_registers(
        ev.filter(F.col("user_id") % 3 != 0), "user_id", group_cols=["event_type"]
    )
    return (
        a.unionByName(b)
        .groupBy("event_type", "bucket")
        .agg(F.max("max_rho").cast("long").alias("max_rho"))
    )


_HH_THRESHOLD = 300


def q_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min heavy hitters over document tokens: 4x1024 counter
    sketch, est = min over rows, keep est >= threshold (never misses a
    true heavy hitter — CMS estimates are one-sided)."""
    docs = _t(spark, sf_dir, "documents")
    t = F.trim(F.col("text"))
    toks = docs.filter(F.length(t) > 0).select(
        F.explode(textstats.tokens(t)).alias("token")
    )
    return sketches.heavy_hitters(toks, "token", threshold=_HH_THRESHOLD)


def _sql_heavy_hitters() -> str:
    return f"""
WITH tok AS (
  SELECT unnest({_SQL_TOKS}) AS key FROM documents WHERE length(trim(text)) > 0
), js AS (SELECT unnest([0, 1, 2, 3]) AS j),
hashed AS (
  SELECT j,
         ('0x' || substr(md5(j::VARCHAR || '|' || key), 1, 14))::BIGINT
           % {sketches.CMS_WIDTH} AS bucket
  FROM tok CROSS JOIN js
), sketch AS (
  SELECT j AS row, bucket, count(*)::BIGINT AS cnt FROM hashed GROUP BY j, bucket
), keys AS (SELECT DISTINCT key FROM tok),
probes AS (
  SELECT key, j,
         ('0x' || substr(md5(j::VARCHAR || '|' || key), 1, 14))::BIGINT
           % {sketches.CMS_WIDTH} AS bucket
  FROM keys CROSS JOIN js
)
SELECT key, min(cnt)::BIGINT AS est
FROM probes JOIN sketch ON sketch.row = probes.j AND sketch.bucket = probes.bucket
GROUP BY key HAVING min(cnt) >= {_HH_THRESHOLD}
"""


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct as-of join: each click matched to the user's
    latest purchase at or before it — merge pattern (one shuffle + one
    window pass), not a range-join pair explosion."""
    ev = _t(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    out = asof.asof_join(clicks, purchases)
    return out.select(
        F.col("user_id").cast("long").alias("user_id"),
        F.col("event_id").cast("long").alias("event_id"),
        "ts_us", "matched_id", "matched_ts_us", "matched_value",
    )


def _sql_asof_join() -> str:
    return """
WITH r0 AS (
  SELECT user_id, ts, event_id, value,
         row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
  FROM events WHERE event_type = 'purchase'
), r AS (
  SELECT user_id AS k, epoch_us(ts) AS ts_us, 0 AS side,
         event_id AS rid, value AS rval, NULL::BIGINT AS lid
  FROM r0 WHERE rn = 1
), l AS (
  SELECT user_id, epoch_us(ts), 1, NULL::BIGINT, NULL::DOUBLE, event_id
  FROM events WHERE event_type = 'click'
), m AS (SELECT * FROM r UNION ALL SELECT * FROM l),
c AS (
  SELECT k, ts_us, side, lid,
         last_value(rid IGNORE NULLS) OVER w AS matched_id,
         last_value(rval IGNORE NULLS) OVER w AS matched_value,
         last_value(CASE WHEN side = 0 THEN ts_us END IGNORE NULLS) OVER w AS matched_ts_us
  FROM m
  WINDOW w AS (PARTITION BY k ORDER BY ts_us ASC, side ASC, lid ASC NULLS FIRST
               ROWS UNBOUNDED PRECEDING)
)
SELECT k::BIGINT AS user_id, lid::BIGINT AS event_id, ts_us,
       matched_id, matched_ts_us, matched_value
FROM c WHERE side = 1
"""


# ---------------------------------------------------------------------------
# driver contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the frontier-admission round algebra at sf0.001 — scheme/
    whitelist/depth filters, deterministic in-round dedup, seen anti-join,
    then per-host politeness ranking, aggregated per host."""
    sf_dir = "/root/testdata/sf0.001"
    admitted = q_frontier_admission(spark, sf_dir)
    queue = admitted.select(
        "host", "depth", F.md5(F.col("url")).alias("url_sha1"), "url"
    )
    r = ranked(queue)
    return (
        r.groupBy("host")
        .agg(
            F.count("*").alias("n_urls"),
            F.sum(F.when(F.col("slot_rank") <= 3, 1).otherwise(0)).alias("fetch_now"),
            F.min("depth").alias("min_depth"),
        )
        .orderBy("host")
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """Ordering policy (the driver checks the FIRST 50 entries per round):
    (1) queries NEW or code-touched THIS round lead, (2) then queries the
    previous round's 50-cap rotated out, (3) then the stable tail — every
    tail entry was rows+schema+hash green in the last driver check AND its
    code is unchanged since. Re-order each round so nothing is ever both
    changed and unchecked."""
    return {
        # --- (1) new or code-touched in round 5 --------------------------
        "robots_sitemaps": q_robots_sitemaps,            # NEW r5
        "crawl_delay_budget": q_crawl_delay_budget,      # NEW r5
        "politeness_priority": q_politeness_priority,    # NEW r5
        "stream_admission_update": q_stream_admission_update,  # NEW r5
        "sitemap_recrawl": q_sitemap_recrawl,            # NEW r5
        "warc_roundtrip": q_warc_roundtrip,              # NEW r5 (sink)
        "source_quality_rollup": q_source_quality_rollup,  # NEW r5
        "sitemap_parse": q_sitemap_parse,                # + pos column
        "stream_frontier_admission": q_stream_frontier_admission,  # regex-free
        "frontier_admission": q_frontier_admission,      # dedup priority agg
        "politeness_topk": q_politeness_topk,            # ranked() priority
        "seen_anti_join": q_seen_anti_join,              # admission touched
        "host_cap": q_host_cap,                          # admission touched
        "crawl_bfs": q_crawl_bfs,                        # crawl loop touched
        "pagerank": q_pagerank,                          # early stop
        "kmeans_assign": q_kmeans_assign,                # trainer early stop
        "ann_ivf_trained": q_ann_ivf_trained,            # trainer early stop
        "content_type_extract": q_content_type_extract,  # .xml mapping
        "robots_wildcard": q_robots_wildcard,            # robots.py refactor
        # --- (2) rotated out of the round-4 check window ------------------
        "asof_join": q_asof_join,
        "heavy_hitters": q_heavy_hitters,
        "multimodal_meta": q_multimodal_meta,
        "multimodal_real_meta": q_multimodal_real_meta,
        "multimodal_resize": q_multimodal_resize,
        "multimodal_frames": q_multimodal_frames,
        # --- (3) stable: green in CORRECTNESS_r04, code-unchanged in r5 ---
        "seed_list_decode": q_seed_list_decode,
        "round_order_topk": q_round_order_topk,
        "primary_domain": q_primary_domain,
        "dedup_exact": q_dedup_exact,
        "corpus_clean": q_corpus_clean,
        "dedup_jaccard": q_dedup_jaccard,
        "dedup_jaccard_capped": q_dedup_jaccard_capped,
        "dedup_minhash_lsh": q_dedup_minhash_lsh,
        "dedup_clusters": q_dedup_clusters,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "dedup_embedding": q_dedup_embedding,
        "dedup_embedding_lsh": q_dedup_embedding_lsh,
        "ann_bruteforce": q_ann_bruteforce,
        "ann_lsh": q_ann_lsh,
        "ann_lsh_multiprobe": q_ann_lsh_multiprobe,
        "ann_ivf": q_ann_ivf,
        "stream_token_stats": q_stream_token_stats,
        "stream_dedup_counts": q_stream_dedup_counts,
        "stream_events_window": q_stream_events_window,
        "events_sessionize": q_events_sessionize,
        "sample_stratified": q_sample_stratified,
        "sample_topk": q_sample_topk,
        "sample_temperature": q_sample_temperature,
        "pack_sequences": q_pack_sequences,
        "chunk_documents": q_chunk_documents,
        "snapshot_diff": q_snapshot_diff,
        "hll_merge": q_hll_merge,
        # --- beyond the 50-entry window: checked green in r04 (or earlier)
        # and byte-unchanged this round; verified locally via
        # tools/check_contract.py before commit ----------------------------
        "warc_parse": q_warc_parse,
        "hll_registers": q_hll_registers,
        "inverted_index": q_inverted_index,
        "tfidf_topk": q_tfidf_topk,
        "text_token_stats": q_text_token_stats,
        "text_quality": q_text_quality,
        "text_lang_id": q_text_lang_id,
        "text_fingerprint": q_text_fingerprint,
        "text_repetition": q_text_repetition,
        "host_counts": q_host_counts,
        "parser_union": q_parser_union,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "robots_sitemaps": _sql_robots_sitemaps(),
        "crawl_delay_budget": _sql_crawl_delay_budget(),
        "politeness_priority": _sql_politeness_priority(),
        "sitemap_recrawl": _sql_sitemap_recrawl(),
        "warc_roundtrip": _sql_warc_roundtrip(),
        "source_quality_rollup": _sql_source_quality_rollup(),
        "frontier_admission": _sql_frontier_admission(),
        "seed_list_decode": """
            WITH src AS (
              SELECT o_orderkey::BIGINT AS okey,
                     '{"page":{"list":[{"create_id":' || o_custkey::VARCHAR ||
                     ',"id":' || o_orderkey::VARCHAR ||
                     '},{"create_id":' || (o_custkey + 1)::VARCHAR ||
                     ',"id":' || (o_orderkey + 1)::VARCHAR || '}]}}' AS js
              FROM orders
            ), ex AS (
              SELECT okey, unnest(json_extract(js, '$.page.list[*]')) AS s
              FROM src
            )
            SELECT okey,
                   'http://www.bml365.com/qy/prod/v/' ||
                   (json_extract_string(s, '$.create_id')::DOUBLE::BIGINT)::VARCHAR ||
                   '-' ||
                   (json_extract_string(s, '$.id')::DOUBLE::BIGINT)::VARCHAR AS url,
                   0::BIGINT AS depth
            FROM ex
        """,
        "round_order_topk": f"""
            WITH admitted AS ({_sql_frontier_admission()})
            SELECT depth, host, url FROM admitted
            ORDER BY depth ASC, host ASC, url ASC
            LIMIT 100
        """,
        "seen_anti_join": """
            SELECT c_custkey::BIGINT AS c_custkey, c_name FROM customer
            WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_orderkey % 3 = 0)
        """,
        "politeness_topk": """
            WITH queue AS (
              SELECT 'h' || (o_custkey % 50)::VARCHAR AS host,
                     (o_orderkey % 4)::BIGINT AS depth,
                     md5(o_orderkey::VARCHAR) AS url_md5,
                     o_orderkey::BIGINT AS okey
              FROM orders
            )
            SELECT host, rn::BIGINT AS slot_rank, okey FROM (
              SELECT host, okey,
                     row_number() OVER (PARTITION BY host ORDER BY depth, url_md5) AS rn
              FROM queue
            ) WHERE rn <= 3
        """,
        "host_counts": """
            SELECT event_type, count(*)::BIGINT AS n_events,
                   count(DISTINCT user_id)::BIGINT AS n_users
            FROM events GROUP BY event_type
        """,
        "parser_union": """
            SELECT 'link' AS kind, p_partkey::BIGINT AS key, p_name AS name FROM part
            UNION ALL
            SELECT 'img' AS kind, s_suppkey::BIGINT AS key, s_name AS name FROM supplier
        """,
        "content_type_extract": """
            WITH src AS (
              SELECT p_partkey::BIGINT AS p_partkey,
                     'http://static.example.net/img/' || p_partkey::VARCHAR || '.' ||
                     CASE WHEN p_partkey % 4 = 0 THEN 'jpg'
                          WHEN p_partkey % 4 = 1 THEN 'png'
                          WHEN p_partkey % 4 = 2 THEN 'gif'
                          ELSE 'html' END AS url
              FROM part
            ), ct AS (
              SELECT *, CASE WHEN url LIKE '%.jpg' OR url LIKE '%.jpeg' THEN 'image/jpeg'
                             WHEN url LIKE '%.png' THEN 'image/png'
                             WHEN url LIKE '%.gif' THEN 'image/gif'
                             ELSE 'text/html; charset=utf-8' END AS content_type
              FROM src
            )
            SELECT p_partkey, url, content_type,
                   CASE WHEN strpos(content_type, '/') > 1
                        THEN regexp_extract(content_type, '^[^/]+/([^;]*)', 1)
                        ELSE '' END AS format,
                   regexp_extract(url, '([^/]*)$', 1) AS file_name
            FROM ct
        """,
        "primary_domain": f"""
            WITH src AS (
              SELECT s_suppkey::BIGINT AS key,
                     CASE WHEN s_suppkey % 7 = 0 THEN 'a' || (s_suppkey % 9)::VARCHAR || '.example.com'
                          WHEN s_suppkey % 7 = 1 THEN 'b' || (s_suppkey % 9)::VARCHAR || '.shop.example.com.cn'
                          WHEN s_suppkey % 7 = 2 THEN 'cdn.example.net'
                          WHEN s_suppkey % 7 = 3 THEN 'x.example.org'
                          WHEN s_suppkey % 7 = 4 THEN '10.0.' || (s_suppkey % 200)::VARCHAR || '.1'
                          WHEN s_suppkey % 7 = 5 THEN 'weird.example.xy'
                          ELSE 'nosuffix' END AS host
              FROM supplier
            )
            SELECT key, host, {_sql_primary_domain("host")} AS primary_domain FROM src
        """,
        "text_token_stats": _sql_token_stats(),
        "text_quality": _sql_quality(),
        "text_lang_id": _sql_lang_id(),
        "text_fingerprint": _sql_fingerprint(),
        "text_repetition": _sql_text_repetition(),
        "dedup_exact": """
            SELECT md5(text) AS content_hash, count(*)::BIGINT AS n_copies,
                   min(doc_id)::BIGINT AS keeper_id
            FROM documents GROUP BY md5(text)
        """,
        "dedup_jaccard": _sql_dedup_jaccard(),
        "corpus_clean": _sql_corpus_clean(),
        "dedup_jaccard_capped": _sql_dedup_jaccard_capped(),
        "dedup_minhash_lsh": _sql_dedup_minhash_lsh(),
        "dedup_clusters": _sql_dedup_clusters(),
        "dedup_simhash": _sql_dedup_simhash(),
        "dedup_simhash_pairs": _sql_dedup_simhash_pairs(),
        "dedup_embedding": _sql_dedup_embedding(),
        "dedup_embedding_lsh": _sql_dedup_embedding(block="lsh"),
        "ann_bruteforce": _sql_ann(bucketed=False),
        "ann_lsh": _sql_ann(bucketed=True),
        "ann_lsh_multiprobe": _sql_ann(bucketed=True, multiprobe=True),
        "ann_ivf": _sql_ann_ivf(),
        "kmeans_assign": _sql_kmeans_assign(),
        "ann_ivf_trained": _sql_ann_ivf_trained(),
        # streaming twins reuse the BATCH oracles: drained available-now
        # streams are defined to equal the batch query over the same files
        "stream_token_stats": _sql_token_stats(),
        "stream_dedup_counts": """
            SELECT md5(text) AS content_hash, count(*)::BIGINT AS n_copies,
                   min(doc_id)::BIGINT AS keeper_id
            FROM documents GROUP BY md5(text)
        """,
        "stream_frontier_admission": _sql_frontier_admission(),
        "stream_admission_update": _sql_frontier_admission(),
        "stream_events_window": _sql_events_window(),
        "events_sessionize": _sql_events_sessionize(),
        "pagerank": _sql_pagerank(),
        "sample_stratified": _sql_sample_stratified(),
        "sample_topk": _sql_sample_topk(),
        "pack_sequences": _sql_pack_sequences(),
        "chunk_documents": _sql_chunk_documents(),
        "robots_wildcard": _sql_robots_wildcard(),
        "host_cap": _sql_host_cap(),
        "sample_temperature": _sql_sample_temperature(),
        "snapshot_diff": _sql_snapshot_diff(),
        "inverted_index": _sql_inverted_index(),
        "tfidf_topk": _sql_tfidf_topk(),
        "warc_parse": _sql_warc_parse(),
        "sitemap_parse": _sql_sitemap_parse(),
        "hll_registers": _sql_hll_registers(),
        # merge == rebuild for a max-register sketch: the merged-snapshot
        # Spark plan must hash-match the WHOLE-table register SQL
        "hll_merge": _sql_hll_registers(),
        "heavy_hitters": _sql_heavy_hitters(),
        "asof_join": _sql_asof_join(),
        "multimodal_meta": _SQL_META,
        "multimodal_real_meta": _SQL_REAL_META,
        "multimodal_resize": _SQL_RESIZE,
        "multimodal_frames": _SQL_FRAMES,
        "crawl_bfs": _bfs_oracle(),
    }


def _bfs_oracle() -> str:
    """The crawl_bfs oracle needs its fixture on disk before DuckDB runs
    the SQL — ensure it here (pure pyarrow, idempotent, ~1s once)."""
    _ensure_bfs_fixture()
    return _sql_crawl_bfs()
