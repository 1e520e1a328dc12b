"""The batch-iterative crawl loop — one Spark DAG per round.

Round algebra (the reference's download/analyze/pick stage loops,
scheduler/scheduler.go:353-524, collapsed into declarative DataFrame ops):

    candidates_r --canonicalize+sha1--> admission filters (native exprs)
      --in-round dedup (min-struct agg)--> anti-join(seen) [bloom prefilt]
      --> admitted  ==> seen_delta (admission marks seen, scheduler.go:574)
    queue = deferred_{r-1} ∪ admitted
      --politeness slot window--> fetch_now | deferred_r
    fetch_now --left join pages (the web)--> fetched
      --content gates--> html pages --parse pandas UDF--> items + links
    links --posexplode, depth+1 (analyzer.go:127)--> candidates_{r+1}

Everything between the two shuffles (dedup anti-join, fetch join) is native
and codegen'd; Python appears exactly once per round (the Arrow-batched
parse UDF). Dedup runs BEFORE the fetch join — the reference's
dedup-before-fetch invariant (never fetch a URL twice) and also the cheap
side of the plan: at 10^10-frontier scale the anti-join prunes the fetch
join's probe side.

Every round commits atomically through RoundStore (frontier, seen delta,
items, errors, per-partition lineage, metrics) so a killed job resumes at
the last manifest.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.storagelevel import StorageLevel

from ..functions import urls as U
from ..functions.html import JCUX_SCHEMA, parse_html_udf
from ..operators import admission
from ..operators.bloom import BloomTable
from ..operators.politeness import assign_fetch_slots
from ..storage import RoundStore

CANDIDATE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("url_sha1", T.StringType()),
        T.StructField("host", T.StringType()),
        T.StructField("path", T.StringType()),
        T.StructField("depth", T.LongType()),
        T.StructField("parent_url", T.StringType()),
        T.StructField("link_pos", T.LongType()),
        T.StructField("priority", T.LongType()),
    ]
)

RAW_CANDIDATE_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType()),
        T.StructField("depth", T.LongType()),
        T.StructField("parent_url", T.StringType()),
        T.StructField("link_pos", T.LongType()),
        T.StructField("priority", T.LongType()),
    ]
)

# frontier priority units (SURVEY §1 `priority long`): plain links rank 0,
# sitemap-discovered URLs carry their <priority> x PRIORITY_SCALE (0-100),
# sitemap FETCHES (robots pointers + index children) rank above everything —
# discovering a 50k-URL sitemap beats fetching any single page
SITEMAP_PRIORITY = 2 * 100  # 2 x sitemap.PRIORITY_SCALE (> any <priority>)
# link_pos for sitemap-discovered candidates: a distinct space above any
# in-page link position (bounded < 2^30 for the numeric dedup variant)
SITEMAP_LINK_POS = 1 << 29

# queue rows = candidate columns + fetch-attempt counter (retry support)
QUEUE_SCHEMA = T.StructType(
    list(CANDIDATE_SCHEMA.fields) + [T.StructField("attempts", T.LongType())]
)


@dataclass
class CrawlConfig:
    whitelist: list[str]
    max_depth: int = 3
    max_rounds: int = 20
    parsers: str = "combined"            # "generic" | "bm1365" | "combined"
    max_fetch_retries: int = 0           # re-enqueue fetch misses AND
    # parse failures up to N times in later rounds, mirroring the
    # reference's symmetric re-SendReq for download failures
    # (scheduler.go:386) and analyze failures (scheduler.go:394).
    # 0 = reference-faithful-in-effect: a retried request is already in
    # the seen set, so the reference's re-SendReq is dropped by the
    # urlMap filter (scheduler.go:551-554). In the pages-table world a
    # parse failure is deterministic (same bytes every attempt) so its
    # retries always exhaust; live fetches make them transient — the
    # counter-gated plumbing is identical for both.
    use_bloom: bool = True
    bloom_min_seen: int = 100_000        # below this the exact anti-join is
                                         # cheaper than building a bloom
    bloom_fpp: float = 0.01
    bloom_shard_bits: int | None = None  # None = auto-size from n_seen
                                         # (each shard bitmap <= 16 MB)
    bloom_headroom: float = 4.0          # over-size the bloom by this factor
    # so per-round maintenance is an OR-merge of the seen DELTA only; the
    # full build re-runs only when n_seen outgrows the sized capacity —
    # geometric steps, so amortized O(1) work per key over the crawl life
    politeness_salt_buckets: int | str | None = "auto"  # int = fixed salt,
    # None = plain per-host window, "auto" = salt with defaultParallelism
    # buckets whenever the PREVIOUS round's committed queue (order ∪
    # deferred) had a host above hot_host_share of the rows AND above
    # hot_host_min_rows — detection reads only the committed host column,
    # so the probe never taxes the hot path, and a hot host cannot pin its
    # whole queue to one task. The absolute floor matters: salting costs 3
    # extra plan branches, a net LOSS when the single-host window task is
    # already small (measured 2x slower on a 2k-page fixture crawl).
    hot_host_share: float = 0.05
    hot_host_min_rows: int = 100_000
    seen_backend: str = "bucketed"       # "bucketed": the anti-join reads a
    # CLUSTERED BY (url_sha1) datasource table whose HashPartitioning
    # reaches the join — no full-seen exchange per round (the Iceberg
    # bucket-transform layout on plain parquet). "parquet": per-round delta
    # union (re-shuffles the seen side every round; small crawls only).
    seen_buckets: int | None = None      # bucket count, pinned at store
    # creation (None = defaultParallelism); pick ~fleet-cores at 10^10
    seen_compact_files_per_bucket: int | None = 16  # compact the bucketed
    # seen table (one-file-per-bucket rewrite, committed rounds only) when
    # the per-round inserts have stacked more than this many files per
    # bucket; None disables. The trigger probe is a directory listing, the
    # rewrite one bucket-preserving shuffle of the table — amortized over
    # the threshold's worth of rounds
    max_admissions_per_host: int | None = None  # crawl-trap guard: bound
    # admitted URLs per host per round; overflow is marked SEEN but never
    # queued (drop-forever — politeness only PACES fetches, it cannot stop
    # a trap host from growing the frontier without bound) and surfaces as
    # error rows (stage='admission', message='host_cap'). None = off.
    robots_from_pages: bool = False      # self-configure from the corpus:
    # derive robots_bodies from the pages table's own
    # scheme://host/robots.txt rows (robots_bodies_from_pages) — rules,
    # Crawl-delay budgets, and Sitemap bootstrap with no side channel.
    # An explicit robots_bodies argument wins.
    round_seconds: float = 60.0          # polite wall-clock a round models;
    # with robots_bodies, hosts declaring `Crawl-delay: d` default to
    # budget_per_round = max(1, floor(round_seconds / d)) unless the caller's
    # explicit budgets table already names the host (explicit wins)
    seen_partitions: int | None = None   # repartition seen deltas by url_sha1
    parse_partitions: int | str | None = "auto"  # widen the parse stage:
    # AQE coalesces the fetch-join output by BYTES, but HTML parsing is
    # per-ROW cpu — small pages would leave most cores idle. "auto" =
    # defaultParallelism, int = exact, None = trust AQE (large-blob case)


@dataclass
class CrawlResult:
    store: RoundStore
    rounds: int = 0
    metrics: list[dict] = field(default_factory=list)

    def order(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read_all(spark, "order")

    def seen(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read_all(spark, "seen_delta")

    def items(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read_all(spark, "items")

    def errors(self, spark: SparkSession) -> DataFrame | None:
        return self.store.read_all(spark, "errors")


def seeds_to_candidates(seeds: DataFrame) -> DataFrame:
    """Seed list -> raw round-0 candidates (InitReqList analog,
    exampes/finder/bm1365Model/JcUx.go:47-85: every seed enters SendReq at
    depth 0). Seeds from sitemap_seeds carry a `priority` column (integer
    frontier units) which threads into the queue; plain seed lists get 0."""
    prio = (
        F.col("priority").cast("long")
        if "priority" in seeds.columns
        else F.lit(0).cast("long")
    )
    return seeds.select(
        F.col("url").cast("string").alias("url"),
        F.lit(0).cast("long").alias("depth"),
        F.lit("").alias("parent_url"),
        F.col("order").cast("long").alias("link_pos"),
        prio.alias("priority"),
    )


def robots_bodies_from_pages(pages: DataFrame) -> DataFrame:
    """Extract (host, body) robots.txt rows from the pages table itself —
    a 100-TB WARC-derived corpus carries each host's robots.txt as just
    another fetched row at ``scheme://host/robots.txt``, so a crawl over
    that corpus can self-configure (rules, Crawl-delay budgets, Sitemap
    pointers) with ONE column-pruned scan instead of a side channel.

    The filter is an exact path match (url == scheme://host + "/robots.txt"
    — RFC 9309 §2.3: the file lives ONLY at the path-root), expressed as
    byte scans (endswith + a length check against the host window) so the
    scan stays a pushdown-friendly codegen'd projection. Bodies decode as
    UTF-8 with replacement (undecodable bytes become U+FFFD line noise the
    field parser ignores — never a task failure)."""
    url = F.col("url")
    rest = U.url_rest_canonical(url)  # host[/path...]
    is_robots = url.endswith("/robots.txt") & (
        F.length(rest)
        == F.length(F.substring_index(rest, "/", 1))
        + F.length(F.lit("/robots.txt"))
    )
    return (
        pages.select("url", "html")
        .filter(is_robots)
        .select(
            U.url_host_canonical(url).alias("host"),
            F.decode(F.col("html"), "UTF-8").alias("body"),
        )
    )


def sitemap_pointer_candidates(robots_bodies: DataFrame) -> DataFrame:
    """robots.txt bodies -> raw round-0 candidates for their ``Sitemap:``
    pointers (RFC 9309 §2.3) — the discovery bootstrap real crawls start
    from: robots -> sitemapindex -> urlset -> frontier. Pointers enter
    admission like any URL (whitelist/robots/depth/dedup all apply) at
    depth 0 with SITEMAP_PRIORITY, so politeness fetches them before any
    page. link_pos is the constant SITEMAP_LINK_POS: pointer rows need no
    within-parent order, and duplicates (two hosts naming one sitemap)
    pack identical winner metadata — deterministic without a global rank."""
    from ..sources.robots import robots_sitemaps

    return robots_sitemaps(robots_bodies).select(
        F.col("sitemap_url").alias("url"),
        F.lit(0).cast("long").alias("depth"),
        F.lit("").alias("parent_url"),
        F.lit(SITEMAP_LINK_POS).cast("long").alias("link_pos"),
        F.lit(SITEMAP_PRIORITY).cast("long").alias("priority"),
    )


def _empty(spark: SparkSession, schema: T.StructType) -> DataFrame:
    return spark.createDataFrame([], schema)


def _items_schema_img(fetched: DataFrame, rnd: int) -> DataFrame:
    """parseImg items (bmParser.go:126-156) + savePicture enrichment
    (bmProcessor.go:56-61): name, format, size — all native expressions.
    `payload` carries the actual image bytes: the reference's savePicture
    persists the file content itself (bmProcessor.go:39-50), so the item
    sink is self-contained — consumers never re-join pages for the blob.
    The bytes stay columnar (parquet binary) end-to-end; the ordered
    export keeps only the metadata columns (artifact size)."""
    ct = F.col("content_type")
    return (
        fetched.filter((F.col("status") == 200) & ct.startswith("image"))
        .filter(U.image_format(ct) != "")
        .select(
            F.lit(rnd).alias("round"),
            F.col("url"),
            F.lit("img").alias("kind"),
            U.url_basename(U.url_path(F.col("url"))).alias("file_name"),
            U.image_format(ct).alias("file_ext"),
            F.length("html").cast("long").alias("file_size"),
            F.lit(None).cast(JCUX_SCHEMA).alias("jcux"),
            F.col("html").alias("payload"),
        )
    )


def run_crawl(
    spark: SparkSession,
    pages: DataFrame,
    seeds: DataFrame,
    cfg: CrawlConfig,
    checkpoint_dir: str,
    budgets: DataFrame | None = None,
    robots: DataFrame | None = None,
    robots_bodies: DataFrame | None = None,
    resume: bool = False,
) -> CrawlResult:
    """See module docstring. ``robots_bodies`` is the raw-robots.txt entry
    point ((host, body) rows): when given, the crawl derives everything a
    robots file feeds — admission rules (parse_robots, unless an explicit
    ``robots`` table overrides), default per-host politeness budgets from
    ``Crawl-delay`` (explicit ``budgets`` rows win per host), and round-0
    frontier candidates for every ``Sitemap:`` pointer. Fetched sitemap
    bodies (content-type application/xml) are parsed per the Sitemaps
    protocol each round: index children re-enter admission as fetchable
    kind='sitemap' URLs, urlset entries as page candidates carrying their
    <priority> — the full robots -> sitemapindex -> urlset -> pages
    discovery chain, closed inside the round DAG."""
    store = RoundStore(checkpoint_dir)
    result = CrawlResult(store=store)
    bucketed = cfg.seen_backend == "bucketed"
    # backend is pinned per store: resuming a parquet-backend checkpoint
    # under 'bucketed' (or vice versa) fails loudly instead of silently
    # reading an empty seen table; legacy stores without a pin are safe
    # because the bucketed resume path backfills below
    store.pin_backend(cfg.seen_backend)
    if bucketed:
        store.ensure_seen_table(
            spark, cfg.seen_buckets or spark.sparkContext.defaultParallelism
        )

    if robots_bodies is None and cfg.robots_from_pages:
        # one column-pruned scan; bounded (one row per host) so the
        # checkpoint keeps the robots scan out of every derived plan
        robots_bodies = robots_bodies_from_pages(pages).localCheckpoint()
    if robots_bodies is not None:
        from ..sources.robots import (
            budgets_from_crawl_delay,
            crawl_delays,
            parse_robots,
        )

        if robots is None:
            # localCheckpoint: the rules dim table is broadcast every round;
            # materializing it once keeps the per-host window parse out of
            # every round's plan (bounded: one row per restricted host)
            robots = parse_robots(robots_bodies).localCheckpoint()
        delay_budgets = budgets_from_crawl_delay(
            crawl_delays(robots_bodies), cfg.round_seconds
        )
        if budgets is None:
            budgets = delay_budgets.localCheckpoint()
        else:
            # explicit budgets override per host; Crawl-delay fills the rest
            budgets = budgets.unionByName(
                delay_budgets.join(budgets.select("host"), "host", "left_anti")
            ).localCheckpoint()

    # ---- resume or cold start -------------------------------------------
    last = store.last_committed() if resume else None
    if last is not None:
        if store.is_done():
            result.rounds = last + 1
            result.metrics = [store.manifest(r)["stats"] for r in store.committed_rounds()]
            return result
        import os as _os

        candidates = store.read(spark, last, "next_candidates")
        deferred = store.read(spark, last, "deferred")
        if "attempts" not in deferred.columns:
            # checkpoint written before retry support: deferred rows never
            # failed a fetch, so attempts starts at 0
            deferred = deferred.withColumn("attempts", F.lit(0).cast("long"))
        retry = (
            store.read(spark, last, "retry")
            if _os.path.exists(store.round_path(last, "retry"))
            else _empty(spark, QUEUE_SCHEMA)
        )
        # checkpoint written before the priority column (legacy): every row
        # ranked equal then, so 0 (the plain-link default) preserves order
        if "priority" not in candidates.columns:
            candidates = candidates.withColumn("priority", F.lit(0).cast("long"))
        if "priority" not in deferred.columns:
            deferred = deferred.withColumn("priority", F.lit(0).cast("long"))
        if "priority" not in retry.columns:
            retry = retry.withColumn("priority", F.lit(0).cast("long"))
        if bucketed:
            # legacy / cross-backend checkpoints: the table may be missing
            # committed rounds' keys — refill from seen_delta parquet first
            store.backfill_seen_bucketed(spark, upto=last)
        seen = (
            store.read_seen_bucketed(spark, upto=last)
            if bucketed
            else store.read_all(spark, "seen_delta", upto=last)
        )
        rnd = last + 1
        result.metrics = [store.manifest(r)["stats"] for r in store.committed_rounds()]
        # driver-side running counts from the committed manifests — no
        # re-count jobs on resume
        last_counts = store.manifest(last).get("counts", {})
        n_candidates = (
            last_counts["next_candidates"]
            if "next_candidates" in last_counts
            else candidates.count()
        )
        n_seen_total = sum(
            store.manifest(r).get("counts", {}).get("seen_delta", 0)
            for r in store.committed_rounds()
        )
    else:
        candidates = seeds_to_candidates(seeds)
        if robots_bodies is not None:
            # Sitemap: pointers bootstrap the frontier alongside the seeds
            # (cold start only — on resume they are already in the seen set)
            candidates = candidates.unionByName(
                sitemap_pointer_candidates(robots_bodies)
            )
        deferred = _empty(spark, QUEUE_SCHEMA)
        retry = _empty(spark, QUEUE_SCHEMA)
        seen = None
        rnd = 0
        n_candidates = candidates.count()
        n_seen_total = 0

    # pages is scanned every round: url + html only (column pruning reaches
    # the parquet scan; `text`/`lang` are never read by the crawl plan)
    pages_fetch = pages.select("url", "html")

    # skew signal from the previous round's queue; persisted in the manifest
    # stats so a resumed run salts its first round when the last committed
    # round's queue had a hot host (instead of waiting one round to re-learn)
    hot_host = False
    if last is not None:
        hot_host = bool(
            store.manifest(last).get("stats", {}).get("hot_host_next", False)
        )

    # the bloom lives ACROSS rounds: built once from the full seen set when
    # the threshold is crossed (or on resume), then maintained per round by
    # OR-merging only that round's committed seen_delta (BloomTable.
    # merge_delta) — never rebuilt from the full 10^10-key corpus per round
    bloom_table = None

    while rnd <= cfg.max_rounds:
        # all per-round counts come from observe() metrics captured during
        # the commit writes (see RoundStore.commit_round) — the only full
        # passes per round are: admission, the politeness window, and the
        # fetch-join + parse (each executed exactly once thanks to the
        # persists below).
        seen_df = seen if seen is not None else _empty(
            spark, T.StructType([T.StructField("url_sha1", T.StringType())])
        )

        scratch: list = []
        prefilter = None
        if cfg.use_bloom and seen is not None and n_seen_total >= cfg.bloom_min_seen:
            if (
                bloom_table is not None
                and bloom_table.capacity_keys is not None
                and n_seen_total * 1.2 > bloom_table.capacity_keys
            ):
                # seen outgrew the sized capacity (fpp would degrade):
                # rebuild ONCE at the next headroom step, not every round
                bloom_table.unpersist()
                bloom_table = None
            if bloom_table is None:
                # bitmaps stay a persisted (shard, bitmap) DataFrame; the
                # probe cogroups candidates with it so each task holds ONE
                # <=16 MB shard — no whole-filter broadcast at 10^10 keys
                bloom_table = BloomTable.build(
                    seen, n_seen=n_seen_total,
                    fpp=cfg.bloom_fpp, shard_bits=cfg.bloom_shard_bits,
                    headroom=cfg.bloom_headroom,
                )
            prefilter = (
                lambda d, _bt=bloom_table: _bt.split(d, scratch=scratch)
            )
        admitted = admission.admit(
            candidates, seen_df, cfg.whitelist, cfg.max_depth,
            robots=robots, bloom_prefilter=prefilter, scratch=scratch,
        )
        if cfg.seen_partitions:
            admitted = admitted.repartition(cfg.seen_partitions, "url_sha1")
        admitted = admitted.persist(StorageLevel.MEMORY_AND_DISK)

        # crawl-trap guard: overflow beyond the per-host cap is marked SEEN
        # (below: seen_delta uses the FULL admitted set, so trap URLs are
        # never re-admitted) but never queued; recorded as error rows
        queue_src, capped_errors = admitted, None
        if cfg.max_admissions_per_host:
            queue_src, overflow = admission.cap_per_host(
                admitted, cfg.max_admissions_per_host
            )
            capped_errors = overflow.select(
                F.lit(rnd).cast("long").alias("round"),
                "url",
                F.lit("admission").alias("stage"),
                F.lit("host_cap").alias("message"),
            )

        queue = deferred.unionByName(
            queue_src.withColumn("attempts", F.lit(0).cast("long"))
        ).unionByName(retry)

        seen_delta = admitted.select(
            "url_sha1", "url", F.lit(rnd).cast("long").alias("first_round")
        )

        if cfg.politeness_salt_buckets == "auto":
            salt_buckets = (
                spark.sparkContext.defaultParallelism if hot_host else None
            )
        else:
            salt_buckets = cfg.politeness_salt_buckets
        fetch_now, deferred_next = assign_fetch_slots(
            queue, budgets, salt_buckets=salt_buckets
        )
        fetch_now = fetch_now.persist(StorageLevel.MEMORY_AND_DISK)

        order = fetch_now.select(
            F.lit(rnd).cast("long").alias("round"), "host", "url", "url_sha1"
        )

        # ---- fetch: the frontier⋈pages join (downloader.go:37-56 analog).
        # Left join keeps misses (the 404/non-200 error path).
        fetched = (
            fetch_now.join(pages_fetch, on="url", how="left")
            .withColumn("content_type", U.content_type_for(F.col("url")))
            .withColumn(
                "status",
                F.when(F.col("html").isNotNull(), F.lit(200)).otherwise(F.lit(404)),
            )
            .persist(StorageLevel.MEMORY_AND_DISK)
        )

        misses = fetched.filter(F.col("status") != 200)
        errors = misses.select(
            F.lit(rnd).cast("long").alias("round"),
            "url",
            F.lit("fetch").alias("stage"),
            F.lit("fetch_miss").alias("message"),
        )
        # retry re-enqueue (fetch-level: retried URLs are already seen, so
        # they bypass admission — matching scheduler.go:574 timing)
        retry_next = misses.filter(
            F.col("attempts") < F.lit(cfg.max_fetch_retries)
        ).select(
            "url", "url_sha1", "host", "path", "depth", "parent_url",
            "link_pos", "priority", (F.col("attempts") + 1).alias("attempts"),
        )

        items_img = _items_schema_img(fetched, rnd)

        html_pages = fetched.filter(
            (F.col("status") == 200) & F.col("content_type").startswith("text/html")
        ).select("url", "host", "depth", "html")

        if cfg.parse_partitions == "auto":
            html_pages = html_pages.repartition(
                spark.sparkContext.defaultParallelism
            )
        elif isinstance(cfg.parse_partitions, int):
            html_pages = html_pages.repartition(cfg.parse_partitions)

        parsed_all = html_pages.withColumn(
            "p", parse_html_udf(F.col("html"), F.col("url"))
        ).select("url", "host", "depth", "p").persist(StorageLevel.MEMORY_AND_DISK)

        # row-level parse failures: error rows go to the errors table and
        # yield no items/links; the task itself never fails on one page
        parse_errors = parsed_all.filter(F.col("p.error").isNotNull()).select(
            F.lit(rnd).cast("long").alias("round"),
            "url",
            F.lit("parse").alias("stage"),
            F.col("p.error").alias("message"),
        )
        errors = errors.unionByName(parse_errors)
        if capped_errors is not None:
            errors = errors.unionByName(capped_errors)
        # analyze-failure retry parity (scheduler.go:394): re-enqueue parse
        # errors like fetch misses, counter-gated; both frames are persisted
        # so the semi-join reads cache, not a recompute
        parse_retry = (
            fetched.join(
                parsed_all.filter(F.col("p.error").isNotNull()).select("url"),
                on="url",
                how="left_semi",
            )
            .filter(F.col("attempts") < F.lit(cfg.max_fetch_retries))
            .select(
                "url", "url_sha1", "host", "path", "depth", "parent_url",
                "link_pos", "priority", (F.col("attempts") + 1).alias("attempts"),
            )
        )
        retry_next = retry_next.unionByName(parse_retry)
        parsed = parsed_all.filter(F.col("p.error").isNull())

        if cfg.parsers == "bm1365":
            out_links = F.col("p.scoped_img_links")
        elif cfg.parsers == "generic":
            out_links = F.concat(F.col("p.links"), F.col("p.img_links"))
        else:  # combined: analyzer parser-list concat order (analyzer.go:92-111)
            out_links = F.concat(
                F.col("p.scoped_img_links"), F.col("p.links"), F.col("p.img_links")
            )

        if cfg.parsers in ("bm1365", "combined"):
            items_bm = parsed.select(
                F.lit(rnd).cast("long").alias("round"),
                F.col("url"),
                F.lit("bm").alias("kind"),
                F.lit("").alias("file_name"),
                F.lit("").alias("file_ext"),
                F.lit(0).cast("long").alias("file_size"),
                F.col("p.jcux").alias("jcux"),
                F.lit(None).cast("binary").alias("payload"),
            )
            items = items_bm.unionByName(items_img)
        else:
            items = items_img

        next_candidates = parsed.select(
            F.col("url").alias("parent_url"),
            (F.col("depth") + 1).cast("long").alias("depth"),  # analyzer.go:127
            F.posexplode(out_links).alias("link_pos", "url"),
        ).select(
            "url", "depth", "parent_url", F.col("link_pos").cast("long"),
            F.lit(0).cast("long").alias("priority"),
        )

        # ---- sitemap bodies (Sitemaps protocol): index children re-enter
        # admission as fetchable URLs, urlset entries as page candidates
        # carrying their <priority>. Per-body projection (regex once per
        # sitemap FILE); a crawl with no xml fetches pays an empty branch.
        from ..sources.sitemap import parse_sitemaps, priority_units

        xml_pages = fetched.filter(
            (F.col("status") == 200)
            & (F.col("content_type") == "application/xml")
        ).select(
            F.col("url").alias("_parent"),
            F.col("depth").alias("_pdepth"),
            "host",
            F.decode(F.col("html"), "UTF-8").alias("body"),
        )
        sm = parse_sitemaps(xml_pages, carry_cols=("_parent", "_pdepth"))
        sm_children = sm.select(
            F.col("loc").alias("url"),
            (F.col("_pdepth") + 1).cast("long").alias("depth"),
            F.col("_parent").alias("parent_url"),
            F.when(
                F.col("kind") == "sitemap",
                F.lit(SITEMAP_LINK_POS) + F.col("pos"),
            ).otherwise(F.col("pos")).cast("long").alias("link_pos"),
            F.when(
                F.col("kind") == "sitemap", F.lit(SITEMAP_PRIORITY).cast("long")
            ).otherwise(priority_units(F.col("priority"))).alias("priority"),
        )
        next_candidates = next_candidates.unionByName(sm_children)

        # per-partition lineage: which partitions produced how many fetched
        # rows this round (north_rule: per-partition lineage + metrics)
        lineage = fetched.groupBy(F.spark_partition_id().alias("partition_id")).agg(
            F.count("*").alias("rows"),
            F.sum(F.when(F.col("status") == 200, 1).otherwise(0)).alias("fetched_ok"),
        ).withColumn("round", F.lit(rnd).cast("long"))

        stats = {
            "round": rnd,
            "candidates": n_candidates,
            "admitted": 0,  # filled below from the commit's observe() counts
            "fetched": 0,
            "items": 0,
            "errors": 0,
            "deferred": 0,
        }
        extra_writes = []
        if bucketed:
            # committed with the round (before the manifest rename): a
            # manifest implies the keys are in the table; orphans from a
            # crashed attempt carry this round number and stay invisible
            # until the round actually commits (reads filter round <= K)
            extra_writes.append(
                lambda: store.append_seen_bucketed(
                    admitted.select("url_sha1"), rnd
                )
            )
        manifest = store.commit_round(
            rnd,
            {
                "seen_delta": seen_delta,
                "order": order,
                "items": items,
                "errors": errors,
                "lineage": lineage,
                "next_candidates": next_candidates,
                "deferred": deferred_next,
                "retry": retry_next,
            },
            stats=stats,
            extra_writes=extra_writes,
        )

        # post-commit stats: observe() metrics captured during the writes
        counts = manifest["counts"]
        n_admitted = counts["seen_delta"]
        n_fetch = counts["order"]
        items_c = counts["items"]
        errors_c = counts["errors"]
        deferred_c = counts["deferred"]
        retry_c = counts["retry"]
        n_seen_total += n_admitted
        deferred = store.read(spark, rnd, "deferred")
        retry = store.read(spark, rnd, "retry")

        # hot-host probe for next round's auto-salt: committed host column
        # of this round's queue (order ∪ deferred) — a cheap columnar scan
        if cfg.politeness_salt_buckets == "auto" and budgets is not None:
            q_hosts = store.read(spark, rnd, "order").select("host").unionByName(
                deferred.select("host")
            )
            top = (
                q_hosts.groupBy("host").count()
                .agg(F.max("count").alias("mx"), F.sum("count").alias("total"))
                .first()
            )
            hot_host = bool(
                top and top["total"]
                and top["mx"] > cfg.hot_host_min_rows
                and top["mx"] / top["total"] > cfg.hot_host_share
            )
        stats.update({"admitted": n_admitted, "fetched": n_fetch,
                      "items": items_c, "errors": errors_c,
                      "deferred": deferred_c, "retried": retry_c,
                      "salted": bool(salt_buckets),
                      "hot_host_next": bool(hot_host)})
        store.update_stats(rnd, stats)
        result.metrics.append(stats)

        candidates = store.read(spark, rnd, "next_candidates")
        if (
            bucketed
            and cfg.seen_compact_files_per_bucket
            and store.seen_files_per_bucket() > cfg.seen_compact_files_per_bucket
        ):
            store.compact_seen_bucketed(spark, upto=rnd)
        seen = (
            store.read_seen_bucketed(spark, upto=rnd)
            if bucketed
            else store.read_all(spark, "seen_delta", upto=rnd)
        )

        # incremental bloom maintenance: fold ONLY this round's committed
        # delta into the persisted bitmaps (cost ~ |delta| + filter size),
        # instead of rebuilding from the full seen set next round
        if bloom_table is not None and n_admitted > 0:
            bloom_table = bloom_table.merge_delta(
                store.read(spark, rnd, "seen_delta").select("url_sha1")
            )

        for df in scratch:  # safe: admitted materialized during commit
            df.unpersist()
        admitted.unpersist()
        fetch_now.unpersist()
        fetched.unpersist()
        parsed_all.unpersist()

        n_candidates = counts["next_candidates"]
        rnd += 1
        if n_candidates == 0 and deferred_c == 0 and retry_c == 0:
            break

    if bloom_table is not None:
        bloom_table.unpersist()
    last = store.last_committed()
    if last is not None:
        export_items(spark, store)
        store.mark_done(last)
    result.rounds = rnd
    return result


def export_items(spark: SparkSession, store: RoundStore) -> str | None:
    """End-of-crawl ordered export: ONE artifact of the items union,
    ORDER BY round, url — the Excel sink's insertion-order file
    (JcUx.go:117-148 via bmProcessor.go:83-89; the reference's insertion
    order is our deterministic (round, url)). Img items gain the
    `file_path` enrichment of bmProcessor.go:56-61 (relative
    pictures/<name>; the columnar payload replaces the per-file OS write).
    (round, url) is unique — a URL is fetched at most once — so the sort,
    and therefore the artifact, is byte-stable across resumed runs."""
    items = store.read_all(spark, "items")
    if items is None:
        return None
    # metadata-only artifact: the payload blobs live in the items table
    # itself; carrying them into the single ordered file would bloat it
    if "payload" in items.columns:
        items = items.drop("payload")
    enriched = items.withColumn(
        "file_path",
        F.when(
            F.col("kind") == "img",
            F.concat(F.lit("pictures/"), F.col("file_name")),
        ).otherwise(F.lit(None).cast("string")),
    )
    return store.write_export(enriched.orderBy("round", "url"))


_ORDER_SCHEMA = T.StructType(
    [
        T.StructField("round", T.LongType()),
        T.StructField("host", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("url_sha1", T.StringType()),
    ]
)

_ERRORS_SCHEMA = T.StructType(
    [
        T.StructField("round", T.LongType()),
        T.StructField("url", T.StringType()),
        T.StructField("stage", T.StringType()),
        T.StructField("message", T.StringType()),
    ]
)

_LINEAGE_SCHEMA = T.StructType(
    [
        T.StructField("partition_id", T.IntegerType()),
        T.StructField("rows", T.LongType()),
        T.StructField("fetched_ok", T.LongType()),
        T.StructField("round", T.LongType()),
    ]
)


def _items_schema() -> T.StructType:
    return T.StructType(
        [
            T.StructField("round", T.LongType()),
            T.StructField("url", T.StringType()),
            T.StructField("kind", T.StringType()),
            T.StructField("file_name", T.StringType()),
            T.StructField("file_ext", T.StringType()),
            T.StructField("file_size", T.LongType()),
            T.StructField("jcux", JCUX_SCHEMA),
            T.StructField("payload", T.BinaryType()),
        ]
    )
