"""Frontier admission — the reference's SendReq pipeline as DataFrame algebra.

Filter conjunction (scheduler/scheduler.go:528-576, same admitted set):
validity -> scheme http/https -> [robots, NEW] -> domain whitelist ->
depth limit -> in-round dedup -> anti-join against the seen table
(the cmap test-and-set at scheduler.go:551-574).

Plan-shape notes for 100 TB scale:

* all predicates except canonicalization are native expressions — one
  WholeStageCodegen span over the candidate scan;
* dedup-before-fetch is manual predicate pushdown: the anti-join runs
  BEFORE the expensive fetch join (Catalyst will not reorder across the
  parse UDF, so the round plan fixes this order — SURVEY.md §4);
* in-round duplicate resolution is an aggregation (min struct), never
  "first row wins" (task order is nondeterministic);
* the seen anti-join is a shuffle on url_sha1; callers can pre-filter with
  the sharded broadcast bloom (operators/bloom.py) so only probable-new
  URLs reach the shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import urls as U
from ..functions.urls import canonicalize_udf

CANDIDATE_COLS = ["url", "url_sha1", "host", "path", "depth", "parent_url", "link_pos"]

# Conservative test for "definitely already RFC-3986-canonical":
# lowercase http(s) scheme, lowercase port/userinfo-free host, absolute
# path with no percent escapes / fragments / whitespace / dot segments.
# URLs that fail the test are not necessarily non-canonical — they just
# take the Python path. Property-tested (fixed-point guarantee) in
# tests/test_urlnorm.py.
#
# Built from substring/instr byte scans, NOT regex: java.util.regex
# allocates a Matcher + String per row, which stops scaling past ~8
# threads (allocation-bandwidth bound) — measured 4-7x slower than this
# form at local[32]. The equivalent regex is kept in the test suite as the
# semantic spec.
_FAST_CANONICAL_RE = (
    r"^https?://[a-z0-9-]+(\.[a-z0-9-]+)*/[^%#?\s]*(\?[^%#\s]*)?$"
)
_DOT_SEGMENT_RE = r"/\.\.?(/|$|\?)"


def _contains_none(col, needles: list[str]):
    out = F.lit(True)
    for n in needles:
        out = out & (F.instr(col, n) == 0)
    return out


def is_definitely_canonical(url) -> "F.Column":
    scheme_ok = url.startswith("http://") | url.startswith("https://")
    # FIRST '://' — embedded absolute URLs in the query (redirect links)
    # must not shift the host window (see urls.url_rest_canonical).
    rest = F.substring(url, F.instr(url, "://") + F.lit(3), F.lit(1 << 30))
    host = F.substring_index(rest, "/", 1)
    path_q = F.substring(rest, F.length(host) + 1, F.lit(1 << 30))
    path = F.substring_index(path_q, "?", 1)
    host_ok = (
        (host != "")
        & (F.instr(rest, "/") > 0)              # absolute path present
        & (F.octet_length(host) == F.length(host))  # ASCII-only host: JVM
        # and Python lowercase agree exactly on ASCII, so the next check
        # is engine-independent
        & (host == F.lower(host))               # no uppercase anywhere
        & _contains_none(host, [":", "@", "?", "#"])
        & ~host.endswith(".")
    )
    pq_ok = _contains_none(path_q, ["%", "#", " ", "\t", "\n", "\r", "\x0b", "\x0c"])
    no_dot_segments = (
        _contains_none(path, ["/./", "/../"])
        & ~path.endswith("/.")
        & ~path.endswith("/..")
    )
    return scheme_ok & host_ok & pq_ok & no_dot_segments


def canonicalize_candidates(cand: DataFrame) -> DataFrame:
    """raw (url, depth, parent_url, link_pos) -> canonical + derived cols.

    Invalid/relative URLs become NULL and are dropped (the reference's
    nil-URL validity check, scheduler.go:536-544).

    Scale shape: most crawl-discovered URLs are already canonical after the
    parse UDF's urljoin, so a native byte-scan pre-test masks them out of
    the Arrow/Python canonicalizer's input — Python does real work only
    for the suspicious minority, in a single pass over the candidates.
    """
    # Single pass, no branch-union: the Arrow UDF's INPUT is null-masked
    # for already-canonical rows (urls.canonicalize_udf maps None -> None
    # with na_action='ignore', so fast rows cost nothing in Python), and
    # the output coalesces back. One scan of the candidate source instead
    # of two + union — measured ~2x on the 1M-URL frontier workload.
    probe = F.col("url").isNotNull() & is_definitely_canonical(F.col("url"))
    probe = F.coalesce(probe, F.lit(False))
    canon = F.when(probe, F.col("url")).otherwise(
        canonicalize_udf(F.when(~probe, F.col("url")))
    )
    out = cand.withColumn("url", canon).filter(F.col("url").isNotNull())
    # all rows now hold canonical urls — host/path via byte scans,
    # no per-row regex
    return (
        out.withColumn("url_sha1", U.url_sha1(F.col("url")))
        .withColumn("host", U.url_host_canonical(F.col("url")))
        .withColumn("path", U.url_path_canonical(F.col("url")))
    )


def rule_matches(path, r) -> "F.Column":
    """Native RFC 9309 §2.2.3 pattern match of a compiled robots rule
    (segments array from splitting the pattern on ``*``, anchored flag for
    a trailing ``$``) against a path column.

    Semantics: the pattern matches FROM THE START of the path; each ``*``
    bridges to the leftmost later occurrence of the next segment (leftmost
    is complete here: if any bridging assignment matches, the greedy-left
    one does); ``anchored`` additionally requires the final segment to end
    exactly at the end of the path. No regex — startswith/endswith plus an
    aggregate of locate() calls over the (tiny, pre-compiled) segment
    array, all inside codegen."""
    segs, anchored = r["segments"], r["anchored"]
    n = F.size(segs)
    s0 = F.element_at(segs, 1)
    # middle segments: everything after the first, minus the last when
    # anchored (the last is pinned to the end separately)
    mid = F.slice(segs, 2, F.when(anchored, F.greatest(n - 2, F.lit(0)))
                  .otherwise(n - 1))
    init = (F.length(s0) + 1).cast("int")

    def step(acc, s):
        found = F.call_function("locate", s, path, acc)
        return (
            F.when(acc <= 0, F.lit(0))
            .when(found == 0, F.lit(0))
            .otherwise((found + F.length(s)).cast("int"))
        )

    pos_after = F.aggregate(mid, init, step)
    last = F.element_at(segs, n)
    tail_ok = (
        F.when(~anchored, F.lit(True))
        .when(n == 1, F.length(path) == F.length(s0))
        .otherwise(
            path.endswith(last)
            & (F.length(path) - F.length(last) + 1 >= pos_after)
        )
    )
    return path.startswith(s0) & (pos_after > 0) & tail_ok


def whitelist_host_predicate(host, whitelist: list[str]) -> "F.Column":
    """Regex-free whitelist membership for a KNOWN whitelist: the fold
    ``host == d OR host.endswith("." + d)`` over the entries — pure byte
    scans inside codegen, no java.util.regex Matcher per row and no
    distinct-host aggregate, so it is legal BEFORE a stateful streaming op
    (where the batch path's distinct-host semi-join — an agg + self-join —
    is not).

    Equivalent to ``primary_domain(host).isin(whitelist)`` (the
    scheduler.go:555 membership test) whenever every whitelist entry is
    itself a registrable domain under the suffix table — which is the
    crawl's invariant: whitelists are built FROM ``primary_domain`` of
    seed hosts (scheduler/scheduler.go:126-131 builds the domain list the
    same way). Property-tested against the regex path in
    tests/test_property.py. Not for IP-address or bare-suffix entries
    (``10.0.0.1``, ``com.cn``) — those need the exact primary_domain path.
    """
    out = F.lit(False)
    for d in whitelist:
        out = out | (host == F.lit(d)) | host.endswith("." + d)
    return out


def admission_filters(
    cand: DataFrame,
    whitelist: list[str],
    max_depth: int,
    robots: DataFrame | None = None,
) -> DataFrame:
    """Pure admission predicates over canonicalized candidates.

    The scheme test is a prefix match, not a regex — canonicalization
    already lowercased the scheme (scheduler.go:545 lowercases too), and
    startswith stays a byte compare inside codegen."""
    out = cand.filter(
        F.col("url").startswith("http://") | F.col("url").startswith("https://")
    )

    if robots is not None:
        # robots: tiny dim table, broadcast. Preferred shape is
        # (host, rules array<struct<prefix, allow, segments, anchored>>)
        # from sources.robots.parse_robots (wildcard patterns pre-compiled
        # to segment arrays); plain (host, disallow_prefixes) or legacy
        # (prefix, allow)-only rules are promoted to single-segment
        # unanchored rules, for which the matcher degenerates to the old
        # startswith. Decision per candidate = RFC 9309 §2.2.2
        # most-specific-match: among matching rules the LONGEST PATTERN
        # wins; an equal-length allow/disallow tie resolves to allow; no
        # matching rule (or no robots row) = allowed. All native: filter +
        # transform + array_max over (len, allow) structs — struct
        # comparison gives exactly the (longest, then allow-wins) order.
        def _promote(prefix_col, allow_col):
            return F.struct(
                prefix_col.alias("prefix"),
                allow_col.alias("allow"),
                F.array(prefix_col).alias("segments"),
                F.lit(False).alias("anchored"),
            )

        # plan-time fast path: promoted plain-prefix rules (legacy rules /
        # disallow_prefixes inputs) are KNOWN single-segment unanchored, so
        # they match with a bare startswith — the general wildcard matcher
        # runs only for parse_robots output that actually carries segments
        wildcard = False
        if "rules" in robots.columns:
            elem = robots.schema["rules"].dataType.elementType
            if "segments" in elem.names:
                rules_col, wildcard = F.col("rules"), True
            else:
                rules_col = F.transform(
                    F.col("rules"), lambda r: _promote(r["prefix"], r["allow"])
                )
        else:
            rules_col = F.transform(
                F.col("disallow_prefixes"),
                lambda p: _promote(p, F.lit(False)),
            )
        matched = F.filter(
            F.col("_r_rules"),
            (lambda r: rule_matches(F.col("path"), r))
            if wildcard
            else (lambda r: F.col("path").startswith(r["prefix"])),
        )
        best = F.array_max(
            F.transform(
                matched,
                lambda r: F.struct(
                    F.length(r["prefix"]).alias("l"), r["allow"].alias("a")
                ),
            )
        )
        blocked = best.isNotNull() & ~best["a"]
        out = (
            out.join(
                F.broadcast(
                    robots.select(
                        F.col("host").alias("_r_host"),
                        rules_col.alias("_r_rules"),
                    )
                ),
                on=[out["host"] == F.col("_r_host")],
                how="left",
            )
            .filter(F.col("_r_rules").isNull() | ~blocked)
            .drop("_r_host", "_r_rules")
        )

    # Whitelist: the primary-domain extraction is the one genuinely
    # regex-bound step, so it runs once per DISTINCT host, not once per
    # URL — a semi-join on the (small relative to the frontier) host set.
    # At 10^10 URLs the distinct-host aggregation is a partial-agg shuffle
    # of short strings; the join back is host-keyed (AQE broadcasts it
    # when the host set is small).
    #
    # The F.when(_n > 0, ...) guard is load-bearing: a predicate over only
    # the grouping column would be PUSHED BELOW the aggregate by Catalyst
    # (PushDownPredicates), silently re-evaluating the regex per URL —
    # measured 25s vs 0.5s at 750k rows / 137 hosts on local[32].
    # Referencing the aggregated _n (always >= 1, so semantics unchanged)
    # pins the filter above the distinct.
    ok_hosts = (
        out.groupBy("host").agg(F.count(F.lit(1)).alias("_n"))
        .filter(
            F.when(F.col("_n") > 0, U.primary_domain(F.col("host"))).isin(whitelist)
        )
        .select("host")
    )
    out = out.join(ok_hosts, on="host", how="left_semi")
    out = out.filter(F.col("depth") <= F.lit(max_depth))
    return out


def dedup_in_round(cand: DataFrame, winner: str = "packed_string") -> DataFrame:
    """Two candidates for one URL in one round -> exactly one admitted
    (the test-and-set race at scheduler.go:551-574), with a deterministic
    winner: min (depth, parent_url, link_pos). Aggregation, not
    dropDuplicates — task order must not pick the winner.

    winner="numeric" switches to the HashAggregate variant (see
    _dedup_in_round_numeric): same admitted URL set, winner metadata
    ordered by (depth, xxhash64(parent), link_pos) instead of the
    lexicographic parent — deterministic, but a different (and 2^-64
    collision-tolerant) tie-break. Kept off the default path so the
    contract queries pin the reference-faithful ordering.

    A `priority` column, when present, is NOT part of the winner ordering:
    the admitted row carries the MAX priority over all duplicates (a URL
    discovered both by a 0.9-priority sitemap entry and a plain link keeps
    the sitemap's urgency) — one more column in the same aggregate, order-
    free and identical across both winner variants."""
    if winner == "numeric":
        return _dedup_in_round_numeric(cand)
    has_priority = "priority" in cand.columns
    # Winner ordering packed into ONE string:
    #   packed = lpad(depth) \x00 parent_url \x00 lpad(link_pos)
    # String compare == field-wise compare because depth/link_pos are
    # fixed-width zero-padded and \x00 sorts below every URL character
    # (so a shorter parent_url wins against its extensions, exactly like
    # struct comparison). url/host/path are 1:1 with the group key, so
    # plain min() carries them.
    # NB: min over strings still executes as SortAggregate (UnsafeRow hash
    # buffers are fixed-width only) — unavoidable while the tie-break
    # includes parent_url; partial aggregation still combines map-side, so
    # the shuffle moves one row per (partition, url_sha1). A fully numeric
    # tie-break (hash of parent) would enable HashAggregate at the cost of
    # a 2^-64 nondeterminism; not worth it for the frontier's semantics.
    # NULL parent_url is preserved (not collapsed with "") by a 1-byte
    # marker: NULL packs as the empty field (sorts first, like NULL in a
    # struct-min), a real value packs as "\x01"+parent (\x01 sorts below
    # every URL character but above the \x00 separator, so shorter parents
    # still win against their extensions). depth/link_pos are non-negative
    # by construction (seeds start at 0, links at depth+1 / enumerate
    # index) — the lpad fixed-width encoding requires that; a negative
    # value would mis-order, so it is asserted in debug runs via tests.
    packed = F.concat_ws(
        "\x00",
        F.lpad(F.col("depth").cast("string"), 19, "0"),
        F.when(F.col("parent_url").isNull(), F.lit("")).otherwise(
            F.concat(F.lit("\x01"), F.col("parent_url"))
        ),
        F.lpad(F.col("link_pos").cast("string"), 19, "0"),
    )
    aggs = [
        F.min("url").alias("url"),
        F.min("host").alias("host"),
        F.min("path").alias("path"),
        F.min(packed).alias("_w"),
    ]
    if has_priority:
        aggs.append(F.max("priority").alias("priority"))
    agg = cand.groupBy("url_sha1").agg(*aggs)
    parts = F.split(F.col("_w"), "\x00")
    packed_parent = F.element_at(parts, 2)
    return agg.select(
        "url_sha1", "url", "host", "path",
        F.element_at(parts, 1).cast("long").alias("depth"),
        F.when(packed_parent == "", F.lit(None).cast("string"))
        .otherwise(F.substring(packed_parent, 2, F.lit(1 << 30)))
        .alias("parent_url"),
        F.element_at(parts, 3).cast("long").alias("link_pos"),
        *(["priority"] if has_priority else []),
    )


def _dedup_in_round_numeric(cand: DataFrame) -> DataFrame:
    """HashAggregate variant of the in-round dedup (the experiment the
    packed-string docstring sketches): the winner ordinal is ONE
    decimal(38,0) — depth*2^94 + parent_ordinal*2^30 + link_pos, where
    parent_ordinal is 0 for NULL (sorts first, like the packed string's
    empty field) else xxhash64(parent)+2^63+1 (unsigned-shifted, never 0).
    Fixed-width decimal buffers are UnsafeRow-mutable, so min() executes
    as HashAggregate with map-side partial aggregation — no per-group sort
    and a 16-byte shuffle value instead of the packed parent string.

    The winner row's full columns come from a join back on
    (url_sha1, packed == min): the aggregate output is already hash-
    partitioned on url_sha1, so only the candidate side exchanges for the
    join — the same single candidate shuffle the string variant pays,
    minus its map-side combine. Duplicate candidate rows that tie exactly
    (fully identical rows, or distinct parents colliding in xxhash64 —
    probability 2^-64 per group) are collapsed by a url_sha1-partitioned
    dropDuplicates that reuses the join's partitioning (no extra
    exchange).

    Bounds: depth < 10^7 and link_pos < 2^30 — ENFORCED, not assumed.
    With ANSI off, an overflowing decimal(7,0)/(10,0) cast yields NULL,
    NULL `_pk` rows lose every min() and `_pk == _w` comparison, and the
    URL would vanish SILENTLY; the raise_error branch (folded into the
    packed expression so column pruning cannot drop it) turns that into a
    loud task failure instead.
    """
    from decimal import Decimal

    two94 = F.lit(Decimal(2 ** 94))
    two63p1 = F.lit(Decimal(2 ** 63 + 1))
    two30 = F.lit(Decimal(2 ** 30))
    parent_ord = F.when(
        F.col("parent_url").isNull(), F.lit(Decimal(0))
    ).otherwise(
        F.xxhash64(F.col("parent_url")).cast("decimal(20,0)") + two63p1
    )
    in_bounds = (F.col("depth") < F.lit(10 ** 7)) & (
        F.col("link_pos") < F.lit(2 ** 30)
    )
    guard = F.when(in_bounds, F.lit(Decimal(0))).otherwise(
        F.raise_error(
            F.concat(
                F.lit("dedup_in_round(winner='numeric') bounds exceeded: "
                      "depth/link_pos out of range for url "),
                F.col("url"),
            )
        ).cast("decimal(38,0)")
    )
    packed = (
        F.col("depth").cast("decimal(7,0)") * two94
        + parent_ord * two30
        + F.col("link_pos").cast("decimal(10,0)")
        + guard
    ).cast("decimal(38,0)")
    has_priority = "priority" in cand.columns
    tagged = cand.withColumn("_pk", packed)
    w_aggs = [F.min("_pk").alias("_w")]
    if has_priority:
        w_aggs.append(F.max("priority").alias("_prio"))
    w = tagged.groupBy("url_sha1").agg(*w_aggs)
    return (
        tagged.join(w, on="url_sha1")
        .filter(F.col("_pk") == F.col("_w"))
        .dropDuplicates(["url_sha1"])
        .select("url_sha1", "url", "host", "path", "depth", "parent_url",
                "link_pos",
                *([F.col("_prio").alias("priority")] if has_priority else []))
    )


def cap_per_host(
    cand: DataFrame, max_per_host: int,
    order_cols: tuple[str, ...] = ("depth", "link_pos", "url_sha1"),
) -> tuple[DataFrame, DataFrame]:
    """Crawl-trap guard: bound admissions PER HOST per round. Calendar
    pages, session ids and faceted search mint unbounded distinct URLs on
    one host; politeness only paces fetches, so without this cap the
    frontier/queue grows without bound on a trap host. Returns
    (kept, overflow) split deterministically by a per-host row_number over
    ``order_cols`` (shallowest first — never task order). The window
    partitions by host; the trap host's sort is the cost of bounding it
    (one pass, spill-safe), and every healthy host's partition is small.
    Callers decide overflow policy — the crawl marks overflow SEEN but
    never queues it (drop-forever, the standard trap mitigation) and
    records error rows."""
    w = Window.partitionBy("host").orderBy(
        *[F.col(c).asc() for c in order_cols]
    )
    tagged = cand.withColumn("_hr", F.row_number().over(w))
    kept = tagged.filter(F.col("_hr") <= max_per_host).drop("_hr")
    overflow = tagged.filter(F.col("_hr") > max_per_host).drop("_hr")
    return kept, overflow


def anti_join_seen(cand: DataFrame, seen: DataFrame) -> DataFrame:
    """Drop already-seen URLs. `seen` needs only url_sha1. When `seen` is
    the RoundStore bucketed table (CLUSTERED BY url_sha1 — the crawl's
    default), its HashPartitioning reaches the join and only the candidate
    side exchanges; the 10^10-row seen side is never re-shuffled
    (plan-asserted in tests/test_seen_bucketed.py)."""
    return cand.join(seen.select("url_sha1"), on="url_sha1", how="left_anti")


def admit(
    cand_raw: DataFrame,
    seen: DataFrame,
    whitelist: list[str],
    max_depth: int,
    robots: DataFrame | None = None,
    bloom_prefilter=None,
    scratch: list | None = None,
    dedup_winner: str = "packed_string",
) -> DataFrame:
    """Full admission: returns the admitted frontier rows for this round.

    bloom_prefilter: optional callable df -> (probably_new_df, definitely_new_df)
    from operators/bloom.py; definite-new rows skip the exact anti-join.

    scratch: optional list the canonicalized intermediate is persisted into.
    The whitelist's distinct-host semi-join branches the plan, and without
    a persist both branches recompute the canonicalize union (incl. the
    Python UDF). Callers pass a list and unpersist its entries AFTER the
    admitted frame is materialized.
    """
    cand = canonicalize_candidates(cand_raw)
    if scratch is not None:
        from pyspark.storagelevel import StorageLevel

        cand = cand.persist(StorageLevel.MEMORY_AND_DISK)
        scratch.append(cand)
    cand = admission_filters(cand, whitelist, max_depth, robots=robots)
    cand = dedup_in_round(cand, winner=dedup_winner)
    if bloom_prefilter is not None:
        maybe_seen, definitely_new = bloom_prefilter(cand)
        return anti_join_seen(maybe_seen, seen).unionByName(definitely_new)
    return anti_join_seen(cand, seen)
