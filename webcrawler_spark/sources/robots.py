"""robots.txt parsing — raw fetched bodies -> the (host, disallow_prefixes)
dim table the admission filter broadcasts (operators/admission.py).

NEW per north_rule (the reference has no robots support; its only
politeness is MaxIdleConnsPerHost=5, exampes/finder/internal/client.go:22).
Grammar follows the public Robots Exclusion Protocol (RFC 9309 subset):

* lines are `field: value`, `#` starts a comment, blank lines ignored;
* a GROUP is a run of consecutive ``User-agent`` lines followed by rules;
* we honor the ``*`` user-agent groups' ``Disallow`` AND ``Allow``
  prefixes (an empty value means no rule and contributes nothing);
* decision semantics (enforced by ``admission.admission_filters``):
  RFC 9309 §2.2.2 most-specific-match — among all rules matching the
  candidate path, the one with the LONGEST pattern wins; an allow/disallow
  tie at equal length resolves to allow;
* wildcards per RFC 9309 §2.2.3: ``*`` matches any character sequence,
  ``$`` at the END of a pattern anchors the match to the end of the path
  (elsewhere ``$`` is literal). Each rule is compiled ONCE at parse time
  into (segments array<string>, anchored boolean) — split on ``*`` after
  collapsing runs and stripping a no-op trailing ``*`` — so the per-
  candidate match in admission stays native (startswith + an aggregate of
  locate() calls), never regex on the hot path.

Everything is native DataFrame algebra: split/posexplode for lines, two
window passes over (host, line position) to assign each rule line to its
governing user-agent group. Windows are per host — bodies are a few KB,
so even 10^8 hosts shuffle fine on the host key; there is no per-row
Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _parsed_lines(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) -> one row per field line: (host, pos, kind, value).

    Comments (``#`` to end of line) and blank lines are stripped; field
    names are case-insensitive (lowercased into ``kind``); ``value`` is the
    trimmed remainder after the FIRST colon (so absolute-URL values like
    ``Sitemap: http://…`` keep their own colons intact)."""
    lines = bodies.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), "\n")).alias("pos", "raw"),
    )
    clean = F.trim(F.substring_index(F.col("raw"), "#", 1))
    return (
        lines.withColumn("line", clean)
        .filter(F.col("line") != "")
        .withColumn("kind", F.lower(F.trim(F.substring_index(F.col("line"), ":", 1))))
        .withColumn(
            "value",
            F.trim(F.substring(F.col("line"), F.instr(F.col("line"), ":") + 1, F.lit(1 << 30))),
        )
        .filter(F.instr(F.col("line"), ":") > 0)
    )


def _grouped_lines(parsed: DataFrame) -> DataFrame:
    """Assign each field line to its governing user-agent group: a run of
    consecutive ``User-agent`` lines starts a new group (RFC 9309 §2.2.1).
    Two window passes over (host, line position); windows are per host —
    bodies are a few KB, so even 10^8 hosts shuffle fine on the host key."""
    w = Window.partitionBy("host").orderBy("pos")
    is_ua = (F.col("kind") == "user-agent").cast("int")
    # group id: a ua line NOT preceded by another ua line starts a new group
    starts_group = (
        (is_ua == 1) & (F.coalesce(F.lag(is_ua).over(w), F.lit(0)) == 0)
    ).cast("int")
    return parsed.withColumn(
        "group_id",
        F.sum(starts_group).over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )


def _star_groups(grouped: DataFrame) -> DataFrame:
    """(host, group_id) of every group naming the wildcard ``*`` agent."""
    return (
        grouped.filter((F.col("kind") == "user-agent") & (F.col("value") == "*"))
        .select("host", "group_id")
        .distinct()
    )


def parse_robots(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) -> (host, disallow_prefixes array<string>,
    rules array<struct<prefix, allow>>) — both sorted.

    ``rules`` is what admission consumes (longest-match with Allow
    overrides); ``disallow_prefixes`` is kept as the legacy/simple view.
    Hosts whose body yields no applicable rules produce NO row (same as an
    absent robots.txt — the admission left join treats both as
    unrestricted). ``Sitemap:`` pointers and ``Crawl-delay`` are NOT here —
    they have their own extractors (:func:`robots_sitemaps`,
    :func:`crawl_delays`) because their scoping differs (group-independent
    vs group-scoped) and their consumers differ (frontier seeding vs
    politeness budgets).
    """
    grouped = _grouped_lines(_parsed_lines(bodies, host_col, body_col))
    star_groups = _star_groups(grouped)

    rules = (
        grouped.filter(
            F.col("kind").isin("disallow", "allow") & (F.col("value") != "")
        )
        .join(star_groups, on=["host", "group_id"], how="left_semi")
        .select(
            "host",
            F.col("value").alias("prefix"),
            (F.col("kind") == "allow").alias("allow"),
        )
        .distinct()
    )
    rules = rules.select("host", "prefix", "allow", *compiled_rule_cols())
    return rules.groupBy("host").agg(
        # collect_list skips NULLs -> disallow-only view (plain prefixes
        # only: a wildcard pattern is not a usable prefix)
        F.array_sort(
            F.collect_list(
                F.when(~F.col("allow") & ~F.col("anchored")
                       & (F.size("segments") == 1), F.col("prefix"))
            )
        ).alias("disallow_prefixes"),
        F.array_sort(
            F.collect_list(F.struct("prefix", "allow", "segments", "anchored"))
        ).alias("rules"),
    )


def compiled_rule_cols(pattern_col: str = "prefix") -> list:
    """Compile a raw rule pattern into the match machinery the admission
    filter consumes: ``anchored`` (pattern ends with ``$``) and
    ``segments`` (pattern body split on ``*``). Runs of ``*`` collapse to
    one; a trailing ``*`` on an UNanchored pattern is a no-op (prefix
    matching already extends past the match) and is stripped so no middle
    segment is ever empty. Regex is fine HERE: rules are a tiny broadcast
    dim table compiled once — candidates never touch a regex."""
    pat = F.col(pattern_col)
    anchored = pat.endswith("$")
    body = F.when(
        anchored, F.expr(f"substring({pattern_col}, 1, length({pattern_col}) - 1)")
    ).otherwise(pat)
    body = F.regexp_replace(body, r"\*+", "*")
    body = F.when(anchored, body).otherwise(F.regexp_replace(body, r"\*$", ""))
    return [
        F.split(body, r"\*", -1).alias("segments"),
        anchored.alias("anchored"),
    ]


def robots_sitemaps(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) -> (host, sitemap_url) — the ``Sitemap:`` pointers.

    RFC 9309 §2.3 (and sitemaps.org "Sitemaps & Cross Submits"): the field
    may appear ANYWHERE in the file and is independent of user-agent groups,
    so this reads raw field lines, not groups. The value is an absolute URL
    (its own ``:`` survives because value extraction splits on the FIRST
    colon of the line). This is how real crawls bootstrap:
    robots.txt -> Sitemap: -> sitemapindex -> urlset -> frontier — the
    reference has no discovery at all (seeds are a hardcoded list,
    exampes/finder/bm1365Model/JcUx.go:47-85), so the whole chain is NEW
    per north_rule. Output is distinct; scheme-relative or garbage values
    are left to admission to reject (the pointers are enqueued as ordinary
    candidates)."""
    p = _parsed_lines(bodies, host_col, body_col)
    return (
        p.filter((F.col("kind") == "sitemap") & (F.col("value") != ""))
        .select("host", F.col("value").alias("sitemap_url"))
        .distinct()
    )


def crawl_delays(
    bodies: DataFrame, host_col: str = "host", body_col: str = "body"
) -> DataFrame:
    """(host, body) -> (host, crawl_delay double) — the de-facto-standard
    ``Crawl-delay`` field (seconds between fetches), scoped to the ``*``
    user-agent groups exactly like Disallow/Allow (it is a group rule in
    every implementation that honors it: Yandex, Bing, Seznam). Hosts
    without a positive parseable delay in a ``*`` group produce no row.
    Multiple values collapse to the MAXIMUM delay (the most conservative —
    fewest fetches), deterministic under any file ordering."""
    grouped = _grouped_lines(_parsed_lines(bodies, host_col, body_col))
    star = _star_groups(grouped)
    d = F.col("value").try_cast("double")
    return (
        grouped.filter(F.col("kind") == "crawl-delay")
        .join(star, on=["host", "group_id"], how="left_semi")
        .select("host", d.alias("crawl_delay"))
        .filter(F.col("crawl_delay") > 0)
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
    )


def budgets_from_crawl_delay(
    delays: DataFrame, round_seconds: float = 60.0
) -> DataFrame:
    """(host, crawl_delay) -> the (host, budget_per_round) dim table the
    politeness operator broadcasts: a round spans ``round_seconds`` of
    polite wall-clock, so a host asking for one fetch per ``delay`` seconds
    gets ``floor(round_seconds / delay)`` slots, floored at 1 (a delay
    longer than the round still crawls, one URL per round — never starves).
    Integer-exact: both engines compute floor() over the same doubles."""
    budget = F.greatest(
        F.lit(1).cast("long"),
        F.floor(F.lit(float(round_seconds)) / F.col("crawl_delay")).cast("long"),
    )
    return delays.select("host", budget.alias("budget_per_round"))
