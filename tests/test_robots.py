"""robots.txt parser (sources/robots.py): grouping, wildcard agent,
comments, empty Disallow, and the admission integration."""

from webcrawler_spark.sources.robots import parse_robots

BODY_STAR = """# example robots
User-agent: *
Disallow: /private/
Disallow: /tmp/

User-agent: OtherBot
Disallow: /otherbot-only/
"""

BODY_MULTI_UA = """User-agent: GoodBot
User-agent: *
Disallow: /both/
"""

BODY_NO_STAR = """User-agent: OnlyBot
Disallow: /x/
"""

BODY_EMPTY_DISALLOW = """User-agent: *
Disallow:
"""

BODY_MESSY = """  user-AGENT :  *   # inline comment
disallow: /a/
Crawl-delay: 10
DISALLOW: /b/
"""


def _parse(spark, items):
    df = spark.createDataFrame(items, "host: string, body: string")
    return {
        r["host"]: list(r["disallow_prefixes"])
        for r in parse_robots(df).collect()
    }


def test_star_group_only(spark):
    got = _parse(spark, [("a.com", BODY_STAR)])
    assert got == {"a.com": ["/private/", "/tmp/"]}


def test_multiple_user_agent_lines_one_group(spark):
    got = _parse(spark, [("b.com", BODY_MULTI_UA)])
    assert got == {"b.com": ["/both/"]}


def test_non_star_group_yields_nothing(spark):
    got = _parse(spark, [("c.com", BODY_NO_STAR)])
    assert got == {}  # absent row == unrestricted


def test_empty_disallow_is_allow_all(spark):
    got = _parse(spark, [("d.com", BODY_EMPTY_DISALLOW)])
    assert got == {}


def test_case_comments_whitespace_and_other_fields(spark):
    got = _parse(spark, [("e.com", BODY_MESSY)])
    assert got == {"e.com": ["/a/", "/b/"]}


def test_multi_host_isolation(spark):
    got = _parse(spark, [
        ("a.com", BODY_STAR),
        ("c.com", BODY_NO_STAR),
        ("e.com", BODY_MESSY),
    ])
    assert got == {
        "a.com": ["/private/", "/tmp/"],
        "e.com": ["/a/", "/b/"],
    }


def test_feeds_admission_filter(spark):
    """Parsed output plugs straight into admission_filters' robots arg."""
    from pyspark.sql import functions as F

    from webcrawler_spark.operators import admission

    robots = parse_robots(
        spark.createDataFrame([("www.example.com", BODY_STAR)],
                              "host: string, body: string")
    )
    cand = spark.createDataFrame(
        [
            ("http://www.example.com/private/x", "www.example.com", "/private/x"),
            ("http://www.example.com/ok", "www.example.com", "/ok"),
            ("http://www.other.com/private/x", "www.other.com", "/private/x"),
        ],
        "url: string, host: string, path: string",
    ).withColumn("depth", F.lit(0).cast("long"))
    out = admission.admission_filters(
        cand, ["example.com", "other.com"], max_depth=3, robots=robots
    )
    urls = sorted(r["url"] for r in out.collect())
    assert urls == [
        "http://www.example.com/ok",
        "http://www.other.com/private/x",  # no robots row -> unrestricted
    ]
