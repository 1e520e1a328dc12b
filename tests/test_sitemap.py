"""Sitemaps-protocol source (sources/sitemap.py): urlset + index parsing,
priority defaulting, seed ordering."""

from webcrawler_spark.sources.sitemap import parse_sitemaps, sitemap_seeds

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>
      http://www.example.com/a
    </loc>
    <lastmod>2024-03-01</lastmod>
    <priority>0.9</priority>
  </url>
  <url><loc>http://www.example.com/b</loc></url>
  <url><loc>http://www.example.com/c</loc><priority>bogus</priority></url>
  <url><priority>0.3</priority></url>
</urlset>
"""

INDEX = """<sitemapindex>
  <sitemap><loc>http://www.example.com/sitemap1.xml</loc>
    <lastmod>2024-01-02</lastmod></sitemap>
  <sitemap><loc>http://www.example.com/sitemap2.xml</loc></sitemap>
</sitemapindex>
"""


def _parse(spark, items):
    df = spark.createDataFrame(items, "host: string, body: string")
    return parse_sitemaps(df)


def test_urlset_fields_and_defaults(spark):
    rows = {
        r["loc"]: (r["kind"], r["lastmod"], r["priority"])
        for r in _parse(spark, [("example.com", URLSET)]).collect()
    }
    # the loc-less block is dropped (loc is mandatory in the protocol)
    assert set(rows) == {
        "http://www.example.com/a",
        "http://www.example.com/b",
        "http://www.example.com/c",
    }
    assert rows["http://www.example.com/a"] == ("url", "2024-03-01", 0.9)
    assert rows["http://www.example.com/b"] == ("url", None, 0.5)  # default
    assert rows["http://www.example.com/c"] == ("url", None, 0.5)  # bogus -> default


def test_index_blocks(spark):
    rows = sorted(
        (r["kind"], r["loc"], r["lastmod"])
        for r in _parse(spark, [("example.com", INDEX)]).collect()
    )
    assert rows == [
        ("sitemap", "http://www.example.com/sitemap1.xml", "2024-01-02"),
        ("sitemap", "http://www.example.com/sitemap2.xml", None),
    ]


def test_seed_ordering_priority_then_url(spark):
    parsed = _parse(spark, [("example.com", URLSET)])
    seeds = sitemap_seeds(parsed).collect()
    ordered = [r["url"] for r in sorted(seeds, key=lambda r: r["order"])]
    # priority 0.9 first, then the two 0.5 defaults alphabetically
    assert ordered == [
        "http://www.example.com/a",
        "http://www.example.com/b",
        "http://www.example.com/c",
    ]
    assert [r["order"] for r in sorted(seeds, key=lambda r: r["order"])] == [0, 1, 2]
    # the output shape is exactly what seeds_to_candidates consumes
    assert set(seeds[0].asDict()) == {"url", "order"}
