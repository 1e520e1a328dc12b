"""Property test: parse_sitemaps (Spark, regexp_extract_all/posexplode)
must agree with parse_sitemaps_py (the pure-Python twin the crawl oracle
uses) on randomized sitemap-ish bodies — well-formed blocks, whitespace
inside <loc>, missing/bogus <priority>, loc-less blocks, interleaved
<url>/<sitemap> blocks, stray text and unclosed noise between blocks.
One seed, hundreds of bodies, ONE Spark job."""

import random

from webcrawler_spark.sources.sitemap import parse_sitemaps, parse_sitemaps_py


def _random_body(rng: random.Random) -> str:
    parts = ["<urlset>"]
    for i in range(rng.randint(0, 6)):
        kind = rng.choice(["url", "url", "sitemap"])
        inner = []
        if rng.random() < 0.9:  # loc present (else the block is dropped)
            pad = rng.choice(["", " ", "\n  ", "\t"])
            inner.append(
                f"<loc>{pad}http://ex.com/{kind}/{i}/{rng.randint(0, 99)}{pad}</loc>"
            )
        if rng.random() < 0.4:
            inner.append(f"<lastmod>2024-0{rng.randint(1, 9)}-10</lastmod>")
        if rng.random() < 0.5:
            pr = rng.choice(["0.1", "0.9", "1", "bogus", "", "0.55"])
            inner.append(f"<priority>{pr}</priority>")
        rng.shuffle(inner)
        noise = rng.choice(["", "\n", "<!-- c -->", "stray <b>text", "<loc>orphan</loc>"])
        parts.append(f"<{kind}>{''.join(inner)}</{kind}>{noise}")
    parts.append("</urlset>")
    return "".join(parts)


def test_parse_sitemaps_matches_python_twin(spark):
    rng = random.Random(20260818)
    bodies = [(f"h{i}.example.com", _random_body(rng)) for i in range(300)]
    df = spark.createDataFrame(bodies, "host: string, body: string")
    got = sorted(
        (r["host"], r["kind"], r["pos"], r["loc"], r["lastmod"], r["priority"])
        for r in parse_sitemaps(df).collect()
    )
    want = sorted(
        (host, b["kind"], b["pos"], b["loc"], b["lastmod"], b["priority"])
        for host, body in bodies
        for b in parse_sitemaps_py(body)
    )
    assert got == want
