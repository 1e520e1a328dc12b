"""Property-based slice (SURVEY §5.3): random page graphs, seeded —
engine ≡ oracle on crawl order and seen-set for every seed.

The fixture generator IS the random-graph sampler (deterministic per
seed); parametrizing the seed gives reproducible property coverage over
graph shapes the hand-picked fixture seed never exercises: different
link fan-outs, duplicate densities, off-domain mixes, hot-host ratios.
"""

import pytest

from oracle import CrawlConfig as OracleConfig, crawl as oracle_crawl
from webcrawler_spark import fixtures
from webcrawler_spark.plans.crawl import CrawlConfig, run_crawl


@pytest.mark.parametrize("seed", [7, 101, 202])
def test_random_graph_engine_equals_oracle(spark, tmp_path, seed):
    n_pages = 60
    paths = fixtures.write_parquet(str(tmp_path / f"web{seed}"),
                                   n_pages=n_pages, seed=seed)
    pages, seeds_data, robots = fixtures.generate(n_pages=n_pages, seed=seed)

    ocfg = OracleConfig(
        whitelist=fixtures.WHITELIST, max_depth=3, max_rounds=8,
        parsers="combined",
        budgets={r["host"]: r["budget_per_round"] for r in robots},
        robots={r["host"]: r["disallow_prefixes"] for r in robots},
    )
    golden = oracle_crawl(pages, seeds_data, ocfg)

    robots_df = spark.read.parquet(paths["robots"])
    cfg = CrawlConfig(whitelist=fixtures.WHITELIST, max_depth=3, max_rounds=8)
    result = run_crawl(
        spark,
        spark.read.parquet(paths["pages"]),
        spark.read.parquet(paths["seeds"]),
        cfg,
        checkpoint_dir=str(tmp_path / f"ck{seed}"),
        budgets=robots_df.select("host", "budget_per_round"),
        robots=robots_df.select("host", "disallow_prefixes"),
    )

    engine_order = [
        (r["round"], r["url"])
        for r in result.order(spark).orderBy("round", "host", "url_sha1").collect()
    ]
    assert engine_order == [(rnd, url) for rnd, _h, url, _s in golden.order], seed

    engine_seen = {
        r["url_sha1"]: (r["url"], r["first_round"])
        for r in result.seen(spark).collect()
    }
    assert engine_seen == golden.seen, seed


def test_whitelist_predicate_equals_primary_domain_membership(spark):
    """admission.whitelist_host_predicate (the regex-free streaming-path
    whitelist test) must admit EXACTLY the hosts primary_domain().isin(wl)
    admits, for whitelists of registrable domains — swept over every
    label/suffix combination around the fixture whitelist."""
    from pyspark.sql import functions as F

    from webcrawler_spark.functions import urls as U
    from webcrawler_spark.operators.admission import whitelist_host_predicate

    wl = ["bml365.com", "example.com.cn", "example.net", "example.me"]
    labels = ["", "a", "www", "shop.x", "bml365", "example", "net",
              "xexample", "example.net", "bml365.com"]
    cores = ["bml365", "example", "xbml365", "bml365x", "com", "net"]
    suffixes = ["com", "com.cn", "net", "net.cn", "me", "org", "cn", "dev",
                "co", "com."]
    hosts = []
    for lab in labels:
        for core in cores:
            for suf in suffixes:
                h = f"{core}.{suf}" if not lab else f"{lab}.{core}.{suf}"
                hosts.append(h)
    hosts += ["", "bml365.com", ".bml365.com", "bml365.com.", "nosuffix",
              "example.net.example.net", "a.example.net.cn"]
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    got = df.select(
        "host",
        F.coalesce(
            whitelist_host_predicate(F.col("host"), wl), F.lit(False)
        ).alias("fast"),
        F.coalesce(
            U.primary_domain(F.col("host")).isin(wl), F.lit(False)
        ).alias("ref"),
    ).collect()
    diffs = [(r["host"], r["fast"], r["ref"]) for r in got if r["fast"] != r["ref"]]
    assert not diffs, f"{len(diffs)} mismatches, first: {diffs[:5]}"
