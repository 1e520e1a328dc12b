"""Paginated seed-list source (InitReqList, JcUx.go:47-85): page-window
bounds, decode/URL construction, malformed-body skip, and an end-to-end
crawl whose seeds are drawn entirely through seed_requests."""

import json

from oracle import CrawlConfig as OracleConfig, crawl as oracle_crawl
from webcrawler_spark.plans.crawl import CrawlConfig, run_crawl
from webcrawler_spark.sources import seedlist


def _body(entries):
    return json.dumps(
        {"page": {"list": [{"create_id": c, "id": i} for c, i in entries]}}
    )


def _listing(spark, rows):
    return spark.createDataFrame(rows, "page_no: long, body: string")


class TestSeedRequests:
    def test_decode_and_url_shape(self, spark):
        df = _listing(spark, [(1, _body([(3, 17), (4, 18)]))])
        got = sorted(
            r["url"] for r in seedlist.decode_listing(df).collect()
        )
        assert got == [
            "http://www.bml365.com/qy/prod/v/3-17",
            "http://www.bml365.com/qy/prod/v/4-18",
        ]

    def test_page_window_is_count(self, spark):
        # Go loop: for i := startPage; i < startPage+pageNum; i++
        # (JcUx.go:50) — pageNum is a COUNT, so startPage=2, pageNum=4
        # fetches pages 2,3,4,5.
        rows = [(p, _body([(p, p * 100)])) for p in range(1, 8)]
        got = {
            r["url"]
            for r in seedlist.seed_requests(
                _listing(spark, rows), start_page=2, page_num=4
            ).collect()
        }
        assert got == {
            f"http://www.bml365.com/qy/prod/v/{p}-{p * 100}" for p in (2, 3, 4, 5)
        }

    def test_order_ranks_by_page_then_position(self, spark):
        rows = [(2, _body([(20, 1), (21, 2)])), (1, _body([(10, 1)]))]
        out = seedlist.seed_requests(
            _listing(spark, rows), start_page=1, page_num=2
        ).collect()
        by_url = {r["url"]: r["order"] for r in out}
        u1 = "http://www.bml365.com/qy/prod/v/10-1"
        u2a = "http://www.bml365.com/qy/prod/v/20-1"
        u2b = "http://www.bml365.com/qy/prod/v/21-2"
        assert by_url[u1] < by_url[u2a] < by_url[u2b]

    def test_malformed_body_contributes_nothing(self, spark):
        rows = [(1, "not json {"), (2, _body([(5, 50)]))]
        out = seedlist.seed_requests(
            _listing(spark, rows), start_page=1, page_num=2
        ).collect()
        assert [r["url"] for r in out] == ["http://www.bml365.com/qy/prod/v/5-50"]

    def test_float_json_numbers_print_as_ints(self, spark):
        # Go decodes JSON numbers as float64 and prints them back integral
        df = _listing(spark, [(1, '{"page":{"list":[{"create_id":3.0,"id":17.0}]}}')])
        out = seedlist.decode_listing(df).collect()
        assert out[0]["url"] == "http://www.bml365.com/qy/prod/v/3-17"


def test_e2e_seeds_drawn_through_pagination(spark, tmp_path):
    """Full crawl whose round-0 frontier comes from seed_requests over a
    two-page listing fixture; engine order/seen match the oracle fed the
    same decoded seed list."""
    import datetime

    import pyarrow as pa
    import pyarrow.parquet as pq

    prefix = seedlist.URL_PREFIX
    u = lambda c, i: f"{prefix}{c}-{i}"  # noqa: E731
    ts = datetime.datetime(2024, 1, 1, tzinfo=datetime.timezone.utc)
    pages = [
        {"url": u(1, 101), "warc_ts": ts, "lang": "zh", "text": "",
         "html": f'<a href="{u(9, 999)}">next</a>'.encode()},
        {"url": u(1, 102), "warc_ts": ts, "lang": "zh", "text": "",
         "html": b"<p>leaf</p>"},
        {"url": u(2, 201), "warc_ts": ts, "lang": "zh", "text": "",
         "html": b"<p>leaf2</p>"},
        {"url": u(9, 999), "warc_ts": ts, "lang": "zh", "text": "",
         "html": b"<p>deep</p>"},
    ]
    outdir = tmp_path / "bmlweb"
    outdir.mkdir()
    pq.write_table(
        pa.Table.from_pydict({
            "url": [p["url"] for p in pages],
            "warc_ts": pa.array([p["warc_ts"] for p in pages],
                                type=pa.timestamp("us", tz="UTC")),
            "html": pa.array([p["html"] for p in pages], type=pa.binary()),
            "text": [p["text"] for p in pages],
            "lang": [p["lang"] for p in pages],
        }),
        str(outdir / "pages.parquet"),
    )
    listing = _listing(spark, [
        (1, _body([(1, 101), (1, 102)])),
        (2, _body([(2, 201)])),
        (3, _body([(3, 301)])),  # outside the requested window
    ])
    seeds_df = seedlist.seed_requests(listing, start_page=1, page_num=2)

    # oracle gets the same decoded seed list (python json twin)
    seeds = sorted(
        ({"url": r["url"], "order": r["order"]} for r in seeds_df.collect()),
        key=lambda s: s["order"],
    )
    assert [s["url"] for s in seeds] == [u(1, 101), u(1, 102), u(2, 201)]

    ocfg = OracleConfig(whitelist=["bml365.com"], max_depth=2, max_rounds=6,
                        parsers="combined")
    golden = oracle_crawl(pages, seeds, ocfg)

    cfg = CrawlConfig(whitelist=["bml365.com"], max_depth=2, max_rounds=6,
                      parsers="combined")
    result = run_crawl(
        spark, spark.read.parquet(str(outdir / "pages.parquet")), seeds_df,
        cfg, checkpoint_dir=str(tmp_path / "ckpt_bml"),
    )
    engine_order = [
        (r["round"], r["url"]) for r in result.order(spark)
        .orderBy("round", "host", "url_sha1").collect()
    ]
    assert engine_order == [(rnd, url) for rnd, _h, url, _s in golden.order]
    # the out-of-window page-3 product must never be crawled
    assert all(url != u(3, 301) for _r, url in engine_order)
    # the linked page at depth 1 was reached through the seeded frontier
    assert any(url == u(9, 999) for _r, url in engine_order)
