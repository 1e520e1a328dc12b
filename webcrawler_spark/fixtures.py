"""Deterministic synthetic web — the `pages` table per BASELINE input_hint.

Schema (fixed by BASELINE.json input_hint):
    url: string, warc_ts: timestamp, html: binary, text: string, lang: string

The `text` column is the golden extracted text, generated with the SAME
function the engine's UDF uses (extract.fields_join over the
`.visible-xs-block .prod_detail` DOM text) so the byte-identical-text gate
compares engine vs oracle, not parser quirks (SURVEY.md §7 risk register).

The graph exercises every edge the reference handles (FIXTURES.md):
breadcrumb positions, the 8 labeled Chinese fields with colon edge cases,
whitespace/CJK text, scoped image containers, relative/absolute/`javascript:`
/`#`/`/`/off-domain/non-http links, dead links (404 analog = absent row),
duplicate targets (dedup/test-and-set), deep chains (depth filter), one hot
host with ~70% of pages (skew/salting), and URLs that differ only by
canonicalization (uppercase host, :80, dot-segments, fragments).

Pure functions of (seed, n_pages); no wall clock, no network.
"""

from __future__ import annotations

import random
from datetime import datetime, timedelta, timezone

from . import htmldom
from .extract import fields_join

HOT_HOST = "www.bml365.com"
SHOP_HOST = "shop.example.com.cn"
CDN_HOST = "static.example.net"
OFFSITE_HOST = "evil.offsite.org"

# primary domains accepted by the crawl (the reference builds this from
# seed URLs + -domains flag, scheduler/scheduler.go:126-131)
WHITELIST = ["bml365.com", "example.com.cn", "example.net"]

EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)

WORDS = (
    "优质 化工 原料 高效 环保 试剂 工业 级别 包装 规格 用途 广泛 "
    "quality chemical reagent industrial grade packaging widely used"
).split()

CATS = [
    ["化工原料", "无机盐", "氯化物"],
    ["化工原料", "有机物", "醇类"],
    ["实验试剂", "分析纯", "标准品"],
    ["工业用品", "清洗剂", "除锈剂"],
]


def product_url(host: str, cid: int, pid: int) -> str:
    # same URL shape as the reference seed constructor (JcUx.go:72-73)
    return f"http://{host}/qy/prod/v/{cid}-{pid}"


def image_url(idx: int, ext: str, host: str = CDN_HOST) -> str:
    return f"http://{host}/img/{idx:05d}.{ext}"


def fake_image_bytes(rng: random.Random, ext: str) -> bytes:
    """Opaque-but-parseable payload: ascii header 'IMG:<w>:<h>:<fmt>:' +
    filler. Real image decode is stubbed in this container (no PIL); the
    header keeps multimodal metadata extraction testable end-to-end."""
    w = rng.choice([320, 640, 800, 1024])
    h = rng.choice([240, 480, 600, 768])
    size = rng.randint(64, 512)
    return (f"IMG:{w}:{h}:{ext}:" + "P" * size).encode("ascii")


def real_image_bytes(w: int, h: int, fmt: str) -> bytes:
    """Deterministic REAL image headers (stdlib only) for the codec tests
    and the multimodal_real_meta contract query: a well-formed minimal
    PNG (signature + IHDR/IDAT/IEND with CRCs), GIF89a (logical screen
    descriptor + trailer) or JPEG (SOI + APP0 JFIF + SOF0 + EOI)."""
    import struct
    import zlib

    if fmt == "png":
        def chunk(tag: bytes, body: bytes) -> bytes:
            c = tag + body
            return struct.pack(">I", len(body)) + c + struct.pack(
                ">I", zlib.crc32(c) & 0xFFFFFFFF
            )

        ihdr = struct.pack(">II5B", w, h, 8, 2, 0, 0, 0)
        idat = zlib.compress(b"\x00" * 8)
        return (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat) + chunk(b"IEND", b"")
        )
    if fmt == "gif":
        return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00\x00\x00" + b"\x3b"
    if fmt == "jpeg":
        app0 = (
            b"\xff\xe0" + struct.pack(">H", 16)
            + b"JFIF\x00\x01\x01\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00"
        )
        sof0 = (
            b"\xff\xc0" + struct.pack(">H", 17) + b"\x08"
            + struct.pack(">HH", h, w)
            + b"\x03" + b"\x01\x22\x00" + b"\x02\x11\x01" + b"\x03\x11\x01"
        )
        return b"\xff\xd8" + app0 + sof0 + b"\xff\xd9"
    raise ValueError(f"unknown format {fmt!r}")


def _info_block(rng: random.Random, i: int) -> str:
    price = f"¥{rng.randint(10, 9999)}.{rng.randint(0, 99):02d}"
    lines = [
        f"<p>适用范围: 工业 清洗 领域 {i}</p>",
        f"<p>价格:{price}</p>",
        "<p>产地 : 山东省 淄博市 </p>",
        f"<p>生产厂家:厂家{i % 37}有限公司</p>",
        f"<p>代理公司:{'' if i % 5 == 0 else f'代理{i % 11}公司'}</p>",
        f"<p>电话:0533-{rng.randint(1000000, 9999999)}</p>",
        f"<p>地址:淄博市 张店区 {i % 99} 号</p>",
        f"<p>邮箱: sales{i % 23}@bml365.com </p>",
    ]
    if i % 7 == 0:
        lines.insert(3, "<p>无冒号行直接跳过</p>")  # colon-less line
    if i % 6 == 0:
        lines.insert(1, f"<p>电话:0533:12345{i % 10}</p>")  # extra colon
    rng.shuffle(lines)
    return "\n        ".join(lines)


def _prod_detail(rng: random.Random, i: int, img_tags: list[str]) -> str:
    n_words = rng.randint(8, 40)
    body = " ".join(rng.choice(WORDS) for _ in range(n_words))
    # mixed whitespace, nested tags, CJK — exercises fields_join semantics
    return (
        f'<div class="prod_detail">\n'
        f"      产品详情  {body}\n"
        f"      <b>加粗{i}</b>\t<span>说明 {body[:20]}</span>\n"
        f"      {''.join(img_tags)}\n"
        f"      尾部   文本\n"
        f"    </div>"
    )


def build_page_html(
    rng: random.Random,
    i: int,
    url: str,
    hrefs: list[str],
    detail_imgs: list[str],
    yyal_imgs: list[str],
    jdgz_imgs: list[str],
) -> str:
    cats = CATS[i % len(CATS)]
    if i % 9 == 0:
        # fewer than 3 breadcrumb anchors -> categories stay empty
        bread = '<a href="/">首页</a><a href="/c">产品</a>'
    else:
        bread = (
            '<a href="/">首页</a><a href="/c">产品</a>'
            + "".join(f'<a href="/c/{j}">{c}</a>' for j, c in enumerate(cats))
        )
    anchor_html = "\n  ".join(f'<a href="{h}">link</a>' for h in hrefs)
    detail_img_html = [f'<img src="{s}">' for s in detail_imgs]
    yyal_html = "".join(f'<img src="{s}">' for s in yyal_imgs)
    jdgz_html = "".join(f'<img src="{s}">' for s in jdgz_imgs)
    return f"""<html><head><title>p{i}</title></head><body>
<div class="visible-xs-block">
  <div class="bread"><div><p>{bread}</p></div></div>
  <div style="margin:0">
    <div class="col-sm-7">
      <div style="padding:0">
        <h3>产品 {i} 标题</h3>
        {_info_block(rng, i)}
      </div>
    </div>
  </div>
  {_prod_detail(rng, i, detail_img_html)}
</div>
<div class="yyal">{yyal_html}</div>
<div class="jdgz">{jdgz_html}</div>
<div class="nav">
  {anchor_html}
  <a href="#">top</a>
  <a href="/">root</a>
  <a href="">empty</a>
  <a href="javascript:void(0)">js</a>
  <a href="JavaScript:history.back()">js2</a>
  <a href="mailto:x@y.com">mail</a>
  <a href="ftp://files.{OFFSITE_HOST}/f{i}">ftp</a>
</div>
</body></html>"""


def golden_text(html: str | bytes) -> str:
    """Golden extracted text — same selector + transform as the engine UDF
    and the oracle (JcUx.go:195-200)."""
    dom = htmldom.parse(html)
    info = ""
    for div in htmldom.find(dom, ".visible-xs-block .prod_detail"):
        info = fields_join(div.text())
    return info


def generate(n_pages: int = 200, seed: int = 42):
    """Build the synthetic web.

    Returns (pages, seeds, robots):
      pages:  list of dicts (url, warc_ts, html, text, lang)
      seeds:  list of dicts (url, order)
      robots: list of dicts (host, disallow_prefixes, budget_per_round)
    """
    rng = random.Random(seed)

    hosts = []
    for i in range(n_pages):
        r = rng.random()
        if r < 0.70:
            hosts.append(HOT_HOST)          # hot host -> skew tests
        elif r < 0.85:
            hosts.append(SHOP_HOST)
        elif r < 0.95:
            hosts.append(CDN_HOST)
        else:
            hosts.append(OFFSITE_HOST)      # off-whitelist

    urls = [product_url(hosts[i], i % 17, i) for i in range(n_pages)]

    # deep chain hanging off page 0: exercises depth-limit filtering
    chain_len = 9
    chain_urls = [f"http://{HOT_HOST}/chain/{k}" for k in range(chain_len)]

    # image universe: ~1.5 per page; ~25% are dead (absent from the table)
    n_imgs = max(4, int(n_pages * 1.5))
    img_exts = ["jpg", "png", "gif", "jpeg"]
    img_urls = [image_url(k, img_exts[k % 4]) for k in range(n_imgs)]
    img_alive = [rng.random() > 0.25 for _ in range(n_imgs)]

    pages = []
    seeds = []
    ts_counter: dict[str, int] = {}

    def next_ts(host: str) -> datetime:
        c = ts_counter.get(host, 0)
        ts_counter[host] = c + 1
        return EPOCH + timedelta(seconds=c)

    for i, url in enumerate(urls):
        # outgoing links: 2-6 product pages, with edge cases
        n_out = rng.randint(2, 6)
        targets = [urls[rng.randrange(n_pages)] for _ in range(n_out)]
        hrefs: list[str] = []
        for t in targets:
            style = rng.random()
            if style < 0.5:
                hrefs.append(t)  # absolute
            elif style < 0.7:
                # relative form of a same-host target
                hrefs.append("/" + t.split("/", 3)[3] if t.count("/") >= 3 else t)
            elif style < 0.8:
                hrefs.append(t.replace("http://", "HTTP://").replace(
                    t.split("/")[2], t.split("/")[2].upper(), 1))  # case-canon dup
            elif style < 0.9:
                hrefs.append(t.replace("://", "://") + "#frag")  # fragment dup
            else:
                hrefs.append(t.replace("/qy/", "/qy/../qy/"))    # dot-segment dup
        if i % 4 == 0:
            hrefs.append(url)  # self link
        if i % 10 == 0:
            hrefs.append(f"http://{HOT_HOST}/dead/{i}")  # 404 analog
        if i % 15 == 0:
            hrefs.append(f"http://{OFFSITE_HOST}/lure/{i}")  # off-whitelist
        if i == 0:
            hrefs.append(chain_urls[0])

        k0 = rng.randrange(n_imgs)
        detail_imgs = [img_urls[(k0 + j) % n_imgs] for j in range(rng.randint(1, 3))]
        # mix of relative and absolute srcs + a duplicate across containers
        yyal_imgs = [f"/img/{(k0 + 7) % n_imgs:05d}.{img_exts[(k0 + 7) % 4]}"]
        jdgz_imgs = [detail_imgs[0]] if i % 3 == 0 else []

        html = build_page_html(rng, i, url, hrefs, detail_imgs, yyal_imgs, jdgz_imgs)
        pages.append(
            {
                "url": url,
                "warc_ts": next_ts(hosts[i]),
                "html": html.encode("utf-8"),
                "text": golden_text(html),
                "lang": "zh" if rng.random() < 0.7 else "en",
            }
        )

    # chain pages (hot host, minimal template, single forward link)
    for k, curl in enumerate(chain_urls):
        nxt = chain_urls[k + 1] if k + 1 < chain_len else urls[0]
        html = build_page_html(rng, 10_000 + k, curl, [nxt], [], [], [])
        pages.append(
            {
                "url": curl,
                "warc_ts": next_ts(HOT_HOST),
                "html": html.encode("utf-8"),
                "text": golden_text(html),
                "lang": "zh",
            }
        )

    # live image rows (binary payload; engine derives content-type from ext)
    for k, iurl in enumerate(img_urls):
        if not img_alive[k]:
            continue
        pages.append(
            {
                "url": iurl,
                "warc_ts": next_ts(CDN_HOST),
                "html": fake_image_bytes(rng, img_exts[k % 4]),
                "text": "",
                "lang": "",
            }
        )

    # seeds: first whitelisted product pages (like InitReqList, JcUx.go:47-85)
    n_seeds = max(2, n_pages // 20)
    order = 0
    for i, url in enumerate(urls):
        if hosts[i] != OFFSITE_HOST and order < n_seeds:
            seeds.append({"url": url, "order": order})
            order += 1

    robots = [
        {"host": HOT_HOST, "disallow_prefixes": ["/private/", "/admin/"],
         "budget_per_round": 25},
        {"host": SHOP_HOST, "disallow_prefixes": [], "budget_per_round": 10},
        {"host": CDN_HOST, "disallow_prefixes": ["/img/secret/"],
         "budget_per_round": 50},
    ]
    return pages, seeds, robots


def content_type_for(url: str) -> str:
    """Derived response content type — the pages table plays the web, and
    the web would send a Content-Type header (downloader.go:50 analog)."""
    path = url.split("?")[0].lower()
    for ext, ct in (
        (".jpg", "image/jpeg"), (".jpeg", "image/jpeg"),
        (".png", "image/png"), (".gif", "image/gif"),
        (".xml", "application/xml"),
    ):
        if path.endswith(ext):
            return ct
    return "text/html; charset=utf-8"


def write_parquet(outdir: str, n_pages: int = 200, seed: int = 42) -> dict:
    """Write pages/seeds/robots parquet with pyarrow (no Spark needed)."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    os.makedirs(outdir, exist_ok=True)
    pages, seeds, robots = generate(n_pages=n_pages, seed=seed)

    pages_tbl = pa.Table.from_pydict(
        {
            "url": [p["url"] for p in pages],
            "warc_ts": pa.array([p["warc_ts"] for p in pages],
                                type=pa.timestamp("us", tz="UTC")),
            "html": pa.array([p["html"] for p in pages], type=pa.binary()),
            "text": [p["text"] for p in pages],
            "lang": [p["lang"] for p in pages],
        }
    )
    seeds_tbl = pa.Table.from_pydict(
        {"url": [s["url"] for s in seeds], "order": [s["order"] for s in seeds]}
    )
    robots_tbl = pa.Table.from_pydict(
        {
            "host": [r["host"] for r in robots],
            "disallow_prefixes": [r["disallow_prefixes"] for r in robots],
            "budget_per_round": [r["budget_per_round"] for r in robots],
        }
    )
    paths = {}
    for name, tbl in (("pages", pages_tbl), ("seeds", seeds_tbl), ("robots", robots_tbl)):
        path = os.path.join(outdir, f"{name}.parquet")
        pq.write_table(tbl, path)
        paths[name] = path
    return paths


def write_bfs_oracle_tables(outdir: str, n_pages: int = 200, seed: int = 42) -> dict:
    """Side tables for the crawl_bfs SQL oracle (pure Python, no Spark).

    The crawl's per-row SCALAR transforms — HTML link extraction (combined
    parser order: scoped-img, links, img — analyzer.go:92-111), RFC-3986
    canonicalization + sha1, content-type classification — are precomputed
    here with the same pure-Python modules the reference simulator
    (tests/oracle.py) uses, so the DuckDB twin can pin the ITERATIVE
    relational structure in SQL: admission conjunction, in-round dedup
    winner, seen anti-join, politeness ranking, fetch join, next-round
    link explosion (scheduler/scheduler.go:528-576, analyzer.go:119-132).

    Tables:
      page_links:  (page_url, link_pos, raw_url)  one row per extracted link
      page_meta:   (url, kind in html|image|other)
      canon_map:   (raw_url, url, sha1, host, path, scheme, primary_domain)
                   url NULL = invalid/relative-unresolvable (dropped)
    """
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq

    from . import htmldom
    from .extract import extract_img_links, extract_links, extract_scoped_img_links
    from .urlnorm import (
        canonicalize,
        primary_domain,
        sha1_hex,
        url_host,
        url_path,
        url_scheme,
    )

    os.makedirs(outdir, exist_ok=True)
    pages, seeds, _robots = generate(n_pages=n_pages, seed=seed)

    page_links: list[dict] = []
    page_meta: list[dict] = []
    raw_universe: set[str] = {s["url"] for s in seeds}
    for p in pages:
        ct = content_type_for(p["url"])
        kind = (
            "image" if ct.startswith("image")
            else "html" if ct.startswith("text/html") else "other"
        )
        page_meta.append({"url": p["url"], "kind": kind})
        if kind != "html":
            continue
        dom = htmldom.parse(p["html"])
        links = (
            extract_scoped_img_links(dom, p["url"])
            + extract_links(dom, p["url"])
            + extract_img_links(dom, p["url"])
        )
        for pos, u in enumerate(links):
            page_links.append({"page_url": p["url"], "link_pos": pos, "raw_url": u})
            raw_universe.add(u)

    canon_rows: list[dict] = []
    for raw in sorted(raw_universe):
        canon = canonicalize(raw)
        if canon is None:
            canon_rows.append(
                {"raw_url": raw, "url": None, "sha1": None, "host": None,
                 "path": None, "scheme": None, "primary_domain": None}
            )
        else:
            host = url_host(canon)
            canon_rows.append(
                {"raw_url": raw, "url": canon, "sha1": sha1_hex(canon),
                 "host": host, "path": url_path(canon),
                 "scheme": url_scheme(canon),
                 "primary_domain": primary_domain(host)}
            )

    paths = {}
    for name, rows, schema in (
        ("page_links", page_links,
         pa.schema([("page_url", pa.string()), ("link_pos", pa.int64()),
                    ("raw_url", pa.string())])),
        ("page_meta", page_meta,
         pa.schema([("url", pa.string()), ("kind", pa.string())])),
        ("canon_map", canon_rows,
         pa.schema([("raw_url", pa.string()), ("url", pa.string()),
                    ("sha1", pa.string()), ("host", pa.string()),
                    ("path", pa.string()), ("scheme", pa.string()),
                    ("primary_domain", pa.string())])),
    ):
        tbl = pa.Table.from_pylist(rows, schema=schema)
        path = os.path.join(outdir, f"{name}.parquet")
        pq.write_table(tbl, path)
        paths[name] = path
    return paths
