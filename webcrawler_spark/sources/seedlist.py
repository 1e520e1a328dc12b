"""Paginated seed-list source — the InitReqList loop as a DataFrame op.

The reference seeds the crawl by POSTing a paginated listing API for pages
``startPage..pageNum``, JSON-decoding each response's
``page.list[*].{create_id,id}`` and sending one product-URL request per
entry at depth 0 (exampes/finder/bm1365Model/JcUx.go:47-85; URL
construction at :72-73).

The sandbox cannot do network I/O, so the listing API is played by a
table of pre-fetched response bodies — one row per page:
``(page_no: long, body: string)`` — exactly like the pages table plays the
web for the downloader. The decode + URL construction are the real
operators; swapping the table for a live fetch is a source change, not a
plan change.

Everything is native (``from_json`` + ``posexplode`` + ``concat``): seed
lists are small, but the same plan shape holds if a listing has 10^9
entries — one scan, no shuffle until admission.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# page:struct<list:array<struct<create_id,id>>> — the reference decodes
# these as float64 (Go encoding/json numbers, JcUx.go:60-74) and prints
# them back as integers in the URL.
LISTING_SCHEMA = "page struct<list: array<struct<create_id: double, id: double>>>"

# JcUx.go:72: "http://www.bml365.com/qy/prod/v/" + create_id + "-" + id
URL_PREFIX = "http://www.bml365.com/qy/prod/v/"

# page stride for the global seed order: (page_no, position-in-page) packed
# into one long, far beyond any real page size
_PAGE_STRIDE = 1 << 20


def product_url(create_id, id_col, prefix: str = URL_PREFIX):
    """The listing entry -> product URL projection (JcUx.go:72-73): float
    JSON numbers printed as integers."""
    return F.concat(
        F.lit(prefix),
        create_id.cast("long").cast("string"),
        F.lit("-"),
        id_col.cast("long").cast("string"),
    )


def decode_listing(
    listing: DataFrame, body_col: str = "body", prefix: str = URL_PREFIX
) -> DataFrame:
    """One row per product entry: all input columns + (pos, url).

    ``from_json`` is permissive like Go's json.Unmarshal: a malformed body
    decodes to NULL and contributes no rows (the reference logs the error
    and skips the page, JcUx.go:62-66).
    """
    parsed = listing.withColumn("_j", F.from_json(F.col(body_col), LISTING_SCHEMA))
    return (
        parsed.select("*", F.posexplode("_j.page.list").alias("pos", "_s"))
        .withColumn("url", product_url(F.col("_s.create_id"), F.col("_s.id"), prefix))
        .drop("_j", "_s")
    )


def seed_requests(
    listing: DataFrame,
    start_page: int = 1,
    page_num: int = 1,
    page_col: str = "page_no",
    body_col: str = "body",
    prefix: str = URL_PREFIX,
) -> DataFrame:
    """InitReqList(startPage, pageNum): seeds from ``page_num`` consecutive
    pages starting at ``start_page`` — pages
    ``start_page .. start_page + page_num - 1`` (the Go loop bound
    ``for i := startPage; i < startPage+pageNum; i++``, JcUx.go:50;
    pageNum is a COUNT, "一共爬多少页" = how many pages in total,
    JcUx.go:46).

    Returns the seeds schema ``(url, order)`` consumed by
    ``plans.crawl.seeds_to_candidates`` — order is the deterministic
    (page, position) rank, replacing the reference's send order (its
    goroutine puts are unordered anyway; SURVEY §5.2).
    """
    window = listing.filter(
        (F.col(page_col) >= F.lit(start_page))
        & (F.col(page_col) < F.lit(start_page + page_num))
    )
    dec = decode_listing(window, body_col=body_col, prefix=prefix)
    return dec.select(
        "url",
        (F.col(page_col).cast("long") * F.lit(_PAGE_STRIDE) + F.col("pos"))
        .cast("long")
        .alias("order"),
    )
