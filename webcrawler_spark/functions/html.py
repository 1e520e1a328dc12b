"""HTML parsing as one Arrow-vectorized pandas UDF.

The reference's analyzer runs a fixed parser list over each response body
(module/local/analyzer/analyzer.go:55-116). Here all parsers share a single
DOM parse per page inside one pandas UDF — one Python round-trip per Arrow
batch, no per-row Python UDFs (BASELINE input_hint), and the body is
naturally re-readable (the MultipleReader of toolkit/reader/reader.go:23-39
is free on a DataFrame column).

Returned struct:
    links:            array<string>  — generic a[href]   (internal/parser.go:59-86)
    img_links:        array<string>  — generic img[src]  (internal/parser.go:88-110)
    scoped_img_links: array<string>  — bm1365 scoped img (bmParser.go:92-100)
    jcux:             struct<14 strings> — JcUx record   (JcUx.go:150-224)
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

from ..extract import JCUX_FIELDS, parse_page

JCUX_SCHEMA = StructType([StructField(f, StringType()) for f in JCUX_FIELDS])

PARSE_SCHEMA = StructType(
    [
        StructField("links", ArrayType(StringType())),
        StructField("img_links", ArrayType(StringType())),
        StructField("scoped_img_links", ArrayType(StringType())),
        StructField("jcux", JCUX_SCHEMA),
        # row-level error capture: a malformed page must not fail the task
        # (reference funnels per-datum errors to the error channel,
        # scheduler/scheduler.go:240-269, and keeps crawling). Holds the
        # exception CLASS name — stable across worker/oracle stack depths.
        StructField("error", StringType()),
    ]
)


@pandas_udf(PARSE_SCHEMA)
def parse_html_udf(html: pd.Series, url: pd.Series) -> pd.DataFrame:
    links, img_links, scoped, jcux, errs = [], [], [], [], []
    for h, u in zip(html, url):
        if h is None or u is None:
            links.append(None)
            img_links.append(None)
            scoped.append(None)
            jcux.append(None)
            errs.append(None)
            continue
        try:
            pp = parse_page(h, u)
        except Exception as e:  # noqa: BLE001 — row-level capture by design
            links.append(None)
            img_links.append(None)
            scoped.append(None)
            jcux.append(None)
            errs.append(type(e).__name__)
            continue
        links.append(pp.links)
        img_links.append(pp.img_links)
        scoped.append(pp.scoped_img_links)
        jcux.append({f: pp.jcux.get(f, "") for f in JCUX_FIELDS})
        errs.append(None)
    return pd.DataFrame(
        {"links": links, "img_links": img_links, "scoped_img_links": scoped,
         "jcux": jcux, "error": errs}
    )
