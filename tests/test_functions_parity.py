"""Native Spark column functions ≡ pure-Python urlnorm (which the oracle
uses). Any divergence here would silently break the e2e contract, so the
parity is tested over an adversarial URL/host table."""

from pyspark.sql import functions as F

from webcrawler_spark import urlnorm
from webcrawler_spark.functions import urls as U

HOSTS = [
    "www.example.com", "a.b.example.com", "www.example.com.cn",
    "www.example.gov.uk", "x.example.net", "example.org", "www.example.me",
    "s.example.tv", "www.example.cn", "192.168.0.1", "10.0.0.1:8080",
    "example.com", "localhost", ".com", "example.com:8080", "www.x.com.cn",
    "WWW.EXAMPLE.COM", "shop.example.co", "a.example.asia", "b.c.d.example.biz",
    "xn--fiqs8s.example.info", "www.bml365.com", "static.example.net",
    "evil.offsite.org", "x.y", "a-b.example.name", "e.mobi", "t.example.so",
]

URLS = [
    "http://www.example.com/a/b",
    "https://h.com:443/x?q=1",
    "http://h.com:8080/x",
    "http://h.com",
    "http://h.com/a/b/../c/./d?x=2",
    "http://h.com/p?q=1",
    "https://UPPER.example.COM/Path/File.HTML",
    "http://h.com/%7euser/a%2fb",
    "http://www.bml365.com/qy/prod/v/3-71",
    "http://static.example.net/img/00042.png",
    "http://h.com/a/",
    "http://h.com/?only=query",
]


def test_primary_domain_native_matches_python(spark):
    df = spark.createDataFrame([(h,) for h in HOSTS], ["host"])
    got = {
        r["host"]: r["pd"]
        for r in df.select("host", U.primary_domain(F.col("host")).alias("pd")).collect()
    }
    for h in HOSTS:
        assert got[h] == urlnorm.primary_domain(h), f"primary_domain({h!r})"


def test_url_parts_native_match_python(spark):
    canon = [urlnorm.canonicalize(u) for u in URLS]
    df = spark.createDataFrame([(c,) for c in canon], ["url"])
    rows = df.select(
        "url",
        U.url_scheme(F.col("url")).alias("scheme"),
        U.url_host(F.col("url")).alias("host"),
        U.url_path(F.col("url")).alias("path"),
        U.url_sha1(F.col("url")).alias("sha1"),
    ).collect()
    for r in rows:
        assert r["scheme"] == urlnorm.url_scheme(r["url"])
        assert r["host"] == urlnorm.url_host(r["url"])
        assert r["path"] == urlnorm.url_path(r["url"])
        assert r["sha1"] == urlnorm.sha1_hex(r["url"])


def test_canonicalize_udf_matches_python(spark):
    raw = URLS + ["not a url", "", "ftp://f.example.com/x", "mailto:a@b.com",
                  "javascript:void(0)", "//proto.relative/x"]
    df = spark.createDataFrame([(u,) for u in raw], ["url"])
    from webcrawler_spark.functions.urls import canonicalize_udf

    got = {r["url"]: r["c"] for r in df.select("url", canonicalize_udf("url").alias("c")).collect()}
    for u in raw:
        assert got[u] == urlnorm.canonicalize(u), f"canonicalize({u!r})"


def test_basename_native_matches_python(spark):
    paths = ["/a/b/c.jpg", "/a/b/", "", "/", "c.jpg", "/x//y//", "/a.b/c.d.e"]
    df = spark.createDataFrame([(p,) for p in paths], ["p"])
    got = {r["p"]: r["b"] for r in df.select("p", U.url_basename(F.col("p")).alias("b")).collect()}
    for p in paths:
        assert got[p] == urlnorm.basename(p), f"basename({p!r})"


def test_image_format_native_matches_python(spark):
    from webcrawler_spark.extract import image_format_from_content_type

    cts = ["image/png", "image/jpeg; charset=binary", "text/html", "/x", "",
           "image/", "image/gif;x;y"]
    df = spark.createDataFrame([(c,) for c in cts], ["ct"])
    got = {r["ct"]: r["f"] for r in df.select("ct", U.image_format(F.col("ct")).alias("f")).collect()}
    for c in cts:
        assert got[c] == image_format_from_content_type(c), f"image_format({c!r})"


def test_content_type_native_matches_python(spark):
    from webcrawler_spark.fixtures import content_type_for

    urls = ["http://h.com/a.jpg", "http://h.com/a.JPEG", "http://h.com/x.png?v=1",
            "http://h.com/y.gif", "http://h.com/page", "http://h.com/a.jpg.html"]
    df = spark.createDataFrame([(u,) for u in urls], ["u"])
    got = {r["u"]: r["ct"] for r in df.select("u", U.content_type_for(F.col("u")).alias("ct")).collect()}
    for u in urls:
        assert got[u] == content_type_for(u), f"content_type({u!r})"
