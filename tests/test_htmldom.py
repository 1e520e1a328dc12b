from webcrawler_spark import htmldom
from webcrawler_spark.extract import (
    extract_jcux,
    extract_links,
    extract_scoped_img_links,
    fields_join,
    image_format_from_content_type,
    parse_page,
)

PAGE = """
<html><body>
<div class="visible-xs-block">
  <div class="bread"><div><p>
    <a href="/">home</a><a href="/c">cat</a><a href="/c1">C1</a><a href="/c2">C2</a><a href="/c3">C3</a>
  </p></div></div>
  <div style="x">
    <div class="col-sm-7">
      <div style="y">
        <h3>  Product Title </h3>
        <p>适用范围: farms and fields </p>
        <p>价格:¥12.50</p>
        <p>产地 : China</p>
        <p>生产厂家:ACME 化工</p>
        <p>代理公司:</p>
        <p>电话:123:456</p>
        <p>nocolonline</p>
        <p>邮箱: a@b.com </p>
      </div>
    </div>
  </div>
  <div class="prod_detail">
    Hello   world
    <b>加粗 文本</b>
    <img src="/img/one.jpg"><img src="#"><img src="two.png">
    tail	text
  </div>
</div>
<div class="yyal"><img src="/img/three.gif"></div>
<div class="jdgz"><img src="http://cdn.example.com/four.jpeg"></div>
<a href="page2.html">next</a>
<a href="#">nope</a>
<a href="JAVASCRIPT:void(0)">nope</a>
<a href="">nope</a>
<a href="/">nope</a>
<a href="ftp://files.example.com/f">ftp</a>
</body></html>
"""


def test_find_document_order_and_classes():
    dom = htmldom.parse(PAGE)
    anchors = htmldom.find(dom, ".visible-xs-block .bread div p a")
    assert [a.text() for a in anchors] == ["home", "cat", "C1", "C2", "C3"]
    assert htmldom.find(dom, "div[style]")  # attr presence selector


def test_text_concatenation():
    dom = htmldom.parse("<div>a<b>b</b>c<i>d<u>e</u></i>f</div>")
    assert htmldom.find(dom, "div")[0].text() == "abcdef"


def test_fields_join_deletes_all_whitespace():
    assert fields_join(" a  b\tc\nd ") == "abcd"
    assert fields_join("加粗 文本") == "加粗文本"
    # unicode spaces (strings.Fields splits on unicode whitespace)
    assert fields_join("a　b") == "ab"


def test_jcux_extraction():
    dom = htmldom.parse(PAGE)
    rec = extract_jcux(dom)
    assert rec["category1"] == "C1"
    assert rec["category2"] == "C2"
    assert rec["category3"] == "C3"
    assert rec["title"] == "  Product Title "  # h3 text NOT trimmed (JcUx.go:165)
    assert rec["scope"] == "farms and fields"
    assert rec["price"] == "¥12.50"
    assert rec["origin"] == "China"
    assert rec["manufacturer"] == "ACME 化工"
    assert rec["agency"] == ""          # empty value after colon
    assert rec["phone"] == "123"        # split(":")[1] only — extra colon drops "456"
    assert rec["email"] == "a@b.com"
    assert rec["info"] == "HelloworldHelloworld".replace("HelloworldHelloworld", "Helloworld加粗文本tailtext")
    assert rec["images"] == "one.jpg,two.png,three.gif,four.jpeg"


def test_link_extraction_filters():
    dom = htmldom.parse(PAGE)
    links = extract_links(dom, "http://www.shop.com/prod/1")
    # breadcrumb hrefs: "/" filtered, "/c*" resolved; page2 relative resolved;
    # "#", javascript, "" and "/" filtered; ftp kept here (scheme filter is
    # admission's job, scheduler.go:545 — parser does not reject schemes)
    assert "http://www.shop.com/c" in links
    assert "http://www.shop.com/prod/page2.html" in links
    assert "ftp://files.example.com/f" in links
    assert not any(l.lower().startswith("javascript") for l in links)
    assert "http://www.shop.com/" not in links  # "/" href pre-filtered


def test_scoped_img_links_order():
    dom = htmldom.parse(PAGE)
    imgs = extract_scoped_img_links(dom, "http://www.shop.com/prod/1")
    assert imgs == [
        "http://www.shop.com/img/one.jpg",
        "http://www.shop.com/prod/two.png",
        "http://www.shop.com/img/three.gif",
        "http://cdn.example.com/four.jpeg",
    ]


def test_image_format():
    assert image_format_from_content_type("image/png") == "png"
    assert image_format_from_content_type("image/jpeg; charset=binary") == "jpeg"
    assert image_format_from_content_type("text/html") == "html"  # i1>0 branch
    assert image_format_from_content_type("/x") == ""
    assert image_format_from_content_type("") == ""


def test_parse_page_bundle():
    pp = parse_page(PAGE.encode("utf-8"), "http://www.shop.com/prod/1")
    assert pp.jcux["category1"] == "C1"
    assert len(pp.scoped_img_links) == 4
    assert len(pp.img_links) == 4  # generic: same srcs ("#" filtered)
