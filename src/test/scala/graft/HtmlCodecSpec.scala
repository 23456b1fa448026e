package graft

import graft.ingest.HtmlCodec
import graft.ingest.HtmlCodec._

/** U5 closure: the tolerant HTML parser + the selector surface of the
  * reference's config-driven spider (container mode, anchor mode,
  * ::text / ::attr / outer-HTML fields), against hand-built pages. */
class HtmlCodecSpec extends org.scalatest.funsuite.AnyFunSuite {

  private val page =
    """<!DOCTYPE html>
      |<html><head>
      |<script>var trap = "<div class='event'>not real</div>";</script>
      |<style>.event { color: red; }</style>
      |<!-- <div class="event">commented out</div> -->
      |</head><body>
      |<div class="listing">
      | <div class="event" id="e1">
      |  <h2 class="title">First &amp; Foremost</h2>
      |  <a href="/e/1?a=1&amp;b=2">more</a>
      |  <p class="desc"> Great   show </p>
      | </div>
      | <div class="event promo" id="e2">
      |  <h2 class="title">Second<br>Act</h2>
      | </div>
      |</div>
      |<img src=x><hr/>
      |</body></html>""".stripMargin

  test("parser: comments, doctype, script/style bodies never match") {
    assert(select(parse(page), "div.event").size == 2)
    assert(select(parse(page), "script").size == 1)
    // the div inside the JS string is not an element
    assert(select(parse(page), "div").size == 3)
  }

  test("selectors: compounds, #id, descendant and child combinators") {
    val root = parse(page)
    assert(select(root, "div.event.promo").map(_.el.attrs("id")) == Seq("e2"))
    assert(select(root, "#e1 h2.title").size == 1)
    assert(select(root, "div.listing > div.event").size == 2)
    assert(select(root, "body > h2").isEmpty) // h2 is not a direct child
    assert(select(root, "span.missing").isEmpty)
  }

  test("::text joins stripped parts; entities decode; <br> splits nodes") {
    val root = parse(page)
    val e1 = select(root, "#e1").head
    assert(extractData(e1, "h2.title::text").contains("First & Foremost"))
    assert(extractData(e1, "p.desc::text").contains("Great   show"))
    val e2 = select(root, "#e2").head
    assert(extractData(e2, "h2.title::text").contains("Second Act"))
    assert(extractData(e1, "a::attr(href)").contains("/e/1?a=1&b=2"))
    assert(extractData(e1, "span.missing::text").isEmpty)
  }

  test("plain selector returns outer HTML (Scrapy .get())") {
    val root = parse("<div><p class=solo>hi &amp; bye</p></div>")
    val d = select(root, "div").head
    assert(extractData(d, "p").contains(
      """<p class="solo">hi &amp; bye</p>"""))
  }

  test("container-mode extraction mirrors the reference") {
    val items = extractItems(page, HtmlConfig(
      itemContainerSelector = Some("div.event"),
      defaults = Map("source" -> "test", "category" -> "music"),
      fields = Map("name" -> "h2.title::text", "url" -> "a::attr(href)",
        "description" -> "p.desc::text")))
    assert(items.size == 2)
    assert(items.head == Map("source" -> "test", "category" -> "music",
      "name" -> "First & Foremost", "url" -> "/e/1?a=1&b=2",
      "description" -> "Great   show"))
    // second item has no anchor/desc: defaults survive, fields absent
    assert(items(1) == Map("source" -> "test", "category" -> "music",
      "name" -> "Second Act"))
  }

  test("anchor-mode: ancestor promotion and name_filter_out") {
    val ul =
      """<ul>
        | <li class="row"><div><a class="lnk" href="/a">Alpha Night</a></div>
        |  <p class="desc">first</p></li>
        | <li class="row"><a class="lnk" href="/b">SKIP Beta</a>
        |  <p class="desc">second</p></li>
        |</ul>""".stripMargin
    val items = extractItems(ul, HtmlConfig(
      itemAnchorSelector = Some("a.lnk"),
      parentContainerTag = "li",
      nameFilterOut = Some("SKIP"),
      fields = Map("name" -> "a.lnk::text", "url" -> "a.lnk::attr(href)",
        "description" -> "p.desc::text")))
    // the anchor is nested a div deeper: ancestor::li[1] still finds it
    assert(items == Seq(Map("name" -> "Alpha Night", "url" -> "/a",
      "description" -> "first")))
  }

  test("tolerance: unclosed tags, stray close tags, bare attributes") {
    val r = parse("<div class=box><p>one<p>two</div></span><p>tail")
    assert(select(r, "div.box").size == 1)
    assert(extractData(Hit(Nil, r), "div.box::text").contains("one two"))
    assert(extractData(Hit(Nil, r), "::text").contains("one two tail"))
  }

  test("xpath selectors are declared out, loudly") {
    intercept[IllegalArgumentException](
      select(parse(page), "xpath://div[@class='event']"))
  }
}
