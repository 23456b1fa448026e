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

  // ---- the XPath subset the reference's sites.json actually uses ------

  private val ppItem = // playplayground shape (sites.json:48-56)
    """<div class="e-con-full e-con e-child">
      | <div class="wrap"><h2 class="elementor-heading-title big">Show &amp; Tell</h2></div>
      | <div class="elementor-widget-text-editor widget">
      |  <div><p>First para <b>bold tail</b></p><p>SECOND para</p></div>
      |  <p>direct child para</p>
      | </div>
      | <a href="/pp/9?a=1&amp;b=2">tickets</a>
      |</div>""".stripMargin

  test("xpath: contains(@class) + /text() returns FIRST text node (.get())") {
    val item = select(parse(ppItem), "div.e-con-full").head
    // sites.json:52 — /text() does NOT contain '::text', so the spider
    // takes .get(): the first text node only, entities decoded
    assert(extractData(item,
      "xpath:.//*[contains(@class, 'elementor-heading-title')]/text()")
      .contains("Show & Tell"))
  }

  test("xpath: //p[N] binds positionally PER PARENT (lxml semantics)") {
    val item = select(parse(ppItem), "div.e-con-full").head
    // //p[1] = every p that is the first p-child of its parent: the
    // inner-div's "First para" AND the widget's "direct child para";
    // document order puts the inner one first; //text() + .get() → first
    assert(extractData(item,
      "xpath:.//div[contains(@class, 'elementor-widget-text-editor')]//p[1]//text()")
      .contains("First para "))
    assert(extractData(item,
      "xpath:.//div[contains(@class, 'elementor-widget-text-editor')]//p[2]//text()")
      .contains("SECOND para"))
  }

  test("xpath: .//a/@href extracts the attribute, entities decoded") {
    val item = select(parse(ppItem), "div.e-con-full").head
    assert(extractData(item, "xpath:.//a/@href").contains("/pp/9?a=1&b=2"))
  }

  test("xpath: following-sibling::text() strip-joins ALL matches (getall)") {
    // hotels shape (sites.json:27): description lives in the text nodes
    // after the first <br> of the promoted <p> container
    val p = select(parse(
      """<p><a href="/h/1">Hotel One</a><br> The grand lobby <br>late checkout </p>"""),
      "p").head
    // '::text' IS a substring of 'following-sibling::text()' → getall-join
    assert(extractData(p, "xpath:.//br[1]/following-sibling::text()")
      .contains("The grand lobby late checkout"))
  }

  test("xpath: select() dispatches element results with real ancestors") {
    val hits = select(parse(ppItem), "xpath:.//div[contains(@class, 'wrap')]")
    assert(hits.size == 1)
    assert(nearestAncestor(hits.head, "div").isDefined)
  }

  test("xpath outside the sites.json subset throws loudly") {
    val root = parse(ppItem)
    val item = select(root, "div.e-con-full").head
    // absolute path
    intercept[IllegalArgumentException](
      select(root, "xpath://div[@class='event']"))
    // unsupported axis
    intercept[IllegalArgumentException](
      extractData(item, "xpath:.//p/ancestor::div"))
    // unsupported predicate shape
    intercept[IllegalArgumentException](
      extractData(item, "xpath:.//div[@class='wrap']/text()"))
    // unsupported function step
    intercept[IllegalArgumentException](
      extractData(item, "xpath:.//p[position()=1]/text()"))
  }
}
