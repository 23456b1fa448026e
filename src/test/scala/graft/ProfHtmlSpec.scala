package graft
import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.{HtmlCodec, Robots}

class ProfHtmlSpec extends AnyFunSuite {
  test("profile html parse/select") {
    val html =
      s"""<html><head><title>P 1-2</title>
         |<META Name="ROBOTS" Content="index, follow">
         |<link rel="canonical" href="https://site1.example/pub">
         |</head><body><p>page 2</p></body></html>""".stripMargin
    val n = 200000
    // warm
    (0 until 20000).foreach(_ => HtmlCodec.parse(html))
    var t0 = System.nanoTime()
    var i = 0
    while (i < n) { HtmlCodec.parse(html); i += 1 }
    val tParse = (System.nanoTime() - t0) / 1e3 / n
    val root = HtmlCodec.parse(html)
    (0 until 20000).foreach(_ => HtmlCodec.select(root, "meta"))
    t0 = System.nanoTime(); i = 0
    while (i < n) { HtmlCodec.select(root, "meta"); HtmlCodec.select(root, "link"); i += 1 }
    val tSel = (System.nanoTime() - t0) / 1e3 / n
    val robotsTxt = "User-Agent: graftbot\r\nDisallow: /private*\r\n\r\nUser-agent: *\r\nDisallow: /\r\n"
    val groups = Robots.parse(robotsTxt)
    (0 until 20000).foreach(_ => Robots.allowed(groups, "graftbot", "/private/pub"))
    t0 = System.nanoTime(); i = 0
    while (i < n) { Robots.allowed(groups, "graftbot", "/private/pub"); i += 1 }
    val tRob = (System.nanoTime() - t0) / 1e3 / n
    t0 = System.nanoTime(); i = 0
    var acc = 0
    while (i < n) {
      val h = s"""<html><head><title>P 1-$i</title>
         |<META Name="ROBOTS" Content="index, follow">
         |<link rel="canonical" href="https://site1.example/pub">
         |</head><body><p>page $i</p></body></html>""".stripMargin
      acc += h.length; i += 1
    }
    val tStr = (System.nanoTime() - t0) / 1e3 / n
    info(f"parse=$tParse%.2fus select2=$tSel%.2fus robots=$tRob%.2fus strbuild=$tStr%.2fus acc=$acc")
    assert(true)
  }
}
