package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Sitemap

/** sitemaps.org discovery walk: urlset leaves, index recursion over
  * gzipped members, and the loud refusals (depth, cycle, locless
  * entry, foreign root element). */
class SitemapSpec extends AnyFunSuite {

  private def gz(s: String): Array[Byte] = {
    val bo = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bo)
    g.write(s.getBytes("UTF-8")); g.close()
    bo.toByteArray
  }

  private def urlset(urls: (String, String)*): String =
    "<?xml version=\"1.0\"?><urlset>" + urls.map { case (l, p) =>
      s"<url><loc>$l</loc><priority>$p</priority></url>"
    }.mkString + "</urlset>"

  private def index(locs: String*): String =
    "<?xml version=\"1.0\"?><sitemapindex>" +
      locs.map(l => s"<sitemap><loc>$l</loc></sitemap>").mkString +
      "</sitemapindex>"

  private def fetcher(m: Map[String, Array[Byte]])
      : String => Array[Byte] =
    u => m.getOrElse(u, throw new IllegalArgumentException(s"404 $u"))

  test("flat urlset: loc and priority extracted in order") {
    val got = Sitemap.expand(
      fetcher(Map("root" -> urlset(
        ("https://a/x", "0.5"), ("https://a/y", "0.8")).getBytes("UTF-8"))),
      "root")
    assert(got.map(_("loc")) == Seq("https://a/x", "https://a/y"))
    assert(got.map(_("pri")) == Seq("0.5", "0.8"))
  }

  test("index of gzipped urlsets: inflated and walked depth-first") {
    val m = Map(
      "root" -> index("c1", "c2").getBytes("UTF-8"),
      "c1" -> gz(urlset(("https://a/1", "0.1"))),
      "c2" -> gz(urlset(("https://a/2", "0.2"), ("https://a/3", "0.3"))))
    val got = Sitemap.expand(fetcher(m), "root")
    assert(got.map(_("loc")) ==
      Seq("https://a/1", "https://a/2", "https://a/3"))
  }

  test("two-level index recursion (gzipped index member too)") {
    val m = Map(
      "root" -> index("mid").getBytes("UTF-8"),
      "mid" -> gz(index("leaf")),
      "leaf" -> gz(urlset(("https://a/only", "0.9"))))
    assert(Sitemap.expand(fetcher(m), "root").map(_("loc")) ==
      Seq("https://a/only"))
  }

  test("nesting past maxDepth refuses loudly") {
    val m = Map(
      "d1" -> index("d2").getBytes("UTF-8"),
      "d2" -> index("d3").getBytes("UTF-8"),
      "d3" -> index("d4").getBytes("UTF-8"),
      "d4" -> urlset(("https://a/deep", "0.1")).getBytes("UTF-8"))
    // depth 4 chain fits the default cap...
    assert(Sitemap.expand(fetcher(m), "d1").nonEmpty)
    // ...a cap of 3 refuses at d4
    val e = intercept[IllegalArgumentException](
      Sitemap.expand(fetcher(m), "d1", maxDepth = 3))
    assert(e.getMessage.contains("depth"))
  }

  test("cycles refuse loudly (self-loop and mutual)") {
    val self = Map("r" -> index("r").getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException](
      Sitemap.expand(fetcher(self), "r")).getMessage.contains("cycle"))
    val mutual = Map(
      "a" -> index("b").getBytes("UTF-8"),
      "b" -> index("a").getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException](
      Sitemap.expand(fetcher(mutual), "a")).getMessage.contains("cycle"))
  }

  test("index entry without <loc> refuses; foreign root refuses") {
    val locless = Map("r" ->
      "<sitemapindex><sitemap><lastmod>2026</lastmod></sitemap></sitemapindex>"
        .getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException](
      Sitemap.expand(fetcher(locless), "r")).getMessage.contains("loc"))
    val foreign = Map("r" -> "<html><body>nope</body></html>".getBytes("UTF-8"))
    assert(intercept[IllegalArgumentException](
      Sitemap.expand(fetcher(foreign), "r")).getMessage.contains("html"))
  }

  test("gunzipIfNeeded: gz inflates, plain bytes pass through") {
    val plain = "hello".getBytes("UTF-8")
    assert(Sitemap.gunzipIfNeeded(plain).sameElements(plain))
    assert(new String(Sitemap.gunzipIfNeeded(gz("hello")), "UTF-8") == "hello")
  }
}
