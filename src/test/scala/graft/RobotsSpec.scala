package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ingest.Robots

/** RFC 9309 protocol corner cases, hand-worked from the spec (§2.2
  * group selection, §2.2.2 special characters, §2.2.2 precedence). */
class RobotsSpec extends AnyFunSuite {

  private val txt =
    """# policy
      |User-Agent: alphabot
      |User-Agent: betabot
      |Disallow: /cgi-bin/
      |Allow: /cgi-bin/public*
      |
      |User-agent: *
      |Disallow: /secret$
      |Disallow:
      |Sitemap: https://x/sitemap.xml
      |""".stripMargin

  test("group selection: matching token, stacked agents, * fallback") {
    val g = Robots.parse(txt)
    assert(g.length == 2)
    assert(g.head.agents == Seq("alphabot", "betabot"))
    // both stacked agents share the rule block
    assert(!Robots.allowed(g, "AlphaBot", "/cgi-bin/x"))
    assert(!Robots.allowed(g, "betabot", "/cgi-bin/x"))
    // unmatched agents fall back to the * group — the alphabot rules
    // must NOT leak onto them
    assert(Robots.allowed(g, "gammabot", "/cgi-bin/x"))
    assert(!Robots.allowed(g, "gammabot", "/secret"))
  }

  test("wildcard and $ anchor match per §2.2.2") {
    assert(Robots.matches("/private*", "/private"))
    assert(Robots.matches("/private*", "/privateer"))
    assert(Robots.matches("/a*b$", "/aXXXb"))
    assert(!Robots.matches("/a*b$", "/aXXXbc")) // anchored
    assert(Robots.matches("/a*b", "/aXXXbc")) // unanchored prefix
    assert(!Robots.matches("/secret$", "/secret/deep"))
    assert(Robots.matches("*.pdf$", "/docs/x.pdf"))
    assert(!Robots.matches("*.pdf$", "/docs/x.pdfx"))
  }

  test("precedence: longest match wins; tie goes to allow") {
    val g = Robots.parse(
      """User-agent: bot
        |Disallow: /p
        |Allow: /page
        |Disallow: /page
        |""".stripMargin)
    // /page matches Disallow /p (2), Allow /page (5), Disallow /page
    // (5): longest is 5 twice -> allow wins the tie
    assert(Robots.allowed(g, "bot", "/page"))
    // /px matches only Disallow /p
    assert(!Robots.allowed(g, "bot", "/px"))
    // nothing matches -> allow
    assert(Robots.allowed(g, "bot", "/other"))
  }

  test("empty Disallow means allow-all; unknown fields ignored") {
    val g = Robots.parse(
      """User-agent: bot
        |Disallow:
        |Crawl-delay: 10
        |""".stripMargin)
    assert(Robots.allowed(g, "bot", "/anything"))
    // no groups at all -> allow
    assert(Robots.allowed(Seq.empty, "bot", "/anything"))
  }

  test("a user-agent line after rules starts a new group") {
    val g = Robots.parse(
      """User-agent: a
        |Disallow: /x
        |User-agent: b
        |Disallow: /y
        |""".stripMargin)
    assert(g.length == 2)
    assert(!Robots.allowed(g, "a", "/x") && Robots.allowed(g, "a", "/y"))
    assert(Robots.allowed(g, "b", "/x") && !Robots.allowed(g, "b", "/y"))
  }
}
