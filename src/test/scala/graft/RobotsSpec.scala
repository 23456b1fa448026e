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

  test("greedy matcher: multi-star patterns, worked cases") {
    assert(Robots.matches("/a*b*c", "/aXbYc"))
    assert(Robots.matches("/a*b*c", "/abbbc")) // first b can't be greedy-stolen
    assert(Robots.matches("/a*b*c$", "/a12b34c"))
    assert(!Robots.matches("/a*b*c$", "/a12b34cd"))
    assert(Robots.matches("/a*b*c", "/a12b34cd")) // unanchored prefix
    assert(Robots.matches("*", "/anything"))
    assert(Robots.matches("**a$", "/xa"))
    assert(!Robots.matches("/a*a*a$", "/aa")) // needs three a's
    assert(Robots.matches("/a*a*a$", "/aaa"))
  }

  test("greedy matcher agrees with the brute-force recursion") {
    // the r13 rewrite (single-star-backtrack, O(n·m)) must be
    // semantics-identical to the obviously-correct exponential form it
    // replaced; exhaustively compare on a seeded random sample
    def brute(pattern: String, path: String): Boolean = {
      val anchored = pattern.nonEmpty && pattern.last == '$'
      val pat = if (anchored) pattern.dropRight(1) else pattern
      def m(pi: Int, si: Int): Boolean =
        if (pi == pat.length) !anchored || si == path.length
        else if (pat.charAt(pi) == '*')
          (si to path.length).exists(k => m(pi + 1, k))
        else si < path.length && path.charAt(si) == pat.charAt(pi) &&
          m(pi + 1, si + 1)
      m(0, 0)
    }
    val rnd = new scala.util.Random(1309)
    val patChars = "ab*"
    val pathChars = "ab"
    (1 to 4000).foreach { trial =>
      val pat0 = (0 until rnd.nextInt(8))
        .map(_ => patChars(rnd.nextInt(3))).mkString
      val pat = if (rnd.nextBoolean()) pat0 + "$" else pat0
      val path = (0 until rnd.nextInt(10))
        .map(_ => pathChars(rnd.nextInt(2))).mkString
      assert(Robots.matches(pat, path) == brute(pat, path),
        s"trial $trial: pattern '$pat' vs path '$path'")
    }
  }

  test("hostile many-star pattern completes (no exponential blowup)") {
    // robots.txt is untrusted input: the pre-r14 recursive matcher went
    // exponential on this shape; the greedy loop is O(n·m)
    val pat = "/" + ("*a" * 12) + "$"
    val path = "/" + ("a" * 3000) + "b"
    val t0 = System.nanoTime()
    assert(!Robots.matches(pat, path))
    assert(Robots.matches(pat, "/" + ("a" * 3000)))
    val ms = (System.nanoTime() - t0) / 1e6
    assert(ms < 2000, s"matcher took ${ms}ms — backtracking regressed")
  }

  test("percent-encoding normalizes before comparison (RFC 9309 §2.2.2)") {
    // unreserved octets unencode; reserved ones stay encoded with
    // uppercased hex; literal '/' never equals %2F
    assert(Robots.normalize("/a%62c") == "/abc")
    assert(Robots.normalize("/a%2fb") == "/a%2Fb")
    assert(Robots.normalize("/%7Euser") == "/~user")
    assert(Robots.normalize("/x%zz") == "/x%zz") // malformed passes through
    assert(Robots.normalize("/caf%C3%A9") == "/caf%C3%A9")
    // a rule written encoded matches a path written literal, both ways
    val g = Robots.parse(
      """User-agent: bot
        |Disallow: /priv%61te
        |Disallow: /a%2Fb
        |""".stripMargin)
    assert(!Robots.allowed(g, "bot", "/private"))
    assert(!Robots.allowed(g, "bot", "/priv%61te"))
    assert(!Robots.allowed(g, "bot", "/a%2fb")) // hex case folds
    assert(Robots.allowed(g, "bot", "/a/b")) // reserved %2F != '/'
    // decoding cannot mint metacharacters: %2A is a literal '*'
    val g2 = Robots.parse("User-agent: bot\nDisallow: /x%2Ay\n")
    assert(Robots.allowed(g2, "bot", "/xZZy"))
    assert(!Robots.allowed(g2, "bot", "/x%2Ay"))
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

  test("Sitemap directives: global line scan, not group-scoped") {
    val t =
      """User-agent: a
        |Sitemap: https://x/one.xml
        |Disallow: /p
        |
        |User-agent: *
        |Disallow: /
        |SITEMAP: https://x/two.xml.gz   # trailing comment
        |sitemap:
        |Sitemap: https://x/three.xml
        |""".stripMargin
    // all three, in file order, regardless of the group they sit in;
    // the empty value and the comment are dropped; case-insensitive
    assert(Robots.sitemaps(t) == Seq("https://x/one.xml",
      "https://x/two.xml.gz", "https://x/three.xml"))
    // the URL's own colon must not be mistaken for the field colon
    assert(Robots.sitemaps("Sitemap: https://h:8443/s.xml") ==
      Seq("https://h:8443/s.xml"))
    assert(Robots.sitemaps("User-agent: *\nDisallow: /\n").isEmpty)
  }

  test("Crawl-delay: parsed per group, selected like allowed()") {
    val g = Robots.parse(
      """User-agent: fast
        |Crawl-delay: 0.5
        |Disallow: /x
        |
        |User-agent: *
        |Crawl-delay: 9
        |Disallow: /
        |""".stripMargin)
    // the agent's own group wins; strangers fall back to the * group
    assert(Robots.crawlDelay(g, "Fast").contains(0.5))
    assert(Robots.crawlDelay(g, "other").contains(9.0))
    // an agent with its OWN delay-less group does NOT inherit the *
    // group's delay — group selection, not line scraping
    val own = Robots.parse(
      "User-agent: bot\nDisallow: /x\n\n" +
        "User-agent: *\nCrawl-delay: 7\nDisallow: /\n")
    assert(Robots.crawlDelay(own, "bot").isEmpty)
    assert(Robots.crawlDelay(own, "anyone").contains(7.0))
    // several matching groups: the conservative MAX wins
    val multi = Robots.parse(
      "User-agent: bot\nCrawl-delay: 2\nDisallow: /a\n\n" +
        "User-agent: bot\nCrawl-delay: 5\nDisallow: /b\n")
    assert(Robots.crawlDelay(multi, "bot").contains(5.0))
    // malformed / negative / non-finite values are ignored, not loud
    assert(Robots.crawlDelay(Robots.parse(
      "User-agent: bot\nCrawl-delay: soon\nDisallow: /\n"),
      "bot").isEmpty)
    assert(Robots.crawlDelay(Robots.parse(
      "User-agent: bot\nCrawl-delay: -3\nDisallow: /\n"),
      "bot").isEmpty)
    // a crawl-delay line still belongs to its group: a user-agent
    // line AFTER it starts a new group
    val split = Robots.parse(
      "User-agent: a\nCrawl-delay: 2\nUser-agent: b\nDisallow: /\n")
    assert(split.length == 2 &&
      Robots.crawlDelay(split, "a").contains(2.0) &&
      Robots.crawlDelay(split, "b").isEmpty)
  }
}
