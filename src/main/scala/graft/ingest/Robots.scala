package graft.ingest

/** robots.txt parsing and admission per RFC 9309 — the crawl-policy
  * gate every corpus-collection pipeline runs before a fetch (the
  * reference crawls with scrapy, which applies the same protocol via
  * ROBOTSTXT_OBEY; this is the in-engine, per-row form). Implements
  * the protocol's matching core exactly:
  *   - groups of user-agent lines sharing one rule block; the
  *     crawler uses ALL groups whose product token matches its agent
  *     case-insensitively, falling back to the `*` groups;
  *   - rule patterns with `*` wildcards and the `$` end anchor;
  *   - precedence: the LONGEST matching pattern (octet length) wins;
  *     on a tie, allow wins; no matching rule means allow;
  *   - comments (#), blank lines, unknown fields, and case-insensitive
  *     field names tolerated as the spec requires.
  * Pure per-row string work — no regex compilation in the hot path
  * (the wildcard matcher is the standard greedy single-star-backtrack
  * loop, O(|pattern|·|path|) worst case — robots.txt is UNTRUSTED
  * external input, so a matcher that can go exponential on a hostile
  * many-wildcard pattern — a slash followed by a dozen star-a pairs
  * and an anchor — is a denial-of-service door, not a parser;
  * r13 ADVICE). */
object Robots {

  final case class Rule(allow: Boolean, pattern: String)

  /** `crawlDelay`: the group's Crawl-delay directive in seconds —
    * non-standard but near-universal (Yandex/Bing honor it), and the
    * per-host politeness constant a frontier scheduler needs. A
    * malformed value is IGNORED, not loud: robots.txt is dirty
    * external input and the crawl gate must not become an outage. */
  final case class Group(agents: Seq[String], rules: Seq[Rule],
      crawlDelay: Option[Double] = None)

  def parse(text: String): Seq[Group] = {
    val groups = Seq.newBuilder[Group]
    var agents = List.empty[String]
    var rules = List.empty[Rule]
    var delay: Option[Double] = None
    var inRules = false
    def flush(): Unit = {
      if (agents.nonEmpty)
        groups += Group(agents.reverse, rules.reverse, delay)
      agents = Nil; rules = Nil; delay = None; inRules = false
    }
    text.linesIterator.foreach { raw =>
      val line = {
        val h = raw.indexOf('#')
        (if (h >= 0) raw.substring(0, h) else raw).trim
      }
      val colon = line.indexOf(':')
      if (line.nonEmpty && colon > 0) {
        val field = line.substring(0, colon).trim.toLowerCase
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            // a user-agent line after rules starts a NEW group
            if (inRules) flush()
            agents ::= value.toLowerCase
          case "allow" if agents.nonEmpty =>
            inRules = true
            if (value.nonEmpty) rules ::= Rule(allow = true, value)
          case "disallow" if agents.nonEmpty =>
            inRules = true
            // an empty Disallow means allow-all: no rule
            if (value.nonEmpty) rules ::= Rule(allow = false, value)
          case "crawl-delay" if agents.nonEmpty =>
            inRules = true
            val d = try Some(value.toDouble)
              catch { case _: NumberFormatException => None }
            // a finite non-negative delay; garbage is ignored
            delay = d.filter(v => v >= 0 && v.isFinite).orElse(delay)
          case _ => () // sitemap, unknown fields
        }
      }
    }
    flush()
    groups.result()
  }

  /** `Sitemap:` directives (sitemaps.org protocol; RFC 9309 §2.3
    * carries them as "other records"): GLOBAL, not group-scoped —
    * they apply regardless of which user-agent group they sit inside,
    * so this is a line scan, not a group walk. Values are returned in
    * file order, trimmed; empty values are dropped. This is the
    * discovery entry point a crawler actually starts from: robots.txt
    * names the sitemaps, [[Sitemap.expand]] walks them. */
  def sitemaps(text: String): Seq[String] =
    text.linesIterator.flatMap { raw =>
      val line = {
        val hash = raw.indexOf('#')
        (if (hash >= 0) raw.substring(0, hash) else raw).trim
      }
      val colon = line.indexOf(':')
      if (colon > 0 &&
          line.substring(0, colon).trim.equalsIgnoreCase("sitemap")) {
        val v = line.substring(colon + 1).trim
        if (v.nonEmpty) Some(v) else None
      } else None
    }.toSeq

  /** The Crawl-delay for `agent` under the same group selection as
    * [[allowed]] (specific groups, else the `*` groups); when several
    * chosen groups declare one, the MAX wins — the conservative read
    * a polite crawler takes. None when no chosen group declares it. */
  def crawlDelay(groups: Seq[Group], agent: String): Option[Double] = {
    val a = agent.toLowerCase
    val mine = groups.filter(_.agents.contains(a))
    val chosen = if (mine.nonEmpty) mine
      else groups.filter(_.agents.contains("*"))
    val ds = chosen.flatMap(_.crawlDelay)
    if (ds.isEmpty) None else Some(ds.max)
  }

  /** RFC 9309 §2.2.2 comparison normalization (via RFC 3986
    * §6.2.2.1-2): percent-encoded octets that decode to UNRESERVED
    * characters (ALPHA / DIGIT / `-` `.` `_` `~`) are unencoded, and
    * the hex digits of encodings that remain are uppercased — so
    * `/a%62c` and `/abc` compare equal while `%2F` (a reserved `/`)
    * stays distinct from a literal slash. Decoding can never mint a
    * `*` or `$` metacharacter (neither is unreserved), so a pattern
    * cannot gain wildcards through normalization. Malformed escapes
    * pass through untouched — robots.txt is dirty real-world input
    * and a normalizer that throws is a crawl-gate outage. */
  def normalize(s: String): String = {
    def hex(c: Char): Int =
      if (c >= '0' && c <= '9') c - '0'
      else if (c >= 'a' && c <= 'f') c - 'a' + 10
      else if (c >= 'A' && c <= 'F') c - 'A' + 10
      else -1
    def unreserved(v: Int): Boolean =
      (v >= 'A' && v <= 'Z') || (v >= 'a' && v <= 'z') ||
        (v >= '0' && v <= '9') || v == '-' || v == '.' || v == '_' ||
        v == '~'
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      val h1 = if (c == '%' && i + 2 < s.length) hex(s.charAt(i + 1)) else -1
      val h2 = if (h1 >= 0) hex(s.charAt(i + 2)) else -1
      if (h1 >= 0 && h2 >= 0) {
        val v = h1 * 16 + h2
        if (unreserved(v)) sb += v.toChar
        else {
          sb += '%'
          sb += s.charAt(i + 1).toUpper
          sb += s.charAt(i + 2).toUpper
        }
        i += 3
      } else { sb += c; i += 1 }
    }
    sb.toString
  }

  /** `pattern` against `path`: literal octets, `*` matches any run,
    * trailing `$` anchors the end; an unanchored pattern matches any
    * PREFIX of the path (the RFC 9309 rule shape). Greedy wildcard
    * match with a single backtrack point: only the MOST RECENT `*` is
    * ever reopened (one octet wider per retry), which is the classic
    * O(n·m) algorithm — reopening earlier stars can never admit a
    * match the last star misses, because the last star already spans
    * any split an earlier one would make. */
  def matches(pattern: String, path: String): Boolean = {
    val anchored = pattern.nonEmpty && pattern.last == '$'
    val pat = if (anchored) pattern.dropRight(1) else pattern
    var pi = 0; var si = 0
    var star = -1 // pattern index of the last '*' seen, -1 = none
    var mark = 0 // path index the last star currently matches up to
    while (true) {
      if (pi == pat.length) {
        // pattern consumed: a prefix match unless the $ anchor demands
        // the full path — then the leftover path can only be absorbed
        // by widening the last star
        if (!anchored || si == path.length) return true
        if (star < 0 || mark >= path.length) return false
        mark += 1; si = mark; pi = star + 1
      } else if (pat.charAt(pi) == '*') {
        star = pi; mark = si; pi += 1
      } else if (si < path.length && path.charAt(si) == pat.charAt(pi)) {
        pi += 1; si += 1
      } else if (star >= 0 && mark < path.length) {
        mark += 1; si = mark; pi = star + 1
      } else return false
    }
    false // unreachable
  }

  /** Admission for (agent, path) under the parsed groups. Patterns
    * and path compare (and rank by octet length) in their §2.2.2
    * normalized forms. */
  def allowed(groups: Seq[Group], agent: String, path: String)
      : Boolean = {
    val a = agent.toLowerCase
    val mine = groups.filter(_.agents.contains(a))
    val chosen = if (mine.nonEmpty) mine
      else groups.filter(_.agents.contains("*"))
    val np = normalize(path)
    val applicable = chosen.flatMap(_.rules)
      .map(r => Rule(r.allow, normalize(r.pattern)))
      .filter(r => matches(r.pattern, np))
    if (applicable.isEmpty) true
    else {
      val best = applicable.map(_.pattern.length).max
      // tie at the longest length → allow wins
      applicable.exists(r => r.allow && r.pattern.length == best)
    }
  }
}
