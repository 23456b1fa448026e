package graft.ingest

/** In-engine HTML field extraction — closes the U5 "live CSS/XPath"
  * stance with the same discipline as the other binary codecs: a
  * tolerant HTML parser plus the exact selector surface the reference's
  * config-driven spider uses (generic_spider.py:30-90), pure Scala, no
  * external parser.
  *
  * Supported, because the reference's configs use them:
  *   - CSS: tag / .class / #id compounds, descendant (space) and child
  *     (`>`) combinators, `::text` (all descendant text nodes, each
  *     stripped, blank-dropped, space-joined — Scrapy's getall() shape)
  *     and `::attr(name)` (first match), plain selector → outer HTML of
  *     the first match (Scrapy's .get()).
  *   - The anchor mode's `ancestor::TAG[1]` lookup (nearest enclosing).
  *   - XPath (`xpath:` prefix): exactly the subset the reference's own
  *     sites.json uses, via XPathLite — descendant `.//`,
  *     `contains(@attr, …)`, per-parent positional `[N]`, `/text()`,
  *     `//text()`, `/@attr`, `following-sibling::text()` — with the
  *     spider's get-vs-getall dispatch (see extractData).
  * Declared OUT, loudly: XPath outside that subset (XPathLite throws).
  *
  * Parser tolerance mirrors what browsers guarantee and spiders rely
  * on: void elements self-close, unmatched close tags are dropped,
  * comments/doctype skipped, script/style bodies consumed raw and
  * EXCLUDED from text (a selector in a JS string literal must not
  * match), standard entities decoded. Extraction is per-row executor
  * work over a string column — same 100 TB envelope as the codecs.
  */
object HtmlCodec {

  sealed trait HNode
  final case class HText(text: String) extends HNode
  final case class HElem(tag: String, attrs: Map[String, String],
      children: Vector[HNode]) extends HNode

  private val voidTags = Set("area", "base", "br", "col", "embed", "hr",
    "img", "input", "link", "meta", "source", "track", "wbr")
  private val rawTags = Set("script", "style")

  /** toLowerCase with an allocation-free fast path for strings that are
    * already caseless ASCII — the overwhelmingly common tag/attr case,
    * and parse runs per document row on the crawl-spine hot paths. Any
    * A-Z or non-ASCII char falls back to the exact original behavior. */
  private def lowerAscii(s: String): String = {
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c >= 'A' && c <= 'Z' || c >= 128) return s.toLowerCase
      i += 1
    }
    s
  }

  /** Case-insensitive indexOf without lowercasing the whole haystack
    * (the raw-tag close scan did `html.toLowerCase` PER script/style
    * tag). `needle` is ASCII by construction ("</" + tag). */
  private def indexOfIgnoreCase(hay: String, needle: String,
      from: Int): Int = {
    val n = needle.length
    var i = math.max(from, 0)
    val max = hay.length - n
    while (i <= max) {
      if (hay.regionMatches(true, i, needle, 0, n)) return i
      i += 1
    }
    -1
  }

  /** Parse an HTML document into a synthetic root element. */
  def parse(html: String): HElem = {
    // mutable frame stack: (tag, attrs, children-so-far)
    val stack = collection.mutable.Stack[
      (String, Map[String, String], collection.mutable.ArrayBuffer[HNode])]()
    stack.push(("", Map.empty, collection.mutable.ArrayBuffer.empty))
    val n = html.length
    var i = 0
    def emitText(s: String): Unit =
      if (s.nonEmpty) stack.top._3 += HText(decodeEntities(s))
    def closeTo(tag: String): Unit =
      if (stack.exists(_._1 == tag)) {
        var done = false
        while (!done) {
          val (t, a, kids) = stack.pop()
          stack.top._3 += HElem(t, a, kids.toVector)
          done = t == tag
        }
      } // unmatched close tag: dropped
    while (i < n) {
      val lt = html.indexOf('<', i)
      if (lt < 0) { emitText(html.substring(i)); i = n }
      else {
        emitText(html.substring(i, lt))
        if (html.startsWith("<!--", lt)) {
          val e = html.indexOf("-->", lt)
          i = if (e < 0) n else e + 3
        } else if (html.startsWith("<!", lt)) {
          val e = html.indexOf('>', lt)
          i = if (e < 0) n else e + 1
        } else if (html.startsWith("</", lt)) {
          val e = html.indexOf('>', lt)
          val tag = lowerAscii(html.substring(lt + 2, if (e < 0) n else e)
            .trim)
          closeTo(tag)
          i = if (e < 0) n else e + 1
        } else {
          val (tag, attrs, selfClose, after) = parseTag(html, lt)
          if (tag.isEmpty) { emitText("<"); i = lt + 1 } // stray '<'
          else if (rawTags(tag) && !selfClose) {
            // raw text element: consume to the matching close tag and
            // DISCARD the body — markup inside JS/CSS must never match
            val close = indexOfIgnoreCase(html, s"</$tag", after)
            stack.top._3 += HElem(tag, attrs, Vector.empty)
            i = if (close < 0) n
                else html.indexOf('>', close) match {
                  case -1 => n
                  case e => e + 1
                }
          } else if (selfClose || voidTags(tag)) {
            stack.top._3 += HElem(tag, attrs, Vector.empty)
            i = after
          } else {
            stack.push((tag, attrs,
              collection.mutable.ArrayBuffer.empty[HNode]))
            i = after
          }
        }
      }
    }
    while (stack.size > 1) { // unclosed elements at EOF
      val (t, a, kids) = stack.pop()
      stack.top._3 += HElem(t, a, kids.toVector)
    }
    val (_, _, kids) = stack.pop()
    HElem("", Map.empty, kids.toVector)
  }

  /** (tag, attrs, selfClosing, indexAfterGt); tag "" = not a tag. */
  private def parseTag(html: String, lt: Int)
      : (String, Map[String, String], Boolean, Int) = {
    val n = html.length
    var i = lt + 1
    val t0 = i
    while (i < n && (html(i).isLetterOrDigit || html(i) == '-')) i += 1
    if (i == t0) return ("", Map.empty, false, i)
    val tag = lowerAscii(html.substring(t0, i))
    val attrs = Map.newBuilder[String, String]
    var selfClose = false
    var done = false
    while (!done && i < n) {
      while (i < n && html(i).isWhitespace) i += 1
      if (i < n && html(i) == '>') { done = true; i += 1 }
      else if (i < n && html(i) == '/') {
        selfClose = true; i += 1
      } else if (i < n) {
        val a0 = i
        while (i < n && !html(i).isWhitespace && html(i) != '=' &&
          html(i) != '>' && html(i) != '/') i += 1
        val name = lowerAscii(html.substring(a0, i))
        while (i < n && html(i).isWhitespace) i += 1
        if (i < n && html(i) == '=') {
          i += 1
          while (i < n && html(i).isWhitespace) i += 1
          val v =
            if (i < n && (html(i) == '"' || html(i) == '\'')) {
              val q = html(i); i += 1
              val v0 = i
              while (i < n && html(i) != q) i += 1
              val s = html.substring(v0, i)
              if (i < n) i += 1
              s
            } else {
              val v0 = i
              while (i < n && !html(i).isWhitespace && html(i) != '>') i += 1
              html.substring(v0, i)
            }
          if (name.nonEmpty) attrs += name -> decodeEntities(v)
        } else if (name.nonEmpty) attrs += name -> ""
      }
    }
    (tag, attrs.result(), selfClose, i)
  }

  private[graft] def decodeEntities(s: String): String =
    if (!s.contains('&')) s
    else {
      val sb = new StringBuilder(s.length)
      var i = 0
      while (i < s.length) {
        if (s(i) == '&') {
          val sc = s.indexOf(';', i)
          val ent = if (sc > i && sc - i <= 10) s.substring(i + 1, sc) else ""
          val decoded: Option[String] = ent match {
            case "amp" => Some("&")
            case "lt" => Some("<")
            case "gt" => Some(">")
            case "quot" => Some("\"")
            case "apos" => Some("'")
            case "nbsp" => Some(" ")
            case e if e.startsWith("#x") || e.startsWith("#X") =>
              scala.util.Try(Integer.parseInt(e.drop(2), 16).toChar.toString)
                .toOption
            case e if e.startsWith("#") =>
              scala.util.Try(e.drop(1).toInt.toChar.toString).toOption
            case _ => None
          }
          decoded match {
            case Some(d) => sb.append(d); i = sc + 1
            case None => sb.append('&'); i += 1
          }
        } else { sb.append(s(i)); i += 1 }
      }
      sb.toString
    }

  // ---- selector engine -------------------------------------------------

  /** One compound: optional tag + required classes/id. */
  private final case class Simple(tag: Option[String], classes: Seq[String],
      id: Option[String], childOfPrev: Boolean) {
    def matches(e: HElem): Boolean =
      tag.forall(_ == e.tag) &&
        id.forall(e.attrs.get("id").contains(_)) && {
          lazy val cs = e.attrs.getOrElse("class", "")
            .split("\\s+").filter(_.nonEmpty).toSet
          classes.forall(cs.contains)
        }
  }

  // parsed-selector memo: a config carries a handful of selector
  // strings and extraction runs PER DOCUMENT ROW (q180/q202), so
  // re-parsing — two regex compiles per selector part — is per-row
  // executor waste (the r9-ADVICE class). Bounded; misses parse fresh.
  private val SelectorCache = new java.util.concurrent.ConcurrentHashMap[
    String, Seq[Simple]]()
  private def parseSelector(sel: String): Seq[Simple] = {
    val cached = SelectorCache.get(sel)
    if (cached != null) return cached
    val parsed = parseSelectorUncached(sel)
    if (SelectorCache.size < 1024) SelectorCache.put(sel, parsed)
    parsed
  }

  private val SelPart = "^([a-zA-Z0-9-]+)?((?:[.#][a-zA-Z0-9_-]+)*)$".r
  private val SelQual = "[.#][a-zA-Z0-9_-]+".r

  private def parseSelectorUncached(sel: String): Seq[Simple] = {
    require(!sel.startsWith("xpath:"),
      s"xpath: selector reached the CSS parser (dispatch bug): $sel")
    val s = sel.stripPrefix("css:").trim
    require(s.nonEmpty, "empty selector")
    val out = Seq.newBuilder[Simple]
    var childNext = false
    for (tok <- s.split("\\s+") if tok.nonEmpty) {
      if (tok == ">") childNext = true
      else {
        // a token may carry glued > combinators: a>b
        for ((part, k) <- tok.split(">").zipWithIndex if part.nonEmpty) {
          val m = SelPart.findFirstMatchIn(part).getOrElse(
              throw new IllegalArgumentException(s"bad selector part: $part"))
          val quals = SelQual
            .findAllIn(Option(m.group(2)).getOrElse("")).toSeq
          out += Simple(Option(m.group(1)).map(_.toLowerCase),
            quals.filter(_.startsWith(".")).map(_.drop(1)),
            quals.find(_.startsWith("#")).map(_.drop(1)),
            childOfPrev = childNext || k > 0)
          childNext = false
        }
      }
    }
    val r = out.result()
    require(r.nonEmpty, s"no simple selectors in: $sel")
    r
  }

  /** A match: the element plus its ancestor chain (root..parent). */
  final case class Hit(ancestors: List[HElem], el: HElem)

  /** All elements in root's subtree (descendant-or-self, Scrapy's css
    * translation) matching the selector, document order. `xpath:`
    * selectors route through XPathLite (generic_spider.py:79-82). */
  def select(root: HElem, selector: String): Seq[Hit] = {
    if (selector.startsWith("xpath:")) {
      val results = XPathLite.eval(root, selector.stripPrefix("xpath:"))
      // an item/container selector must yield ELEMENTS — an xpath
      // ending in /text() or /@attr here is a misconfiguration and
      // must fail loudly (the perimeter contract), not return an
      // empty item list that reads as "page had no items"
      require(results.forall {
        case XPathLite.RNode(c) => c.node.isInstanceOf[HElem]
        case _ => false
      }, s"xpath selector '$selector' yields text/attribute results; " +
        "an item selector must select elements")
      return results.collect {
        case XPathLite.RNode(c) if c.node.isInstanceOf[HElem] =>
          Hit(XPathLite.ancestorsOf(c), c.node.asInstanceOf[HElem])
      }
    }
    val (sels, _) = splitPseudo(selector)
    val chain = parseSelector(sels)
    val hits = Seq.newBuilder[Hit]
    // ancestor chain as a push/pop buffer — the `anc :+ e` form copied
    // the list per visited node; the List materializes only on a hit
    val anc = collection.mutable.ArrayBuffer.empty[HElem]
    def walk(e: HElem): Unit = {
      if (chainMatches(chain, anc, e)) hits += Hit(anc.toList, e)
      anc += e
      e.children.foreach { case c: HElem => walk(c); case _ => }
      anc.remove(anc.length - 1)
    }
    walk(root)
    hits.result()
  }

  /** e matches last simple; earlier simples embed into the ancestor
    * list (child combinator = immediate parent). Ancestors BELOW the
    * subtree root still count for combinators, matching Scrapy. */
  private def chainMatches(chain: Seq[Simple],
      anc: scala.collection.Seq[HElem], e: HElem): Boolean = {
    if (!chain.last.matches(e)) return false
    if (chain.length == 1) return true // fit(Nil, …) is uniformly true
    // right-to-left over remaining simples and available ancestors
    def fit(rest: List[Simple], pool: scala.collection.Seq[HElem],
        mustBeLast: Boolean): Boolean = rest match {
      case Nil => true
      case s :: tail =>
        if (mustBeLast)
          pool.nonEmpty && s.matches(pool.last) &&
            fit(tail, pool.init, s.childOfPrev)
        else pool.zipWithIndex.reverse.exists { case (p, idx) =>
          s.matches(p) && fit(tail, pool.take(idx), s.childOfPrev)
        }
    }
    fit(chain.init.reverse.toList, anc, chain.last.childOfPrev)
  }

  private def splitPseudo(selector: String): (String, Option[String]) = {
    val i = selector.indexOf("::")
    if (i < 0) (selector, None)
    else (selector.substring(0, i).trim, Some(selector.substring(i + 2)))
  }

  /** Scrapy `.css(sel).getall()` joined — every matching node's
    * descendant text, each part stripped, blanks dropped, space-joined
    * (generic_spider.py:86-88). `xpath:` selectors evaluate through the
    * XPathLite subset, with the spider's exact get-vs-getall dispatch:
    * a selector string containing `::text` (which following-sibling::
    * text() does, but /text() and //text() do NOT) is getall-strip-
    * joined; anything else returns the FIRST match raw (.get()),
    * mirroring generic_spider.py:83-90's substring check. */
  def extractData(scope: Hit, selector: String): Option[String] = {
    if (selector.startsWith("xpath:")) {
      val xp = selector.stripPrefix("xpath:")
      val vals = XPathLite.eval(scope.el, xp).map(serializeXr)
      return if (xp.contains("::text")) {
        val parts = vals.map(_.trim).filter(_.nonEmpty)
        if (parts.isEmpty) None else Some(parts.mkString(" "))
      } else vals.headOption
    }
    val (sels, pseudo) = splitPseudo(selector)
    pseudo match {
      case Some("text") =>
        val parts =
          (if (sels.isEmpty) Seq(Hit(scope.ancestors, scope.el))
           else selectWithin(scope, sels))
            .flatMap(h => textNodes(h.el)).map(_.trim).filter(_.nonEmpty)
        if (parts.isEmpty) None else Some(parts.mkString(" "))
      case Some(p) if p.startsWith("attr(") && p.endsWith(")") =>
        val name = p.stripPrefix("attr(").stripSuffix(")").toLowerCase
        selectWithin(scope, sels).flatMap(_.el.attrs.get(name)).headOption
      case Some(other) =>
        throw new IllegalArgumentException(s"unsupported pseudo ::$other")
      case None => selectWithin(scope, sels).headOption.map(h => render(h.el))
    }
  }

  private def selectWithin(scope: Hit, sels: String): Seq[Hit] = {
    // descendant-or-self inside the scope element, but keep the real
    // ancestor chain so combinators can reach above it (Scrapy allows it)
    val chain = parseSelector(sels)
    val hits = Seq.newBuilder[Hit]
    val anc = collection.mutable.ArrayBuffer.empty[HElem]
    anc ++= scope.ancestors
    def walk(e: HElem): Unit = {
      if (chainMatches(chain, anc, e)) hits += Hit(anc.toList, e)
      anc += e
      e.children.foreach { case c: HElem => walk(c); case _ => }
      anc.remove(anc.length - 1)
    }
    walk(scope.el)
    hits.result()
  }

  /** Scrapy serialization of an XPath result: text node → raw text,
    * attribute → value, element → outer HTML. */
  private def serializeXr(r: XPathLite.XResult): String = r match {
    case XPathLite.RNode(c) => c.node match {
      case HText(t) => t
      case e: HElem => render(e)
    }
    case XPathLite.RAttr(v, _) => v
  }

  private def textNodes(e: HElem): Seq[String] =
    e.children.flatMap {
      case HText(t) => Seq(t)
      case c: HElem if rawTags(c.tag) => Nil
      case c: HElem => textNodes(c)
    }

  /** `ancestor::TAG[1]` — the nearest enclosing element with the tag
    * (generic_spider.py:46), as a Hit so field extraction can recurse. */
  def nearestAncestor(hit: Hit, tag: String): Option[Hit] = {
    val idx = hit.ancestors.lastIndexWhere(_.tag == tag.toLowerCase)
    if (idx < 0) None
    else Some(Hit(hit.ancestors.take(idx), hit.ancestors(idx)))
  }

  def render(e: HElem): String = {
    def esc(s: String) = s.flatMap {
      case '&' => "&amp;"
      case '<' => "&lt;"
      case '>' => "&gt;"
      case c => c.toString
    }
    val sb = new StringBuilder
    def go(n: HNode): Unit = n match {
      case HText(t) => sb.append(esc(t))
      case el: HElem =>
        if (el.tag.nonEmpty) {
          sb.append('<').append(el.tag)
          el.attrs.foreach { case (k, v) =>
            sb.append(' ').append(k).append("=\"")
              .append(esc(v).replace("\"", "&quot;")).append('"')
          }
          sb.append('>')
        }
        el.children.foreach(go)
        if (el.tag.nonEmpty && !voidTags(el.tag))
          sb.append("</").append(el.tag).append('>')
    }
    go(e)
    sb.toString
  }

  // ---- the reference's config-driven extraction ------------------------

  /** Mirror of the generic spider's per-source config surface. */
  final case class HtmlConfig(
      itemContainerSelector: Option[String] = None,
      itemAnchorSelector: Option[String] = None,
      parentContainerTag: String = "div",
      nameFilterOut: Option[String] = None,
      fields: Map[String, String] = Map.empty,
      defaults: Map[String, String] = Map.empty)

  /** generic_spider.parse: container mode selects item elements
    * directly; anchor mode selects anchors, drops those whose text
    * carries the filter string, and promotes each to its nearest
    * `parentContainerTag` ancestor. Fields evaluate inside the item
    * element; empty extractions leave the default (or nothing). */
  def extractItems(html: String, cfg: HtmlConfig)
      : Seq[Map[String, String]] = {
    val root = parse(html)
    val items: Seq[Hit] = cfg.itemContainerSelector match {
      case Some(sel) => select(root, sel)
      case None => cfg.itemAnchorSelector match {
        case Some(sel) =>
          select(root, sel).flatMap { a =>
            val name = textNodes(a.el).map(_.trim).filter(_.nonEmpty)
              .mkString(" ")
            if (cfg.nameFilterOut.exists(f => f.nonEmpty && name.contains(f)))
              None
            else nearestAncestor(a, cfg.parentContainerTag)
          }
        case None => Nil
      }
    }
    items.map { item =>
      val out = Map.newBuilder[String, String]
      out ++= cfg.defaults
      for ((field, sel) <- cfg.fields;
           data <- extractData(item, sel);
           d = data.trim if d.nonEmpty)
        out += field -> d
      out.result()
    }
  }
}
