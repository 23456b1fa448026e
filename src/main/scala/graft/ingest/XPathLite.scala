package graft.ingest

import HtmlCodec.{HElem, HNode, HText}

/** The XPath subset the reference's own spider configs use
  * (sites.json:27 `.//br[1]/following-sibling::text()`, sites.json:52-55
  * playplayground's star-test `contains(@class, …)]/text()` paths,
  * `…//p[N]//text()`, `.//a/@href`), dispatched by
  * generic_spider.py:79-85. Everything
  * outside this subset throws loudly — no silent wrong answers.
  *
  * Semantics follow XPath 1.0 as lxml evaluates it:
  *   - `//` expands to `/descendant-or-self::node()/child::…`, so a
  *     positional predicate binds PER PARENT: `//p[1]` is every p that is
  *     the first p-child of its parent, not the first p in the document.
  *   - `contains(@a, 's')` is a substring test on the raw attribute value
  *     (not a class-token test).
  *   - Node-sets are deduplicated and returned in document order.
  * The get-vs-getall split (first match vs strip-join-all) is NOT here —
  * it lives in HtmlCodec.extractData, mirroring the spider's
  * `'::text' in selector` dispatch string-check exactly.
  */
object XPathLite {

  /** A node plus its identity (index path from the evaluation root) and
    * parent link, so sibling axes and document-order dedup both work. */
  final case class XCtx(node: HNode, path: Vector[Int], parent: Option[XCtx])

  sealed trait XResult
  final case class RNode(ctx: XCtx) extends XResult
  final case class RAttr(value: String, path: Vector[Int]) extends XResult

  private sealed trait Test
  private final case class NameTest(name: String) extends Test
  private case object AnyElem extends Test
  private case object TextTest extends Test

  private sealed trait Pred
  private final case class Pos(n: Int) extends Pred
  private final case class ContainsAttr(attr: String, sub: String) extends Pred

  private sealed trait Axis
  private case object Child extends Axis
  private case object FollowingSibling extends Axis
  private case object Attribute extends Axis

  private final case class Step(descend: Boolean, axis: Axis, test: Test,
      preds: Seq[Pred])

  private def fail(xp: String, why: String): Nothing =
    throw new IllegalArgumentException(
      s"unsupported XPath (outside the reference-config subset): $why in: $xp")

  // ---- parser ----------------------------------------------------------

  private def parsePath(xp: String): Seq[Step] = {
    var s = xp.trim
    if (s.startsWith("//")) fail(xp, "absolute // path (use relative .//)")
    if (s.startsWith("./")) s = s.drop(1)
    else if (s == ".") return Nil
    else if (!s.startsWith("/")) s = "/" + s // bare relative step
    val steps = Seq.newBuilder[Step]
    var i = 0
    while (i < s.length) {
      var descend = false
      if (s.startsWith("//", i)) { descend = true; i += 2 }
      else if (s(i) == '/') i += 1
      else fail(xp, s"expected / at offset $i")
      // step token runs to the next '/' outside [...] brackets/quotes
      val t0 = i
      var depth = 0
      var quote = ' '
      while (i < s.length && (depth > 0 || quote != ' ' || s(i) != '/')) {
        val c = s(i)
        if (quote != ' ') { if (c == quote) quote = ' ' }
        else if (c == '\'' || c == '"') quote = c
        else if (c == '[') depth += 1
        else if (c == ']') depth -= 1
        i += 1
      }
      steps += parseStep(xp, s.substring(t0, i).trim, descend)
    }
    val r = steps.result()
    r.zipWithIndex.foreach { case (st, k) =>
      if (st.axis == Attribute && k != r.length - 1)
        fail(xp, "@attr only as the final step")
    }
    r
  }

  private def parseStep(xp: String, tok0: String, descend: Boolean): Step = {
    if (tok0.isEmpty) fail(xp, "empty step")
    var tok = tok0
    var axis: Axis = Child
    val ax = tok.indexOf("::")
    if (ax >= 0) {
      tok.substring(0, ax) match {
        case "following-sibling" => axis = FollowingSibling
        case "child" => axis = Child
        case other => fail(xp, s"axis $other::")
      }
      tok = tok.substring(ax + 2)
    }
    // split off predicates
    val preds = Seq.newBuilder[Pred]
    val pb = tok.indexOf('[')
    var testTok = tok
    if (pb >= 0) {
      testTok = tok.substring(0, pb)
      var rest = tok.substring(pb)
      while (rest.nonEmpty) {
        if (!rest.startsWith("[")) fail(xp, s"bad predicate tail $rest")
        val e = matchBracket(rest)
        preds += parsePred(xp, rest.substring(1, e).trim)
        rest = rest.substring(e + 1).trim
      }
    }
    val test: Test =
      if (testTok == "*") AnyElem
      else if (testTok == "text()") TextTest
      else if (testTok.startsWith("@")) {
        if (axis != Child) fail(xp, "@ with explicit axis")
        axis = Attribute
        NameTest(testTok.drop(1).toLowerCase)
      } else if (testTok.matches("[a-zA-Z][a-zA-Z0-9-]*"))
        NameTest(testTok.toLowerCase)
      else fail(xp, s"node test '$testTok'")
    if (axis == Attribute && preds.result().nonEmpty)
      fail(xp, "predicate on @attr")
    if (axis == FollowingSibling && test != TextTest)
      fail(xp, "following-sibling:: only with text()")
    Step(descend, axis, test, preds.result())
  }

  /** index of the ']' matching the leading '[' (quote-aware). */
  private def matchBracket(s: String): Int = {
    var depth = 0; var quote = ' '; var i = 0
    while (i < s.length) {
      val c = s(i)
      if (quote != ' ') { if (c == quote) quote = ' ' }
      else if (c == '\'' || c == '"') quote = c
      else if (c == '[') depth += 1
      else if (c == ']') { depth -= 1; if (depth == 0) return i }
      i += 1
    }
    throw new IllegalArgumentException(s"unbalanced [ in $s")
  }

  private val containsRe =
    """contains\(\s*@([a-zA-Z][a-zA-Z0-9-]*)\s*,\s*(?:'([^']*)'|"([^"]*)")\s*\)""".r

  private def parsePred(xp: String, p: String): Pred =
    if (p.matches("[0-9]+")) Pos(p.toInt)
    else p match {
      case containsRe(attr, sq, dq) =>
        ContainsAttr(attr.toLowerCase, if (sq != null) sq else dq)
      case _ => fail(xp, s"predicate [$p]")
    }

  // ---- evaluator -------------------------------------------------------

  /** Evaluate the subset XPath relative to `scope` (the item element). */
  def eval(scope: HElem, xpath: String): Seq[XResult] = {
    val steps = parsePath(xpath)
    var ctxs: Seq[XCtx] = Seq(XCtx(scope, Vector.empty, None))
    var attrs: Seq[RAttr] = null
    steps.foreach { st =>
      val base = if (st.descend) dedupe(ctxs.flatMap(descendantOrSelf)) else ctxs
      if (st.axis == Attribute) {
        val NameTest(a) = st.test: @unchecked
        attrs = dedupe2(base.flatMap { c =>
          c.node match {
            case e: HElem => e.attrs.get(a).map(RAttr(_, c.path)).toSeq
            case _ => Nil
          }
        })
      } else {
        ctxs = dedupe(base.flatMap(c => applyPreds(candidates(c, st), st.preds)))
      }
    }
    if (attrs != null) attrs else ctxs.map(RNode(_))
  }

  private def candidates(c: XCtx, st: Step): Seq[XCtx] = st.axis match {
    case Child => c.node match {
      case e: HElem =>
        e.children.zipWithIndex.collect {
          case (ch, i) if testOk(ch, st.test) =>
            XCtx(ch, c.path :+ i, Some(c))
        }
      case _ => Nil
    }
    case FollowingSibling => c.parent match {
      case Some(p) =>
        val pe = p.node.asInstanceOf[HElem]
        val my = c.path.last
        pe.children.zipWithIndex.collect {
          case (ch, i) if i > my && testOk(ch, st.test) =>
            XCtx(ch, p.path :+ i, Some(p))
        }
      case None => Nil
    }
    case Attribute => Nil // handled in eval
  }

  private def testOk(n: HNode, t: Test): Boolean = (n, t) match {
    case (e: HElem, NameTest(name)) => e.tag == name
    case (e: HElem, AnyElem) => e.tag.nonEmpty
    case (_: HText, TextTest) => true
    case _ => false
  }

  /** Predicates left-to-right; position re-indexes after each (XPath 1.0). */
  private def applyPreds(cands: Seq[XCtx], preds: Seq[Pred]): Seq[XCtx] =
    preds.foldLeft(cands) {
      case (cs, Pos(n)) => cs.lift(n - 1).toSeq
      case (cs, ContainsAttr(a, sub)) => cs.filter(_.node match {
        case e: HElem => e.attrs.get(a).exists(_.contains(sub))
        case _ => false
      })
    }

  private def descendantOrSelf(c: XCtx): Seq[XCtx] = {
    val out = Seq.newBuilder[XCtx]
    def go(x: XCtx): Unit = {
      out += x
      x.node match {
        case e: HElem => e.children.zipWithIndex.foreach { case (ch, i) =>
          go(XCtx(ch, x.path :+ i, Some(x)))
        }
        case _ =>
      }
    }
    go(c)
    out.result()
  }

  private def pathLt(a: Vector[Int], b: Vector[Int]): Boolean = {
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    a.length < b.length
  }

  /** Node-set semantics: unique nodes, document order. */
  private def dedupe(cs: Seq[XCtx]): Seq[XCtx] = {
    val seen = collection.mutable.HashSet[Vector[Int]]()
    cs.filter(c => seen.add(c.path)).sortWith((x, y) => pathLt(x.path, y.path))
  }

  private def dedupe2(rs: Seq[RAttr]): Seq[RAttr] = {
    val seen = collection.mutable.HashSet[Vector[Int]]()
    rs.filter(r => seen.add(r.path)).sortWith((x, y) => pathLt(x.path, y.path))
  }

  /** The ancestor element chain (root..parent) for Hit interop. */
  def ancestorsOf(c: XCtx): List[HElem] = {
    val out = List.newBuilder[HElem]
    def up(x: Option[XCtx]): Unit = x match {
      case Some(p) =>
        up(p.parent)
        p.node match { case e: HElem => out += e; case _ => }
      case None =>
    }
    up(c.parent)
    out.result()
  }
}
