package graft.ingest


/** Sitemap discovery per sitemaps.org protocol 0.9: a root document
  * is either a `<urlset>` of leaf `<url>` entries or a
  * `<sitemapindex>` whose `<sitemap><loc>` members are themselves
  * sitemaps — routinely shipped as `.xml.gz` — so discovery is a
  * bounded recursion, not a single parse. Closes the r14 verdict's
  * composition gap: the gzip sniff and the XML element machinery
  * both already existed; this wires them into the walk the spec
  * actually requires. Reference behavior: the spider config's flat
  * per-source extraction (generic_spider.py) never descended an
  * index — this is the scale path a real frontier needs.
  *
  * Loud on: nesting past `maxDepth` (the protocol has no depth cap
  * but an unbounded walk is a crawler trap), a revisited sitemap URL
  * (cycle), an index entry without a `<loc>`, a truncated gzip
  * member, or a root element that is neither vocabulary word.
  * Fetching is injected (`fetch`) — the engine stays zero-egress;
  * the q306 WARC spine shows the archive-backed instantiation. */
object Sitemap {

  /** Leaf `<url>` entries reachable from `rootUrl`, depth-first in
    * index order; each map carries the extracted child-element texts
    * (`loc`, and `pri` when a `<priority>` is present). */
  def expand(fetch: String => Array[Byte], rootUrl: String,
      maxDepth: Int = 4): Seq[Map[String, String]] = {
    val visited = scala.collection.mutable.Set.empty[String]
    def go(url: String, depth: Int): Seq[Map[String, String]] = {
      require(depth <= maxDepth,
        s"sitemap nesting exceeds depth $maxDepth at $url")
      require(visited.add(url), s"sitemap cycle: $url revisited")
      val xml = new String(gunzipIfNeeded(fetch(url)), "UTF-8")
      rootElement(xml) match {
        case "sitemapindex" =>
          HtmlCodec.extractItems(xml, HtmlCodec.HtmlConfig(
            itemContainerSelector = Some("sitemapindex > sitemap"),
            fields = Map("loc" -> "loc::text")))
            .flatMap { m =>
              val loc = m.getOrElse("loc", throw new
                IllegalArgumentException(s"index entry without <loc> in $url"))
              go(loc, depth + 1)
            }
        case "urlset" =>
          HtmlCodec.extractItems(xml, HtmlCodec.HtmlConfig(
            itemContainerSelector = Some("urlset > url"),
            fields = Map("loc" -> "loc::text",
              "pri" -> "priority::text",
              "lastmod" -> "lastmod::text")))
        case other => throw new IllegalArgumentException(
          s"sitemap root element is <$other>, not urlset/sitemapindex ($url)")
      }
    }
    go(rootUrl, 1)
  }

  /** RFC 1952 magic sniff; non-gzip bytes pass through untouched. */
  def gunzipIfNeeded(bytes: Array[Byte]): Array[Byte] =
    if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
        (bytes(1) & 0xff) == 0x8b) graft.multimodal.Zlib.gunzip(bytes)
    else bytes

  /** First element name past the XML declaration / comments — the
    * two-word vocabulary dispatch needs only this, not a full parse. */
  private def rootElement(xml: String): String = {
    var i = 0
    while (i >= 0 && i < xml.length) {
      i = xml.indexOf('<', i)
      if (i >= 0) {
        val c = if (i + 1 < xml.length) xml.charAt(i + 1) else ' '
        if (c == '?' || c == '!') i += 1
        else {
          var j = i + 1
          while (j < xml.length && (xml.charAt(j).isLetterOrDigit ||
            xml.charAt(j) == '_' || xml.charAt(j) == '-')) j += 1
          return xml.substring(i + 1, j).toLowerCase
        }
      }
    }
    throw new IllegalArgumentException("no root element in sitemap XML")
  }
}
