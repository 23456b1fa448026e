package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-expression standardizers — the reference's scalar transform
  * surface (SURVEY.md §2.7: F1–F14, D1–D5). All pure Catalyst expressions
  * except the Python-`title()` parity UDF (F3 divergence note).
  */
object Standardize {

  // ───────────────────────── strings ─────────────────────────

  /** F1: collapse runs of whitespace, trim (standardizer.py:53). */
  def collapseWs(c: Column): Column =
    trim(regexp_replace(c, "\\s+", " "))

  /** F2: strip trailing venue-type suffix, case-insensitive
    * (standardizer.py:54). */
  def stripVenueSuffix(c: Column): Column =
    regexp_replace(c, "(?i)\\s+(venue|hall|theater|theatre)$", "")

  /** F3: title-case. `initcap` capitalizes after whitespace; Python
    * `str.title()` capitalizes after ANY non-letter (digits, apostrophes).
    * This UDF reproduces the Python semantics exactly for golden parity
    * (transform_data.py:79 etc.). */
  val pyTitle = udf { (s: String) =>
    if (s == null) null
    else {
      val sb = new StringBuilder(s.length)
      var prevLetter = false
      s.foreach { ch =>
        if (ch.isLetter) {
          sb += (if (prevLetter) ch.toLower else ch.toUpper)
          prevLetter = true
        } else { sb += ch; prevLetter = false }
      }
      sb.toString
    }
  }

  /** F4: snake_case → spaced Title Case (transform_data.py:79,252,492). */
  def snakeToTitle(c: Column): Column =
    pyTitle(regexp_replace(c, "_", " "))

  /** F5: price normalization — 'free' → 0.0, else first number
    * (standardizer.py:57-65); null when nothing matches. */
  def parsePrice(c: Column): Column =
    when(c.isNull, lit(null).cast("double"))
      .when(lower(c).contains("free"), lit(0.0))
      .otherwise(nullif(regexp_extract(c, "\\d+\\.?\\d*", 0), lit(""))
        .cast("double"))

  /** F6: pipe-joined description from labeled parts with a per-value
    * truncation (yelp_spider.py:69-86, nashville_arcgis.py:168-175).
    * Null parts drop out (concat_ws skips nulls). */
  def assembleDescription(parts: Seq[(String, Column)],
      valueCap: Int = 100): Column =
    concat_ws(" | ", parts.map { case (label, v) =>
      when(v.isNotNull, concat(lit(s"$label: "), left(v, lit(valueCap))))
    }: _*)

  /** F7: flattened description capped at 500 chars
    * (document_spider.py:396-397). */
  def capDescription(c: Column, cap: Int = 500): Column = left(c, lit(cap))

  /** F8: slugify (transform_data.py:345-348). */
  def slugify(c: Column): Column =
    lower(regexp_replace(c, "\\W+", "-"))

  /** F9: synthetic stable URL for documents lacking one: scheme + md5-12 of
    * the identity fields (document_spider.py:486-505). */
  def syntheticUrl(scheme: String, identity: Column*): Column =
    concat(lit(s"$scheme://"),
      substring(md5(concat_ws("|", identity: _*).cast("binary")), 1, 12))

  /** F10: URL absolutization against a base url (generic_spider.py:60,69) —
    * java.net.URI.resolve semantics, ingest-side. */
  val resolveUrl = udf { (base: String, href: String) =>
    if (href == null) null
    else if (base == null) href
    else try new java.net.URI(base).resolve(href).toString
    catch { case _: Exception => href }
  }

  /** F11: split a "key: value" line into a 2-element array
    * (pdf_spider.py:82-86). */
  def keyValueSplit(c: Column): Column = split(c, ":", 2)

  // F12: heuristic line classifiers (pdf_spider.py:11-18,102-111,
  // document_spider.py:356-381)
  def isUrlLine(c: Column): Column = c.rlike("^https?://")
  def isDateLine(c: Column): Column =
    c.rlike("\\d{1,2}[/-]\\d{1,2}[/-]\\d{2,4}") ||
      c.rlike("(?i)(january|february|march|april|may|june|july|august|" +
        "september|october|november|december)\\s+\\d{1,2}") ||
      c.rlike("\\d{4}-\\d{2}-\\d{2}")
  def isAddressLine(c: Column): Column =
    lower(c).rlike("\\d+\\s+\\w+.*(street|st|avenue|ave|road|rd|boulevard|" +
      "blvd|drive|dr|lane|ln|way|pike|place)\\b")
  def looksLikeName(c: Column): Column =
    length(c).between(5, 150) && substring(c, 1, 1).rlike("[A-Z]")

  /** P5: invalid-string domain (nashville_arcgis.py:21-22,129-138). */
  def isValidString(c: Column): Column =
    c.isNotNull &&
      !lower(trim(c)).isin("none", "", "unknown", "n/a", "na", "unnamed",
        "null") &&
      length(trim(c)) >= 2

  /** F13: safe double cast — null on failure (transform_data.py:268-273).
    * Spark 4 runs ANSI mode by default, where a plain cast on malformed
    * input throws — try_cast restores the reference's null-on-failure. */
  def safeDouble(c: Column): Column = c.try_cast("double")

  // ───────────────────────── dates (D1–D5) ─────────────────────────

  private def tzOffsetIso(wall: Column, tz: String): Column = {
    // wall-clock timestamp interpreted in `tz` → "yyyy-MM-ddTHH:mm:ss±HH:00"
    val utc = to_utc_timestamp(wall, tz)
    val offH = ((unix_timestamp(wall) - unix_timestamp(utc)) / 3600)
      .cast("int")
    concat(date_format(wall, "yyyy-MM-dd'T'HH:mm:ss"),
      format_string("%+03d:00", offH))
  }

  /** D1: multi-strategy date standardizer, dispatched on `source`
    * (standardizer.py:4-49). `refYear` replaces the reference's
    * `datetime.now().year` (standardizer.py:20) for determinism.
    * Unparseable input falls through unchanged; yelp → null. */
  def standardizeDate(date: Column, source: Column, refYear: Int,
      localTz: String = "America/Chicago"): Column = {
    // (a) ticketmaster/seatgeek: "YYYY-MM-DD HH:MM:SS" or ISO → ISO 'T' form
    val isoParsed = coalesce(
      try_to_timestamp(date, lit("yyyy-MM-dd HH:mm:ss")),
      try_to_timestamp(date, lit("yyyy-MM-dd'T'HH:mm:ss")))
    val isoOut = date_format(isoParsed, "yyyy-MM-dd'T'HH:mm:ss")

    // (b) nashville.com: "October 2 @ 8:00 pm" + refYear + central time
    val nashMatch = regexp_extract(date,
      "(\\w+\\s+\\d+)\\s*@\\s*([\\d:]+\\s*[apAP][mM])", 0)
    val nashWall = coalesce(
      try_to_timestamp(
        concat(regexp_extract(date, "(\\w+\\s+\\d+)\\s*@", 1),
          lit(s" $refYear "),
          upper(regexp_extract(date, "@\\s*([\\d:]+\\s*[apAP][mM])", 1))),
        lit("MMMM d yyyy h:mm a")),
      try_to_timestamp(
        concat(regexp_extract(date, "(\\w+\\s+\\d+)\\s*@", 1),
          lit(s" $refYear "),
          upper(regexp_extract(date, "@\\s*([\\d:]+\\s*[apAP][mM])", 1))),
        lit("MMMM d yyyy h a")))
    val nashOut = tzOffsetIso(nashWall, localTz)

    // (c) underdog: "October 2, 2025 | 8:00PM CDT" — tz-abbrev map
    val udDatePart = regexp_extract(date, "^([^|]+)\\|", 1)
    val udTimePart = upper(trim(regexp_extract(date,
      "\\|\\s*([\\d:]+\\s*[apAP][mM])", 1)))
    val udTzAbbr = upper(regexp_extract(date, "(?i)\\b(CDT|CST|EDT|EST)\\b", 1))
    val udOffset = when(udTzAbbr === "CDT", "-05:00")
      .when(udTzAbbr === "CST", "-06:00")
      .when(udTzAbbr === "EDT", "-04:00")
      .when(udTzAbbr === "EST", "-05:00")
    val udWall = coalesce(
      try_to_timestamp(concat(trim(udDatePart), lit(" "), udTimePart),
        lit("MMMM d, yyyy h:mma")),
      try_to_timestamp(concat(trim(udDatePart), lit(" "), udTimePart),
        lit("MMMM d, yyyy ha")))
    val udOut = concat(date_format(udWall, "yyyy-MM-dd'T'HH:mm:ss"), udOffset)

    val src = lower(coalesce(source, lit("")))
    when(date.isNull, lit(null).cast("string"))
      .when(src.contains("yelp"), lit(null).cast("string"))
      .when((src.contains("ticketmaster") || src.contains("seatgeek")) &&
        isoParsed.isNotNull, isoOut)
      .when(src.contains("nashville.com") && nashMatch =!= "" &&
        nashWall.isNotNull, nashOut)
      .when(src.contains("underdog") && udWall.isNotNull && udOffset.isNotNull,
        udOut)
      .otherwise(date)
  }

  /** D2: ticketmaster localDate+localTime concat
    * (ticketmaster_spider.py:62-67). */
  def concatDateTime(d: Column, t: Column): Column = concat_ws(" ", d, t)

  /** D3: display format (app.py:23-32). */
  def displayDate(ts: Column): Column =
    date_format(ts, "MMM dd, yyyy 'at' hh:mm a")

  /** D5: seatgeek utc-else-local coalesce (seatgeek_spider.py:75). */
  def coalesceDates(utc: Column, local: Column): Column = coalesce(utc, local)

  /** Engine-native typed derivation of the stringly event_date. */
  def eventTs(eventDate: Column): Column = coalesce(
    try_to_timestamp(eventDate, lit("yyyy-MM-dd'T'HH:mm:ssXXX")),
    try_to_timestamp(eventDate, lit("yyyy-MM-dd'T'HH:mm:ss")),
    try_to_timestamp(eventDate, lit("yyyy-MM-dd HH:mm:ss")),
    try_to_timestamp(eventDate, lit("yyyy-MM-dd")))
}
