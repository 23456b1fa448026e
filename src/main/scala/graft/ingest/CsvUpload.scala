package graft.ingest

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ops.Standardize

/** S7 + N3/N4: the CSV document-upload path — read with encoding fallback,
  * normalize arbitrary headers via the synonym map, clean per-record, and
  * project onto the canonical schema (document_spider.py:25-33,118-134,
  * 255-301). Header resolution is driver-side schema work (no shuffle);
  * the value cleanup is one codegen'd projection. */
object CsvUpload {

  /** canonical field → header synonyms, lowercase (COLUMN_MAPPINGS,
    * document_spider.py:25-33). First present synonym wins. */
  val columnSynonyms: Seq[(String, Seq[String])] = Seq(
    "name" -> Seq("name", "title", "event", "event_name", "business",
      "business_name"),
    "url" -> Seq("url", "link", "website", "web", "site"),
    "venue_name" -> Seq("venue_name", "venue", "location", "place",
      "where"),
    "venue_address" -> Seq("venue_address", "address", "addr", "street",
      "street_address"),
    "event_date" -> Seq("event_date", "date", "when", "day", "datetime",
      "start_date"),
    "description" -> Seq("description", "desc", "details", "info",
      "about", "summary"),
    "category" -> Seq("category", "type", "kind", "genre_type"),
    "venue_city" -> Seq("venue_city", "city", "town"),
    "latitude" -> Seq("latitude", "lat"),
    "longitude" -> Seq("longitude", "lng", "lon", "long"),
    "neighborhood" -> Seq("neighborhood", "area", "district"),
    "genre" -> Seq("genre", "music_genre", "style"),
    "season" -> Seq("season", "time_of_year"),
    "price" -> Seq("price", "cost", "admission", "ticket_price", "fee"))

  /** Read a CSV with utf-8 → latin-1 fallback (document_spider.py:118-134).
    * Spark's CSV reader never throws on bad encoding — it substitutes
    * U+FFFD — so the fallback must be decided by an explicit strict decode
    * (CodingErrorAction.REPORT) of the file bytes, mirroring the
    * reference's UnicodeDecodeError retry. Detection samples the first
    * 1 MiB of each file (an upload-path helper: files are small and local;
    * not a distributed scan). */
  def readCsv(spark: SparkSession, path: String): DataFrame = {
    def read(enc: String) = spark.read
      .option("header", "true").option("encoding", enc)
      .option("mode", "PERMISSIVE")
      .csv(path)
    val enc = if (filesDecodeAsUtf8(spark, path)) "UTF-8" else "ISO-8859-1"
    read(enc)
  }

  /** Strict UTF-8 check over each file's leading bytes. `endOfInput=false`
    * tolerates a multi-byte codepoint cut at the sample boundary; only a
    * definitively malformed sequence fails. Undetectable paths (remote FS
    * errors, empty dir) default to UTF-8. */
  private[graft] def filesDecodeAsUtf8(spark: SparkSession,
      path: String): Boolean = {
    import java.nio.{ByteBuffer, CharBuffer}
    import java.nio.charset.{CodingErrorAction, StandardCharsets}
    import org.apache.hadoop.fs.Path
    try {
      val p = new Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val files =
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).filter(_.isFile).map(_.getPath)
        else Array(p)
      files.forall { f =>
        val in = fs.open(f)
        try {
          val buf = new Array[Byte](1 << 20)
          var off = 0
          var r = in.read(buf, 0, buf.length)
          while (r > 0 && off + r < buf.length) { off += r
            r = in.read(buf, off, buf.length - off) }
          val n = off + math.max(r, 0)
          if (n <= 0) true
          else {
            val dec = StandardCharsets.UTF_8.newDecoder()
              .onMalformedInput(CodingErrorAction.REPORT)
              .onUnmappableCharacter(CodingErrorAction.REPORT)
            val bb = ByteBuffer.wrap(buf, 0, n)
            val cb = CharBuffer.allocate(8192)
            var res = dec.decode(bb, cb, false)
            while (res.isOverflow) { cb.clear(); res = dec.decode(bb, cb, false) }
            !res.isError
          }
        } finally in.close()
      }
    } catch { case _: Exception => true }
  }

  /** N3: lowercase headers, then coalesce each canonical field from its
    * present synonyms (missing → null literal). N4: trim values, blank →
    * null. Unknown columns drop out (the reference ignores them). */
  def normalizeHeaders(df: DataFrame): DataFrame = {
    val present: Map[String, String] =
      df.columns.map(c => c.trim.toLowerCase.replace(' ', '_') -> c).toMap
    val cols: Seq[Column] = columnSynonyms.map { case (canonical, syns) =>
      val hits = syns.flatMap(present.get).map(c =>
        nullif(trim(col(s"`$c`")), lit("")))
      (if (hits.isEmpty) lit(null).cast("string")
       else coalesce(hits: _*)).as(canonical)
    }
    df.select(cols: _*)
  }

  /** Full upload parse: headers → canonical, safe casts for coords (F13),
    * price normalization (F5), P7 name validity, F9 synthetic url from
    * name|address|file when absent. */
  def parse(spark: SparkSession, path: String,
      sourceTag: String = "Document Upload (CSV)"): DataFrame = {
    val norm = normalizeHeaders(readCsv(spark, path))
    norm
      .withColumn("latitude", Standardize.safeDouble(col("latitude")))
      .withColumn("longitude", Standardize.safeDouble(col("longitude")))
      .withColumn("price", Standardize.parsePrice(col("price")))
      .withColumn("source", lit(sourceTag))
      .filter(length(coalesce(col("name"), lit(""))) >= 3 &&
        col("name").rlike("[A-Za-z]"))
      .withColumn("url", coalesce(col("url"),
        Standardize.syntheticUrl("document", col("name"),
          col("venue_address"), lit(path))))
  }

  /** S8: the Excel workbook path (document_spider.py:136-161) with the
    * workbook materialized as per-sheet tabular files (no Excel codec in
    * this container — declared stance; a sheet decoder would slot in as
    * another `parse` source without changing these semantics): read the
    * FIRST sheet; only when it yields no valid items, re-read and union
    * ALL sheets (unionByName with missing-column fill — sheets may carry
    * different header synonyms). The yield probe is one bounded count on
    * the already-filtered first sheet, mirroring the reference's
    * `if not items` check. */
  def parseWorkbookSheets(spark: SparkSession, sheetPaths: Seq[String],
      sourceTag: String = "Document Upload (Excel)"): DataFrame = {
    require(sheetPaths.nonEmpty, "workbook has no sheets")
    val first = parse(spark, sheetPaths.head, sourceTag)
    if (first.limit(1).count() > 0) first
    else sheetPaths.map(parse(spark, _, sourceTag))
      .reduce(_.unionByName(_, allowMissingColumns = true))
  }

  /** A5: run-statistics tally — rejects by reason plus yield counts
    * (nashville_arcgis.py:41-42,95-101,180-186 generalized). One pass,
    * one tiny aggregation. */
  def rejectStats(df: DataFrame): DataFrame = {
    val reason = when(col("name").isNull, "no_name")
      .when(length(col("name")) < 3 || !col("name").rlike("[A-Za-z]"),
        "invalid_name")
      .otherwise("yielded")
    normalizeHeaders(df).groupBy(reason.as("reason"))
      .agg(count(lit(1)).as("n")).orderBy("reason")
  }
}
