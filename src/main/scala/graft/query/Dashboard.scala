package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.ops.TextOps

/** The reference's single user-facing query (§3.1: app.py:56-67 +
  * db_extractor.py:28-62) as one declarative plan builder over a silver
  * events DataFrame carrying a `search_tokens` array column.
  *
  * filter(source, category) → [AND-token match + tf relevance] → sort
  * (relevance when searching, else event_date,name) → page slice. Every
  * page compiles to TakeOrderedAndProject (per-partition top
  * offset+limit, driver merge — no global sort, no single-partition
  * window). Sibling plans: total count and the DISTINCT dropdown
  * domains. */
object Dashboard {

  val PerPage = 25 // app.py:10, db_extractor.py:6

  final case class Page(rows: DataFrame, total: Long, totalPages: Long)

  private def predicate(source: Option[String], category: Option[String],
      terms: Seq[String]): Column = {
    val base = lit(true)
    val s = source.fold(base)(v => col("source") === v)
    val c = category.fold(s && base)(v => s && col("category") === v)
    if (terms.isEmpty) c
    else c && terms.map(t => array_contains(col("search_tokens"), t))
      .reduce(_ && _)
  }

  /** Query-side twin of the load-time tokenization (plainto_tsquery): same
    * normalization + stopword filter, optionally the same Porter stem. */
  private def normalizeQuery(q: Option[String], stem: Boolean): Seq[String] =
    q.toSeq.flatMap(_.toLowerCase.split("[^\\p{L}\\p{Nd}]+"))
      .filter(t => t.length > 1 && !TextOps.stopwords.contains(t))
      .map(t => if (stem) graft.functions.Porter.stem(t) else t)

  /** ts_rank-style field weights: name hits count WeightA, body hits
    * WeightD (Postgres defaults 1.0 / 0.1). */
  val WeightA = 1.0
  val WeightD = 0.1

  def query(events: DataFrame, source: Option[String] = None,
      category: Option[String] = None, search: Option[String] = None,
      page: Int = 1, stemmed: Boolean = false,
      weighted: Boolean = false, normalization: Int = 0): Page = {
    val terms = normalizeQuery(search, stemmed)
    val filtered = events.filter(predicate(source, category, terms))

    def tf(column: String, t: String) =
      size(filter(col(column), x => x === lit(t)))
    val sortCols: Seq[Column] =
      if (terms.nonEmpty) {
        val raw =
          if (weighted)
            terms.map(t => tf("name_tokens", t) * WeightA +
              tf("body_tokens", t) * WeightD).reduce(_ + _)
          else terms.map(t => tf("search_tokens", t).cast("double"))
            .reduce(_ + _)
        // ts_rank's documented normalization flags (doc-length penalties)
        val score = if (normalization == 0) raw
          else TextOps.tsRankNormalize(raw, col("search_tokens"),
            normalization)
        Seq(score.desc, asc("event_date"), asc("name"))
      } else Seq(asc("event_date"), asc("name"), asc("url"))

    val total = filtered.count()
    // offset+limit after orderBy plans as TakeOrderedAndProject (each
    // partition keeps offset+limit rows, driver merges) — unlike a global
    // row_number window, which would move every row to one partition.
    val rows = filtered.orderBy(sortCols: _*)
      .offset(math.max(page - 1, 0) * PerPage).limit(PerPage)
    Page(rows, total, (total + PerPage - 1) / PerPage)
  }

  /** A2: dropdown domains. */
  def distinctDomain(events: DataFrame, column: String): DataFrame =
    events.select(column).where(col(column).isNotNull)
      .distinct().orderBy(column)

  /** W5: sliding window of ≤5 page links around the current page
    * (app.py:35-50) — driver-side arithmetic. */
  def pageLinks(current: Int, totalPages: Long): Seq[Int] = {
    val lo = math.max(1L, math.min(current - 2L, totalPages - 4L))
    val hi = math.min(totalPages, lo + 4)
    (lo to hi).map(_.toInt)
  }
}
