package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Rule-based event categorization — the reference's keyword cascade
  * (categorizer.py:1-32) as a generated first-match-wins `when` chain over
  * lower(name ∥ description ∥ venue), plus the trusted-source gate
  * (transformer.py:17-18). Data-driven: the keyword tables are plain Seqs,
  * compiled to codegen'd expressions — no UDF, no shuffle. */
object Categorize {

  /** category → keywords, in the reference's exact first-match-wins order
    * (categorizer.py:7-18); fallthrough 'music'. */
  val categoryRules: Seq[(String, Seq[String])] = Seq(
    "festival" -> Seq("festival", "fest", "fair"),
    "comedy" -> Seq("comedy", "stand-up", "standup", "improv"),
    "theater" -> Seq("theater", "theatre", "musical", "play", "broadway",
      "opera", "ballet"),
    "sports" -> Seq("game", "match", "race", "basketball", "football",
      "hockey", "soccer", "baseball"),
  )
  val defaultCategory = "music"

  /** genre → keywords (categorizer.py:21-31); fallthrough 'general'. */
  val genreRules: Seq[(String, Seq[String])] = Seq(
    "rock" -> Seq("rock", "metal", "punk"),
    "country" -> Seq("country", "bluegrass", "folk"),
    "jazz" -> Seq("jazz", "blues"),
    "pop" -> Seq("pop"),
    "hip-hop" -> Seq("hip-hop", "hip hop", "rap"),
    "electronic" -> Seq("electronic", "edm", "dj", "techno", "house"),
    "classical" -> Seq("classical", "symphony", "orchestra"),
    "indie" -> Seq("indie", "alternative"),
    "soul" -> Seq("soul", "r&b", "funk", "gospel"),
  )
  val defaultGenre = "general"

  private def cascade(combined: Column,
      rules: Seq[(String, Seq[String])], dflt: String): Column =
    rules.foldRight(lit(dflt)) { case ((label, kws), els) =>
      when(kws.map(combined.contains(_)).reduce(_ || _), lit(label))
        .otherwise(els)
    }

  /** Combined haystack (categorizer.py:2-5). */
  def haystack(name: Column, description: Column, venue: Column): Column =
    lower(concat_ws(" ", coalesce(name, lit("")),
      coalesce(description, lit("")), coalesce(venue, lit(""))))

  def category(hay: Column): Column =
    cascade(hay, categoryRules, defaultCategory)

  def genre(hay: Column): Column = cascade(hay, genreRules, defaultGenre)

  /** Struct(category, genre) — the categorizer's two outputs in one pass. */
  def categorize(name: Column, description: Column, venue: Column): Column = {
    val hay = haystack(name, description, venue)
    struct(category(hay).as("category"), genre(hay).as("genre"))
  }

  /** Trusted sources keep their upstream category (transformer.py:17-18). */
  val trustedSources: Seq[String] =
    Seq("Ticketmaster", "SeatGeek", "Nashville ArcGIS", "Google Places")

  /** U1 gate: categorize only when the source isn't trusted or upstream
    * category is missing. */
  def effectiveCategory(source: Column, upstream: Column,
      derived: Column): Column =
    when(source.isin(trustedSources: _*) && upstream.isNotNull, upstream)
      .otherwise(derived)
}
