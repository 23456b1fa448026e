package graft

import org.apache.spark.sql.functions._
import graft.ops.Categorize

class CategorizeSpec extends SparkSpec {
  import spark.implicits._

  private def catGenre(name: String, desc: String = "", venue: String = "")
      : (String, String) = {
    val r = Seq((name, desc, venue)).toDF("n", "d", "v")
      .select(Categorize.categorize($"n", $"d", $"v").as("c"))
      .select("c.category", "c.genre").collect().head
    (r.getString(0), r.getString(1))
  }

  test("first-match-wins order: festival beats music keywords") {
    assert(catGenre("Jazz Festival") == ("festival", "jazz"))
  }

  test("category cascade covers each rule class") {
    assert(catGenre("Stand-up night")._1 == "comedy")
    assert(catGenre("Broadway musical")._1 == "theater")
    assert(catGenre("Hockey game")._1 == "sports")
    assert(catGenre("Evening concert")._1 == "music") // default
  }

  test("genre cascade + default") {
    assert(catGenre("Symphony under the stars")._2 == "classical")
    assert(catGenre("Something else")._2 == "general")
  }

  test("haystack includes description and venue") {
    assert(catGenre("Night out", "bluegrass on the lawn")._2 == "country")
    assert(catGenre("Night out", "", "Punk Palace")._2 == "rock")
  }

  test("trusted-source gate keeps upstream category") {
    val df = Seq(
      ("Ticketmaster", "Sports", "music"),
      ("Yelp", "Restaurants", "music"),
      ("Ticketmaster", null, "music"))
      .toDF("source", "upstream", "derived")
      .select(Categorize.effectiveCategory($"source", $"upstream",
        $"derived"))
    assert(df.collect().map(_.getString(0)).toSeq
      == Seq("Sports", "music", "music"))
  }
}
