package graft

import org.apache.spark.sql.functions._
import graft.ops.Standardize._

class StandardizeSpec extends SparkSpec {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame): Seq[Any] =
    df.collect().map(_.get(0)).toSeq

  test("F1 whitespace collapse") {
    val got = one(Seq("  a   b\t c ").toDF("s").select(collapseWs($"s")))
    assert(got == Seq("a b c"))
  }

  test("F2 venue suffix strip is case-insensitive and anchored") {
    val got = one(Seq("Ryman Auditorium HALL", "Hall of Fame")
      .toDF("s").select(stripVenueSuffix($"s")))
    assert(got == Seq("Ryman Auditorium", "Hall of Fame"))
  }

  test("F3 pyTitle matches Python str.title() edge cases") {
    val got = one(Seq("rock'n'roll", "art_culture 2nd stage", "o'brien's")
      .toDF("s").select(pyTitle($"s")))
    // Python: "Rock'N'Roll", "Art_Culture 2Nd Stage", "O'Brien'S"
    assert(got == Seq("Rock'N'Roll", "Art_Culture 2Nd Stage", "O'Brien'S"))
  }

  test("F4 snakeToTitle") {
    assert(one(Seq("art_culture").toDF("s").select(snakeToTitle($"s")))
      == Seq("Art Culture"))
  }

  test("F5 price parse: free, currency, garbage, null") {
    val got = one(Seq("FREE", "$15.50", "Tickets from $25", "abc", null)
      .toDF("s").select(parsePrice($"s")))
    assert(got == Seq(0.0, 15.5, 25.0, null, null))
  }

  test("F8 slugify") {
    assert(one(Seq("Rock & Roll Night!").toDF("s").select(slugify($"s")))
      == Seq("rock-roll-night-"))
  }

  test("F9 synthetic url is stable md5-12") {
    val got = one(Seq(("Fest", "12 Main St"))
      .toDF("n", "a").select(syntheticUrl("pdf", $"n", $"a")))
    val again = one(Seq(("Fest", "12 Main St"))
      .toDF("n", "a").select(syntheticUrl("pdf", $"n", $"a")))
    assert(got == again && got.head.toString.startsWith("pdf://")
      && got.head.toString.length == "pdf://".length + 12)
  }

  test("F12 line classifiers") {
    assert(one(Seq("https://x.y").toDF("s").select(isUrlLine($"s")))
      == Seq(true))
    assert(one(Seq("October 12", "2025-01-02", "no digits here")
      .toDF("s").select(isDateLine($"s"))) == Seq(true, true, false))
    assert(one(Seq("123 Broadway Ave", "hello world")
      .toDF("s").select(isAddressLine($"s"))) == Seq(true, false))
    assert(one(Seq("Grand Ole Opry", "hi", "lowercase line")
      .toDF("s").select(looksLikeName($"s"))) == Seq(true, false, false))
  }

  test("P5 invalid-string domain filter") {
    val got = one(Seq("N/A", "none", "x", " Unknown ", "Ryman")
      .toDF("s").select(isValidString($"s")))
    assert(got == Seq(false, false, false, false, true))
  }

  test("D1 ticketmaster/seatgeek ISO normalization") {
    val got = one(Seq(("2025-10-02 20:00:00", "Ticketmaster"))
      .toDF("d", "src").select(standardizeDate($"d", $"src", 2025)))
    assert(got == Seq("2025-10-02T20:00:00"))
  }

  test("D1 nashville.com: year injection + central-time offset") {
    val got = one(Seq(
      ("October 2 @ 8:00 pm", "Nashville.com Events"),  // CDT
      ("January 5 @ 7 pm", "Nashville.com Events"))     // CST
      .toDF("d", "src").select(standardizeDate($"d", $"src", 2025)))
    assert(got == Seq("2025-10-02T20:00:00-05:00", "2025-01-05T19:00:00-06:00"))
  }

  test("D1 underdog: explicit year + tz abbreviation map") {
    val got = one(Seq(
      ("October 2, 2025 | 8:00PM CDT", "Underdog"),
      ("January 5, 2025 | 8:00PM EST", "Underdog"))
      .toDF("d", "src").select(standardizeDate($"d", $"src", 2025)))
    assert(got == Seq("2025-10-02T20:00:00-05:00", "2025-01-05T20:00:00-05:00"))
  }

  test("D1 yelp nulls out; unknown formats fall through unchanged") {
    val got = one(Seq(
      ("whenever", "Yelp"),
      ("every saturday", "Underdog"),
      ("2025-13-45 25:99", "Ticketmaster"))
      .toDF("d", "src").select(standardizeDate($"d", $"src", 2025)))
    assert(got == Seq(null, "every saturday", "2025-13-45 25:99"))
  }

  test("F6/F7 description assembly with caps") {
    val got = one(Seq(("4.5/5", "$$", null: String)).toDF("r", "p", "c")
      .select(assembleDescription(Seq(
        "Rating" -> $"r", "Price" -> $"p", "Categories" -> $"c"))))
    assert(got == Seq("Rating: 4.5/5 | Price: $$")) // null part drops out
    val capped = one(Seq("x" * 600).toDF("s").select(capDescription($"s")))
    assert(capped.head.toString.length == 500)
  }

  test("F11 key:value split keeps colons in the value") {
    val got = Seq("website: https://x.y:8080/p").toDF("s")
      .select(keyValueSplit($"s")).as[Seq[String]].collect().head
    assert(got == Seq("website", " https://x.y:8080/p"))
  }

  test("D2/D5 date concat and coalesce") {
    assert(one(Seq(("2025-10-02", "20:00:00")).toDF("d", "t")
      .select(concatDateTime($"d", $"t"))) == Seq("2025-10-02 20:00:00"))
    assert(one(Seq((null: String, "2025-10-02T19:00:00")).toDF("u", "l")
      .select(coalesceDates($"u", $"l"))) == Seq("2025-10-02T19:00:00"))
  }

  test("eventTs derives a typed timestamp from the stringly event_date") {
    val got = Seq("2025-10-02T20:00:00-05:00", "2025-10-02T20:00:00",
      "garbage").toDF("s")
      .select(eventTs($"s").cast("string")).collect().map(_.getString(0))
    assert(got(0) == "2025-10-03 01:00:00") // offset applied (UTC session)
    assert(got(1) == "2025-10-02 20:00:00")
    assert(got(2) == null)
  }

  test("D3 display format") {
    val got = one(Seq("2024-01-01 00:09:58").toDF("s")
      .select(displayDate($"s".cast("timestamp"))))
    assert(got == Seq("Jan 01, 2024 at 12:09 AM"))
  }
}
