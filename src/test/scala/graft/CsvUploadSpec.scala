package graft

import org.apache.spark.sql.functions._
import graft.ingest.CsvUpload
import graft.ops.Standardize
import graft.query.Dashboard

class CsvUploadSpec extends SparkSpec {
  import spark.implicits._

  private def res(name: String): String =
    getClass.getResource(s"/$name").getPath

  test("clean CSV: canonical headers pass through") {
    val df = CsvUpload.parse(spark, res("sample_clean.csv"))
    assert(df.count() == 2)
    val fest = df.filter($"name" === "Music Fest").collect().head
    assert(fest.getAs[String]("url") == "http://ex.com/fest")
    assert(fest.getAs[Double]("latitude") == 36.16)
  }

  test("messy CSV: 11 synonym headers resolve to canonical fields") {
    val df = CsvUpload.parse(spark, res("messy_headers.csv"))
    val honky = df.filter($"name" === "Honky Tonk Night").collect().head
    assert(honky.getAs[String]("url") == "http://ex.com/honky") // Link
    assert(honky.getAs[String]("venue_name") == "Broadway Bar") // Venue
    assert(honky.getAs[String]("venue_address") == "412 Broadway")
    assert(honky.getAs[String]("event_date") == "October 2 @ 8:00 pm")
    assert(honky.getAs[Double]("price") == 15.0)                // Cost F5
    val slam = df.filter($"name" === "Poetry Slam").collect().head
    assert(slam.getAs[Double]("price") == 0.0)                  // FREE
    assert(slam.getAs[String]("url").startsWith("document://")) // F9
  }

  test("encoding: latin-1 bytes are detected and decoded without mojibake") {
    val dir = java.nio.file.Files.createTempDirectory("graft-enc")
    val f = dir.resolve("latin1.csv")
    // "Café Olé" in ISO-8859-1: 0xE9 is malformed as UTF-8
    java.nio.file.Files.write(f,
      "name,url\nCafé Olé,http://ex.com/cafe\n"
        .getBytes(java.nio.charset.StandardCharsets.ISO_8859_1))
    assert(!CsvUpload.filesDecodeAsUtf8(spark, f.toString))
    val names = CsvUpload.parse(spark, f.toString)
      .select("name").as[String].collect()
    assert(names.toSeq == Seq("Café Olé"))
    // and a genuine UTF-8 file with the same text stays UTF-8
    val g = dir.resolve("utf8.csv")
    java.nio.file.Files.write(g,
      "name,url\nCafé Olé,http://ex.com/cafe\n"
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    assert(CsvUpload.filesDecodeAsUtf8(spark, g.toString))
    val names2 = CsvUpload.parse(spark, g.toString)
      .select("name").as[String].collect()
    assert(names2.toSeq == Seq("Café Olé"))
  }

  test("extreme CSV: invalid values degrade to null, bad rows drop") {
    val df = CsvUpload.parse(spark, res("extreme.csv"))
    assert(df.count() == 2) // single-char name dropped (P7)
    val food = df.filter($"name" === "Food Truck Fest").collect().head
    assert(food.getAs[Any]("latitude") == null)       // 36.abc -> null F13
    assert(food.getAs[Double]("longitude") == -86.9)
    assert(food.getAs[Double]("price") == 5.0)        // $5
    assert(food.getAs[String]("url") == "www.foodtruckfest")
    // unparseable dates kept raw (D1 fallthrough happens downstream)
    assert(food.getAs[String]("event_date") == "2025-13-45 25:99")
  }

  test("A5 reject statistics tally") {
    val raw = CsvUpload.readCsv(spark, res("extreme.csv"))
    val stats = CsvUpload.rejectStats(raw).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(stats("yielded") == 2 && stats("invalid_name") == 1)
  }

  test("F10 url absolutization") {
    val got = Seq(("http://ex.com/events/", "details/5"),
      ("http://ex.com/a", "http://other.com/x"))
      .toDF("base", "href")
      .select(Standardize.resolveUrl($"base", $"href"))
      .as[String].collect().toSeq
    assert(got == Seq("http://ex.com/events/details/5", "http://other.com/x"))
  }

  test("S6 config-driven field extraction builder") {
    import graft.ingest.ConfigSelect
    import graft.ingest.ConfigSelect.FieldRule
    val raw = Seq(("big show", "8pm", null: String))
      .toDF("title", "showtime", "loc")
    val got = ConfigSelect(raw, Seq(
      FieldRule("name", "initcap(title)"),
      FieldRule("event_date", "concat('today ', showtime)"),
      FieldRule("venue_city", "loc", default = Some("Nashville"))))
      .collect().head
    assert(got.getString(0) == "Big Show")
    assert(got.getString(1) == "today 8pm")
    assert(got.getString(2) == "Nashville") // default injected
  }

  test("S8 workbook: valid first sheet wins, ignoring later sheets") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx")
    val s1 = dir.resolve("sheet1.csv")
    val s2 = dir.resolve("sheet2.csv")
    java.nio.file.Files.writeString(s1,
      "name,url\nMusic Fest,http://ex.com/fest\n")
    java.nio.file.Files.writeString(s2,
      "title,link\nOther Show,http://ex.com/other\n")
    val df = CsvUpload.parseWorkbookSheets(spark,
      Seq(s1.toString, s2.toString))
    // first sheet yielded items -> reference returns ONLY sheet 0
    assert(df.select("name").as[String].collect().toSeq == Seq("Music Fest"))
  }

  test("S8 workbook: empty first sheet falls back to union of all sheets") {
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx2")
    val s1 = dir.resolve("sheet1.csv")
    val s2 = dir.resolve("sheet2.csv")
    val s3 = dir.resolve("sheet3.csv")
    // sheet 1 has rows but none survive the P7 name gate (no valid items,
    // matching the reference's `if not items` — not merely an empty file)
    java.nio.file.Files.writeString(s1, "name,url\nab,http://ex.com/x\n")
    // sheets use DIFFERENT header synonyms; unionByName must align them
    java.nio.file.Files.writeString(s2,
      "title,link,cost\nHonky Tonk Night,http://ex.com/honky,$15\n")
    java.nio.file.Files.writeString(s3,
      "event_name,website\nPoetry Slam,http://ex.com/slam\n")
    val df = CsvUpload.parseWorkbookSheets(spark,
      Seq(s1.toString, s2.toString, s3.toString))
    val rows = df.orderBy("name").collect()
    assert(rows.map(_.getAs[String]("name")).toSeq ==
      Seq("Honky Tonk Night", "Poetry Slam"))
    assert(rows.head.getAs[Double]("price") == 15.0) // Cost synonym, F5
    assert(rows.head.getAs[String]("url") == "http://ex.com/honky")
  }

  test("W5 page-link window") {
    assert(Dashboard.pageLinks(1, 10) == Seq(1, 2, 3, 4, 5))
    assert(Dashboard.pageLinks(6, 10) == Seq(4, 5, 6, 7, 8))
    assert(Dashboard.pageLinks(10, 10) == Seq(6, 7, 8, 9, 10))
    assert(Dashboard.pageLinks(1, 2) == Seq(1, 2))
  }
}
