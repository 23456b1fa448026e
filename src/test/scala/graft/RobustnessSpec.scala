package graft

import org.apache.spark.sql.functions._
import graft.ingest.Normalize
import graft.ops.Partitioning

class RobustnessSpec extends SparkSpec {
  import spark.implicits._

  test("malformed payloads route to quarantine, not silent null-drops") {
    val bronze = Seq(
      (1L, "yelp", """{"name": "Good Row", "url": "http://x/1"}"""),
      (2L, "yelp", """{not json at all"""),
      (3L, "yelp", """[1, 2, 3]"""), // json but not an object
      (4L, "yelp", null: String))
      .toDF("id", "source_spider", "raw_json")
    val (good, bad) = Normalize.quarantine(bronze)
    assert(bad.select("id").as[Long].collect().toSet == Set(2L, 3L))
    assert(good.count() == 2) // the parseable row + the null payload
    // quarantine preserves the raw payload for replay
    assert(bad.filter($"id" === 2).select("raw_json").as[String]
      .collect().head.startsWith("{not"))
  }

  test("parseAnySafe: poison blobs become typed rows, clean ones parse") {
    import graft.ingest.{DocParse, DocxCodec, PdfCodec}
    // clean PDF parses Right
    val pdf = PdfCodec.encode(Seq("Name: Safe Event", "Venue: Hall"))
    val ok = DocParse.parseAnySafe(pdf)
    assert(ok.isRight && ok.toOption.get._1 == "pdf")
    // truncated PDF (magic intact, structure gone) → quarantine row,
    // not a thrown exception
    val poisonPdf = pdf.take(pdf.length / 2)
    val q1 = DocParse.parseAnySafe(poisonPdf)
    assert(q1.isLeft, "truncated PDF must quarantine")
    assert(q1.swap.toOption.get.format == "pdf")
    assert(q1.swap.toOption.get.error.nonEmpty)
    // truncated docx → quarantine
    val docx = DocxCodec.encode(paragraphs = Seq("x"), tables = Nil)
    assert(DocParse.parseAnySafe(docx.take(docx.length / 2)).isLeft)
    // zip magic with no readable structure → quarantine, format 'zip'
    val junkZip = Array('P'.toByte, 'K'.toByte, 3.toByte, 4.toByte) ++
      Array.tabulate[Byte](32)(k => (k * 37 % 251).toByte)
    val q2 = DocParse.parseAnySafe(junkZip)
    assert(q2.isLeft && q2.swap.toOption.get.format == "zip")
    // a Dataset map over MIXED clean+poison blobs completes (the
    // 100 TB property: one corrupt blob must not abort the task)
    val rows = Seq((1L, pdf), (2L, poisonPdf), (3L, junkZip))
      .toDF("id", "bin").as[(Long, Array[Byte])]
      .map { case (id, b) =>
        (id, DocParse.parseAnySafe(b).fold(_ => "quarantined", _ => "ok"))
      }
      .collect().toMap
    assert(rows == Map(1L -> "ok", 2L -> "quarantined",
      3L -> "quarantined"))
  }

  test("containmentPairs: empty shingle sets never divide by zero") {
    val df = Seq(
      (1L, Seq("a", "b")),
      (2L, Seq.empty[String]), // no shingles — must drop out, not NaN
      (3L, Seq("a", "b")))
      .toDF("id", "toks")
    val got = graft.ops.DedupOps.containmentPairs(df, "id", "toks", 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.toSet == Set((1L, 3L, 1.0), (3L, 1L, 1.0)))
  }

  test("pagerank loop body tolerates an empty edge set") {
    // the registered query derives edges from real tables, but the loop
    // shape must not NPE/throw when a filter upstream leaves no edges
    import org.apache.spark.sql.types._
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("src", LongType),
        StructField("dst", LongType))))
    val deg = empty.groupBy("src").agg(count(lit(1)).as("deg"))
    assert(deg.count() == 0)
    val joined = empty.join(broadcast(deg), "src")
    assert(joined.localCheckpoint().count() == 0)
  }

  test("gopher signals are total on whitespace-edge texts") {
    val df = Seq((1L, "word"), (2L, "a b"), (3L, "  "), (4L, ""))
      .toDF("doc_id", "text")
    // same expressions as q96 (split on single space, not regex)
    val toks = split(lower(col("text")), " ")
    val out = df.select(col("doc_id"), size(toks).as("n"),
      (aggregate(toks, lit(0L), (a, w) => a + length(w)).cast("double")
        / size(toks)).as("mwl")).collect()
    assert(out.length == 4) // no exception = total
    // empty string still yields one empty token — mwl 0, never NaN/error
    val empt = out.find(_.getLong(0) == 4L).get
    assert(empt.getInt(1) == 1 && empt.getDouble(2) == 0.0)
  }

  test("salted join is row-identical to the plain join") {
    val big = (1 to 2000).map(i => (if (i % 10 == 0) "hot" else s"k$i", i))
      .toDF("key", "v") // 'hot' carries 10% of all rows
    val small = Seq(("hot", "H"), ("k1", "A"), ("k2", "B"))
      .toDF("key", "label")
    val plain = big.join(small, Seq("key"))
      .select("key", "v", "label").orderBy("key", "v").collect().toSeq
    val salted = Partitioning.saltedJoin(big, small, "key", 8)
      .select("key", "v", "label").orderBy("key", "v").collect().toSeq
    assert(salted == plain)
    assert(plain.count(_.getString(0) == "hot") == 200)
  }

  test("salted agg equals plain agg on skewed keys") {
    val df = (1 to 5000)
      .map(i => (if (i % 2 == 0) "hot" else s"k${i % 7}", i.toDouble / 100))
      .toDF("key", "value")
    val plain = df.groupBy("key")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast(org.apache.spark.sql.types.DecimalType(30, 2)))
          .cast("double").as("sum_value"))
      .orderBy("key").collect().toSeq
    val salted = Partitioning.saltedCountSum(df, "key", "value", 2, 8)
      .orderBy("key").collect().toSeq
    assert(salted == plain)
  }

  test("corrupt parquet file: loud by default, skippable by explicit flag") {
    // at fleet scale a few corrupt files among millions are a fact of
    // life; the engine must fail LOUDLY unless the operator explicitly
    // opts into skipping — and then still return every good row
    val dir = java.nio.file.Files.createTempDirectory("graft_corrupt")
    spark.range(100).toDF("id").repartition(2)
      .write.mode("overwrite").parquet(dir.toString)
    java.nio.file.Files.write(dir.resolve("part-junk.parquet"),
      "this is not a parquet file".getBytes("UTF-8"))
    val loud = intercept[Exception] {
      spark.read.parquet(dir.toString).count()
    }
    assert(loud != null)
    spark.conf.set("spark.sql.files.ignoreCorruptFiles", "true")
    try assert(spark.read.parquet(dir.toString).count() == 100)
    finally spark.conf.unset("spark.sql.files.ignoreCorruptFiles")
  }
}
