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
}
