package graft

import org.apache.spark.sql.functions._
import graft.ops.JoinOps

class JoinOpsSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("bloom join: prunes the fact side yet equals the plain join") {
    val fact = Tables.t(spark, dir, "lineitem")
      .select("l_suppkey", "l_extendedprice")
    val dim = Tables.t(spark, dir, "supplier")
      .filter(col("s_nationkey") === 3)
      .select("s_suppkey", "s_name")
    val bloomed = JoinOps.bloomPrunedJoin(fact, dim, "l_suppkey", "s_suppkey")
    val plain = fact.join(dim, col("l_suppkey") === col("s_suppkey"))
    assert(bloomed.count() == plain.count())
    // the pre-filter must actually cut the fact side (no false negatives
    // is the correctness half; pruning is the point at scale)
    val n = dim.count()
    val bf = dim.stat.bloomFilter("s_suppkey", math.max(n, 1), 0.01)
    val kept = fact.filter(udf((k: java.lang.Long) =>
      k != null && bf.mightContainLong(k)).apply(col("l_suppkey"))).count()
    assert(kept < fact.count() / 2,
      s"bloom kept $kept of ${fact.count()} fact rows — not pruning")
  }

  test("bloom join: empty dim yields an empty join, not an NPE") {
    val fact = Seq((1L, 1.0), (2L, 2.0)).toDF("k", "v")
    val dim = Seq.empty[(Long, String)].toDF("dk", "name")
    assert(JoinOps.bloomPrunedJoin(fact, dim, "k", "dk").count() == 0)
  }

  test("cdcCompact: latest change wins, deleted keys drop out") {
    val changes = Seq(
      (1L, 10L, "upsert", 1.0),
      (2L, 10L, "upsert", 2.0), // latest for key 10
      (3L, 20L, "upsert", 3.0),
      (4L, 20L, "delete", 0.0), // key 20 deleted last -> gone
      (5L, 30L, "delete", 0.0),
      (6L, 30L, "upsert", 6.0)) // deleted then re-created -> kept
      .toDF("event_id", "key", "op", "v")
    val got = JoinOps.cdcCompact(changes, "key", "event_id", "event_id",
        "op", Seq("delete"))
      .orderBy("key").select("key", "v").as[(Long, Double)].collect().toSeq
    assert(got == Seq((10L, 2.0), (30L, 6.0)))
  }

  test("scd2: runs compress, intervals chain, last version is current") {
    val changes = Seq(
      (1L, 10L, "bronze"), (2L, 10L, "bronze"), // same run, compressed
      (3L, 10L, "silver"), (4L, 10L, "gold"),
      (5L, 20L, "bronze"))
      .toDF("event_id", "key", "tier")
    val got = JoinOps.scd2(changes, "key", "event_id", "event_id", "tier")
      .select("key", "tier", "valid_from", "valid_to", "is_current")
      .orderBy("key", "valid_from")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))
      .toSeq
    assert(got == Seq(
      (10L, "bronze", 1L, Some(3L), false),
      (10L, "silver", 3L, Some(4L), false),
      (10L, "gold", 4L, None, true),
      (20L, "bronze", 5L, None, true)))
  }
}
