package graft

import graft.streaming.StreamJoin
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermarked stream-stream interval join: same-key events within the
  * lag window match; outside it (or other keys) they don't; state stays
  * bounded by the watermark + lag horizon. */
class StreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("matches same-key pairs within the lag window only") {
    implicit val sqlCtx = spark.sqlContext
    val purchases = MemoryStream[(Long, java.sql.Timestamp)]
    val errors = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoin.intervalJoin(
      purchases.toDF().toDF("p_user", "p_ts"), "p_user", "p_ts",
      errors.toDF().toDF("e_user", "e_ts"), "e_user", "e_ts",
      maxLagSec = 60, watermarkSec = 30)
    val q = joined
      .select(col("p_user"), unix_timestamp(col("p_ts")).as("p"),
        unix_timestamp(col("e_ts")).as("e"))
      .writeStream.format("memory").queryName("sj_out").start()
    try {
      // user 1: error 50s after purchase (in window), another 100s after
      // (outside); user 2: error BEFORE its purchase (no match); user 3:
      // error in-window but different key from user 1's purchase
      purchases.addData((1L, ts(100)), (2L, ts(200)))
      errors.addData((1L, ts(150)), (1L, ts(200)), (2L, ts(190)),
        (3L, ts(110)))
      q.processAllAvailable()
      val out = spark.table("sj_out")
        .select("p_user", "p", "e").as[(Long, Long, Long)].collect().toSet
      assert(out == Set((1L, 100L, 150L)),
        s"exactly the in-window same-key pair joins, got $out")
    } finally q.stop()
  }

  test("join state expires: a late right event past the horizon is dropped") {
    implicit val sqlCtx = spark.sqlContext
    val left = MemoryStream[(Long, java.sql.Timestamp)]
    val right = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoin.intervalJoin(
      left.toDF().toDF("l_k", "l_ts"), "l_k", "l_ts",
      right.toDF().toDF("r_k", "r_ts"), "r_k", "r_ts",
      maxLagSec = 10, watermarkSec = 5)
    val q = joined.select(col("l_k"))
      .writeStream.format("memory").queryName("sj_exp").start()
    try {
      left.addData((1L, ts(100)))
      right.addData((9L, ts(100)))
      q.processAllAvailable()
      // advance both watermarks far past 100 + lag + delay
      left.addData((8L, ts(1000)))
      right.addData((9L, ts(1000)))
      q.processAllAvailable()
      // a matching right event arriving now is beneath the watermark —
      // the join must NOT emit it (left state for ts=100 is expired)
      right.addData((1L, ts(105)))
      q.processAllAvailable()
      assert(spark.table("sj_exp").count() == 0,
        "late beneath-watermark event must not join against expired state")
    } finally q.stop()
  }

  test("left outer: unmatched left emits null-padded after the horizon") {
    implicit val sqlCtx = spark.sqlContext
    val left = MemoryStream[(Long, java.sql.Timestamp)]
    val right = MemoryStream[(Long, java.sql.Timestamp)]
    val joined = StreamJoin.intervalJoinLeftOuter(
      left.toDF().toDF("l_k", "l_ts"), "l_k", "l_ts",
      right.toDF().toDF("r_k", "r_ts"), "r_k", "r_ts",
      maxLagSec = 10, watermarkSec = 5)
    val q = joined
      .select(col("l_k"), unix_timestamp(col("l_ts")).as("l"),
        col("r_k"))
      .writeStream.format("memory").queryName("sj_outer").start()
    try {
      // user 1 matches in-window; user 2 never gets a right event
      left.addData((1L, ts(100)), (2L, ts(100)))
      right.addData((1L, ts(105)))
      q.processAllAvailable()
      // nothing null-padded yet: user 2's window is still open
      val early = spark.table("sj_outer")
        .filter(col("r_k").isNull).count()
      assert(early == 0, "outer row emitted before the horizon closed")
      // advance both watermarks past 100 + lag(10) + delay(5)
      left.addData((8L, ts(1000)))
      right.addData((9L, ts(1000)))
      q.processAllAvailable()
      val rows = spark.table("sj_outer")
        .select(col("l_k"), col("r_k").isNull.as("unmatched"))
        .as[(Long, Boolean)].collect().toSet
      assert(rows.contains((1L, false)), s"matched pair missing: $rows")
      assert(rows.contains((2L, true)),
        s"unmatched left not null-padded after horizon: $rows")
    } finally q.stop()
  }
}
