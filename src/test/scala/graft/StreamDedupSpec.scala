package graft

import graft.streaming.StreamDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Watermark-bounded streaming dedup: duplicates inside the horizon are
  * dropped exactly once; state expires with the watermark (a re-delivery
  * past the horizon re-emits — the documented at-least-once residue an
  * idempotent sink absorbs). */
class StreamDedupSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Long) = new java.sql.Timestamp(sec * 1000L)

  test("duplicates within the watermark horizon emit exactly once") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val out = StreamDedup.dedupWithinWatermark(
      in.toDF().toDF("id", "ts"), "id", "ts", watermarkSec = 30)
    val q = out.select(col("id"), unix_timestamp(col("ts")).as("t"))
      .writeStream.format("memory").queryName("sd_once").start()
    try {
      in.addData((1L, ts(100)), (1L, ts(100)), (2L, ts(110)))
      q.processAllAvailable()
      in.addData((1L, ts(105)), (2L, ts(112))) // re-deliveries, in horizon
      q.processAllAvailable()
      val got = spark.table("sd_once").select("id")
        .as[Long].collect().sorted.toSeq
      assert(got === Seq(1L, 2L),
        s"each id exactly once inside the horizon, got $got")
    } finally q.stop()
  }

  test("state expires with the watermark: a late re-delivery re-emits") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, java.sql.Timestamp)]
    val out = StreamDedup.dedupWithinWatermark(
      in.toDF().toDF("id", "ts"), "id", "ts", watermarkSec = 30)
    val q = out.select(col("id"), unix_timestamp(col("ts")).as("t"))
      .writeStream.format("memory").queryName("sd_expire").start()
    try {
      in.addData((1L, ts(100)))
      q.processAllAvailable()
      // advance the watermark far past id 1's expiry (100 + 30)
      in.addData((9L, ts(1000)))
      q.processAllAvailable()
      // id 1's state is gone: this duplicate (well above the watermark,
      // so not dropped as late) is indistinguishable from a new event
      // and re-emits (the idempotent-sink contract takes over)
      in.addData((1L, ts(990)))
      q.processAllAvailable()
      val ones = spark.table("sd_expire").filter(col("id") === 1).count()
      assert(ones === 2L,
        s"expected the post-expiry re-delivery to re-emit, got $ones rows")
    } finally q.stop()
  }
}
