package graft

import graft.streaming.StreamQuota
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState quota admission: per-key counts persist across
  * micro-batches (the ValueState contract), admission is first-`limit`
  * in arrival order, and other keys are unaffected. Runs on the RocksDB
  * state store transformWithState requires. */
class StreamQuotaSpec extends SparkSpec {
  import spark.implicits._

  test("quota admits first N per key across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val in = MemoryStream[(Long, Long)]
    val q = StreamQuota.admit(in.toDS(), limit = 2)
      .toDF("k", "payload", "admitted")
      .writeStream.format("memory").queryName("quota_out").start()
    try {
      in.addData((1L, 10L), (1L, 11L), (2L, 20L))
      q.processAllAvailable()
      // the count SURVIVES into the next batch: 12/13 are over quota
      in.addData((1L, 12L), (2L, 21L), (1L, 13L))
      q.processAllAvailable()
      val got = spark.table("quota_out")
        .as[(Long, Long, Boolean)].collect().toSet
      assert(got === Set(
        (1L, 10L, true), (1L, 11L, true), (2L, 20L, true),
        (1L, 12L, false), (2L, 21L, true), (1L, 13L, false)))
    } finally {
      q.stop()
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }
}
