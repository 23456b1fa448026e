package graft

import graft.streaming.StatefulCdc
import graft.streaming.StatefulCdc.{Change, Snapshot}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming CDC compaction: latest-wins state across micro-batches,
  * out-of-order suppression, delete tombstones. */
class StatefulCdcSpec extends SparkSpec {
  import spark.implicits._

  test("latest wins across batches; stale updates are suppressed") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Change]
    val q = StatefulCdc.compact(in.toDS(), deleteOps = Set("delete"))
      .writeStream.format("memory").queryName("cdc_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1: two keys
      in.addData(Change(1, 10, 1, "upsert", 1.0),
        Change(2, 10, 2, "upsert", 2.0))
      q.processAllAvailable()
      // batch 2: key 1 advances; key 2 receives a STALE change (order 5)
      in.addData(Change(1, 20, 3, "upsert", 1.5),
        Change(2, 5, 4, "upsert", 9.9))
      q.processAllAvailable()
      // batch 3: key 1 deleted; a late update older than the delete
      in.addData(Change(1, 30, 5, "delete", 0.0))
      q.processAllAvailable()
      in.addData(Change(1, 25, 6, "upsert", 7.7))
      q.processAllAvailable()

      val out = spark.table("cdc_out").as[Snapshot].collect().toSeq
      val byKey = out.groupBy(_.key)
      // key 1: initial, update, tombstone — the late order-25 upsert
      // after the order-30 delete must NOT resurface
      assert(byKey(1L).map(s => (s.order, s.value, s.deleted)) ==
        Seq((10L, 1.0, false), (20L, 1.5, false), (30L, 0.0, true)))
      // key 2: only the initial row; the stale order-5 change is silent
      assert(byKey(2L).map(s => (s.order, s.value, s.deleted)) ==
        Seq((10L, 2.0, false)))
    } finally q.stop()
  }
}
