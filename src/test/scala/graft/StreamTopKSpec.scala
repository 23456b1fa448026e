package graft

import graft.streaming.StreamTopK
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState Misra–Gries heavy hitters: the bounded MapState
  * survives across micro-batches, the decrement-all-on-overflow rule
  * fires (an insert against a full map evicts instead of growing), and
  * group keys are isolated. Runs on the RocksDB state store
  * transformWithState requires. Every expected value below is the
  * hand-replay of the MG algorithm on the exact arrival order. */
class StreamTopKSpec extends SparkSpec {
  import spark.implicits._

  test("MG summary persists, bounds state at k, isolates groups") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state." +
        "RocksDBStateStoreProvider")
    val in = MemoryStream[(String, String)]
    val q = StreamTopK.heavyHitters(in.toDS(), k = 2)
      .toDF("grp", "item", "mg_count")
      .writeStream.format("memory").queryName("topk_out").start()
    try {
      // batch 1, group g: a a b c → a:1, a:2, b:1; then c hits a FULL
      // map → decrement-all: a:1, b evicted, c NOT inserted (classic MG)
      in.addData(("g", "a"), ("g", "a"), ("g", "b"), ("g", "c"))
      q.processAllAvailable()
      val afterB1 = spark.table("topk_out")
        .as[(String, String, Long)].collect().toSet
      assert(afterB1 === Set(("g", "a", 1L)))
      // batch 2: state SURVIVES — b re-inserts into the free slot,
      // a increments from its carried counter; new group h is isolated
      in.addData(("g", "b"), ("g", "a"), ("h", "x"))
      q.processAllAvailable()
      val all = spark.table("topk_out")
        .as[(String, String, Long)].collect().toSet
      assert(all === Set(
        ("g", "a", 1L),                      // batch-1 summary
        ("g", "a", 2L), ("g", "b", 1L),      // batch-2 summary for g
        ("h", "x", 1L)))                     // batch-2 summary for h
      // MG guarantee on the replay: n=6 items for g, k=2 → any item
      // with true freq > n/(k+1)=2 must be present: a (true 3) is
      val gLatest = Set(("a", 2L), ("b", 1L))
      assert(gLatest.exists(_._1 == "a"))
      // and no summary ever exceeds k entries
      assert(gLatest.size <= 2)
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
