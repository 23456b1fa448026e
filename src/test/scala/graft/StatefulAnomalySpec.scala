package graft

import graft.streaming.StatefulAnomaly
import graft.streaming.StatefulAnomaly.{Flag, Obs}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

/** Streaming Welford anomaly detection: warm-up suppression, prequential
  * flagging across micro-batches, per-key state isolation. */
class StatefulAnomalySpec extends SparkSpec {
  import spark.implicits._

  test("flags outliers against prior-moment state; warm-up stays silent") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[Obs]
    val q = StatefulAnomaly.detect(in.toDS(), minObs = 10, zThreshold = 3.0)
      .writeStream.format("memory").queryName("anom_out")
      .outputMode(OutputMode.Append).start()
    try {
      // batch 1 — warm-up: 10 alternating values for key g (mean 10,
      // sd 1); key c gets constant values (sd 0, can never flag)
      in.addData((0 until 10).map(i =>
        Obs("g", if (i % 2 == 0) 9.0 else 11.0)) ++
        (0 until 12).map(_ => Obs("c", 5.0)): _*)
      q.processAllAvailable()
      assert(spark.table("anom_out").count() == 0,
        "warm-up batch must not flag")

      // batch 2 — g gets a wild outlier (z ≈ 990) and a normal value;
      // c gets the same value again (sd still 0 → never flags)
      in.addData(Obs("g", 1000.0), Obs("c", 5.0))
      q.processAllAvailable()
      val flagged = spark.table("anom_out").as[Flag].collect()
      assert(flagged.map(f => (f.key, f.value)).toSet ==
        Set(("g", 1000.0)))
      assert(flagged.head.z > 100)

      // batch 3 — a normal g value: the outlier widened the running sd,
      // but 11.0 is still well inside ±3 of the updated moments
      in.addData(Obs("g", 11.0))
      q.processAllAvailable()
      assert(spark.table("anom_out").count() == 1, "normal value silent")
    } finally q.stop()
  }
}
