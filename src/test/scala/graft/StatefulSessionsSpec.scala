package graft

import java.sql.Timestamp
import java.nio.file.Files
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.{GroupStateTimeout, Trigger}
import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{ClosedSession, Ev}

class StatefulSessionsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  test("flatMapGroupsWithState closes sessions on gap across restarts") {
    implicit val sqlCtx = spark.sqlContext
    // A stateful query under a processing-time trigger reruns batches
    // continuously (timeout checks), so drive it deterministically:
    // AvailableNow runs + a shared checkpoint carrying state across runs.
    val base = Files.createTempDirectory("graft_sessions").toString
    val ck = s"$base/ck"; val out = s"$base/out"
    val input = MemoryStream[Ev]
    def runOnce(): Unit = {
      val q = StatefulSessions
        .track(input.toDS(), gapSeconds = 1800,
          timeout = GroupStateTimeout.NoTimeout)
        .writeStream.outputMode("append")
        .format("parquet").option("path", out)
        .option("checkpointLocation", ck)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }
    // run 1: user 1 two events 10 min apart (open session), user 2 one
    input.addData(Ev(1, ts(0), 5.0), Ev(1, ts(10), 7.0), Ev(2, ts(0), 1.0))
    runOnce()
    assert(spark.read.parquet(out).count() == 0) // nothing closed yet
    // run 2: user 1 jumps 60 min -> closes the first session; state for
    // users 1 and 2 was restored from the checkpoint
    input.addData(Ev(1, ts(70), 2.0))
    runOnce()
    val closed = spark.read.parquet(out).as[ClosedSession].collect()
    assert(closed.length == 1)
    val s = closed.head
    assert(s.user_id == 1 && s.n_events == 2 && s.sum_value == 12.0)
    assert(s.start_ts == 0L && s.end_ts == 10 * 60000L)
  }
}
