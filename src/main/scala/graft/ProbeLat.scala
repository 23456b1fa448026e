package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe: decompose per-stage turnaround latency in the bench's
  * local-mode session — how much wall a trivial exchange+agg pays beyond
  * its task time, and how that scales with chained exchanges. */
object ProbeLat {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](label: String)(f: => A): Unit = {
      val runs = (1 to 5).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e6
      }
      println(f"$label%-40s ${runs.map(r => f"$r%7.1f").mkString(" ")} ms")
    }

    // decompose one job: submit→stage→task latencies
    val events = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        def now: Long = System.currentTimeMillis()
        override def onJobStart(
            e: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          events.add(s"$now jobStart ${e.jobId}")
        override def onJobEnd(
            e: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
          events.add(s"$now jobEnd ${e.jobId}")
        override def onStageSubmitted(
            e: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
          events.add(s"$now stageSubmit ${e.stageInfo.stageId} " +
            s"${e.stageInfo.numTasks}t")
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
          events.add(s"$now stageDone ${e.stageInfo.stageId} " +
            s"sub=${e.stageInfo.submissionTime.getOrElse(-1L)} " +
            s"done=${e.stageInfo.completionTime.getOrElse(-1L)}")
      })

    val df = spark.range(100000).select(col("id"),
      (col("id") % 97).as("k"), (col("id") % 13).as("v"))

    time("noop count")(df.count())
    // one instrumented agg run after warm-up
    events.clear()
    val t0 = System.currentTimeMillis()
    df.groupBy("k").count().count()
    val t1 = System.currentTimeMillis()
    println(s"--- instrumented agg: wall ${t1 - t0} ms, t0=$t0 t1=$t1")
    events.forEach(e => println(s"  $e"))
    time("1 exchange: groupBy(k).count")(
      df.groupBy("k").count().count())
    time("2 chained: groupBy(k),groupBy(v%)")(
      df.groupBy("k").agg(sum("v").as("s"))
        .groupBy(col("s") % 7).count().count())
    time("4 chained aggs")(
      df.groupBy("k").agg(sum("v").as("s"))
        .groupBy((col("s") % 101).as("a")).agg(sum("s").as("t"))
        .groupBy((col("t") % 53).as("b")).agg(sum("t").as("u"))
        .groupBy((col("u") % 7).as("c")).count().count())
    time("broadcast join of agg")(
      df.join(broadcast(df.groupBy("k").agg(sum("v").as("s"))), "k")
        .count())
    time("bcast chain x3") {
      val m1 = df.groupBy("k").agg(sum("v").as("s"))
      val j1 = df.join(broadcast(m1), "k")
        .select(col("k"), (col("v") + col("s")).as("v2"))
      val m2 = j1.groupBy("k").agg(sum("v2").as("s2"))
      val j2 = j1.join(broadcast(m2), "k")
        .select(col("k"), (col("v2") + col("s2")).as("v3"))
      j2.groupBy("k").agg(sum("v3")).count()
    }
    time("orderBy (range part)")(
      df.groupBy("k").agg(sum("v").as("s")).orderBy("k").count())
    spark.stop()
  }
}
