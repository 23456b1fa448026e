package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Self-measured scale probe (dev tool, not part of the engine): builds
  * a ×N corpus from sf0.1 by key-shift replication and times the most
  * expensive registered queries at both scales, printing the measured
  * scaling exponent per query (log-ratio of warm medians / log N).
  *
  * Replication preserves WORKLOAD SHAPE, which naive copying would not:
  *   - documents: each copy's tokens get a copy suffix, so shingle/token
  *     spaces are DISJOINT across copies — the duplicate-group and
  *     posting-list distributions replicate per copy instead of every
  *     copy of a doc pairing with every other (which would grow pair
  *     outputs ×N² and measure output explosion, not engine scaling).
  *   - embeddings: each copy applies a copy-keyed deterministic sign
  *     flip per dimension — intra-copy geometry (distances up to sign
  *     pattern, cluster structure) is preserved while cross-copy cosines
  *     land near zero, so ANN candidate sets replicate per copy.
  *
  * Usage: runMain graft.ScaleProbe [mult] [q1,q2,...]
  * Writes the corpus under /tmp/graft_scaleprobe/sfX<mult> (reused if
  * present), prints one line per query: name, t(sf0.1), t(×N), exponent.
  */
object ScaleProbe {

  private val defaultProbe = Seq(
    "q75_jaccard_prefix", "q16_jaccard_pairs", "q157_triangle_census",
    "q100_pagerank", "q156_split_leakage", "q150_dup_span",
    "q76_stemmed_search", "q178_lm_fluency", "q74_ann_self_join",
    "q40_embedding_dups", "q173_paragraph_dedup", "q102_bpe_merges")

  def main(args: Array[String]): Unit = {
    val mult = args.headOption.map(_.toInt).getOrElse(10)
    val probe = args.lift(1).map(_.split(",").map(_.trim).toSeq)
      .getOrElse(defaultProbe)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val base = "/root/testdata/sf0.1"
    val big = s"/tmp/graft_scaleprobe/sfX$mult"
    if (!new java.io.File(s"$big/_READY").exists()) buildCorpus(spark, base, big, mult)

    def warmMedian(fn: (SparkSession, String) => DataFrame, dir: String,
        runs: Int = 3): Double = {
      fn(spark, dir).count() // warm: codegen + page cache
      val ts = (1 to runs).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      ts.sorted.apply(runs / 2)
    }

    println(f"${"query"}%-24s ${"t_sf0.1"}%8s ${"t_x" + mult}%8s ${"exponent"}%9s")
    probe.foreach { name =>
      SparkEntry.queries.get(name) match {
        case None => println(f"$name%-24s MISSING")
        case Some(fn) =>
          try {
            val t1 = warmMedian(fn, base)
            graft.SessionCaches.resetAll()
            val tN = warmMedian(fn, big)
            graft.SessionCaches.resetAll()
            val exp = math.log(tN / t1) / math.log(mult.toDouble)
            println(f"$name%-24s $t1%8.2f $tN%8.2f $exp%9.2f")
          } catch {
            case e: Throwable =>
              println(f"$name%-24s FAIL ${e.getClass.getSimpleName}: ${e.getMessage}")
          }
      }
    }
    spark.stop()
  }

  private def buildCorpus(spark: SparkSession, base: String, big: String,
      mult: Int): Unit = {
    new java.io.File(big).mkdirs()
    // all other tables: straight copies so every probe query resolves
    val names = new java.io.File(base).listFiles()
      .map(_.getName).filter(_.endsWith(".parquet"))
      .filterNot(n => n == "documents.parquet" ||
        n == "embeddings.parquet" || n == "events.parquet")
    names.foreach { n =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(base, n), java.nio.file.Paths.get(big, n),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val docs = Tables.t(spark, base, "documents")
    val nDocs = docs.agg(max(col("doc_id"))).head().getLong(0) + 1
    val bigDocs = (0 until mult).map { k =>
      docs.select(
        (col("doc_id") + lit(k * nDocs)).as("doc_id"),
        // token-wise copy suffix keeps copies shingle-disjoint
        (if (k == 0) col("text")
         else array_join(transform(split(col("text"), " "),
           t => concat(t, lit(s"~$k"))), " ")).as("text"),
        col("lang"), col("source"),
        // suffixed copies are LONGER — keep n_chars consistent with
        // text so length-gated probe queries see the same selectivity
        (if (k == 0) col("n_chars")
         else length(array_join(transform(split(col("text"), " "),
           t => concat(t, lit(s"~$k"))), " ")).cast("long")).as("n_chars"))
    }.reduce(_ union _)
    bigDocs.repartition(32).write.mode("overwrite")
      .parquet(s"$big/documents.parquet")
    val vecs = Tables.t(spark, base, "embeddings")
    val nVecs = vecs.agg(max(col("vec_id"))).head().getLong(0) + 1
    val bigVecs = (0 until mult).map { k =>
      vecs.select(
        (col("vec_id") + lit(k * nVecs)).as("vec_id"),
        // copy-keyed deterministic sign flip per dimension: intra-copy
        // geometry preserved, cross-copy cosines ~0
        (if (k == 0) col("embedding")
         else zip_with(col("embedding"),
           sequence(lit(0), size(col("embedding")) - 1),
           (v, i) => v * when(pmod(hash(lit(k), i), lit(2)) === 0, lit(1.0f))
             .otherwise(lit(-1.0f)))).as("embedding"),
        col("label"))
    }.reduce(_ union _)
    bigVecs.repartition(8).write.mode("overwrite")
      .parquet(s"$big/embeddings.parquet")
    // events: user_id/event_id shift per copy — the event log grows ×N
    // as N new user populations with identical per-user histories, so
    // per-user window work, funnel shapes and per-type value
    // distributions replicate instead of per-user histories growing ×N
    val evs = Tables.t(spark, base, "events")
    val Array(evMax) = evs
      .agg(max(col("event_id")), max(col("user_id"))).collect()
    val (nEv, nUs) = (evMax.getLong(0) + 1, evMax.getLong(1) + 1)
    val bigEvs = (0 until mult).map { k =>
      evs.select(
        (col("event_id") + lit(k * nEv)).as("event_id"), col("ts"),
        (col("user_id") + lit(k * nUs)).as("user_id"),
        col("event_type"), col("value"), col("props"))
    }.reduce(_ union _)
    bigEvs.repartition(16).write.mode("overwrite")
      .parquet(s"$big/events.parquet")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(big, "_READY"), "ok")
    println(s"[scaleprobe] built $big (x$mult)")
  }
}
