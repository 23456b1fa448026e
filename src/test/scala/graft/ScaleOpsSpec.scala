package graft

import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, PrefixSum, RangeJoin, TextOps}

class ScaleOpsSpec extends SparkSpec {
  import spark.implicits._

  test("runningTotal matches the sequential prefix sum, negatives included") {
    val df = Seq((1L, 10.0), (2L, -5.0), (3L, 2.5), (7L, 100.0), (9L, -0.5),
      (12L, 4.0), (20L, 1.0)).toDF("k", "v")
    val got = PrefixSum.runningTotal(df, "k", col("v"), "run", buckets = 3)
      .orderBy("k").select("k", "run").as[(Long, Double)].collect().toSeq
    val expected = Seq(1L -> 10.0, 2L -> 5.0, 3L -> 7.5, 7L -> 107.5,
      9L -> 107.0, 12L -> 111.0, 20L -> 112.0)
    assert(got == expected)
  }

  test("runningTotal handles empty input and non-long key types") {
    val empty = Seq.empty[(Long, Double)].toDF("k", "v")
    assert(PrefixSum.runningTotal(empty, "k", col("v"), "run", 4)
      .count() == 0)
    val ints = Seq((1, 2.0), (5, 3.0), (9, 4.0)).toDF("k", "v")
    val gotInt = PrefixSum.runningTotal(ints, "k", col("v"), "run", 2)
      .orderBy("k").select("run").as[Double].collect().toSeq
    assert(gotInt == Seq(2.0, 5.0, 9.0))
    val dbl = Seq((0.5, 1.0), (1.5, 1.0), (2.5, 1.0)).toDF("k", "v")
    val gotDbl = PrefixSum.runningTotal(dbl, "k", col("v"), "run", 2)
      .orderBy("k").select("run").as[Double].collect().toSeq
    assert(gotDbl == Seq(1.0, 2.0, 3.0))
  }

  test("runningTotal with quantile buckets matches on heavily skewed keys") {
    // keys clustered at the low end + far outliers: fixed-width ranges
    // would put almost everything in bucket 0
    val rows = ((1L to 50L) ++ Seq(1000000L, 2000000L, 3000000L))
      .map(k => (k, k.toDouble))
    val df = rows.toDF("k", "v")
    val got = PrefixSum.runningTotal(df, "k", col("v"), "run", buckets = 4,
        quantileBuckets = true)
      .orderBy("k").select("k", "run").as[(Long, Double)].collect().toSeq
    val expected = rows.scanLeft(0.0)(_ + _._2).drop(1)
      .zip(rows.map(_._1)).map { case (run, k) => (k, run) }
    assert(got == expected)
  }

  test("formats round-trip: json, orc, csv sinks preserve the data") {
    val dir = java.nio.file.Files.createTempDirectory("graft-fmt").toString
    val df = Seq((1L, "a,b \"q\"", 1.5), (2L, null, -0.25), (3L, "äöü", 0.0))
      .toDF("id", "s", "x")
    df.write.mode("overwrite").json(s"$dir/j")
    df.write.mode("overwrite").orc(s"$dir/o")
    df.write.mode("overwrite").option("header", "true").csv(s"$dir/c")
    val j = spark.read.schema(df.schema).json(s"$dir/j")
    val o = spark.read.orc(s"$dir/o")
    val c = spark.read.schema(df.schema).option("header", "true")
      .csv(s"$dir/c")
    Seq(j, o, c).foreach { back =>
      assert(back.orderBy("id").collect().toSeq ==
        df.orderBy("id").collect().toSeq)
    }
  }

  test("connectedComponents: chain merges to one cluster, islands stay apart") {
    // chain 1-2-3-4-5 (diameter forces several propagation rounds), pair
    // 10-11, and 20-21-22 as a triangle
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L),
      (20L, 21L), (21L, 22L), (20L, 22L)).toDF("a_id", "b_id")
    val got = DedupOps.connectedComponents(edges)
      .orderBy("node").as[(Long, Long)].collect().toSeq
    assert(got == Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 5L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("pointInInterval: bucket-spanning intervals, inclusive start, exclusive end") {
    // width 10: interval A [5, 25) spans buckets 0,1,2; B [30, 40) exactly
    // bucket 3; points at the boundaries probe inclusivity
    val intervals = Seq(("A", 5L, 25L), ("B", 30L, 40L)).toDF("iv", "s", "e")
    val points = Seq(("p5", 5L), ("p24", 24L), ("p25", 25L), ("p30", 30L),
      ("p39", 39L), ("p40", 40L)).toDF("p", "ts")
    val got = RangeJoin.pointInInterval(points, "ts", intervals, "s", "e", 10L)
      .select("p", "iv").as[(String, String)].collect().toSet
    assert(got == Set("p5" -> "A", "p24" -> "A", "p30" -> "B", "p39" -> "B"))
  }

  test("ngrams keeps multiplicity where shingles dedups") {
    val df = Seq("a b a b a").toDF("text")
    val r = df.select(
      TextOps.ngrams(TextOps.tokens($"text"), 2).as("ng"),
      TextOps.shingles(TextOps.tokens($"text"), 2).as("sh")).collect().head
    assert(r.getSeq[String](0) == Seq("a b", "b a", "a b", "b a"))
    assert(r.getSeq[String](1) == Seq("a b", "b a"))
  }

  test("redactPii masks emails and phones; counts match") {
    val df = Seq(
      "reach me at jane.doe+x@ex-ample.org or (615) 555-0101 / 615-555-0199",
      "no pii here").toDF("text")
    val got = df.select(
      TextOps.redactPii($"text").as("red"),
      TextOps.piiCount($"text", TextOps.emailRe).as("ne"),
      TextOps.piiCount($"text", TextOps.phoneRe).as("np"))
      .collect()
    assert(got(0).getString(0) ==
      "reach me at [EMAIL] or [PHONE] / [PHONE]")
    assert(got(0).getLong(1) == 1 && got(0).getLong(2) == 2)
    assert(got(1).getString(0) == "no pii here")
    assert(got(1).getLong(1) == 0 && got(1).getLong(2) == 0)
  }

  test("compact: many small files -> few range-clustered sorted files") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("cmp").toString
    // 64 tiny files of interleaved keys (the streaming-sink debris shape)
    spark.range(10000).select(col("id"), (col("id") * 7 % 10000).as("k"))
      .repartition(64)
      .write.mode("overwrite").parquet(s"$dir/small")
    val smallFiles = new java.io.File(s"$dir/small")
      .listFiles().count(_.getName.endsWith(".parquet"))
    assert(smallFiles == 64)

    graft.ops.Partitioning.compact(
      spark.read.parquet(s"$dir/small"), s"$dir/big", "k",
      targetRowsPerFile = 2500L)
    val out = new java.io.File(s"$dir/big")
      .listFiles().filter(_.getName.endsWith(".parquet"))
    // range sampling can split unevenly by a file or two; the hard
    // invariants are the order-of-magnitude reduction and the bands below
    assert(out.length >= 3 && out.length <= 8,
      s"10k rows / 2.5k target -> ~4 files, got ${out.length}")

    // range clustering: per-file [min, max] bands on k must not overlap
    // (footer-stats file pruning depends on exactly this)
    val bands = out.map { f =>
      val d = spark.read.parquet(f.getAbsolutePath)
        .agg(min(col("k")), max(col("k"))).collect()(0)
      (d.getLong(0), d.getLong(1))
    }.sortBy(_._1)
    bands.sliding(2).foreach {
      case Array((_, hi), (lo2, _)) =>
        assert(hi < lo2, s"file key bands overlap: $hi >= $lo2")
      case _ =>
    }
    // nothing lost
    assert(spark.read.parquet(s"$dir/big").count() == 10000)
  }

  test("z-order clustering bounds BOTH columns' per-file ranges") {
    import org.apache.spark.sql.functions._
    // two independent uniform keys in [0, 1024): a linear sort on x
    // leaves each file's y-range ~full-width; the Morton interleave must
    // shrink the y side too (that's the whole point — footer-stats
    // pruning for predicates on either column)
    val dir = java.nio.file.Files.createTempDirectory("zord").toString
    val df = spark.range(16384).select(
      ((col("id") * 2654435761L) % 1024).as("x"),
      ((col("id") * 40503) % 1024).as("y"))
    graft.ops.Partitioning.compact(df, s"$dir/linear", "x", 1024L)
    graft.ops.Partitioning.compactZOrder(df, s"$dir/zorder", "x", "y",
      bits = 10, targetRowsPerFile = 1024L)
    def meanRange(path: String, c: String): Double = {
      val files = new java.io.File(path)
        .listFiles().filter(_.getName.endsWith(".parquet"))
      val spans = files.map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(col(c)), max(col(c))).collect()(0)
        (r.getLong(1) - r.getLong(0)).toDouble
      }
      spans.sum / spans.length
    }
    // the comparative claim that matters for pruning: under a linear
    // x-sort the y side stays near full width per file; z-order must
    // shrink it substantially while keeping x bounded too. With 16
    // files a perfect quad-tree split gives 256 per side; allow
    // generous slack for range-sampling unevenness at file edges
    val linY = meanRange(s"$dir/linear", "y")
    val zx = meanRange(s"$dir/zorder", "x")
    val zy = meanRange(s"$dir/zorder", "y")
    assert(linY > 600.0, s"baseline degenerate: linear y mean range $linY")
    assert(zy < 0.75 * linY, s"z-order y $zy not < 0.75x linear $linY")
    assert(zx < 600.0, s"z-order x mean range $zx")
    assert(zy < 600.0, s"z-order y mean range $zy")
    // nothing lost
    assert(spark.read.parquet(s"$dir/zorder").count() == 16384)
    // zvalue round-trip sanity: interleave of (1,0) and (0,1)
    val z = spark.range(1).select(
      graft.ops.Partitioning.zvalue(lit(1L), lit(0L), 4).as("a"),
      graft.ops.Partitioning.zvalue(lit(0L), lit(1L), 4).as("b"))
      .collect()(0)
    assert(z.getLong(0) == 1L && z.getLong(1) == 2L)
  }

  test("schema evolution: mergeSchema unions old and new parquet columns") {
    // long-lived tables gain columns; old files must stay readable with
    // the new schema (nulls for the missing column), no rewrite
    val dir = java.nio.file.Files.createTempDirectory("graft_evo").toString
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .write.parquet(s"$dir/t/batch=1")
    Seq((3L, "c", 9.5)).toDF("id", "v", "score")
      .write.parquet(s"$dir/t/batch=2")
    val df = spark.read.option("mergeSchema", "true").parquet(s"$dir/t")
    assert(df.columns.toSet == Set("id", "v", "score", "batch"))
    val rows = df.orderBy("id").collect()
    assert(rows.length == 3)
    assert(rows(0).isNullAt(rows(0).fieldIndex("score"))) // old file → null
    assert(rows(2).getDouble(rows(2).fieldIndex("score")) == 9.5)
  }

  test("dynamic partition overwrite replaces only the written partitions") {
    // the incremental-reload semantics at scale: rewriting one day must
    // not truncate the others (static mode would wipe the whole table)
    val dir = java.nio.file.Files.createTempDirectory("graft_dpo").toString
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try {
      Seq((1L, "d1"), (2L, "d2")).toDF("id", "day")
        .write.partitionBy("day").parquet(s"$dir/t")
      // overwrite ONLY day=d2 with new content
      Seq((20L, "d2")).toDF("id", "day")
        .write.mode("overwrite").partitionBy("day").parquet(s"$dir/t")
      val got = spark.read.parquet(s"$dir/t")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "d1"), (20L, "d2")))
    } finally
      spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
  }
}
