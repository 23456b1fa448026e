package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval (range) join as an equi-join.
  *
  * A naive `p.ts BETWEEN i.start AND i.end` join has no equality conjunct,
  * so Spark plans a broadcast-nested-loop — quadratic and single-minded at
  * scale. Bucketizing time converts it to a shuffle equi-join: intervals
  * are exploded to every fixed-width bucket they overlap, points map to
  * exactly one bucket, the join key is the bucket id, and the exact range
  * predicate refines the matches. Each point lands in one bucket, so no
  * dedup is needed. Shuffle volume is |points| + |intervals|·(span/width
  * + 1), and the join parallelizes across buckets — the standard
  * interval-bucketing shape that survives large inputs. Width should be
  * chosen near the typical interval span (wider wastes refine work,
  * narrower replicates intervals more).
  */
object RangeJoin {

  /** Inner-join `points` to the `intervals` whose [startCol, endCol) range
    * contains ptCol. All three columns are epoch microseconds (LONG). */
  def pointInInterval(points: DataFrame, ptCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      bucketWidthUs: Long): DataFrame = {
    val w = lit(bucketWidthUs)
    // drop empty/inverted intervals up front: sequence(start, stop) on a
    // descending pair silently yields a DESCENDING range, so degenerate
    // rows would still burst into buckets they cannot match in
    val iv = intervals.filter(col(endCol) > col(startCol))
      .withColumn("__bk",
        explode(sequence(floor(col(startCol) / w),
          floor((col(endCol) - 1) / w))))
    val pt = points.withColumn("__bk", floor(col(ptCol) / w))
    pt.join(iv, Seq("__bk"))
      .filter(col(ptCol) >= col(startCol) && col(ptCol) < col(endCol))
      .drop("__bk")
  }

  /** Interval-overlap join: pairs from `a` × `b` whose half-open ranges
    * [start, end) intersect, optionally scoped by extra equi-join keys
    * (e.g. the user the intervals belong to). Both sides explode to their
    * bucket span; an overlapping pair shares ≥ 1 bucket, and is emitted
    * from exactly ONE — the first bucket both cover,
    * max(⌊aStart/w⌋, ⌊bStart/w⌋) — so no post-join dedup (and therefore
    * no extra shuffle) is needed. Column names must be disjoint across
    * `a` and `b` apart from `extraKeys`. */
  def intervalOverlap(a: DataFrame, aStart: String, aEnd: String,
      b: DataFrame, bStart: String, bEnd: String,
      bucketWidthUs: Long, extraKeys: Seq[String] = Nil): DataFrame = {
    val w = lit(bucketWidthUs)
    // empty/inverted intervals overlap nothing — filter before bursting
    // (sequence on a descending pair would explode them anyway)
    def burst(df: DataFrame, s: String, e: String) =
      df.filter(col(e) > col(s)).withColumn("__bk",
        explode(sequence(floor(col(s) / w), floor((col(e) - 1) / w))))
    burst(a, aStart, aEnd).join(burst(b, bStart, bEnd),
        ("__bk" +: extraKeys).toSeq)
      .filter(col(aStart) < col(bEnd) && col(bStart) < col(aEnd))
      .filter(col("__bk") ===
        greatest(floor(col(aStart) / w), floor(col(bStart) / w)))
      .drop("__bk")
  }
}
