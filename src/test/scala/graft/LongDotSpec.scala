package graft

import org.apache.spark.sql.functions._
import graft.functions.LongDotExpr.longDot

/** LongDotExpr invariants: exact equality with a brute-force fold
  * (including negative components and the dist² dot identity the
  * kmeans/SemDeDup family relies on), null propagation, and the
  * length-mismatch → null contract. */
class LongDotSpec extends SparkSpec {
  import spark.implicits._

  private val a = Seq.tabulate(64)(k => (k * 37 - 1000).toLong)
  private val b = Seq.tabulate(64)(k => (2048 - k * 53).toLong)

  test("matches the brute-force fold, negatives included") {
    val expected = a.zip(b).map { case (x, y) => x * y }.sum
    val got = Seq((a, b)).toDF("a", "b")
      .select(longDot(col("a"), col("b")).as("d")).head().getLong(0)
    assert(got == expected)
  }

  test("dist2 dot identity equals the direct squared distance") {
    val direct = a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    val viaDots = Seq((a, b)).toDF("a", "b")
      .select((longDot(col("a"), col("a"))
        - lit(2L) * longDot(col("a"), col("b"))
        + longDot(col("b"), col("b"))).as("d"))
      .head().getLong(0)
    assert(viaDots == direct)
  }

  test("null input and length mismatch both yield null") {
    val df = Seq((a, null: Seq[Long]), (a, a.take(10)))
      .toDF("a", "b")
      .select(longDot(col("a"), col("b")).as("d"))
    assert(df.collect().forall(_.isNullAt(0)))
  }
}
