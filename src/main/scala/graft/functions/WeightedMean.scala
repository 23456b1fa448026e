package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Custom typed aggregate (the engine's UDAF surface): weighted mean with
  * an exact java.math.BigDecimal accumulator, so the result is independent
  * of partial-aggregation order — the same decimal-exactness rule the
  * plain sums follow (Tables.dsum), which keeps it DuckDB-oracle-checkable.
  * Register for untyped use with `functions.udaf(WeightedMean)`. */
object WeightedMean
    extends Aggregator[(Double, Long), (java.math.BigDecimal, Long), Double] {

  private val Zero = java.math.BigDecimal.ZERO

  override def zero: (java.math.BigDecimal, Long) = (Zero, 0L)

  override def reduce(b: (java.math.BigDecimal, Long), a: (Double, Long))
      : (java.math.BigDecimal, Long) = {
    // value carries ≤2 decimals; scale-2 decimal of the double is exact
    val v = new java.math.BigDecimal(a._1)
      .setScale(2, java.math.RoundingMode.HALF_UP)
    (b._1.add(v.multiply(java.math.BigDecimal.valueOf(a._2))),
      b._2 + a._2)
  }

  override def merge(x: (java.math.BigDecimal, Long),
      y: (java.math.BigDecimal, Long)): (java.math.BigDecimal, Long) =
    (x._1.add(y._1), x._2 + y._2)

  override def finish(r: (java.math.BigDecimal, Long)): Double =
    if (r._2 == 0) Double.NaN else r._1.doubleValue() / r._2

  override def bufferEncoder: Encoder[(java.math.BigDecimal, Long)] =
    Encoders.tuple(Encoders.DECIMAL, Encoders.scalaLong)

  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
