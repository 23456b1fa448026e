package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitter summary (Misra & Gries 1982), in the
  * MERGEABLE form of Agarwal et al., "Mergeable Summaries" (PODS 2012):
  * a bounded map of ≤ k counters whose per-item estimate undershoots the
  * true count by at most n/(k+1) — so every item with true frequency
  * above n/(k+1) is guaranteed present, regardless of how partial
  * summaries were partitioned or merge-ordered.
  *
  * This is the partial-aggregation shape Spark needs at 100 TB: each
  * task summarizes its split in O(k) memory, partials merge
  * associatively (combine counts; if over k entries, subtract the
  * (k+1)-th largest and keep positives), and only O(k) state crosses the
  * shuffle — against a naive groupBy whose shuffle is proportional to
  * the number of DISTINCT keys. The summary's contents depend on merge
  * order (only the GUARANTEE is order-free), so engine-independent
  * results come from the sketch→verify pattern: re-count the ≤ k
  * candidates exactly and threshold above the guarantee bound — see
  * QualityQ q91.
  *
  * Runs as an ObjectHashAggregate (object buffer, no codegen) — the
  * same physical shape as Spark's built-in percentile/HLL sketches. */
class MisraGries(k: Int)
    extends Aggregator[Long, Map[Long, Long], Map[Long, Long]] {
  require(k > 0, "MisraGries: k must be positive")

  def zero: Map[Long, Long] = Map.empty

  def reduce(b: Map[Long, Long], a: Long): Map[Long, Long] =
    b.get(a) match {
      case Some(c) => b.updated(a, c + 1)
      case None if b.size < k => b.updated(a, 1L)
      case None => // full: decrement every counter (new item cancels out)
        b.iterator.collect { case (key, c) if c > 1 => key -> (c - 1) }
          .toMap
    }

  def merge(x: Map[Long, Long], y: Map[Long, Long]): Map[Long, Long] = {
    val sum = y.foldLeft(x) { case (acc, (key, c)) =>
      acc.updated(key, acc.getOrElse(key, 0L) + c)
    }
    if (sum.size <= k) sum
    else {
      // subtract the (k+1)-th largest count from all, keep positives:
      // ≤ k survive and each absorbed decrement is bounded by n/(k+1)
      val d = sum.valuesIterator.toArray.sorted(Ordering[Long].reverse)(k)
      sum.iterator.collect { case (key, c) if c > d => key -> (c - d) }
        .toMap
    }
  }

  def finish(b: Map[Long, Long]): Map[Long, Long] = b

  def bufferEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
  def outputEncoder: Encoder[Map[Long, Long]] =
    ExpressionEncoder[Map[Long, Long]]()
}
