package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed global running total (prefix sum) without the
  * single-partition window that `Window.orderBy(key)` would plan.
  *
  * Classic two-phase scan, expressed so every phase recomputes
  * deterministically (no reliance on physical partition ids, which can
  * change between jobs):
  *
  *   1. one cheap scalar pass finds the key's min/max; rows map to one of
  *      `buckets` fixed-width key ranges — a pure function of the row;
  *   2. a window partitioned BY BUCKET (parallel across buckets) computes
  *      the within-bucket running sum; the bucketed+windowed projection is
  *      persisted (memory, spilling to local disk) at this point;
  *   3. per-bucket totals are read OFF THE PERSISTED PARTIALS — the total
  *      of a bucket is its last running value, `max_by(__local, key)` —
  *      prefix-summed on the driver (≤ `buckets` rows), and
  *      broadcast-joined back as each bucket's starting offset.
  *
  * The input is scanned exactly twice (the scalar min/max probe + the
  * window pass); the totals aggregate and the final join both reuse the
  * persisted partials instead of re-reading and re-windowing the input,
  * which at 100 TB removes a full scan-and-shuffle. No stage sees more
  * than 1/buckets of the rows in one task. Fixed-width ranges assume a
  * roughly uniform key (true for synthetic order keys); a skewed key
  * swaps step 1 for quantile boundaries without changing the rest. Sums
  * run in DECIMAL for order-independent exactness. The persisted partials
  * are released by Spark's context cleaner when the result goes out of
  * scope (same lifecycle as any cached intermediate).
  */
object PrefixSum {

  /** Append `outCol` = running sum of `valueCol` over rows ordered by
    * `keyCol` (a unique numeric key). `quantileBuckets = true` swaps the
    * fixed-width ranges for approxQuantile boundaries, which keeps bucket
    * sizes even under skewed keys at the cost of one sampling pass. */
  def runningTotal(df: DataFrame, keyCol: String, valueCol: Column,
      outCol: String, buckets: Int,
      quantileBuckets: Boolean = false): DataFrame = {
    // all bucket math in double so any numeric key type works: the
    // mapping only has to be monotonic in the key (keys are unique, so
    // double rounding cannot merge distinct orderings incorrectly — at
    // worst two adjacent keys share a bucket)
    val key = col(keyCol).cast("double")
    val bucket =
      if (quantileBuckets) {
        val probs = (1 until buckets).map(_.toDouble / buckets).toArray
        val cuts = df.select(key.as("__k")).stat
          .approxQuantile("__k", probs, 0.001).distinct.sorted
        // bucket = number of boundaries strictly below the key: keys in
        // the same cut range share a bucket, order across buckets follows
        // key order — exactly what the offset cumsum needs
        cuts.foldLeft(lit(0L)) { (acc, c) =>
          acc + when(key > lit(c), 1L).otherwise(0L)
        }
      } else {
        val Array(bounds) =
          df.agg(min(key).as("lo"), max(key).as("hi")).collect()
        if (bounds.isNullAt(0)) // empty input: keep the schema contract
          return df.withColumn(outCol, lit(null).cast("double"))
        val lo = bounds.getDouble(0)
        val hi = bounds.getDouble(1)
        val width = math.max(1e-12, (hi - lo) / buckets)
        floor((key - lit(lo)) / lit(width)).cast("long")
      }

    val dec = valueCol.cast(org.apache.spark.sql.types.DecimalType(30, 2))
    val w = Window.partitionBy(col("__bucket")).orderBy(key)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = df.withColumn("__bucket", bucket)
      .withColumn("__local", sum(dec).over(w))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    // per-bucket totals from the persisted partials: sum(dec) per bucket
    // is exact even when distinct keys collide under the double cast
    // (max_by over the cast key could pick a mid-bucket running value on
    // such ties). ≤ `buckets` rows — driver-side prefix sum. This job
    // also materializes `local`, so the final join below reads the
    // persisted partials instead of re-running the window pass.
    val totals = local.groupBy("__bucket")
      .agg(sum(dec).as("__tot"))
      .collect()
      .map(r => r.getLong(0) ->
        Option(r.getDecimal(1)).getOrElse(java.math.BigDecimal.ZERO))
      .sortBy(_._1)
    val offsets = totals.scanLeft((-1L, java.math.BigDecimal.ZERO)) {
      case ((_, acc), (b, tot)) => (b, acc.add(tot))
    }.sliding(2).collect { case Array((_, acc), (b, _)) => (b, acc) }.toSeq

    val spark = df.sparkSession
    import spark.implicits._
    val offsetDf = broadcast(offsets.toDF("__bucket", "__offset"))
    local.join(offsetDf, Seq("__bucket"), "left")
      .withColumn(outCol,
        (col("__local") + coalesce(col("__offset"),
          lit(java.math.BigDecimal.ZERO))).cast("double"))
      .drop("__bucket", "__local", "__offset")
  }
}
