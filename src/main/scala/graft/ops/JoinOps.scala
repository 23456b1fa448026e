package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-shaping helpers beyond the planner's defaults. */
object JoinOps {

  /** Bloom-pruned join: build a Bloom filter over the (small) dim side's
    * keys, pre-filter the fact side with it, then run the exact join.
    * The bloom has no false negatives, so the result is IDENTICAL to the
    * plain join (oracle-checkable); what changes is the shuffle volume —
    * at 100 TB the fact rows that cannot match never leave their input
    * partition. This is the manual form of Spark's runtime bloom filter
    * (spark.sql.optimizer.runtime.bloomFilter.*), useful when the
    * optimizer's heuristics (size/selectivity thresholds, shuffle-join
    * only) won't inject one. The UDF is justified: no public built-in
    * expression evaluates a driver-built Bloom sketch (the internal
    * BloomFilterMightContain is reserved for injected runtime filters).
    * One bounded count + one dim scan build the filter; `expectedItems`
    * callers can pass a known cardinality to skip the count. */
  def bloomPrunedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, fpp: Double = 0.01,
      expectedItems: Long = -1L): DataFrame = {
    val n = if (expectedItems > 0) expectedItems
      else dim.select(dimKey).count()
    // empty dim: the bloom aggregate yields null (nothing to hash) and
    // the join is empty anyway — prune everything without building one
    if (n == 0) return fact.filter(lit(false))
      .join(dim, col(factKey) === col(dimKey))
    val bf = dim.stat.bloomFilter(dimKey, n, fpp)
    val bc = fact.sparkSession.sparkContext.broadcast(bf)
    // type-dispatch so the probe hashes the same representation the
    // builder did — a blanket Long UDF would make Spark cast non-numeric
    // keys to null and silently prune matching rows (false negatives)
    import org.apache.spark.sql.types._
    val might = fact.schema(factKey).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        udf((k: java.lang.Long) => k != null && bc.value.mightContainLong(k))
      case StringType =>
        udf((k: String) => k != null && bc.value.mightContainString(k))
      case other => throw new IllegalArgumentException(
        s"bloomPrunedJoin: unsupported key type $other for '$factKey' — " +
          "stat.bloomFilter hashes integral/string keys only")
    }
    fact.filter(might(col(factKey)))
      .join(dim, col(factKey) === col(dimKey))
  }

  /** CDC latest-wins compaction: reduce a change feed to one current row
    * per key — the row with the greatest (orderCol, tieCol); rows whose
    * final operation is in `deleteOps` drop out (the key was deleted).
    * One shuffle, map-side partial aggregation (max_by over a struct) —
    * the scalable MERGE-INTO-snapshot shape, no window over history. */
  def cdcCompact(changes: DataFrame, keyCol: String, orderCol: String,
      tieCol: String, opCol: String, deleteOps: Seq[String]): DataFrame = {
    val payload = struct(changes.columns.map(col): _*)
    val last = changes.groupBy(keyCol)
      .agg(max_by(payload, struct(col(orderCol), col(tieCol))).as("__last"))
      .select(col(keyCol) +: changes.columns.filterNot(_ == keyCol)
        .map(c => col(s"__last.$c").as(c)): _*)
    last.filter(!col(opCol).isInCollection(deleteOps))
  }

  /** SCD type-2 history build from a change feed: one version row per
    * (key, run of equal `attrCol`), with [valid_from, valid_to) bounds
    * and a current flag. Change detection (lag) and interval closing
    * (lead) share one (key)-partitioned ordering — a single shuffle. */
  def scd2(changes: DataFrame, keyCol: String, orderCol: String,
      tieCol: String, attrCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
    val versioned = changes
      .withColumn("__prev", lag(col(attrCol), 1).over(w))
      .filter(col("__prev").isNull || col("__prev") =!= col(attrCol))
    val wv = Window.partitionBy(col(keyCol))
      .orderBy(col(orderCol), col(tieCol))
    versioned
      .withColumn("valid_from", col(orderCol))
      .withColumn("valid_to", lead(col(orderCol), 1).over(wv))
      .withColumn("is_current", col("valid_to").isNull)
      .drop("__prev")
  }
}
