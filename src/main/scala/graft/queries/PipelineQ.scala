package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._
import graft.ops.JoinOps

/** Warehouse-pipeline operators round 3: CDC latest-wins compaction,
  * SCD type-2 history build, bloom-pruned join, heavy-hitter detection.
  * Each is the at-scale shape (single-shuffle aggregation or per-key
  * window; no global window, no driver loops) with an exact DuckDB
  * oracle. */
object PipelineQ {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // CDC compaction: events as a change feed keyed by user_id; the
    // current snapshot is each user's latest change (ts, event_id
    // tiebreak), with 'error' as the delete operation — a MERGE INTO
    // snapshot without a table format, one map-side-partial shuffle.
    "q78_cdc_merge" -> ((s, dir) => {
      JoinOps.cdcCompact(
          t(s, dir, "events")
            .select("event_id", "user_id", "event_type", "value", "ts"),
          keyCol = "user_id", orderCol = "ts", tieCol = "event_id",
          opCol = "event_type", deleteOps = Seq("error"))
        .select(col("user_id"), col("event_type").as("last_type"),
          col("value").as("last_value"), col("ts").as("last_ts"))
        .orderBy("user_id")
    }),

    // SCD2 dimension history: one version row per run of equal
    // event_type per user, [valid_from, valid_to) closed by the next
    // version, open interval = current. Output trimmed to a
    // deterministic user sample to keep the gate result small.
    "q79_scd2_history" -> ((s, dir) => {
      JoinOps.scd2(
          t(s, dir, "events")
            .filter(pmod(col("user_id"), lit(25)) === 0)
            .select("event_id", "user_id", "event_type", "ts"),
          keyCol = "user_id", orderCol = "ts", tieCol = "event_id",
          attrCol = "event_type")
        .select(col("user_id"), col("event_type"), col("valid_from"),
          col("valid_to"), col("is_current").cast("int").as("is_current"))
        .orderBy("user_id", "valid_from", "event_type")
    }),

    // Bloom-pruned join: lineitem joined to one nation's suppliers with
    // a dim-side bloom filter pre-pruning the fact scan. No false
    // negatives, so the result equals the plain join (the oracle); the
    // bloom is the shuffle-volume story, asserted in JoinOpsSpec.
    "q80_bloom_join" -> ((s, dir) => {
      val dim = t(s, dir, "supplier")
        .filter(col("s_nationkey") === 3)
        .select(col("s_suppkey"), col("s_name"))
      JoinOps.bloomPrunedJoin(
          t(s, dir, "lineitem").select("l_suppkey", "l_extendedprice"),
          dim, "l_suppkey", "s_suppkey")
        .groupBy("s_suppkey", "s_name")
        .agg(count(lit(1)).as("n_items"),
          dsum(col("l_extendedprice"), 2).as("revenue"))
        .orderBy("s_suppkey")
    }),

    // Heavy-hitter detection (skew diagnostics): top users by event
    // volume with their share of the total — partial-aggregated count
    // plus one broadcast scalar, no global window.
    "q81_heavy_hitters" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val counts = e.groupBy("user_id").agg(count(lit(1)).as("n"))
      val total = broadcast(e.agg(count(lit(1)).as("__total")))
      counts.crossJoin(total)
        .withColumn("share",
          round(col("n").cast("double") / col("__total"), 6))
        .select("user_id", "n", "share")
        .orderBy(desc("n"), asc("user_id"))
        .limit(10)
    }),
  )

  val oracles: Map[String, String] = Map(
    "q78_cdc_merge" ->
      """SELECT user_id, event_type AS last_type, value AS last_value,
        | ts AS last_ts
        |FROM (
        | SELECT *, row_number() OVER (PARTITION BY user_id
        |   ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events) x
        |WHERE rn = 1 AND event_type <> 'error'
        |ORDER BY user_id""".stripMargin,

    "q79_scd2_history" ->
      """WITH f AS (
        | SELECT event_id, user_id, event_type, ts FROM events
        | WHERE user_id % 25 = 0),
        |runs AS (
        | SELECT *, lag(event_type) OVER w AS prev
        | FROM f WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |v AS (
        | SELECT user_id, event_type, ts AS valid_from, event_id
        | FROM runs WHERE prev IS NULL OR prev <> event_type)
        |SELECT user_id, event_type, valid_from,
        | lead(valid_from) OVER w AS valid_to,
        | CAST(lead(valid_from) OVER w IS NULL AS INT) AS is_current
        |FROM v WINDOW w AS (PARTITION BY user_id ORDER BY valid_from, event_id)
        |ORDER BY user_id, valid_from, event_type""".stripMargin,

    "q80_bloom_join" ->
      """SELECT s.s_suppkey, s.s_name, count(*) AS n_items,
        | CAST(sum(CAST(l.l_extendedprice AS DECIMAL(30,2))) AS DOUBLE)
        |   AS revenue
        |FROM lineitem l
        |JOIN (SELECT s_suppkey, s_name FROM supplier WHERE s_nationkey = 3) s
        |  ON l.l_suppkey = s.s_suppkey
        |GROUP BY s.s_suppkey, s.s_name
        |ORDER BY s.s_suppkey""".stripMargin,

    "q81_heavy_hitters" ->
      """WITH c AS (SELECT user_id, count(*) AS n FROM events
        |           GROUP BY user_id),
        |t AS (SELECT count(*) AS total FROM events)
        |SELECT user_id, n, round(CAST(n AS DOUBLE) / total, 6) AS share
        |FROM c, t
        |ORDER BY n DESC, user_id ASC LIMIT 10""".stripMargin,
  )
}
