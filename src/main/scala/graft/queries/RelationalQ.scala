package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType
import graft.Tables._

/** Generalized relational operator suite over the driver's TPC-H-ish tables.
  *
  * Mirrors the reference's query surface (filter/count/sort/page — SURVEY.md
  * §2.3/§2.5/§2.6, db_extractor.py:28-58) generalized to joins, windows,
  * rollup/cube and set ops per SURVEY.md §2.4/§2.5 notes. Every query is a
  * declarative DataFrame plan: Catalyst pushes filters/projections to the
  * parquet scan, picks broadcast joins for small sides under AQE, and plans
  * LIMIT as TakeOrderedAndProject (no full sort at scale).
  */
object RelationalQ {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1-style pricing summary: partial (map-side) agg then final —
    // one shuffle on the 6-value grouping key; decimal sums for exactness.
    "q01_pricing_summary" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity"), 2).as("sum_qty"),
          dsum(col("l_extendedprice"), 2).as("sum_base_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(30, 6))).cast("double").as("sum_disc_price"),
          sum((col("l_extendedprice") * (lit(1) - col("l_discount"))
            * (lit(1) + col("l_tax")))
            .cast(DecimalType(30, 8))).cast("double").as("sum_charge"),
          davg(col("l_quantity"), 2).as("avg_qty"),
          davg(col("l_extendedprice"), 2).as("avg_price"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // Top-k: TakeOrderedAndProject — no global sort, each partition keeps 25.
    "q02_topk_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
        .limit(25)
    }),

    // 3-way join; filter pushed below the join; dims broadcast under AQE.
    "q03_join_revenue" -> ((s, dir) => {
      val c = t(s, dir, "customer").select("c_custkey", "c_mktsegment")
      val o = t(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"))
        .select("o_orderkey", "o_custkey")
      val l = t(s, dir, "lineitem")
        .select(col("l_orderkey"),
          (col("l_extendedprice") * (lit(1) - col("l_discount")))
            .cast(DecimalType(30, 6)).as("rev"))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(sum(col("rev")).cast("double").as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy("c_mktsegment")
    }),

    // DISTINCT projection (SURVEY.md A2: dropdown domains).
    "q04_distinct_types" -> ((s, dir) => {
      t(s, dir, "events")
        .select("event_type").where(col("event_type").isNotNull)
        .distinct()
        .orderBy("event_type")
    }),

    // Ranking window: top-3 orders per customer (partitioned shuffle once).
    "q05_window_top3" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), asc("o_orderkey"))
      t(s, dir, "orders")
        .withColumn("rn", row_number().over(w).cast("long"))
        .filter(col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
        .orderBy("o_custkey", "rn")
    }),

    // ROLLUP grouping sets.
    "q06_rollup_orders" -> ((s, dir) => {
      t(s, dir, "orders")
        .rollup(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n"),
          dsum(col("o_totalprice"), 2).as("sum_price"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))
    }),

    // Filtered COUNT(*) (SURVEY.md A1 — dashboard pagination count).
    "q07_filtered_count" -> ((s, dir) => {
      t(s, dir, "events")
        .filter(col("event_type") === "purchase" && col("value") > 100.0)
        .agg(count(lit(1)).as("n"))
    }),

    // LIMIT/OFFSET pagination, page 3 of 25 (SURVEY.md W3).
    "q08_pagination" -> ((s, dir) => {
      t(s, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        .orderBy(asc("ts"), asc("event_id"))
        .offset(50).limit(25)
    }),

    // First-wins dedup by key (SURVEY.md K2/J1 generalized): deterministic
    // tiebreak via row_number, not order-nondeterministic dropDuplicates.
    "q09_dedup_first_wins" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"), col("event_type"))
        .orderBy(asc("event_id"))
      t(s, dir, "events")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("event_id", "user_id", "event_type", "value")
        .orderBy("event_id")
    }),

    // Set ops: users who both purchased and signed up, minus error-only noise.
    "q10_setops" -> ((s, dir) => {
      val e = t(s, dir, "events")
      val purchased = e.filter(col("event_type") === "purchase" && col("value") > 180)
        .select("user_id").distinct()
      val signed = e.filter(col("event_type") === "signup" && col("value") > 180)
        .select("user_id").distinct()
      val errored = e.filter(col("event_type") === "error" && col("value") > 195)
        .select("user_id").distinct()
      purchased.intersect(signed).except(errored).orderBy("user_id")
    }),

    // CUBE grouping sets with exact decimal aggregate.
    "q20_cube_lineitem" -> ((s, dir) => {
      t(s, dir, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("n"), dsum(col("l_quantity"), 2).as("sum_qty"))
        .orderBy(asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))
    }),
  )

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        | CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_base_price,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS sum_disc_price,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(30,8))) AS DOUBLE) AS sum_charge,
        | CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS avg_qty,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(30,2))) AS DOUBLE) / count(*) AS avg_price,
        | count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q02_topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 25""".stripMargin,

    "q03_join_revenue" ->
      """SELECT c_mktsegment,
        | CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(30,6))) AS DOUBLE) AS revenue,
        | count(*) AS n_items
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |GROUP BY c_mktsegment
        |ORDER BY c_mktsegment""".stripMargin,

    "q04_distinct_types" ->
      """SELECT DISTINCT event_type FROM events
        |WHERE event_type IS NOT NULL ORDER BY event_type""".stripMargin,

    "q05_window_top3" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        | SELECT o_custkey, o_orderkey, o_totalprice,
        |   CAST(row_number() OVER (PARTITION BY o_custkey
        |     ORDER BY o_totalprice DESC, o_orderkey ASC) AS BIGINT) AS rn
        | FROM orders) x
        |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin,

    "q06_rollup_orders" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        | CAST(sum(CAST(o_totalprice AS DECIMAL(30,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin,

    "q07_filtered_count" ->
      """SELECT count(*) AS n FROM events
        |WHERE event_type = 'purchase' AND value > 100.0""".stripMargin,

    "q08_pagination" ->
      """SELECT event_id, ts, user_id, event_type, value FROM events
        |ORDER BY ts ASC, event_id ASC LIMIT 25 OFFSET 50""".stripMargin,

    "q09_dedup_first_wins" ->
      """SELECT event_id, user_id, event_type, value FROM (
        | SELECT event_id, user_id, event_type, value,
        |   row_number() OVER (PARTITION BY user_id, event_type
        |     ORDER BY event_id ASC) AS rn
        | FROM events) x
        |WHERE rn = 1 ORDER BY event_id""".stripMargin,

    "q10_setops" ->
      """(SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase' AND value > 180
        | INTERSECT
        | SELECT DISTINCT user_id FROM events WHERE event_type = 'signup' AND value > 180)
        |EXCEPT
        |SELECT DISTINCT user_id FROM events WHERE event_type = 'error' AND value > 195
        |ORDER BY user_id""".stripMargin,

    "q20_cube_lineitem" ->
      """SELECT l_returnflag, l_linestatus, count(*) AS n,
        | CAST(sum(CAST(l_quantity AS DECIMAL(30,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST""".stripMargin,
  )
}
