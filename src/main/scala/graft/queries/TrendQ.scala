package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import graft.Tables._
import graft.ops.TextOps

/** Trend / longitudinal analytics round 4: month-over-month growth,
  * event-transition matrices, rolling-window distinct actives, and
  * vocabulary-growth (Heaps-law) curves. All deterministic — decimal
  * sums, explicit tie-breaks — so every query is oracle-exact. */
object TrendQ {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Month-over-month revenue growth per region: the classic KPI trend
    // query. Dimensions (customer→nation→region) broadcast; the fact
    // table aggregates once per (region, month) with DECIMAL-exact sums;
    // the lag window partitions by region (parallel, never global). The
    // growth ratio divides the deterministic unrounded doubles.
    "q106_mom_growth" -> ((s, dir) => {
      val rev = t(s, dir, "orders")
        .join(broadcast(t(s, dir, "customer")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, dir, "region")),
          col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"),
          date_trunc("month", col("o_orderdate")).as("month"))
        .agg(sum(col("o_totalprice").cast(DecimalType(38, 6)))
          .cast("double").as("rev"))
      val w = Window.partitionBy(col("region")).orderBy(col("month"))
      rev.withColumn("prev", lag(col("rev"), 1).over(w))
        .select(col("region"), col("month"),
          round(col("rev"), 4).as("revenue"),
          round((col("rev") - col("prev")) / col("prev"), 6)
            .as("mom_growth"))
        .orderBy("region", "month")
    }),

    // First-order Markov transition matrix over per-user event streams:
    // lag within the (user, ts, event_id)-ordered window — partitioned
    // by user, so the state never exceeds one user's history — then a
    // global (prev, next) count (≤ |event types|² rows) with the share
    // normalized inside each source state.
    "q107_transition_matrix" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val pairs = t(s, dir, "events")
        .withColumn("prev", lag(col("event_type"), 1).over(w))
        .filter(col("prev").isNotNull)
        .groupBy(col("prev"), col("event_type").as("next"))
        .agg(count(lit(1)).as("n"))
      val wp = Window.partitionBy(col("prev"))
      pairs
        .withColumn("share",
          round(col("n").cast("double") / sum(col("n")).over(wp), 6))
        .orderBy("prev", "next")
    }),

    // Rolling 7-day distinct active users (the WAU curve), computed the
    // scale-safe way: each event fans out to the ≤7 day-buckets whose
    // trailing window covers it, then one distinct-count per bucket —
    // map-side partial distinct, no per-day self-joins, no global
    // window. (An exact distinct over a RANGE window can't partial-
    // aggregate; the fan-out form does.)
    "q108_rolling_active" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("user_id"),
          explode(sequence(lit(0), lit(6))).as("k"),
          date_trunc("day", col("ts")).cast("date").as("d"))
        .select(col("user_id"), date_add(col("d"), col("k")).as("day"))
        .groupBy("day")
        .agg(countDistinct(col("user_id")).as("n_active"))
        .orderBy("day")
    }),

    // Vocabulary growth (Heaps' law) over the trigram-shingle
    // vocabulary: new and cumulative distinct shingles per tenth of the
    // corpus, where a shingle belongs to the decile of its FIRST
    // occurrence. The corpus collapses to vocab-sized (shingle,
    // first_doc) partials in one pass; the cumulative sum runs over ≤10
    // rows (driver-scale by construction — the window is bounded by the
    // bucket count, not the data).
    "q109_vocab_growth" -> ((s, dir) => {
      val docs = t(s, dir, "documents")
      val mx = docs.agg(max(col("doc_id")).as("mx"))
      val firsts = docs
        .select(col("doc_id"), explode(graft.functions.ShinglesExpr
          .shingles(TextOps.tokens(col("text")), 3)).as("w"))
        .groupBy("w").agg(min(col("doc_id")).as("first_doc"))
      val perDecile = firsts.crossJoin(broadcast(mx))
        .select(least(floor(col("first_doc") * 10 / (col("mx") + 1)),
          lit(9L)).as("decile"))
        .groupBy("decile").agg(count(lit(1)).as("new_words"))
      val w = Window.orderBy(col("decile"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      perDecile
        .withColumn("cum_vocab", sum(col("new_words")).over(w))
        .orderBy("decile")
    }),

    // First-5-events user journey strings: the per-user ordered path,
    // built the scale-safe way — a per-user window keeps only rank ≤ 5
    // BEFORE any list is collected (a bare collect_list would buffer a
    // user's whole history), and the full-partition count rides the same
    // window. The window's hashpartitioning(user_id) already satisfies
    // the groupBy, so the plan has ONE exchange total.
    "q110_user_journey" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("event_id"))
      val wAll = Window.partitionBy(col("user_id"))
      t(s, dir, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"),
          row_number().over(w).as("rn"),
          count(lit(1)).over(wAll).as("n_events"))
        .filter(col("rn") <= 5)
        .groupBy("user_id")
        .agg(max(col("n_events")).as("n_events"),
          array_join(transform(
            array_sort(collect_list(struct(col("ts"), col("event_id"),
              col("event_type")))),
            x => x.getField("event_type")), ">").as("journey"))
        .orderBy("user_id")
    }),
  )

  val oracles: Map[String, String] = Map(
    "q106_mom_growth" ->
      """WITH rev AS (
        | SELECT r.r_name AS region,
        |  date_trunc('month', o.o_orderdate) AS month,
        |  CAST(sum(CAST(o.o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
        |    AS rev
        | FROM orders o
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation n ON c.c_nationkey = n.n_nationkey
        | JOIN region r ON n.n_regionkey = r.r_regionkey
        | GROUP BY 1, 2)
        |SELECT region, month, round(rev, 4) AS revenue,
        | round((rev - lag(rev) OVER w) / lag(rev) OVER w, 6) AS mom_growth
        |FROM rev WINDOW w AS (PARTITION BY region ORDER BY month)
        |ORDER BY region, month""".stripMargin,

    "q107_transition_matrix" ->
      """WITH p AS (
        | SELECT lag(event_type) OVER (PARTITION BY user_id
        |   ORDER BY ts, event_id) AS prev, event_type AS next
        | FROM events),
        |c AS (
        | SELECT prev, next, count(*) AS n FROM p
        | WHERE prev IS NOT NULL GROUP BY prev, next)
        |SELECT prev, next, n,
        | round(CAST(n AS DOUBLE)
        |   / sum(n) OVER (PARTITION BY prev), 6) AS share
        |FROM c ORDER BY prev, next""".stripMargin,

    "q108_rolling_active" ->
      """SELECT CAST(date_trunc('day', ts) AS DATE) + k.k AS day,
        | count(DISTINCT user_id) AS n_active
        |FROM events, (SELECT unnest([0,1,2,3,4,5,6]) AS k) k
        |GROUP BY day ORDER BY day""".stripMargin,

    "q109_vocab_growth" ->
      """WITH f AS (
        | SELECT w, min(doc_id) AS first_doc FROM (
        |  SELECT doc_id, unnest(list_distinct(list_transform(
        |    range(1, len(string_split(lower(text), ' ')) - 1),
        |    i -> string_split(lower(text), ' ')[i] || ' '
        |      || string_split(lower(text), ' ')[i+1] || ' '
        |      || string_split(lower(text), ' ')[i+2]))) AS w
        |  FROM documents)
        | GROUP BY w),
        |d AS (
        | SELECT least(first_doc * 10 // ((SELECT max(doc_id) + 1
        |   FROM documents)), 9) AS decile
        | FROM f),
        |g AS (SELECT decile, count(*) AS new_words FROM d GROUP BY decile)
        |SELECT decile, new_words,
        | sum(new_words) OVER (ORDER BY decile
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_vocab
        |FROM g ORDER BY decile""".stripMargin,

    "q110_user_journey" ->
      """WITH r AS (
        | SELECT user_id, event_type,
        |  row_number() OVER (PARTITION BY user_id
        |    ORDER BY ts, event_id) AS rn,
        |  count(*) OVER (PARTITION BY user_id) AS n_events,
        |  ts, event_id
        | FROM events)
        |SELECT user_id, max(n_events) AS n_events,
        | array_to_string(list(event_type ORDER BY ts, event_id), '>')
        |   AS journey
        |FROM r WHERE rn <= 5
        |GROUP BY user_id ORDER BY user_id""".stripMargin,
  )
}
