package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables._

/** ETL-shaped queries over the `events` stream table: JSON payload
  * extraction (the reference's raw_json parse, SURVEY.md N1/N2), display
  * formatting (D3), and time-bucketed rollups (the batch shape of the
  * streaming windowed agg, SURVEY.md R1). */
object EtlQ {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Semi-structured extraction: pull props.k out of the JSON string and
    // aggregate — from_json/get_json_object stays codegen'd in the scan.
    "q22_json_agg" -> ((s, dir) => {
      t(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy("event_type")
        .agg(sum(col("k")).cast("long").as("sum_k"),
          count(lit(1)).as("n"),
          max(col("k")).cast("long").as("max_k"))
        .orderBy("event_type")
    }),

    // Display formatting (app.py:23-32): timestamp → "Jan 01, 2024 at 12:09 AM".
    "q23_date_display" -> ((s, dir) => {
      t(s, dir, "events")
        .select(col("event_id"),
          date_format(col("ts"), "MMM dd, yyyy 'at' hh:mm a").as("display"))
        .orderBy("event_id")
        .limit(100)
    }),

    // Hourly rollup per event type — batch twin of the Structured Streaming
    // windowed aggregation (graft.streaming); decimal sum for exactness.
    "q24_hourly_rollup" -> ((s, dir) => {
      t(s, dir, "events")
        .groupBy(date_trunc("hour", col("ts")).as("hour"), col("event_type"))
        .agg(count(lit(1)).as("n"), dsum(col("value"), 2).as("sum_value"))
        .orderBy("hour", "event_type")
        .limit(500)
    }),
  )

  val oracles: Map[String, String] = Map(
    "q22_json_agg" ->
      """SELECT event_type,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
        | count(*) AS n,
        | CAST(max(CAST(json_extract_string(props, '$.k') AS INTEGER)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q23_date_display" ->
      """SELECT event_id, strftime(ts, '%b %d, %Y at %I:%M %p') AS display
        |FROM events ORDER BY event_id LIMIT 100""".stripMargin,

    "q24_hourly_rollup" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, count(*) AS n,
        | CAST(sum(CAST(value AS DECIMAL(30,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2 ORDER BY hour, event_type LIMIT 500""".stripMargin,
  )
}
