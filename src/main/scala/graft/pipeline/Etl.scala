package graft.pipeline

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.ingest.Normalize
import graft.ops.DedupOps

/** End-to-end batch ETL (§3.2): bronze raw_data → normalize → standardize
  * → categorize → tokenize → dedup → silver append.
  *
  * Load semantics reproduce `INSERT … ON CONFLICT (url) DO NOTHING`
  * (transform_data.py:566-602) deterministically: intra-batch first-wins
  * picks the row with the lowest envelope id per url (insert order ≙
  * envelope order), and the cross-batch anti-join skips urls already in
  * silver — making re-runs idempotent (R4). */
object Etl {

  /** Transform one bronze batch to canonical rows with search tokens. */
  def transform(bronze: DataFrame, refYear: Int = 2025): DataFrame =
    Normalize.withSearchTokens(Normalize.normalize(bronze, refYear))

  /** Dedup within the batch (first by envelope id) then against the
    * existing silver table; returns only the rows to append. */
  def dedupForLoad(batch: DataFrame, silver: Option[DataFrame]): DataFrame = {
    val intra = DedupOps.firstWins(
      batch.filter(col("url").isNotNull), Seq("url"), asc("id"))
    val fresh = silver.fold(intra)(s => DedupOps.antiJoinNew(intra, s, "url"))
    fresh.drop("id")
  }

  /** Full run: returns (rowsAppended, newSilver). A real deployment writes
    * `appended` with mode("append") partitioned by source; callers that
    * need truncate-and-reload (K3, tasks.py:28-29) pass silver = None and
    * overwrite. */
  def run(bronze: DataFrame, silver: Option[DataFrame],
      refYear: Int = 2025): (Long, DataFrame) = {
    val appended = dedupForLoad(transform(bronze, refYear), silver)
    val count = appended.count() // A6: items_loaded
    (count, silver.fold(appended)(s => s.unionByName(appended)))
  }

  /** A5 run counters as observed metrics: the tallies ride along with
    * whatever action executes the load — one pass, no second aggregation
    * job (the engine-native form of the reference's per-spider
    * total/yielded/no_coords statistics, nashville_arcgis.py:41-42,
    * 95-101). Read the map from the returned Observation after an action
    * on the returned DataFrame. */
  def observedLoad(batch: DataFrame)
      : (org.apache.spark.sql.Observation, DataFrame) = {
    // unnamed Observation => unique generated name, so several observed
    // loads can compose into one query without duplicate-metric errors
    val obs = org.apache.spark.sql.Observation()
    val observed = batch.observe(obs,
      count(lit(1)).as("rows"),
      sum(when(col("url").isNull, 1L).otherwise(0L)).as("null_url"),
      sum(when(col("latitude").isNull || col("longitude").isNull, 1L)
        .otherwise(0L)).as("no_coords"),
      // DISTINCT aggregates are disallowed in observed metrics (they
      // would break single-pass collection) — the HLL sketch is the
      // correct one-pass cardinality here
      approx_count_distinct(col("source")).as("n_sources"))
    (obs, observed)
  }
}
