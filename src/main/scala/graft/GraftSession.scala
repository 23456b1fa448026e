package graft

import org.apache.spark.sql.SparkSession

/** The library's session entry point: one place that encodes the
  * configuration this engine assumes, so a user switching from the
  * reference service gets a correctly-configured session in one call.
  *
  *   val spark = GraftSession.local()          // tests / single node
  *   val spark = GraftSession.configure(
  *     SparkSession.builder().master(...))     // cluster: bring your own
  *       .getOrCreate()
  *
  * What it sets and why:
  *   - AQE on (default) — runtime re-planning, skew-join splitting and
  *     partition coalescing are the 100 TB safety net.
  *   - `parquet.nanosAsLong` — some driver testdata generations carry
  *     TIMESTAMP(NANOS), which the vectorized reader otherwise rejects
  *     (Tables.t then truncates ns→us exactly like DuckDB does; naive
  *     TIMESTAMP(MICROS) generations surface as NTZ and Tables.t casts
  *     them to session-tz TIMESTAMP).
  *   - UTC session timezone — deterministic timestamp display/parse.
  *   - custom SQL functions registered (minhash_sig, simhash64,
  *     shingles, ngrams, cosine_sim, winnow, stem_tokens).
  * Shuffle partitions are a deploy-time decision: `local()` sizes them
  * to the core count; `configure` leaves the cluster default alone.
  */
object GraftSession {

  /** Shared config for any builder (cluster or local). Functions are
    * injected as session extensions, so both paths get the SQL surface. */
  def configure(b: SparkSession.Builder): SparkSession.Builder = b
    .withExtensions(new graft.functions.GraftExtensions)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.session.timeZone", "UTC")

  /** Local session with every engine function registered. */
  def local(cores: Int = Runtime.getRuntime.availableProcessors(),
      appName: String = "graft"): SparkSession = {
    val spark = configure(SparkSession.builder()
      .master(s"local[$cores]")
      .appName(appName)
      .config("spark.sql.shuffle.partitions", cores.toString))
      .getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    spark
  }
}
