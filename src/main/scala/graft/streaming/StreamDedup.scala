package graft.streaming

import org.apache.spark.sql.DataFrame

/** Streaming dedup for at-least-once sources (the K2 dedup-sink
  * semantics applied INSIDE a stream instead of at the batch sink):
  * re-deliveries of the same id are dropped as long as their state
  * lives, and state is bounded by the event-time watermark — the only
  * dedup contract that holds on an unbounded stream without unbounded
  * state. Built on `dropDuplicatesWithinWatermark`, which (unlike
  * `dropDuplicates`) evicts a key's state once the watermark passes its
  * event time + delay: a duplicate arriving within the delay of its
  * first occurrence is ALWAYS dropped; one arriving after expiry may
  * re-emit, which downstream idempotent sinks (the q09 anti-join
  * pattern) absorb. At 100 TB/day the state store holds only the
  * horizon's keys, not the day's. */
object StreamDedup {

  def dedupWithinWatermark(df: DataFrame, idCol: String, tsCol: String,
      watermarkSec: Int): DataFrame =
    df.withWatermark(tsCol, s"$watermarkSec seconds")
      .dropDuplicatesWithinWatermark(idCol)
}
