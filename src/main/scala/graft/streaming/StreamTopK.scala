package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{MapState, OutputMode,
  StatefulProcessor, TTLConfig, TimeMode, TimerValues}

/** Streaming heavy hitters per group — Misra–Gries (1982) summaries on
  * `transformWithState` `MapState`, the second stateful-v2 surface next
  * to StreamQuota's `ValueState`: a bounded map of at most `k` typed
  * (item, counter) entries per group key, RocksDB-backed, mutated
  * in-place across micro-batches.
  *
  * Semantics: the streaming twin of q91's batch sketched heavy hitters.
  * Each arriving item increments its counter, inserts while fewer than
  * `k` counters exist, and otherwise decrements EVERY counter (evicting
  * zeros) — the classic guarantee: any item with true frequency
  * > n/(k+1) is guaranteed present, and a surviving counter
  * undercounts its item's true frequency by at most n/(k+1). State per
  * group is ≤ k entries REGARDLESS of stream length or item
  * cardinality — the property that makes per-group top-k viable on an
  * unbounded stream where exact per-item counts would grow without
  * limit. After each batch the processor emits the group's full
  * current summary (deterministic (count desc, item) order), so the
  * latest emission per group IS the sketch.
  */
object StreamTopK {

  /** (group, item) in → (group, item, mg_count) summary rows out. */
  class MisraGriesProcessor(k: Int)
      extends StatefulProcessor[String, (String, String),
        (String, String, Long)] {
    @transient private var counters: MapState[String, Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      counters = getHandle.getMapState[String, Long]("mg",
        Encoders.STRING, Encoders.scalaLong, TTLConfig.NONE)

    override def handleInputRows(key: String,
        rows: Iterator[(String, String)],
        timerValues: TimerValues): Iterator[(String, String, Long)] = {
      rows.foreach { case (_, item) =>
        if (counters.containsKey(item))
          counters.updateValue(item, counters.getValue(item) + 1L)
        else if (counters.keys().size < k)
          counters.updateValue(item, 1L)
        else {
          // decrement-all instead of insert; zeros evict so the map
          // stays ≤ k entries (drain first: mutating while iterating
          // a state-store iterator is undefined)
          val entries = counters.iterator().toVector
          entries.foreach { case (it, c) =>
            if (c <= 1L) counters.removeKey(it)
            else counters.updateValue(it, c - 1L)
          }
        }
      }
      counters.iterator().toVector
        .map { case (it, c) => (key, it, c) }
        .sortBy { case (_, it, c) => (-c, it) }
        .iterator
    }
  }

  /** Apply the sketch to a streaming (group, item) Dataset. */
  def heavyHitters(ds: Dataset[(String, String)], k: Int)
      : Dataset[(String, String, Long)] = {
    implicit val outEnc = Encoders.tuple(Encoders.STRING,
      Encoders.STRING, Encoders.scalaLong)
    ds.groupByKey(_._1)(Encoders.STRING)
      .transformWithState(new MisraGriesProcessor(k), TimeMode.None(),
        OutputMode.Append())
  }
}
