package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor,
  TTLConfig, TimeMode, TimerValues, ValueState}

/** Streaming quota admission on `transformWithState` — the
  * arbitrary-stateful-processing v2 API (Spark 4), the successor to
  * flatMapGroupsWithState used by the older StatefulSessions/StatefulCdc
  * ops: typed per-key `ValueState` handles, explicit `TimeMode`, and a
  * RocksDB-backed state store (the provider transformWithState
  * requires, and the one a 100 TB-per-day stream needs anyway — state
  * lives off-heap and spills to disk instead of growing the executor
  * heap).
  *
  * Semantics: the streaming twin of q243's batch rate limit — the first
  * `limit` events per key are admitted, the rest emit with
  * admitted=false so a downstream filter or dead-letter sink can route
  * them. State per key is ONE long (the admitted count); with a
  * `TTLConfig` the quota becomes a rolling window instead of lifetime
  * (kept NONE here so the spec pins the simplest contract).
  */
object StreamQuota {

  /** (key, payload) in → (key, payload, admitted) out. */
  class QuotaProcessor(limit: Long)
      extends StatefulProcessor[Long, (Long, Long), (Long, Long, Boolean)] {
    @transient private var seen: ValueState[Long] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen", Encoders.scalaLong,
        TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[(Long, Long)],
        timerValues: TimerValues): Iterator[(Long, Long, Boolean)] = {
      var n = if (seen.exists()) seen.get() else 0L
      val out = rows.map { case (_, payload) =>
        n += 1
        (key, payload, n <= limit)
      }.toVector // drain before updating state (rows is lazy)
      seen.update(n)
      out.iterator
    }
  }

  /** Apply the quota to a streaming (key, payload) Dataset. */
  def admit(ds: Dataset[(Long, Long)], limit: Long)
      : Dataset[(Long, Long, Boolean)] = {
    implicit val outEnc = Encoders.tuple(Encoders.scalaLong,
      Encoders.scalaLong, Encoders.scalaBoolean)
    ds.groupByKey(_._1)(Encoders.scalaLong)
      .transformWithState(new QuotaProcessor(limit), TimeMode.None(),
        OutputMode.Append())
  }
}
