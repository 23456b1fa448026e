package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming CDC compaction — the streaming twin of JoinOps.cdcCompact:
  * one state cell per key holding the latest change seen so far (by
  * (order, tie)); each micro-batch emits the keys whose current value
  * CHANGED in that batch (update-stream semantics, like a changelog
  * topic's compacted view). Deletes tombstone the key: the state is kept
  * (so late out-of-order updates older than the delete stay suppressed)
  * and the emitted row carries deleted = true. State per key is O(1) —
  * it scales with live keys, not change volume. */
object StatefulCdc {

  final case class Change(key: Long, order: Long, tie: Long, op: String,
      value: Double)
  final case class Latest(order: Long, tie: Long, op: String, value: Double)
  final case class Snapshot(key: Long, order: Long, value: Double,
      deleted: Boolean)

  def compact(changes: Dataset[Change], deleteOps: Set[String])
      : Dataset[Snapshot] = {
    val spark = changes.sparkSession
    import spark.implicits._
    changes.groupByKey(_.key)
      .flatMapGroupsWithState[Latest, Snapshot](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, batch, state: GroupState[Latest]) =>
          // latest change in this batch for the key (order, tie) — the
          // per-batch reduce keeps the iterator single-pass and O(1) mem
          def later(xo: Long, xt: Long, yo: Long, yt: Long): Boolean =
            xo > yo || (xo == yo && xt > yt)
          val top = batch.reduceLeft { (a, b) =>
            if (later(b.order, b.tie, a.order, a.tie)) b else a
          }
          val cur = state.getOption
          val newer = cur.forall(c => later(top.order, top.tie, c.order, c.tie))
          if (newer) {
            state.update(Latest(top.order, top.tie, top.op, top.value))
            Iterator.single(Snapshot(key, top.order, top.value,
              deleteOps.contains(top.op)))
          } else Iterator.empty
      }
  }
}
