package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming z-score anomaly detection — the incremental twin of
  * QualityQ q89: per-key running moments maintained with Welford's
  * online algorithm (Welford 1962), each incoming value flagged against
  * the statistics of everything seen BEFORE it (prequential scoring —
  * an outlier cannot mask itself by inflating the variance it is judged
  * against).
  *
  * State per key is three numbers (n, mean, M2) — O(keys), independent
  * of stream length, the only shape that survives an unbounded feed.
  * Welford's update is the numerically stable form: the naive Σx/Σx²
  * running pair cancels catastrophically once n·mean² dominates the
  * variance (exactly the regime a long-running stream reaches);
  * batch-mode q89 can afford exact DECIMAL sums, a stream cannot. */
object StatefulAnomaly {

  final case class Obs(key: String, value: Double)
  final case class Moments(n: Long, mean: Double, m2: Double)
  final case class Flag(key: String, value: Double, z: Double)

  /** Flag observations whose |z| vs the key's prior moments exceeds
    * `zThreshold`; scoring starts once a key has `minObs` observations
    * (before that everything is warm-up, nothing is flagged). */
  def detect(obs: Dataset[Obs], minObs: Long, zThreshold: Double)
      : Dataset[Flag] = {
    val spark = obs.sparkSession
    import spark.implicits._
    obs.groupByKey(_.key)
      .flatMapGroupsWithState[Moments, Flag](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key, batch, state: GroupState[Moments]) =>
          var m = state.getOption.getOrElse(Moments(0L, 0.0, 0.0))
          val out = Seq.newBuilder[Flag]
          batch.foreach { o =>
            if (m.n >= minObs) {
              val sd = math.sqrt(m.m2 / m.n)
              if (sd > 0 && math.abs((o.value - m.mean) / sd) > zThreshold)
                out += Flag(key, o.value, (o.value - m.mean) / sd)
            }
            val n1 = m.n + 1
            val d = o.value - m.mean
            val mean1 = m.mean + d / n1
            m = Moments(n1, mean1, m.m2 + d * (o.value - mean1))
          }
          state.update(m)
          out.result().iterator
      }
  }
}
