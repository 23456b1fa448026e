package graft

/** Registry of every cross-query memoized cache in the engine (shared
  * checkpointed edge sets, persisted partials, …).
  *
  * Contract: any module that memoizes a `localCheckpoint`'d / persisted
  * DataFrame across query invocations (the ScaleQ.sharedEdges pattern)
  * MUST register its reset here at object init. Bench's warm-up→timed
  * transition then calls [[resetAll]] — dropping the references and
  * letting the context cleaner reclaim the blocks — instead of
  * blanket-unpersisting every persistent RDD in the context, which would
  * free checkpoint blocks still referenced by a cache it doesn't know
  * about and fail the timed phase with "checkpoint block not found". */
object SessionCaches {
  private val resets =
    new java.util.concurrent.CopyOnWriteArrayList[() => Unit]

  /** Register a cache-clearing thunk; call once per cache at object init. */
  def register(reset: () => Unit): Unit = resets.add(reset)

  /** Drop every registered cache (references only; block cleanup is the
    * context cleaner's job once the references are gone). */
  def resetAll(): Unit = resets.forEach(r => r())
}
