package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Lifecycle registry for persisted STAGING frames — the bounded
  * intermediates (cell tables, per-source word counts, distinct-value
  * tables) operators persist+materialize once so multiple consumers read
  * cached rows instead of re-deriving a corpus aggregate (the psiPerGroup
  * column-pruning-defeats-exchange-reuse lesson).
  *
  * Why a registry: eager unpersist inside an operator is unsafe — its
  * output is lazily consumed, so the stage must outlive the `apply`
  * call. Left alone, MEMORY_AND_DISK blocks from a 200-gate sweep or
  * repeated pipeline triggers accumulate until the ContextCleaner
  * happens to GC the frames (ADVICE r13). Operators therefore stage
  * through here, and the session's consumption points (Verify after each
  * gate dump, Bench after each measured rep, PipelineRunner after each
  * run) call [[releaseAll]] once the action that consumed the output has
  * finished. Releasing is always CORRECT — a re-consumed frame silently
  * recomputes — it only forfeits caching, so release points just have to
  * sit after full consumption, never before an action.
  */
object Staging {

  private val live = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[DataFrame, java.lang.Boolean]())

  /** Persist + eagerly materialize `df` and register it for
    * [[releaseAll]]; returns the persisted frame. Eager because every
    * staging site needs it (consumers must hit the cache, not re-derive)
    * and because a lazily-persisted stage could otherwise first
    * materialize AFTER a releaseAll raced past it.
    */
  def stage(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    p.count()
    live.add(p)
    p
  }

  /** Number of live staged frames (test observability). */
  def liveCount: Int = live.size()

  /** Unpersist every staged frame (non-blocking) and clear the registry.
    * Call only after the consuming action has completed.
    */
  def releaseAll(): Unit = {
    live.forEach(df => df.unpersist(false))
    live.clear()
  }
}
