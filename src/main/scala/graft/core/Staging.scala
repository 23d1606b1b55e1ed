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
  * finished.
  *
  * CONTRACT — release only at QUIESCENT points. [[releaseAll]] sweeps
  * the whole session-global registry, so it must run only when no staged
  * output is still awaiting consumption anywhere in the session — i.e.
  * one pipeline/gate at a time (how Verify, Bench and PipelineRunner
  * run). Releasing mid-consumption is NOT merely a recompute: several
  * staged frames are `spark_partition_id`-dependent (KsStatistic,
  * QuantileRank range-partition the value table and join per-partition
  * offsets back by _pid), and if their consumers independently recompute
  * the exchange after an early release, the offset and slice sides can
  * disagree on partition boundaries — silently wrong results, which the
  * eager count() in [[stage]] exists to prevent. Concurrent pipelines in
  * one session must skip releaseAll and accept cache growth (or release
  * at their own join point). Long-lived monitor loops that invoke a
  * staging operator per trigger (e.g. EventAnomaly.fromCounts) must call
  * releaseAll after consuming each readout, or they pin one staged frame
  * per trigger for the application's life.
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
