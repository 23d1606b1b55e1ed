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
  * repeated pipeline triggers accumulate for the session's life
  * (ADVICE r13).
  *
  * SCOPES (ADVICE r14): release is tied to the call path that CREATED
  * the stage, not to a session-global sweep. A consumption point wraps
  * its work in [[scoped]]; frames staged anywhere under that block (on
  * the same thread) release when the block exits — i.e. after the
  * actions that consumed them have finished, which is that path's
  * quiescent point BY CONSTRUCTION. Scopes are thread-confined and
  * nest, so:
  *
  *  - concurrent pipelines in one session (distinct threads, e.g. two
  *    streaming queries' foreachBatch loops) cannot release each
  *    other's frames — the r14 hazard where an early sweep made
  *    `spark_partition_id`-dependent stages (KsStatistic, QuantileRank)
  *    recompute with different partition boundaries mid-consumption is
  *    structurally closed;
  *  - a long-lived monitor loop wraps each trigger's readout in
  *    [[scoped]] and leaks nothing, with no global-contract knowledge.
  *
  * Frames staged OUTSIDE any scope land in the session-global registry,
  * swept by [[releaseAll]] — the pre-r15 contract, kept for ad-hoc/REPL
  * use: call releaseAll only at a point where no staged output is still
  * awaiting consumption on ANY thread (releaseAll never touches scoped
  * frames, so scoped call paths stay safe regardless). [[release]]
  * drops one specific frame when the creating code knows its own
  * quiescent point.
  */
object Staging {

  private final class Scope {
    val frames = new java.util.concurrent.ConcurrentLinkedQueue[DataFrame]()
  }

  // thread-confined stack of open scopes (innermost first)
  private val scopes = new ThreadLocal[List[Scope]] {
    override def initialValue(): List[Scope] = Nil
  }

  // frames staged outside any scope — the global sweep target
  private val global = java.util.Collections.newSetFromMap(
    new java.util.concurrent.ConcurrentHashMap[DataFrame, java.lang.Boolean]())

  /** Persist + eagerly materialize `df`; register it with the innermost
    * open scope on this thread (released at that scope's exit), or with
    * the global registry when no scope is open. Eager because every
    * staging site needs it (consumers must hit the cache, not re-derive)
    * and because a lazily-persisted stage could otherwise first
    * materialize AFTER its release raced past it.
    */
  def stage(df: DataFrame,
      level: StorageLevel = StorageLevel.MEMORY_AND_DISK): DataFrame = {
    val p = df.persist(level)
    p.count()
    scopes.get() match {
      case s :: _ => s.frames.add(p)
      case Nil => global.add(p)
    }
    p
  }

  /** Register an ALREADY-persisted frame (e.g. a frozen model table
    * whose lifetime is normally caller-managed) with the innermost open
    * scope / the global registry, so the surrounding call path's release
    * point unpersists it like any staged frame.
    */
  def adopt(df: DataFrame): DataFrame = {
    scopes.get() match {
      case s :: _ => s.frames.add(df)
      case Nil => global.add(df)
    }
    df
  }

  /** Run `body` with a fresh scope: frames staged under it (this
    * thread) unpersist when the block exits — after `body`'s consuming
    * actions completed. Nests; inner scopes release first.
    */
  def scoped[T](body: => T): T = {
    val s = new Scope
    scopes.set(s :: scopes.get())
    try body
    finally {
      scopes.set(scopes.get() match { case _ :: t => t; case Nil => Nil })
      s.frames.forEach(df => df.unpersist(false))
      s.frames.clear()
    }
  }

  /** Unpersist one staged frame now — for creators that know their own
    * quiescent point. Removes it from whichever registry holds it (or
    * no-ops for an unknown frame).
    */
  def release(df: DataFrame): Unit = {
    val inScope = scopes.get().exists(_.frames.remove(df))
    if (global.remove(df) || inScope) df.unpersist(false)
  }

  /** Number of live staged frames on this thread's scopes plus the
    * global registry (test observability).
    */
  def liveCount: Int = scopes.get().map(_.frames.size).sum + global.size()

  /** Unpersist every GLOBALLY-registered staged frame (non-blocking)
    * and clear that registry. Never touches scoped frames — scoped call
    * paths release themselves. Call only when no globally-staged output
    * is still awaiting consumption.
    */
  def releaseAll(): Unit = {
    global.forEach(df => df.unpersist(false))
    global.clear()
  }
}
