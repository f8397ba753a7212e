package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Materialization strategies for a derived table that is about to be
  * referenced more than once in one plan (e.g. both sides of a
  * self-join, or two union branches).
  *
  * Why this exists: Catalyst's `DeduplicateRelations` gives each
  * reference of the same logical subtree fresh expression ids, so
  * exchange/subquery reuse never fires across a self-join — the whole
  * upstream pipeline executes once PER REFERENCE unless the table is
  * materialized first.
  *
  * Two strategies, chosen per deployment:
  *
  *   - [[Materialize.LocalCheckpoint]] (default): eager
  *     `localCheckpoint` — cheapest on a single node (no lineage
  *     re-evaluation, blocks stored on the executors that computed
  *     them) but NOT fault-tolerant: losing an executor loses its
  *     blocks with no lineage to recompute them.
  *   - [[Materialize.Persist]]: `persist(MEMORY_AND_DISK)` — the cache
  *     manager substitutes the cached relation into every reference
  *     (cache lookup matches on the canonicalized analyzed plan, so it
  *     fires on re-aliased self-join sides too), the pipeline computes
  *     once, and lineage is retained so executor loss triggers
  *     recompute instead of job failure. The right choice on a
  *     long-lived multi-executor cluster.
  */
object Materialize {

  sealed trait Strategy

  /** Eager localCheckpoint: single-node default, not fault-tolerant. */
  case object LocalCheckpoint extends Strategy

  /** persist(MEMORY_AND_DISK): fault-tolerant, lineage retained. */
  case object Persist extends Strategy

  /** Materialize `df` under the chosen strategy so later multiple
    * references execute its pipeline exactly once.
    *
    * Lifecycle note for [[Persist]]: the cache entry lives until the
    * session drops it — a long-running job that calls a persisting
    * operator per batch should `df.unpersist()` its outputs' inputs (or
    * `spark.sharedState.cacheManager.clearCache()` between batches)
    * once downstream results are materialized, or executor storage
    * accumulates one signature/bucket table per call. LocalCheckpoint
    * blocks are dropped with the RDD by the ContextCleaner once
    * unreferenced.
    */
  def apply(df: DataFrame, strategy: Strategy = LocalCheckpoint): DataFrame =
    strategy match {
      case LocalCheckpoint =>
        if (sys.env.contains("GRAFT_MAT_TRACE")) {
          val t0 = System.nanoTime()
          val out = df.localCheckpoint()
          val caller = Thread.currentThread().getStackTrace
            .drop(2).find(e => !e.getClassName.startsWith("graft.core"))
            .map(e => s"${e.getClassName.stripPrefix("graft.")}:${e.getLineNumber}")
            .getOrElse("?")
          System.err.println(f"[mat] ${(System.nanoTime() - t0) / 1e9}%6.3fs $caller")
          out
        } else df.localCheckpoint()
      case Persist         => df.persist(StorageLevel.MEMORY_AND_DISK)
    }

  /** Release a table previously materialized with [[apply]] once its
    * consumers have materialized (iterative algorithms call this on the
    * superseded round's table). Persist: drop the cache entry without
    * blocking. LocalCheckpoint: no-op — the checkpoint RDD's blocks are
    * reclaimed by the ContextCleaner when the DataFrame becomes
    * unreachable. */
  def release(df: DataFrame, strategy: Strategy): Unit =
    strategy match {
      case LocalCheckpoint => ()
      case Persist         => df.unpersist(blocking = false); ()
    }
}
