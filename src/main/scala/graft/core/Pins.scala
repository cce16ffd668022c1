package graft.core

import org.apache.spark.sql.DataFrame

/** Eager, CacheManager-tracked materialization of a multiply-consumed
  * DataFrame (r10, the round-9 storage-hygiene fix).
  *
  * Two shapes exist for "evaluate this once, reuse it several times":
  *
  *  - `localCheckpoint()` — truncates lineage (the ONLY correct choice
  *    for self-referencing loop state, where plan trees otherwise
  *    double per round), but its blocks bypass the CacheManager:
  *    `spark.catalog.clearCache()` cannot reclaim them and they live
  *    until the RDD is GC'd. Loop-internal state therefore pairs it
  *    with [[org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint]]
  *    each round.
  *  - [[pin]] — `persist()` + a forcing `count()`. No lineage
  *    truncation, but every block stays under the CacheManager, so a
  *    session-level `clearCache()` (Bench runs one between queries)
  *    returns storage to zero. This is the shape for RESULTS and for
  *    straight-line multiply-consumed intermediates.
  *
  * After a caller frees truncated-lineage inputs (the GraphOps solver
  * pattern: pin the result, then free the last round's checkpoint),
  * the pinned cache can no longer recompute evicted partitions — pin
  * only model-sized relations, and pin BEFORE freeing inputs.
  */
object Pins {
  def pin(df: DataFrame): DataFrame = {
    df.persist(); df.count(); df
  }

  /** Pin `df` as an INDEPENDENT cache entry — the RESULT shape for
    * operators that release their inputs before returning (the GraphOps
    * solvers, the CrawlGraph loops).
    *
    * A plain [[pin]] is unsound there: Spark's non-cascading uncache
    * (`Dataset.unpersist` on any input whose plan is a subplan of the
    * cached result) re-compiles the dependent entry and CLEARS its
    * built buffers, so the next read recomputes through lineage the
    * caller has already freed (measured: CHECKPOINT_RDD_BLOCK_ID_NOT_
    * FOUND when the loop state was localCheckpoint-freed).
    *
    * This variant stages through an eager `localCheckpoint()` — the
    * result is computed ONCE while the caller's caches are still warm,
    * and its plan collapses to a bare `LogicalRDD` scan that shares no
    * subplan with any input — then copies the blocks into a
    * CacheManager-tracked persist and frees the staging checkpoint
    * (RDD-level, which bypasses cache invalidation). Later input
    * unpersists cannot touch the entry, and `clearCache()` fully
    * reclaims it. If the entry is dropped BEFORE the returned Dataset's
    * last read, that read fails (the staging lineage is gone) — callers
    * re-run the operator rather than re-reading a cleared result. */
  def pinDetached(df: DataFrame): DataFrame = {
    val staged = df.localCheckpoint() // eager: computed from warm inputs
    staged.persist(); staged.count()
    org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(staged)
    staged
  }
}
