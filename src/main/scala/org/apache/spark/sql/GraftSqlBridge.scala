package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Minimal accessor bridge: Spark 4 made Column<->Expression conversion
  * `private[sql]` (`classic.ExpressionUtils`). Custom Catalyst expressions
  * (graft.functions._) need exactly these two conversions to expose a
  * `Column` API — the standard extension-library pattern.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Wrap a (resolved) LogicalPlan as a DataFrame — needed to hand a
    * custom logical operator (graft.plans._) back to the public API. */
  def ofRows(spark: SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    classic.Dataset.ofRows(spark.asInstanceOf[classic.SparkSession], plan)

  /** Substitute already-cached (persisted) subtrees of `plan` with
    * their `InMemoryRelation`s, exactly as execution would (r16). The
    * window-rewrite's chain merge runs CollapseProject over the raw
    * analyzed plan; collapsing a Project INTO a pinned subtree changes
    * that subtree, the CacheManager's sameResult lookup then misses at
    * execution, and the pinned pipeline silently recomputes (measured:
    * q_bootstrap_ci's 100k-row md5 pipeline ran twice — shuffle records
    * doubled). Substituting first turns every cached subtree into an
    * InMemoryRelation LEAF the merge cannot reach into. */
  def withCachedData(spark: SparkSession,
                     plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.catalyst.plans.logical.LogicalPlan =
    spark.asInstanceOf[classic.SparkSession].sharedState.cacheManager
      .useCachedData(plan)

  /** Free the storage blocks behind a `localCheckpoint()`ed Dataset.
    *
    * `localCheckpoint` persists `queryExecution.toRdd` and truncates the
    * lineage to a `LogicalRDD` over those blocks; `Dataset.unpersist()`
    * only consults the CacheManager and never releases them, so an
    * iterative algorithm that checkpoints per round leaks every prior
    * round's blocks until GC. This digs the RDD out of the `LogicalRDD`
    * and unpersists it directly — call ONLY once nothing will read the
    * Dataset again (the lineage is gone; the data is unrecoverable).
    */
  def freeLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed match {
      case lr: org.apache.spark.sql.execution.LogicalRDD =>
        lr.rdd.unpersist(blocking = false)
      case _ => () // not a checkpointed plan — nothing to free
    }

  /** The session's (mutable, shared-with-`newSession()` descendants)
    * extensions registry — `private[sql]` on `classic.SparkSession`.
    * graft.catalog.GraftViews injects its view-resolution rule here and
    * derives a sibling session whose fresh session state picks it up. */
  def extensions(spark: SparkSession): SparkSessionExtensions =
    spark.asInstanceOf[classic.SparkSession].extensions

  /** Drain the listener bus so QueryExecutionListener callbacks for all
    * already-finished actions have run (`listenerBus` is private[spark];
    * the plan-audit specs need a synchronous view of what executed). */
  def waitForListenerBus(spark: SparkSession): Unit =
    spark.sparkContext.listenerBus.waitUntilEmpty()
}
