package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.{ExtQueries, Queries, R103Queries, R13Queries, R39Queries, R49Queries, R54Queries, R67Queries, R72Queries, R88Queries, R92Queries, R94Queries, R96Queries, R98Queries, R99Queries}

/** Storage hygiene of the multiply-consumed-intermediate pins (r10,
  * VERDICT r9 task 3): the five query bodies that materialize a
  * model-sized relation mid-plan must leave NO storage blocks the
  * session cannot reclaim. `localCheckpoint()` (the r9 shape) fails
  * this — its RDD blocks bypass the CacheManager, so Bench's
  * `spark.catalog.clearCache()` between queries cannot free them and
  * they linger until GC. The `Queries.pin` replacement (persist +
  * forcing count) keeps every block under the CacheManager: after a
  * query runs, one `clearCache()` must return the session to its
  * prior persistent-RDD set.
  */
class PinnedBlocksSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  /** Every query whose body (or whose operator: the GraphOps solvers,
    * the CrawlGraph loops) materializes a multiply-consumed
    * intermediate or a result — the full set converted off
    * localCheckpoint in r10. */
  private val pinned = Seq(
    R13Queries.qPageRank, R13Queries.qSssp, R39Queries.qHits,
    R49Queries.qTextrank, R54Queries.qMinhashEstimate,
    R72Queries.qDbscanCells, R67Queries.qSccFunctional,
    R88Queries.qPhraseSearch, R88Queries.qCriticalPath,
    R92Queries.qBoost, R96Queries.qIpf, R99Queries.qHaar,
    R94Queries.qAssortativity, R98Queries.qModularity,
    R103Queries.qConductance, ExtQueries.qComponentsStar,
    ExtQueries.qDedupComponents, Queries.qCrawlBfs)

  test("pinned intermediates are fully reclaimed by clearCache") {
    spark.catalog.clearCache()
    val before = spark.sparkContext.getPersistentRDDs.keySet
    pinned.foreach { q =>
      q.run(spark, sf).collect()
      spark.catalog.clearCache()
      val leaked = spark.sparkContext.getPersistentRDDs.keySet.diff(before)
      assert(leaked.isEmpty,
        s"${q.name}: blocks ${leaked.mkString(",")} survived clearCache — " +
          "an intermediate escaped the CacheManager (localCheckpoint shape)")
    }
  }
}
