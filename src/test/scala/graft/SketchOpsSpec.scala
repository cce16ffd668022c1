package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contract for the rows-only `q_cms_topk`: count-min estimates can only
  * OVER-count (est ≥ exact, always — counters are sums of non-negative
  * adds), and the over-count is bounded by eps·N at the sketch's
  * confidence. Seeded hashing makes the whole thing deterministic, so
  * both bounds are hard assertions here, and a rerun must hash-match. */
class SketchOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.01"

  test("q_cms_topk: est >= exact, est <= exact + eps*N, deterministic") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val n = li.count()
    val slack = math.ceil(0.005 * n).toLong
    def run() = SparkEntry.queries("q_cms_topk")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val est = run()
    val exact = li.where(col("l_partkey").between(1, 25))
      .groupBy("l_partkey").agg(count(lit(1)).cast("long").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(est.keySet == (1L to 25L).toSet)
    for (k <- 1L to 25L) {
      val e = est(k); val x = exact.getOrElse(k, 0L)
      assert(e >= x, s"key $k: CMS must never under-count ($e < $x)")
      assert(e <= x + slack,
        s"key $k: over-count ${e - x} exceeds eps*N = $slack")
    }
    assert(run() == est, "seeded sketch must be reproducible")
  }
}
