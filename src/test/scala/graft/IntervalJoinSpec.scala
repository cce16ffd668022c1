package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.IntervalJoin

/** Binned interval join == brute-force theta join, for bin widths both
  * smaller and larger than the intervals (multi-bin spans are where a
  * missing dedup or an off-by-one bin range shows up). */
class IntervalJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // deterministic pseudo-random intervals: lo in [0, 1000), len in [1, 120]
  private def intervals(n: Int, salt: Int) =
    (0 until n).map { i =>
      val lo = (i * 37 + salt * 101) % 1000
      val len = 1 + ((i * 53 + salt * 7) % 120)
      (i.toLong, lo.toLong, (lo + len).toLong)
    }

  private def pairs(binWidth: Long): Seq[(Long, Long)] = {
    val l = intervals(80, 1).toDF("l_id", "l_lo", "l_hi")
    val r = intervals(90, 2).toDF("r_id", "r_lo", "r_hi")
    IntervalJoin.binnedOverlapJoin(l, "l_lo", "l_hi", r, "r_lo", "r_hi", binWidth)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq.sorted
  }

  private lazy val expected: Seq[(Long, Long)] = {
    val l = intervals(80, 1).toDF("l_id", "l_lo", "l_hi")
    val r = intervals(90, 2).toDF("r_id", "r_lo", "r_hi")
    l.crossJoin(r)
      .where(col("l_lo") < col("r_hi") && col("r_lo") < col("l_hi"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq.sorted
  }

  test("bin width near interval length") { assert(pairs(64) == expected) }

  test("bin width much smaller than intervals (every pair spans many bins)") {
    assert(pairs(7) == expected)
  }

  test("bin width larger than the whole domain (single bin, degenerate)") {
    assert(pairs(10000) == expected)
  }

  test("nanosecond-epoch bounds beyond 2^53 bin exactly (no double corruption)") {
    // ~1.7e18 ns with widths of a few hundred ns: a double divide loses
    // ~256 ns of precision here and mis-bins boundary intervals
    val base = 1700000000000000000L
    val l = (0 until 60).map { i =>
      (i.toLong, base + i * 333L, base + i * 333L + 1 + (i % 5) * 100L)
    }.toDF("l_id", "l_lo", "l_hi")
    val r = (0 until 70).map { i =>
      (i.toLong, base + i * 287L + 13L, base + i * 287L + 14L + (i % 7) * 90L)
    }.toDF("r_id", "r_lo", "r_hi")
    val want = l.crossJoin(r)
      .where(col("l_lo") < col("r_hi") && col("r_lo") < col("l_hi"))
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq.sorted
    // narrow bins stress 2^53 double corruption; minute-wide ns bins
    // (6e10) stress decimal HALF_UP rounding at the derived scale —
    // integer floor division must survive both
    for (w <- Seq(256L, 60L * 1000 * 1000 * 1000)) {
      val got = IntervalJoin
        .binnedOverlapJoin(l, "l_lo", "l_hi", r, "r_lo", "r_hi", w)
        .select("l_id", "r_id").as[(Long, Long)].collect().toSeq.sorted
      assert(got == want && want.nonEmpty, s"binWidth=$w")
    }
  }

  test("negative bounds use floor (not truncate-toward-zero) binning") {
    val l = Seq((1L, -95L, -80L), (2L, -10L, 5L)).toDF("l_id", "l_lo", "l_hi")
    val r = Seq((1L, -85L, -60L), (2L, -3L, 1L)).toDF("r_id", "r_lo", "r_hi")
    val got = IntervalJoin
      .binnedOverlapJoin(l, "l_lo", "l_hi", r, "r_lo", "r_hi", 32)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq.sorted
    assert(got == Seq((1L, 1L), (2L, 2L)))
  }

  test("empty and null intervals are dropped, not matched") {
    val l = Seq((1L, 10L, 10L), (2L, 5L, 6L)).toDF("l_id", "l_lo", "l_hi")
    val r = spark.sql(
      "SELECT * FROM VALUES (1L, 5L, 20L), (2L, NULL, 9L) AS t(r_id, r_lo, r_hi)")
    val got = IntervalJoin
      .binnedOverlapJoin(l, "l_lo", "l_hi", r, "r_lo", "r_hi", 8)
      .select("l_id", "r_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((2L, 1L))) // [10,10) is empty; null lo never matches
  }

  test("plan shuffles on the bin (equi-join), not a nested loop") {
    val l = intervals(80, 1).toDF("l_id", "l_lo", "l_hi")
      .repartition(4) // defeat any small-input broadcast
    val r = intervals(90, 2).toDF("r_id", "r_lo", "r_hi").repartition(4)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val plan = IntervalJoin
        .binnedOverlapJoin(l, "l_lo", "l_hi", r, "r_lo", "r_hi", 64)
        .queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
        s"expected an equi-shuffle join on the bin:\n$plan")
      assert(!plan.contains("BroadcastNestedLoopJoin") &&
        !plan.contains("CartesianProduct"), s"nested loop leaked:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
