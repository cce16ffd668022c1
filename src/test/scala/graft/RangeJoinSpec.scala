package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{BroadcastRangeJoinExec, RangeJoin}

class RangeJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def brute(points: Seq[(Long, Long)],
                    ivs: Seq[(Long, Long, Long)]): Set[(Long, Long)] =
    (for {
      (pid, p) <- points
      (iid, lo, hi) <- ivs
      if lo <= p && p <= hi
    } yield (pid, iid)).toSet

  test("matches the brute-force BETWEEN join on random data (incl. nesting)") {
    val rng = new scala.util.Random(13)
    val points = (1L to 400L).map(i => (i, rng.nextInt(1000).toLong))
    // irregular, heavily nested intervals — exercises the prefix-max stop
    val ivs = (1L to 120L).map { i =>
      val lo = rng.nextInt(900).toLong
      (i, lo, lo + rng.nextInt(300).toLong)
    }
    val got = RangeJoin.pointInInterval(
      points.toDF("pid", "p"), ivs.toDF("iid", "lo", "hi"), "p", "lo", "hi")
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == brute(points, ivs))
  }

  test("plan uses BroadcastRangeJoinExec, not nested-loop") {
    val df = RangeJoin.pointInInterval(
      Seq((1L, 5L)).toDF("pid", "p"),
      Seq((1L, 0L, 9L)).toDF("iid", "lo", "hi"), "p", "lo", "hi")
    val p = df.queryExecution.executedPlan
    assert(p.collect { case e: BroadcastRangeJoinExec => e }.nonEmpty,
      p.toString)
    assert(p.collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => j
    }.isEmpty, p.toString)
  }

  test("ambiguous column names fail loudly instead of binding the first match") {
    val dup = Seq((1L, 5L)).toDF("pid", "p").withColumn("p", $"p")
      .select($"pid", $"p", $"p".as("p")) // two output attrs named p
    val e = intercept[IllegalArgumentException] {
      RangeJoin.pointInInterval(dup,
        Seq((1L, 0L, 9L)).toDF("iid", "lo", "hi"), "p", "lo", "hi")
    }
    assert(e.getMessage.contains("ambiguous"))
  }

  test("edges: empty intervals, out-of-range points, null handling") {
    val empty = RangeJoin.pointInInterval(
      Seq((1L, 5L)).toDF("pid", "p"),
      Seq.empty[(Long, Long, Long)].toDF("iid", "lo", "hi"), "p", "lo", "hi")
    assert(empty.count() == 0)
    val oob = RangeJoin.pointInInterval(
      Seq((1L, -10L), (2L, 999L)).toDF("pid", "p"),
      Seq((1L, 0L, 10L)).toDF("iid", "lo", "hi"), "p", "lo", "hi")
    assert(oob.count() == 0)
    val withNulls = RangeJoin.pointInInterval(
      Seq((java.lang.Long.valueOf(1L), java.lang.Long.valueOf(5L)),
        (java.lang.Long.valueOf(2L), null))
        .toDF("pid", "p"),
      Seq((java.lang.Long.valueOf(1L), java.lang.Long.valueOf(0L), java.lang.Long.valueOf(9L)),
        (java.lang.Long.valueOf(2L), null, java.lang.Long.valueOf(9L)))
        .toDF("iid", "lo", "hi"),
      "p", "lo", "hi")
    assert(withNulls.select("pid", "iid").as[(Long, Long)].collect().toSet
      == Set((1L, 1L)))
  }

  test("boundary inclusivity: lo = p and hi = p both match") {
    val got = RangeJoin.pointInInterval(
      Seq((1L, 10L)).toDF("pid", "p"),
      Seq((1L, 10L, 20L), (2L, 0L, 10L), (3L, 11L, 20L), (4L, 0L, 9L))
        .toDF("iid", "lo", "hi"), "p", "lo", "hi")
      .select("iid").as[Long].collect().toSet
    assert(got == Set(1L, 2L))
  }

  test("nested intervals sharing a lo: all containing intervals found") {
    // lo all <= p, hi mixed: the scan must not stop at the first miss
    val got = RangeJoin.pointInInterval(
      Seq((1L, 50L)).toDF("pid", "p"),
      Seq((1L, 0L, 100L), (2L, 10L, 20L), (3L, 20L, 60L), (4L, 30L, 40L),
        (5L, 40L, 55L)).toDF("iid", "lo", "hi"), "p", "lo", "hi")
      .select("iid").as[Long].collect().toSet
    assert(got == Set(1L, 3L, 5L))
  }
}
