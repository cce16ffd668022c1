package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.AsOfJoin
import graft.plans.{AsofJoinNative, BroadcastAsofJoinExec}

class AsofNativeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("matches the composed union+window as-of on random keyed series") {
    val rng = new scala.util.Random(29)
    val probes = (1L to 500L).map(i =>
      (i, rng.nextInt(20).toLong, rng.nextInt(1000).toLong))
      .toDF("pid", "k", "t")
    val quotes = (1L to 300L).map(i =>
      (i, rng.nextInt(20).toLong, rng.nextInt(1000).toLong))
      .toDF("qid", "k", "qt")
    val native = AsofJoinNative.asofJoin(probes,
        quotes.select($"qid", $"k".as("qk"), $"qt"),
        "k", "qk", "t", "qt", "qid")
      .select("pid", "qid").as[(Long, Option[Long])].collect().toMap
    val composed = AsOfJoin.asOf(probes, quotes,
        leftKey = "k", rightKey = "k", leftTime = "t", rightTime = "qt",
        rightTie = "qid", rightVals = Seq("qid"))
      .select("pid", "qid").as[(Long, Option[Long])].collect().toMap
    assert(native == composed)
  }

  test("tie on time takes the greatest tie id; no-match rows null-pad") {
    val probes = Seq((1L, 1L, 100L), (2L, 1L, 5L), (3L, 2L, 100L))
      .toDF("pid", "k", "t")
    val quotes = Seq((10L, 1L, 100L), (11L, 1L, 100L), (9L, 1L, 50L))
      .toDF("qid", "qk", "qt")
    val got = AsofJoinNative.asofJoin(probes, quotes,
        "k", "qk", "t", "qt", "qid")
      .select("pid", "qid").as[(Long, Option[Long])].collect().toMap
    // pid 1: two quotes at t=100 -> max qid 11; pid 2: nothing at or
    // before t=5; pid 3: key 2 has no quotes at all
    assert(got == Map(1L -> Some(11L), 2L -> None, 3L -> None))
  }

  test("null keys and times never match; null right rows are dropped") {
    val probes = Seq(
      (1L, java.lang.Long.valueOf(1L), java.lang.Long.valueOf(100L)),
      (2L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(100L)),
      (3L, java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long]))
      .toDF("pid", "k", "t")
    val quotes = Seq(
      (10L, java.lang.Long.valueOf(1L), java.lang.Long.valueOf(50L)),
      (11L, null.asInstanceOf[java.lang.Long], java.lang.Long.valueOf(10L)),
      (12L, java.lang.Long.valueOf(1L), null.asInstanceOf[java.lang.Long]))
      .toDF("qid", "qk", "qt")
    val got = AsofJoinNative.asofJoin(probes, quotes,
        "k", "qk", "t", "qt", "qid")
      .select("pid", "qid").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(10L), 2L -> None, 3L -> None))
  }

  test("plan uses BroadcastAsofJoinExec; probe side has no shuffle") {
    val df = AsofJoinNative.asofJoin(
      Seq((1L, 1L, 5L)).toDF("pid", "k", "t"),
      Seq((1L, 1L, 1L)).toDF("qid", "qk", "qt"),
      "k", "qk", "t", "qt", "qid")
    val p = df.queryExecution.executedPlan
    assert(p.collect { case e: BroadcastAsofJoinExec => e }.nonEmpty, p.toString)
    assert(p.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }.isEmpty, s"as-of broadcast must not shuffle the probe side:\n$p")
  }
}
