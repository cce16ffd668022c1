package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{TopKPerKey, TopKPerKeyExec, TopKPerKeyPartialExec}

class TopKPerKeySpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("topKPerKey == window row_number formulation (unique order values)") {
    val rng = new scala.util.Random(11)
    // unique order values: permutation of 0..n
    val n = 5000
    val vals = rng.shuffle((0 until n).toList)
    val df = vals.zipWithIndex.map { case (v, i) =>
      (i % 37L, v.toLong, s"payload_$i")
    }.toDF("k", "v", "p")
    val custom = TopKPerKey.topKPerKey(df, Seq("k"), "v", 5)
      .select("k", "v", "p").as[(Long, Long, String)].collect().toSet
    val w = Window.partitionBy("k").orderBy(col("v").desc)
    val window = df.withColumn("rn", row_number().over(w)).where($"rn" <= 5)
      .select("k", "v", "p").as[(Long, Long, String)].collect().toSet
    assert(custom == window && custom.size == 37 * 5)
  }

  test("groups smaller than k are returned whole; null order values dropped") {
    val df = Seq((1L, Some(10L)), (1L, Some(20L)), (2L, None), (2L, Some(5L)))
      .toDF("k", "v")
    val got = TopKPerKey.topKPerKey(df, Seq("k"), "v", 3)
      .select("k", "v").as[(Long, Option[Long])].collect().toSet
    assert(got == Set((1L, Some(10L)), (1L, Some(20L)), (2L, Some(5L))))
  }

  test("plan contains TopKPerKeyExec and exactly one inserted shuffle") {
    val df = (1 to 100).map(i => (i % 7L, i.toLong)).toDF("k", "v")
    val q = TopKPerKey.topKPerKey(df, Seq("k"), "v", 2)
    q.collect()
    val plan = q.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) { case e: TopKPerKeyExec => e }.nonEmpty)
    val shuffles = collectWithSubqueries(plan) { case e: ShuffleExchangeLike => e }
    assert(shuffles.size == 1)
  }

  test("map-side partial heap bounds the shuffle to ≤ partitions×keys×k rows") {
    val nParts = 8
    val df = spark.range(100000).repartition(nParts)
      .selectExpr("id % 7 AS k", "id AS v")
    val q = TopKPerKey.topKPerKey(df, Seq("k"), "v", 2)
    val got = q.select("k", "v").as[(Long, Long)].collect().toSet
    // exactness first: global top-2 per key survives the two-phase split
    val want = (0L until 7L).flatMap { key =>
      val top = (0L until 100000L).filter(_ % 7 == key).sorted.reverse.take(2)
      top.map(key -> _)
    }.toSet
    assert(got == want)
    val plan = q.queryExecution.executedPlan
    assert(collectWithSubqueries(plan) {
      case e: TopKPerKeyPartialExec => e }.nonEmpty)
    // the exchange feeding the final node must carry the PARTIAL output
    // (≤ 8 partitions × 7 keys × 2 = 112 rows), not the 100k input
    val topkShuffle = collectWithSubqueries(plan) {
      case e: ShuffleExchangeLike
        if collectWithSubqueries(e.child) {
          case p: TopKPerKeyPartialExec => p }.nonEmpty => e
    }
    assert(topkShuffle.size == 1)
    val written = topkShuffle.head.metrics("shuffleRecordsWritten").value
    assert(written <= nParts.toLong * 7 * 2,
      s"shuffle carried $written rows — partial heap not applied")
  }

  test("string order type works") {
    val df = Seq((1L, "b"), (1L, "a"), (1L, "c"), (2L, "x")).toDF("k", "s")
    val got = TopKPerKey.topKPerKey(df, Seq("k"), "s", 2)
      .select("k", "s").as[(Long, String)].collect().toSet
    assert(got == Set((1L, "c"), (1L, "b"), (2L, "x")))
  }

  test("string order values survive row-buffer reuse (20k rows)") {
    // regression: UTF8String order values are views into the shuffle
    // reader's reused buffer and must be copied before entering the heap
    val rng = new scala.util.Random(5)
    val rows = (1 to 20000).map { i =>
      (i % 5L, rng.alphanumeric.take(12).mkString, i)
    }
    val df = rows.toDF("k", "s", "id")
    val got = TopKPerKey.topKPerKey(df, Seq("k"), "s", 4)
      .select("k", "s").as[(Long, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toSeq).toMap
    val want = rows.groupBy(_._1).view
      .mapValues(_.map(_._2).sorted(Ordering[String].reverse).take(4).sorted.toSeq)
      .toMap
    assert(got == want)
  }
}
