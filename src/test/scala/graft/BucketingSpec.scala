package graft

import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Bucketing, Tables}

/** Co-bucketed joins must plan with ZERO exchanges: the shuffle was paid
  * once at write time. */
class BucketingSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark = SparkTestSession.spark

  val sf = "/root/testdata/sf0.001"

  test("co-bucketed join on the bucket key plans without any Exchange") {
    Bucketing.writeBucketed(
      Tables.load(spark, sf, "lineitem"), "li_bucketed", "l_orderkey", 8)
    Bucketing.writeBucketed(
      Tables.load(spark, sf, "orders"), "o_bucketed", "o_orderkey", 8)
    val joined = Bucketing.coBucketedJoin(spark, "li_bucketed", "o_bucketed",
      "l_orderkey", "o_orderkey")
    // force a merge-join path: disable broadcast for this check
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val n = joined.count()
      assert(n == Tables.load(spark, sf, "lineitem").count())
      val plan = joined.queryExecution.executedPlan
      val exchanges = collectWithSubqueries(plan) { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"expected shuffle-free bucketed join, got: $plan")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }

  test("non-bucketed same join needs exchanges (control)") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val li = Tables.load(spark, sf, "lineitem")
      val o = Tables.load(spark, sf, "orders")
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
      joined.count()
      val exchanges = collectWithSubqueries(joined.queryExecution.executedPlan) {
        case e: Exchange => e
      }
      assert(exchanges.nonEmpty)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
    }
  }
}
