package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Storage-partitioned join: two sources REPORTING key-grouped
  * partitioning must join with ZERO Exchange — co-location from the
  * table layout itself, the Iceberg/Delta SPJ contract. */
class KeyedSourceSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark = SparkTestSession.spark

  private def keyed(mult: Long) = spark.read.format("graft-keyed")
    .option("groups", 8).option("rowsPerGroup", 200)
    .option("mult", mult).load()

  test("reported KeyGroupedPartitioning joins without any Exchange") {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val a = keyed(31).groupBy("k").agg(sum("v").as("sa"))
      val b = keyed(57).groupBy("k").agg(sum("v").as("sb"))
      val joined = a.join(b, "k")
      assert(joined.count() == 8)
      val exchanges = collectWithSubqueries(
        joined.queryExecution.executedPlan) { case e: Exchange => e }
      assert(exchanges.isEmpty,
        s"SPJ should be shuffle-free, got:\n${joined.queryExecution.executedPlan}")
    } finally prev.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None) => spark.conf.unset(c)
    }
  }

  test("formula values match the documented generator") {
    val rows = keyed(31).where(col("k") === 3).orderBy("v").limit(3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // group 3, mult 31: v = (93 + 7i) % 1000 for i in 0..199
    val expect = (0L until 200L).map(i => (3L, (93 + 7 * i) % 1000))
      .sortBy(_._2).take(3)
    assert(rows.toSeq == expect)
  }

  test("without v2 bucketing the same join needs exchanges (control)") {
    val confs = Seq(
      "spark.sql.sources.v2.bucketing.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (c, _) => c -> spark.conf.getOption(c) }
    confs.foreach { case (c, v) => spark.conf.set(c, v) }
    try {
      val joined = keyed(31).join(keyed(57), "k")
      joined.count()
      val exchanges = collectWithSubqueries(
        joined.queryExecution.executedPlan) { case e: Exchange => e }
      assert(exchanges.nonEmpty)
    } finally prev.foreach {
      case (c, Some(v)) => spark.conf.set(c, v)
      case (c, None) => spark.conf.unset(c)
    }
  }
}
