package graft

import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, ShuffledHashJoinExec, SortMergeJoinExec}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Join-strategy control: the three knobs that matter at 100 TB.
  *
  *  - HINTS pick the physical join when the optimizer's size estimates
  *    are wrong (a 10 MB-estimated dim that is really 10 GB, or the
  *    reverse) — each hint must actually select its operator, or the
  *    "fix" silently does nothing;
  *  - AQE SKEW SPLIT rescues the straggler partition a hot key creates
  *    in a sort-merge join: the oversized partition is split into
  *    sub-partitions joined against a replicated other side. This is
  *    the runtime complement of SkewOps' compile-time salting — no
  *    query rewrite, but only fires under AQE with size thresholds.
  */
class JoinStrategySpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def finalPlan(df: org.apache.spark.sql.DataFrame) = {
    df.collect() // AQE finalizes the plan only on execution
    df.queryExecution.executedPlan
  }

  test("broadcast / merge / shuffle_hash hints select their operators") {
    val big = spark.range(0, 10000).select(col("id").as("k"))
    val dim = spark.range(0, 100).select(col("id").as("k"),
      (col("id") * 2).as("v"))

    val bhj = finalPlan(big.join(dim.hint("broadcast"), "k"))
    assert(collectWithSubqueries(bhj) {
      case j: BroadcastHashJoinExec => j }.nonEmpty, s"no BHJ in:\n$bhj")

    val smj = finalPlan(big.join(dim.hint("merge"), "k"))
    assert(collectWithSubqueries(smj) {
      case j: SortMergeJoinExec => j }.nonEmpty, s"no SMJ in:\n$smj")

    val shj = finalPlan(big.join(dim.hint("shuffle_hash"), "k"))
    assert(collectWithSubqueries(shj) {
      case j: ShuffledHashJoinExec => j }.nonEmpty, s"no SHJ in:\n$shj")
  }

  test("AQE splits the skewed partition of a sort-merge join") {
    // one hot key (0) carries ~100k rows ≈ several MB; thresholds are
    // lowered so the hot partition qualifies as skewed on this fixture
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.forceOptimizeSkewedJoin" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) =>
      k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val left = spark.range(0, 120000)
        .select(when(col("id") % 6 =!= 0, 0L).otherwise(col("id")).as("k"),
          concat(lit("payload-payload-payload-"), col("id")).as("pay"))
      val right = spark.range(0, 2000).select(col("id").as("k"),
        (col("id") * 3).as("v"))
      // no same-key operator above the join (that would add a
      // distribution requirement AQE must weigh against the split), and
      // the payload stays referenced so the hot partition's shuffle
      // bytes clear the skew threshold
      val joined = left.join(right, "k")
        .agg(sum(length(col("pay"))).as("bytes"))
      val plan = finalPlan(joined)
      val skewed = collectWithSubqueries(plan) {
        case j: SortMergeJoinExec if j.isSkewJoin => j
        case j: ShuffledHashJoinExec if j.isSkewJoin => j
      }
      assert(skewed.nonEmpty, s"no skew-split join in:\n$plan")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
