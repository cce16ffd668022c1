package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** Scan-pruning pins for the r13 late-wave registry queries: column
  * pruning must flow through every new custom operator
  * (`producedAttributes` correct on all seven skew members + the
  * widened global ones), so each query's parquet scan reads ONLY the
  * columns the query touches. A scan that regresses to reading the
  * whole events/orders row fails here — the PERF scan-audit convention
  * turned into a permanent pin. */
class R112ScanPruningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sfDir = "/root/testdata/sf0.001"

  private def requiredCols(name: String): Set[String] = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = SparkEntry.queries(name)(spark, sfDir)
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s.requiredSchema.fieldNames.toSet
      }.flatten.toSet
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private val eventsCols = Set("event_id", "user_id", "value")

  test("the events-based late-wave queries scan only (event_id, user_id, value)") {
    Seq("q_skewmovagg_rewrite", "q_skewframeagg_rewrite",
      "q_nthmov_rewrite", "q_skewshiftnn_rewrite",
      "q_skewrangemov_rewrite", "q_skewleadnn_rewrite",
      "q_skewnth_rewrite", "q_rangemov_desc").foreach { q =>
      val cols = requiredCols(q)
      assert(cols == eventsCols, s"$q reads $cols")
    }
  }

  test("q_pctexact_wide scans only o_totalprice") {
    assert(requiredCols("q_pctexact_wide") == Set("o_totalprice"))
  }
}
