package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Cost-based optimization evidence: `ANALYZE TABLE` statistics reach
  * the optimizer and change plans. At 100 TB the broadcast decision is
  * THE plan decision — a wrong shuffle join on a dimension table costs
  * a full fact-table shuffle — and files-on-disk size alone misjudges
  * selective-filter subtrees; CBO's row counts are how Spark sees
  * through them. */
class CboStatsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def withConf[T](kv: (String, String)*)(body: => T): T = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  private def mkTable(name: String, n: Long): Unit = {
    val loc = Files.createTempDirectory(s"graft_cbo_$name").toString
    spark.sql(s"DROP TABLE IF EXISTS $name")
    spark.range(n).select($"id".as("k"), ($"id" % 1000).as("grp"))
      .write.option("path", loc).saveAsTable(name)
  }

  test("ANALYZE TABLE row and column stats are visible to the optimizer") {
    mkTable("cbo_dim", 500)
    spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS")
    spark.sql("ANALYZE TABLE cbo_dim COMPUTE STATISTICS FOR COLUMNS k, grp")
    // rowCount-bearing stats flow through the plan only on the CBO visitor
    withConf("spark.sql.cbo.enabled" -> "true") {
      val stats = spark.table("cbo_dim").queryExecution.optimizedPlan.stats
      assert(stats.rowCount.contains(BigInt(500)), s"stats: $stats")
      // NDV is HyperLogLog-estimated — assert the ±5% band, not equality
      val kStats = stats.attributeStats.find(_._1.name == "k").map(_._2)
      val ndv = kStats.flatMap(_.distinctCount).getOrElse(BigInt(0))
      assert(ndv >= 475 && ndv <= 525, s"expected NDV ~500 for k, got $kStats")
      assert(kStats.exists(_.nullCount.contains(BigInt(0))))
      assert(kStats.exists(s => s.min.contains(0L) && s.max.contains(499L)))
    }
  }

  test("CBO row counts drive the broadcast decision through a filter") {
    mkTable("cbo_fact", 200000)
    mkTable("cbo_small", 150000)
    Seq("cbo_fact", "cbo_small").foreach { t =>
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS")
      spark.sql(s"ANALYZE TABLE $t COMPUTE STATISTICS FOR COLUMNS k, grp")
    }
    // threshold sits between the FILTERED dim's CBO estimate (~1/1000 of
    // 150k rows, a few KB) and the full table's on-disk size (~1 MB) —
    // only selectivity-aware stats can justify the broadcast
    def planOf(cbo: Boolean): String = withConf(
      "spark.sql.cbo.enabled" -> cbo.toString,
      "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024).toString,
      "spark.sql.adaptive.enabled" -> "false") {
      val dim = spark.table("cbo_small").where($"grp" === 3)
      spark.table("cbo_fact").join(dim, "k")
        .queryExecution.executedPlan.toString
    }
    assert(planOf(cbo = true).contains("BroadcastHashJoin"),
      "expected stats-estimated broadcast of the filtered dim")
    // without CBO the filter keeps the child's full size estimate -> SMJ;
    // this pins that the broadcast above really came from the stats
    assert(!planOf(cbo = false).contains("BroadcastHashJoin"),
      "expected sort-merge join when selectivity stats are ignored")
  }

}
