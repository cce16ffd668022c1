package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class PagesSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def pages(rows: Long, parts: Int) =
    spark.read.format("graft-pages")
      .option("rows", rows.toString).option("parts", parts.toString).load()

  test("generates the full deterministic table across the requested partitions") {
    val df = pages(1000, 8)
    assert(df.rdd.getNumPartitions == 8)
    assert(df.count() == 1000)
    assert(df.select(countDistinct("page_id")).as[Long].head() == 1000)
    val r = df.where($"page_id" === 7)
      .select("url", "html").as[(String, String)].head()
    assert(r._1 == "https://site.example/p/7")
    assert(r._2.contains("href=\"/p/15\"") && r._2.contains("href=\"/p/23\""))
  }

  test("page_id range predicates push into the scan (rows never generated)") {
    val df = pages(1000, 4).where($"page_id" >= 100 && $"page_id" < 250)
    assert(df.count() == 150)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan.exists(d => d.contains("lo=100") && d.contains("hi=250")),
      s"expected clamped range in scan description, got $scan")
  }

  test("column pruning reaches the scan (html never built for a 1-col read)") {
    val df = pages(100, 2).select("page_id")
    assert(df.as[Long].collect().sorted.toSeq == (0L until 100L))
    val cols = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(cols.contains(Seq("page_id")), s"expected pruned schema, got $cols")
  }
}
