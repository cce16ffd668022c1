package graft

import java.nio.file.Files

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.{Sinks, Tables}

class PartitionedSinkSpec extends AnyFunSuite with AdaptiveSparkPlanHelper {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("partitioned write enables partition pruning on read") {
    val dir = Files.createTempDirectory("graft-part").toString
    val orders = Tables.load(spark, "/root/testdata/sf0.001", "orders")
      .withColumn("order_year", year(col("o_orderdate")))
    Sinks.writePartitioned(orders, "order_year", dir)
    // directory layout: one dir per year
    val partDirs = new java.io.File(dir).listFiles()
      .filter(_.getName.startsWith("order_year=")).map(_.getName).sorted
    assert(partDirs.length > 1 && partDirs.head.startsWith("order_year="))
    // a filter on the partition column must reach PartitionFilters and
    // scan only the matching partition's files
    val q = spark.read.parquet(dir).where(col("order_year") === 1997)
    q.count()
    val scans = collectWithSubqueries(q.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    assert(scan.partitionFilters.nonEmpty,
      s"expected partition filters, got: ${scan.metadata}")
    val expected = orders.where(col("order_year") === 1997).count()
    assert(q.count() == expected && expected > 0)
  }

  test("per-depth append accumulates edges across incremental writes") {
    val dir = Files.createTempDirectory("graft-edges").toString + "/edges"
    val d0 = Seq((0, "r", "a"), (0, "r", "b"))
      .toDF("pen_depth", "parent_link", "child_link")
    val d1 = Seq((1, "a", "c")).toDF("pen_depth", "parent_link", "child_link")
    Sinks.appendEdges(d0, dir)
    Sinks.appendEdges(d1, dir) // incremental append, reference K1 shape
    val got = spark.read.parquet(dir)
      .select("pen_depth", "parent_link", "child_link")
      .as[(Int, String, String)].collect().toSet
    assert(got == Set((0, "r", "a"), (0, "r", "b"), (1, "a", "c")))
  }

  test("compactParquet merges small files and preserves the data exactly") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    spark.range(20000).select(col("id"), (col("id") * 3).as("v"))
      .repartition(24) // simulate incremental-append fragmentation
      .write.parquet(dir)
    def parquetFiles = new java.io.File(dir).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(parquetFiles == 24)
    val before = spark.read.parquet(dir).as[(Long, Long)].collect().toSet
    val n = Sinks.compactParquet(spark, dir, targetFileBytes = 1L << 20)
    assert(n < 24 && parquetFiles == n)
    val after = spark.read.parquet(dir).as[(Long, Long)].collect().toSet
    assert(after == before)
  }

  test("compactParquet preserves a partitioned layout (per-leaf rewrite)") {
    val dir = Files.createTempDirectory("graft-compact-part").toString + "/t"
    spark.range(6000)
      .select((col("id") % 3).as("p"), col("id").as("v"))
      .repartition(10).write.partitionBy("p").parquet(dir)
    val before = spark.read.parquet(dir).select("p", "v")
      .as[(Long, Long)].collect().toSet
    Sinks.compactParquet(spark, dir, targetFileBytes = 1L << 20)
    // layout intact: still one dir per partition value, fewer files each
    val partDirs = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("p=")).sortBy(_.getName)
    assert(partDirs.map(_.getName).toSeq == Seq("p=0", "p=1", "p=2"))
    partDirs.foreach { d =>
      assert(d.listFiles().count(_.getName.endsWith(".parquet")) == 1)
    }
    val after = spark.read.parquet(dir).select("p", "v")
      .as[(Long, Long)].collect().toSet
    assert(after == before)
    // partition pruning still works on the compacted table
    assert(spark.read.parquet(dir).where(col("p") === 1).count() == 2000)
  }

  test("compactParquet heals a crash that left data only in the hidden backup") {
    val dir = Files.createTempDirectory("graft-compact-heal").toString + "/t"
    spark.range(1000).select(col("id").as("v")).repartition(4).write.parquet(dir)
    val before = spark.read.parquet(dir).as[Long].collect().toSet
    // simulate dying between the two swap renames: live dir gone, full
    // data stranded in the hidden backup sibling
    val f = new java.io.File(dir)
    val bak = new java.io.File(f.getParent, s".${f.getName}_backup_deadbeef")
    assert(f.renameTo(bak))
    Sinks.compactParquet(spark, f.getParent, targetFileBytes = 1L << 20)
    val after = spark.read.parquet(dir).as[Long].collect().toSet
    assert(after == before, "healed table must contain the stranded data")
    assert(!bak.exists, "backup dir should be restored away")
  }
}
