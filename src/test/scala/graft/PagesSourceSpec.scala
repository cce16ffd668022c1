package graft

import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

import graft.sources.PagesSourceMetrics
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

  test("reported statistics track the pushed range (SupportsReportStatistics)") {
    // stats come from the SCAN after pushdown, so the optimizer sees the
    // clamped range — the closed-form DSv2 analogue of ANALYZE TABLE
    val full = pages(100000, 4)
    val clamped = pages(100000, 4).where($"page_id" < 1000)
    val fullStats = full.queryExecution.optimizedPlan.stats
    val clampedStats = clamped.queryExecution.optimizedPlan.stats
    assert(fullStats.rowCount.contains(BigInt(100000)), s"got $fullStats")
    assert(clampedStats.rowCount.contains(BigInt(1000)), s"got $clampedStats")
    assert(clampedStats.sizeInBytes * 50 < fullStats.sizeInBytes,
      s"pushed filter must shrink reported bytes: $clampedStats vs $fullStats")
    // string widths are sampled from the generator, not the 20-byte
    // defaultSize: the html payload alone is ~65+ bytes per row
    assert(clampedStats.sizeInBytes >= BigInt(1000L * 80),
      s"row width must reflect the real payload: $clampedStats")
  }

  test("column pruning reaches the scan (html never built for a 1-col read)") {
    val df = pages(100, 2).select("page_id")
    assert(df.as[Long].collect().sorted.toSeq == (0L until 100L))
    val cols = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.readSchema().fieldNames.toSeq
    }
    assert(cols.contains(Seq("page_id")), s"expected pruned schema, got $cols")
  }

  test("count/min/max push COMPLETELY into the scan (one closed-form row)") {
    val df = pages(100000, 8).where($"page_id" >= 500 && $"page_id" < 90000)
      .agg(count(lit(1)).as("n"), min("page_id").as("mn"),
        max("page_id").as("mx"))
    val (n, mn, mx) = df.as[(Long, Long, Long)].head()
    assert((n, mn, mx) == (89500L, 500L, 89999L))
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }
    assert(scan.exists(_.contains("PagesAggScan")),
      s"aggregation was not pushed into the scan: $scan")
    // complete pushdown: a single closed-form row feeds the plan — the
    // scan partition count collapses to 1 regardless of `parts`
    val parts = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.inputRDD.getNumPartitions
    }
    assert(parts.contains(1), s"expected single closed-form partition: $parts")
  }

  test("runtime filtering: a broadcast dim's key set reaches the scan (rows never generated)") {
    import graft.sources.PagesSourceMetrics
    val confs = Seq(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      // tiny fixture: bypass the stats-based benefit estimate
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "100.0")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      // the dim needs a selective predicate — that is what marks the
      // build side as a pruning-filter source for the DPP rule
      val dim = spark.range(10).select(($"id" * 1000).as("k"))
        .where($"k" < 5000)
      val fact = pages(100000, 8)
      val j = fact.join(broadcast(dim), $"page_id" === $"k")
        .select("page_id", "url")
      PagesSourceMetrics.rowsProduced.set(0)
      assert(j.collect().map(_.getLong(0)).sorted.toSeq ==
        Seq(0L, 1000L, 2000L, 3000L, 4000L))
      val produced = PagesSourceMetrics.rowsProduced.get()
      // without SupportsRuntimeFiltering the scan generates all 100k
      // rows; with it, only the dim's 5 keys are ever produced
      assert(produced <= 5L,
        s"runtime filter did not reach the scan: produced $produced rows")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("LIMIT pushes into the scan: the range clamps, rows beyond never generate") {
    PagesSourceMetrics.rowsProduced.set(0)
    val df = pages(100000, 4).limit(5)
    assert(df.collect().map(_.getLong(0)).toSet == (0L until 5L).toSet)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(scan.contains("hi=5") && scan.contains("limitPushed=true"),
      s"limit did not push: $scan")
    assert(PagesSourceMetrics.rowsProduced.get() <= 5L,
      s"scan generated ${PagesSourceMetrics.rowsProduced.get()} rows for LIMIT 5")
  }

  test("ORDER BY page_id LIMIT n pushes as top-N: sort and limit leave the plan") {
    PagesSourceMetrics.rowsProduced.set(0)
    val df = pages(100000, 4).orderBy("page_id").limit(7)
      .select("page_id")
    assert(df.collect().map(_.getLong(0)).toSeq == (0L until 7L))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("TakeOrderedAndProject") && !plan.contains("Sort"),
      s"top-N not fully pushed:\n$plan")
    assert(PagesSourceMetrics.rowsProduced.get() <= 7L,
      s"scan generated ${PagesSourceMetrics.rowsProduced.get()} rows for top-7")
  }

  test("DESC / non-id top-N is declined: Spark keeps the sort, result stays right") {
    val df = pages(1000, 4).orderBy($"page_id".desc).limit(3)
      .select("page_id")
    assert(df.collect().map(_.getLong(0)).toSeq == Seq(999L, 998L, 997L))
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(!scan.contains("limitPushed=true"),
      s"a DESC top-N must not clamp the ASC prefix: $scan")
  }

  test("LIMIT composes with pushed filters: clamp applies after the range") {
    val df = pages(100000, 4).where($"page_id" >= 500).limit(4)
    assert(df.collect().map(_.getLong(0)).toSet == (500L until 504L).toSet)
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(scan.contains("lo=500") && scan.contains("hi=504"), scan)
  }

  test("OFFSET pushes with LIMIT: the pagination window clamps the range") {
    PagesSourceMetrics.rowsProduced.set(0)
    val df = pages(100000, 4).orderBy("page_id")
      .offset(20).limit(10).select("page_id")
    assert(df.collect().map(_.getLong(0)).toSeq == (20L until 30L))
    val scan = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.scan.description()
    }.getOrElse("")
    assert(scan.contains("lo=20") && scan.contains("hi=30"),
      s"offset+limit window did not clamp: $scan")
    assert(PagesSourceMetrics.rowsProduced.get() <= 10L,
      s"scan generated ${PagesSourceMetrics.rowsProduced.get()} rows for a 10-row page")
  }

  test("reported ordering elides per-partition sorts (SupportsReportOrdering)") {
    val df = pages(10000, 4).sortWithinPartitions("page_id")
      .select("page_id")
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Sort"),
      s"scan reports page_id ASC — the sort should be elided:\n$plan")
    // and the data really is ordered within each partition
    val ok = df.rdd.mapPartitions { it =>
      val ids = it.map(_.getLong(0)).toSeq
      Iterator.single(ids == ids.sorted)
    }.collect()
    assert(ok.forall(identity))
  }

  test("batch reads are columnar: vectors feed codegen through ColumnarToRow") {
    val df = pages(5000, 4).where($"page_id" < 2000)
      .select("page_id", "url")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("ColumnarToRow"),
      s"batch scan should be vectorized:\n$plan")
    // values identical to the row-based contract, strings included
    val got = df.collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.length == 2000)
    assert(got.toMap.apply(7L) == "https://site.example/p/7")
    // and the whole required row set was generated exactly once
    // (collect, not count — count() rides the closed-form aggregate
    // pushdown and generates NO rows at all)
    PagesSourceMetrics.rowsProduced.set(0)
    assert(pages(5000, 4).where($"page_id" < 100)
      .select("page_id").collect().length == 100)
    assert(PagesSourceMetrics.rowsProduced.get() == 100)
  }

  test("the scan reports a pagesGenerated SQL metric (post-pushdown count)") {
    val df = pages(100000, 4).where($"page_id" < 1234).select("page_id")
    assert(df.collect().length == 1234)
    val metric = df.queryExecution.executedPlan.collectFirst {
      case b: BatchScanExec => b.metrics.get("pagesGenerated")
    }.flatten
    assert(metric.isDefined, "pagesGenerated custom metric missing")
    assert(metric.get.value == 1234L,
      s"metric should equal the clamped row count, got ${metric.get.value}")
  }

  test("micro-batch streaming read delivers all pages across multiple batches") {
    val q = spark.readStream.format("graft-pages")
      .option("rows", "300").option("parts", "2").option("batchRows", "100")
      .load()
      .writeStream.format("memory").queryName("graft_pages_stream")
      .outputMode("append")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    try {
      // AvailableNow + SupportsTriggerAvailableNow: runs batch-by-batch
      // to reportLatestOffset, then stops itself
      q.awaitTermination(120000)
      assert(!q.isActive)
      val got = spark.sql("SELECT page_id FROM graft_pages_stream")
        .as[Long].collect()
      assert(got.length == 300 && got.toSet == (0L until 300L).toSet)
      // admission control capped each batch at 100 -> >= 3 non-empty
      val nonEmpty = q.recentProgress.count(_.numInputRows > 0)
      assert(nonEmpty >= 3, s"expected >=3 batches, got $nonEmpty")
    } finally q.stop()
  }

  test("memsink write publishes all task buffers atomically at job commit") {
    import graft.sources.MemSinkStore
    MemSinkStore.clear("spec1")
    pages(200, 4).select($"page_id", $"url")
      .write.format("graft-memsink").option("key", "spec1")
      .mode("overwrite").save()
    val rows = MemSinkStore.get("spec1").getOrElse(Seq.empty)
    assert(rows.length == 200)
    assert(rows.map(_.head.asInstanceOf[Long]).toSet == (0L until 200L).toSet)
    assert(rows.forall(r =>
      r(1) == s"https://site.example/p/${r.head}"))
    MemSinkStore.clear("spec1")
  }

  test("memsink append mode accumulates across jobs; overwrite truncates") {
    import graft.sources.MemSinkStore
    MemSinkStore.clear("spec2")
    def write(loHi: (Long, Long), mode: String): Unit =
      spark.range(loHi._1, loHi._2).select($"id")
        .write.format("graft-memsink").option("key", "spec2")
        .mode(mode).save()
    write((0L, 50L), "append")
    write((50L, 80L), "append")
    assert(MemSinkStore.get("spec2").get.map(_.head).toSet ==
      (0L until 80L).toSet)
    write((100L, 110L), "overwrite")
    assert(MemSinkStore.get("spec2").get.map(_.head).toSet ==
      (100L until 110L).toSet)
    MemSinkStore.clear("spec2")
  }

  test("memsink rejects nested column types loudly") {
    val err = intercept[Exception] {
      spark.range(5).select(array($"id").as("a"))
        .write.format("graft-memsink").option("key", "spec3")
        .mode("overwrite").save()
    }
    assert(err.getMessage.contains("atomic column types only"),
      s"unexpected error: ${err.getMessage}")
  }
}
