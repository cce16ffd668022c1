package graft

import java.nio.file.Files

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-behavior evidence at the physical-plan level: AQE skew-join
  * splitting, explicit join-strategy control via hints, zero-extra-job
  * pipeline metrics (`Dataset.observe`), and range-partitioned sorted
  * lake layout. These are the mechanisms the engine leans on at 100 TB
  * (beyond the manual salting in `operators/SkewOps`), so each is
  * asserted against the plan or the produced files, not just results.
  */
class ScalePlanSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Set SQL confs for one block, restoring previous values after. */
  private def withConf(kv: (String, String)*)(body: => Unit): Unit = {
    val prev = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
    kv.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime (skew=true in final plan)") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      // detect aggressively: our skewed partition is ~1 MB, the others ~KB
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1024",
      // force a shuffle join — broadcast would hide the skew entirely
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      // 95% of left rows share key 0 -> one huge shuffle partition
      val left = spark.range(100000)
        .select(when($"id" < 95000, 0L).otherwise($"id").as("k"), $"id".as("v"))
      val right = spark.range(100).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = left.join(right, "k")
      // only k=0 matches: ids >= 95000 keep keys outside right's 0..99
      assert(joined.collect().length == 95000)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"))
      assert(finalPlan.contains("skew=true"),
        s"expected runtime skew-join split in final plan:\n$finalPlan")
    }
  }

  test("AQE coalesces undersized shuffle partitions at runtime") {
    withConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
      "spark.sql.adaptive.coalescePartitions.parallelismFirst" -> "false",
      // a 3-group aggregate shuffled into 64 partitions is mostly empty:
      // the runtime plan must read far fewer, without changing results
      "spark.sql.shuffle.partitions" -> "64") {
      val df = spark.read
        .parquet("/root/testdata/sf0.001/lineitem.parquet")
        .groupBy("l_returnflag").agg(count(lit(1)).as("n"))
      assert(df.collect().length == 3)
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(finalPlan.contains("isFinalPlan=true"))
      assert(finalPlan.contains("coalesced"),
        s"expected AQEShuffleRead coalesced in final plan:\n$finalPlan")
    }
  }

  test("dynamic partition pruning: a selective dim filter prunes fact partitions at runtime") {
    val out = Files.createTempDirectory("graft_dpp").toString
    spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .withColumn("bucket", $"l_orderkey" % 10)
      .write.mode("overwrite").partitionBy("bucket").parquet(out)
    withConf(
      "spark.sql.optimizer.dynamicPartitionPruning.enabled" -> "true",
      // tiny test data: let DPP fire regardless of its stats heuristics
      "spark.sql.optimizer.dynamicPartitionPruning.useStats" -> "false",
      "spark.sql.optimizer.dynamicPartitionPruning.fallbackFilterRatio" -> "100.0") {
      val fact = spark.read.parquet(out)
      val dim = spark.range(10).select($"id".as("k"))
        .where($"k" === 3 || $"k" === 7)
      val j = fact.join(dim, fact("bucket") === dim("k"))
        .agg(count(lit(1)).as("n"))
      val n = j.as[Long].head()
      val want = spark.read.parquet(out)
        .where($"bucket" === 3 || $"bucket" === 7).count()
      assert(n == want)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.toLowerCase.contains("dynamicpruning"),
        s"expected a dynamic-pruning partition filter on the fact scan:\n$plan")
    }
  }

  test("runtime bloom filter: a selective shuffle join seeds might_contain on the big side") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // force the shuffle-join path (bloom filters don't apply to
      // broadcast joins, where the hash set itself prunes) and drop the
      // size thresholds so the tiny fixture qualifies
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB") {
      val li = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
      val big = spark.read.parquet("/root/testdata/sf0.01/orders.parquet")
        .where($"o_totalprice" > 450000)
      val j = li.join(big, $"l_orderkey" === $"o_orderkey")
        .agg(count(lit(1)).as("n"))
      assert(j.as[Long].head() > 0)
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("might_contain"),
        s"expected a runtime bloom filter on the lineitem side:\n$plan")
    }
  }

  test("join strategy is controllable per-join via hints (plan-asserted)") {
    val a = spark.range(1000).select($"id".as("k"), $"id".as("va"))
    val b = spark.range(100).select($"id".as("k"), $"id".as("vb"))
    withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      def planOf(df: org.apache.spark.sql.DataFrame): String =
        df.queryExecution.sparkPlan.toString
      assert(planOf(a.join(broadcast(b), "k")).contains("BroadcastHashJoin"))
      assert(planOf(a.join(b.hint("shuffle_hash"), "k"))
        .contains("ShuffledHashJoin"))
      assert(planOf(a.join(b.hint("merge"), "k")).contains("SortMergeJoin"))
    }
  }

  test("Dataset.observe collects pipeline metrics without an extra job") {
    val obs = Observation("ingest-stats")
    val df = spark.range(1000)
      .select($"id", ($"id" % 7).as("m"))
      .observe(obs, count(lit(1)).as("rows"),
        sum($"m").cast("long").as("m_total"),
        max($"id").as("max_id"))
    val n = df.filter($"m" =!= -1).count() // one action drives both
    assert(n == 1000)
    val row = obs.get
    assert(row("rows") == 1000L)
    assert(row("m_total") == (0L until 1000L).map(_ % 7).sum)
    assert(row("max_id") == 999L)
  }

  test("repartitionByRange + sortWithinPartitions yields disjoint per-file key ranges") {
    val out = Files.createTempDirectory("graft_range_layout").toString
    val df = spark.range(10000)
      .select(pmod(hash($"id"), lit(1000)).cast("long").as("k"), $"id".as("v"))
    df.repartitionByRange(4, $"k").sortWithinPartitions("k")
      .write.mode("overwrite").parquet(out)
    // every file covers a key range disjoint from every other file — the
    // layout that makes parquet row-group min/max pruning effective
    val ranges = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg(min("k").as("lo"), max("k").as("hi"))
      .as[(String, Long, Long)].collect().sortBy(_._2)
    assert(ranges.length > 1)
    // strictly less: equal boundary keys would mean the same key lives in
    // two files, defeating min/max pruning (RangePartitioner co-locates
    // equal keys, so strict inequality must hold)
    ranges.sliding(2).foreach {
      case Array((_, _, hi1), (_, lo2, _)) =>
        assert(hi1 < lo2, s"overlapping file ranges: $hi1 >= $lo2")
      case _ =>
    }
    // and the data round-trips completely
    assert(spark.read.parquet(out).count() == 10000)
  }

  test("nested schema pruning: reading struct.a never deserializes the wide sibling") {
    // the struct analogue of column pruning — at 100 TB a metadata
    // struct routinely carries a wide payload field; selecting one leaf
    // must prune the rest out of the parquet ReadSchema
    val out = Files.createTempDirectory("graft_nested_prune").toString
    spark.range(2000)
      .selectExpr("id", "named_struct('a', id % 7, 'b', id % 11, " +
        "'huge', repeat('x', 200)) AS s")
      .write.mode("overwrite").parquet(out)
    val q = spark.read.parquet(out).where($"s.a" === 3).select($"id", $"s.a")
    assert(q.count() == 286)
    val scan = q.queryExecution.executedPlan.toString
    val readSchema = scan.linesIterator.find(_.contains("ReadSchema"))
      .getOrElse(scan)
    assert(readSchema.contains("s:struct<a:bigint>"),
      s"expected nested pruning to a:bigint only, got: $readSchema")
    assert(!readSchema.contains("huge"),
      s"wide sibling leaked into the scan: $readSchema")
  }
}
