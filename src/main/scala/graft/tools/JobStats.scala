package graft.tools

import java.util.concurrent.atomic.AtomicLong

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession

import graft.core.Tables

/** Runtime-overhead dump: `runMain graft.tools.JobStats <sfDir> <query>...`
  * executes each named SparkEntry query to completion and prints the
  * number of Spark jobs, stages, and tasks it scheduled. Static plan
  * counts ([[PlanStats]]) can't see a driver-side loop — an iterative
  * solver is J jobs × S stages × T tasks of pure scheduling overhead on
  * model-sized state, and THAT (not data volume) dominates the
  * fixed-cost iterative queries' wall-clock. Counts are deterministic
  * for a fixed (query, sf, cpus), so they A/B cleanly on a noisy box
  * where wall-clock won't.
  */
object JobStats {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val names = if (args.length > 1) args.drop(1).toSeq
                else graft.SparkEntry.queries.keys.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // flip to compare scheduling overhead with size-first AQE coalescing
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
        sys.env.getOrElse("GRAFT_PARALLELISM_FIRST", "true"))
      // default matches the Bench session (AQE size-coalescing of
      // cached builds); flip via env to quantify what the setting saves
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("GRAFT_CACHE_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val jobs = new AtomicLong; val stages = new AtomicLong
    val tasks = new AtomicLong
    // shuffle volume (r14, VERDICT r13 task 2): records read + written
    // across all tasks — the count that moves when an operator changes
    // its exchange shape, deterministic like the scheduling counts
    val shufR = new AtomicLong; val shufW = new AtomicLong
    val verbose = sys.env.contains("GRAFT_JOBSTATS_VERBOSE")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (verbose) {
          val ms = (for (a <- s.stageInfo.submissionTime;
                         b <- s.stageInfo.completionTime) yield b - a)
            .getOrElse(-1L)
          println(s"  STAGE ${s.stageInfo.stageId} " +
            s"tasks=${s.stageInfo.numTasks} ms=$ms " +
            s"${s.stageInfo.name.take(70)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          shufR.addAndGet(m.shuffleReadMetrics.recordsRead)
          shufW.addAndGet(m.shuffleWriteMetrics.recordsWritten)
        }
      }
    })
    // warm up BEFORE the first reset (as Bench does): one-time lazy setup
    // (parquet footer reads, schema inference from Tables.load, codegen
    // class-load) schedules real jobs, and without this they are attributed
    // to whichever query first triggers them, skewing its counts relative
    // to later queries. Two halves (ADVICE r11):
    //  1. load EVERY fixture table on this sfDir — footer/schema jobs for
    //     tables only LATER queries touch no longer land in their counts;
    //  2. a throwaway run of the first measured query warms the codegen /
    //     execution framework class-load. This assumes the query is
    //     IDEMPOTENT under double execution — true for every registered
    //     query today (the stateful DSv2/JDBC builders start with
    //     DROP/CREATE); a non-idempotent query must not be measured first.
    Tables.names.foreach { t =>
      try Tables.load(spark, sfDir, t).count()
      catch { case _: Throwable => () }
    }
    names.headOption.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, sfDir).count()
      catch { case _: Throwable => () } // a failing query still fails measured below
      spark.catalog.clearCache()
      org.apache.spark.sql.GraftSqlBridge.waitForListenerBus(spark)
    }
    names.foreach { n =>
      try {
        jobs.set(0); stages.set(0); tasks.set(0)
        shufR.set(0); shufW.set(0)
        if (verbose) println(s"  BEGIN $n")
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        // listener events are delivered asynchronously — drain the bus
        // so the printed counts belong to THIS query
        org.apache.spark.sql.GraftSqlBridge.waitForListenerBus(spark)
        val dt = (System.nanoTime() - t0) / 1e9
        println(f"JOBSTATS $n jobs=${jobs.get} stages=${stages.get} " +
          f"tasks=${tasks.get} shufR=${shufR.get} shufW=${shufW.get} " +
          f"wall=$dt%.2f")
        spark.catalog.clearCache()
      } catch { case t: Throwable => println(s"JOBSTATS $n FAIL: $t") }
    }
    spark.stop()
  }
}
