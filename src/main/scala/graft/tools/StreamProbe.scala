package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off wall-clock probe for the streaming fixed cost:
  * `runMain graft.tools.StreamProbe <sfDir> <query>...` runs each named
  * query twice (warm JVM) and prints per-phase timestamps from the
  * streaming progress events — batch count, per-batch durations, and
  * the residue (query-fn wall minus batch time) that is session/start/
  * stop machinery. Diagnostic only; not part of the driver contract.
  */
object StreamProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = if (args.length > 1) args.drop(1).toSeq else Seq("q_stream_left_outer")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val batches = new java.util.concurrent.ConcurrentLinkedQueue[(Long, String, Long)]()
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit = {
        val p = e.progress
        val dm = p.durationMs
        val detail = Seq("triggerExecution", "addBatch", "getBatch",
            "latestOffset", "queryPlanning", "walCommit", "commitOffsets")
          .flatMap(k => Option(dm.get(k)).map(v => s"$k=$v"))
          .mkString(",")
        batches.add((p.batchId, detail, p.numInputRows))
      }
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    })
    // warm up streaming machinery like Bench does
    locally {
      val tmp = java.nio.file.Files.createTempDirectory("graft_probe_warm").toString
      spark.range(4).selectExpr("id", "timestamp_micros(id * 1000000) AS ts")
        .write.mode("overwrite").parquet(tmp)
      val q = spark.readStream.schema("id LONG, ts TIMESTAMP").parquet(tmp)
        .withWatermark("ts", "1 second")
        .groupBy(org.apache.spark.sql.functions.window(
          org.apache.spark.sql.functions.col("ts"), "2 seconds"))
        .count()
        .writeStream.outputMode("append")
        .format("memory").queryName("graft_probe_warm").start()
      q.processAllAvailable(); q.stop()
    }
    names.foreach { n =>
      (1 to 2).foreach { run =>
        batches.clear()
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(n)(spark, sfDir).count()
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        val bs = batches.toArray(Array.empty[(Long, String, Long)])
        println(f"STREAMPROBE $n run=$run wall=$wall%.2f batches=${bs.length} " +
          bs.map { case (id, d, rows) => s"b$id[$rows rows: $d]" }.mkString(" "))
      }
    }
    spark.stop()
  }
}
