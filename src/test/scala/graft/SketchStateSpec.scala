package graft

import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode,
  TimerValues, TTLConfig, ValueState}
import org.scalatest.funsuite.AnyFunSuite

/** Sketch accuracy + the Spark 4 arbitrary-state API.
  *
  *  - `q_hll_sketch` has no oracle (DataSketches HLL internals are
  *    engine-specific); this spec pins its estimates to within 5% of
  *    the exact distinct counts, and the union rollup to the exact
  *    global count — the contract that makes the rows-only query
  *    meaningful.
  *  - `transformWithState` (StatefulProcessor, Spark 4's replacement
  *    for mapGroupsWithState) runs a per-user running counter on the
  *    RocksDB state store — the API the engine would use for custom
  *    state machines (crawl frontier tracking, per-host politeness) in
  *    production streaming.
  */
class SketchStateSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTestSession.spark
  val sf = "/root/testdata/sf0.01"

  test("q_hll_sketch estimates within 5% of exact; union matches global") {
    val est = SparkEntry.queries("q_hll_sketch")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val exact = li.groupBy("l_returnflag")
      .agg(countDistinct("l_partkey").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exactAll = li.select(countDistinct("l_partkey")).first().getLong(0)
    for ((k, n) <- exact) {
      val e = est(k)
      assert(math.abs(e - n).toDouble / n < 0.05, s"$k: est $e vs exact $n")
    }
    assert(math.abs(est("ALL") - exactAll).toDouble / exactAll < 0.05,
      s"union est ${est("ALL")} vs exact $exactAll")
  }

  test("transformWithState: per-user counter on RocksDB equals batch groupBy") {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      import spark.implicits._
      val stageDir = graft.core.Tables.stageEventsDir(sf, "graft_tws_src")
      val src = spark.readStream
        .schema("event_id LONG, ts LONG, user_id LONG")
        .parquet(stageDir)
        .select(col("user_id")).as[Long]
      val q = src.groupByKey(identity)
        .transformWithState(new CountProcessor, TimeMode.None(),
          OutputMode.Update())
        .writeStream.outputMode("update")
        .format("memory").queryName("graft_tws_out").start()
      q.processAllAvailable(); q.stop()
      // update mode may emit a row per batch; the latest (max) count per
      // user is the final state
      val got = spark.table("graft_tws_out")
        .groupBy("_1").agg(max("_2").as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = spark.read.parquet(s"$sf/events.parquet")
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want,
        s"per-user counts differ, e.g. ${got.toSeq.sortBy(_._1).take(3)} vs ${want.toSeq.sortBy(_._1).take(3)}")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}

/** Running per-key event counter: ValueState accumulates across
  * micro-batches; each batch emits the updated total. */
class CountProcessor extends StatefulProcessor[Long, Long, (Long, Long)] {
  @transient private var cnt: ValueState[Long] = _
  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    cnt = getHandle.getValueState[Long]("cnt", Encoders.scalaLong,
      TTLConfig.NONE)
  override def handleInputRows(key: Long, rows: Iterator[Long],
      timerValues: TimerValues): Iterator[(Long, Long)] = {
    val n = (if (cnt.exists()) cnt.get() else 0L) + rows.size
    cnt.update(n)
    Iterator.single((key, n))
  }
}
