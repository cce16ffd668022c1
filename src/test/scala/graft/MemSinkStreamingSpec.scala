package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{MemSinkCommit, MemSinkStore, MemSinkStreamingWrite}

/** The DSv2 streaming-write contract (graft-memsink → `toStreaming`):
  * epoch commits are atomic AND idempotent — the properties a real
  * exactly-once sink (K1's JDBC append) must give a restarted stream.
  * The end-to-end path is oracle-checked as q_stream_sink_dsv2; these
  * pin the replay/abort semantics the oracle hash cannot see.
  */
class MemSinkStreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val schema = StructType(Seq(StructField("v", LongType)))
  private def msg(vs: Long*) = MemSinkCommit(vs.map(Seq(_)))

  test("replayed epoch commits as a no-op (exactly-once restart)") {
    val key = "spec_replay"
    MemSinkStore.clear(key)
    val w = new MemSinkStreamingWrite(key, schema, truncate = false)
    w.commit(0L, Array(msg(1L, 2L)))
    w.commit(1L, Array(msg(3L)))
    assert(MemSinkStore.lastEpoch(key) == 1L)
    assert(MemSinkStore.get(key).get.map(_.head) == Seq(1L, 2L, 3L))
    // Spark replays the last un-committed micro-batch after a restart;
    // a sink that double-applies it duplicates rows — ours must not
    w.commit(1L, Array(msg(3L)))
    assert(MemSinkStore.get(key).get.map(_.head) == Seq(1L, 2L, 3L),
      "replayed epoch was applied twice")
    // and a LATE replay of an older epoch is equally inert
    w.commit(0L, Array(msg(1L, 2L)))
    assert(MemSinkStore.get(key).get.map(_.head) == Seq(1L, 2L, 3L))
  }

  test("complete-mode epochs replace atomically (truncate per epoch)") {
    val key = "spec_truncate"
    MemSinkStore.clear(key)
    val w = new MemSinkStreamingWrite(key, schema, truncate = true)
    w.commit(0L, Array(msg(1L, 2L)))
    w.commit(1L, Array(msg(7L, 8L, 9L)))
    assert(MemSinkStore.get(key).get.map(_.head) == Seq(7L, 8L, 9L),
      "complete mode must replace, not accumulate")
  }

  test("abort publishes nothing") {
    val key = "spec_abort"
    MemSinkStore.clear(key)
    val w = new MemSinkStreamingWrite(key, schema, truncate = false)
    w.abort(0L, Array(msg(42L)))
    assert(MemSinkStore.get(key).isEmpty)
    assert(MemSinkStore.lastEpoch(key) == -1L)
  }

  test("end to end: streaming aggregation through the DSv2 sink matches batch") {
    val key = "spec_e2e"
    MemSinkStore.clear(key)
    val tmp = java.nio.file.Files.createTempDirectory("graft_memsink_e2e")
      .toString
    spark.range(100)
      .select(col("id"), timestamp_micros(col("id") * 1000000L).as("ts"))
      .write.mode("overwrite").parquet(tmp)
    val q = spark.readStream.schema("id LONG, ts TIMESTAMP").parquet(tmp)
      .groupBy((col("id") % 7L).as("k"))
      .agg(count(lit(1)).cast("long").as("n"))
      .writeStream.outputMode("complete")
      .format("graft-memsink").option("key", key)
      .option("checkpointLocation", java.nio.file.Files
        .createTempDirectory("graft_memsink_ck").toString)
      .start()
    q.processAllAvailable(); q.stop()
    assert(MemSinkStore.lastEpoch(key) >= 0L)
    val got = MemSinkStore.get(key).get
      .map(r => (r(0).asInstanceOf[Long], r(1).asInstanceOf[Long])).sorted
    val want = (0L until 100L).groupBy(_ % 7L).toSeq
      .map { case (k, vs) => (k, vs.size.toLong) }.sorted
    assert(got == want)
  }
}
