package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Sinks
import graft.ext.MultimodalOps
import graft.streaming.EventsStream

class SinksStreamingSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("K2 text sink writes header + body under sanitized names") {
    val dir = Files.createTempDirectory("graft-text").toString
    val df = Seq(("https://s.test/a/b", "hello world")).toDF("url", "text")
    Sinks.writeTextFiles(df, "https://s.test/", dir)
    val f = Paths.get(dir, "https___s.test_https___s.test_a_b.txt")
    assert(Files.exists(f))
    val content = new String(Files.readAllBytes(f), "UTF-8")
    assert(content ==
      "root_site: https://s.test/\nweb_url: https://s.test/a/b\nhello world")
  }

  test("K3 binary sink writes bytes verbatim") {
    val dir = Files.createTempDirectory("graft-bin").toString
    val bytes = Array[Byte](1, 2, 3, -1)
    val df = Seq(("https://s.test/doc", bytes)).toDF("url", "content")
    Sinks.writeBinaryFiles(df, "https://s.test/", dir)
    val f = Paths.get(dir, "https___s.test_https___s.test_doc.pdf")
    assert(Files.readAllBytes(f).toSeq == bytes.toSeq)
  }

  test("multimodal stub extraction preserves rows and is deterministic") {
    val media = Seq(
      MultimodalOps.MediaRow(1L, "image", "abc".getBytes),
      MultimodalOps.MediaRow(2L, "audio", Array[Byte]())).toDS()
    val got = MultimodalOps.extractFeatures(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    assert(got(1L).n_bytes == 3 && got(1L).checksum == 'a' + 'b' + 'c')
    assert(got(2L).n_bytes == 0 && got(2L).width == 1)
  }

  test("streaming windowed counts match the batch equivalent") {
    val dir = Files.createTempDirectory("graft-stream").toString
    val events = Seq(
      (1L, java.sql.Timestamp.valueOf("2024-01-01 00:01:00"), 1L, "click", 1.0, "{}"),
      (2L, java.sql.Timestamp.valueOf("2024-01-01 00:02:00"), 2L, "click", 2.0, "{}"),
      (3L, java.sql.Timestamp.valueOf("2024-01-01 00:07:30"), 3L, "view", 3.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite").parquet(dir)
    val q = EventsStream.start(spark, dir, "stream_out")
    q.processAllAvailable(); q.stop()
    val got = spark.table("stream_out")
      .selectExpr("event_type", "n", "total_value")
      .as[(String, Long, Double)].collect().toSet
    assert(got == Set(("click", 2L, 3.0), ("view", 1L, 3.0)))
  }

  test("K3 binary sink round-trips through the binaryFile source") {
    val dir = Files.createTempDirectory("graft-binsrc").toString
    val df = Seq(("https://s.test/doc.pdf", Array[Byte](1, 2, 3, 4)))
      .toDF("url", "content")
    Sinks.writeBinaryFiles(df, "https://s.test/", dir)
    // the raw-document-store read path (SURVEY §1.1): binary corpus as a
    // DataFrame of (path, content) — no custom reader needed
    val back = spark.read.format("binaryFile").load(dir)
      .selectExpr("path", "content")
      .as[(String, Array[Byte])].collect()
    assert(back.length == 1)
    assert(back.head._1.endsWith("https___s.test_https___s.test_doc.pdf.pdf"))
    assert(back.head._2.toSeq == Seq[Byte](1, 2, 3, 4))
  }

  test("foreachBatch incremental append lands every micro-batch in the sink") {
    val srcDir = Files.createTempDirectory("graft-fb-src").toString
    val outDir = Files.createTempDirectory("graft-fb-out").toString + "/sink"
    val mkEvents = (rows: Seq[(Long, String, Long, String, Double, String)]) =>
      rows.toDF("event_id", "tss", "user_id", "event_type", "value", "props")
        .selectExpr("event_id", "CAST(tss AS TIMESTAMP) AS ts", "user_id",
          "event_type", "value", "props")
    mkEvents(Seq((1L, "2024-01-01 00:01:00", 1L, "click", 1.0, "{}")))
      .write.mode("append").parquet(srcDir)
    val q = EventsStream.startIncrementalAppend(spark, srcDir, outDir)
    try {
      q.processAllAvailable()
      // second micro-batch: a new file appears in the source
      mkEvents(Seq((2L, "2024-01-01 00:02:00", 2L, "click", 2.0, "{}")))
        .write.mode("append").parquet(srcDir)
      q.processAllAvailable()
    } finally q.stop()
    val sunk = spark.read.parquet(outDir)
    // update mode re-emits the click window in each batch that changes it
    // (n=1 then n=2), each append stamped with its own batch id — exact
    // ids aren't stable (watermark advances insert no-data batches)
    val byBatch = sunk.selectExpr("batch_id", "n")
      .as[(Long, Long)].collect().toSet
    assert(byBatch.map(_._2) == Set(1L, 2L))
    assert(byBatch.map(_._1).size == 2)
  }
}
