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

  private def formulaSums(id: Long, xs: Range, ys: Range): (Long, Long, Long) = {
    var (r, g, b) = (0L, 0L, 0L)
    for (y <- ys; x <- xs) {
      r += MultimodalOps.pixelR(id, x, y)
      g += MultimodalOps.pixelG(id, x, y)
      b += MultimodalOps.pixelB(id, x, y)
    }
    (r, g, b)
  }

  test("image decode reads real PNG pixels (encode->decode formula round trip)") {
    val media = MultimodalOps.imagesFromDocuments(spark, Seq(7L, 12L).toDF("doc_id"))
    val got = MultimodalOps.decodeImages(spark, media).collect()
      .map(f => f.doc_id -> f).toMap
    // doc 7: w = 7%5+1 = 3, h = 7%4+1 = 4; PNG is lossless so the decoded
    // sums must equal the generating formula exactly
    assert(got(7L).width == 3 && got(7L).height == 4 && got(7L).n_pixels == 12)
    assert((got(7L).sum_r, got(7L).sum_g, got(7L).sum_b) ==
      formulaSums(7L, 0 until 3, 0 until 4))
    assert(got(12L).width == 3 && got(12L).height == 1)
    assert((got(12L).sum_r, got(12L).sum_g, got(12L).sum_b) ==
      formulaSums(12L, 0 until 3, 0 until 1))
  }

  test("frame sampling slices every 2nd frame out of the decoded strip") {
    // doc 4: nFrames = 4%3+2 = 3 -> kept frames 0 and 2
    val media = MultimodalOps.stripsFromDocuments(spark, Seq(4L).toDF("doc_id"))
    val got = MultimodalOps.sampleFrames(spark, media).collect()
      .sortBy(_.frame_idx)
    assert(got.map(_.frame_idx).toSeq == Seq(0, 2))
    assert((got(1).sum_r, got(1).sum_g, got(1).sum_b) ==
      formulaSums(4L, 0 until 4, 6 until 9))
  }

  test("nearest-neighbor resize samples src(x*inW/outW, y*inH/outH)") {
    // doc 9: w = 9%5+1 = 5, h = 9%4+1 = 2; resize to 2x2 picks
    // x in {0*5/2, 1*5/2} = {0, 2}, y in {0*2/2, 1*2/2} = {0, 1}
    val media = MultimodalOps.imagesFromDocuments(spark, Seq(9L).toDF("doc_id"))
    val got = MultimodalOps.resizeImages(spark, media, 2, 2).collect().head
    val picks = for (y <- Seq(0, 1); x <- Seq(0, 2)) yield (x, y)
    val exp = picks.map { case (x, y) =>
      (MultimodalOps.pixelR(9L, x, y).toLong,
        MultimodalOps.pixelG(9L, x, y).toLong,
        MultimodalOps.pixelB(9L, x, y).toLong)
    }.reduce((a, b) => (a._1 + b._1, a._2 + b._2, a._3 + b._3))
    assert((got.sum_r, got.sum_g, got.sum_b) == exp)
    assert(got.out_w == 2 && got.out_h == 2)
  }

  test("audio decode parses real WAV PCM (encode->decode formula round trip)") {
    val media = MultimodalOps.wavsFromDocuments(spark, Seq(3L).toDF("doc_id"))
    val got = MultimodalOps.decodeAudio(spark, media).collect().head
    // doc 3: n = 3%50+20 = 23 samples; PCM lossless -> exact formula sums
    val samples = (0 until 23).map(MultimodalOps.audioSample(3L, _))
    assert(got.sample_rate == 8000 && got.n_samples == 23)
    assert(got.sum_amp == samples.map(_.toLong).sum)
    assert(got.sum_abs == samples.map(v => math.abs(v).toLong).sum)
  }

  test("perceptualHash/audioFingerprint enforce the 64-bit bitmap contract") {
    val img = MultimodalOps.imagesFromDocuments(spark, Seq(7L).toDF("doc_id"))
    intercept[IllegalArgumentException] {
      MultimodalOps.perceptualHash(spark, img, grid = 9) // 81 cells > 64 bits
    }
    val wav = MultimodalOps.wavsFromDocuments(spark, Seq(3L).toDF("doc_id"))
    intercept[IllegalArgumentException] {
      MultimodalOps.audioFingerprint(spark, wav, bands = 65)
    }
    // boundary values stay legal
    assert(MultimodalOps.perceptualHash(spark, img, grid = 8).count() == 1)
    assert(MultimodalOps.audioFingerprint(spark, wav, bands = 64).count() == 1)
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
