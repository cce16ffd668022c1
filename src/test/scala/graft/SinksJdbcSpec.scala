package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.Sinks

/** K1 live round-trip: [[Sinks.jdbcAppend]] against EMBEDDED Derby (on
  * Spark's default classpath) — the first execution of the JDBC sink
  * against a real database engine rather than the parquet stand-in.
  * Mirrors the reference's `raw.indexing` append flow
  * (`web_spider_oo.py:343-350`, `spider_indexing_dataclass.py:24-34`):
  * append-mode table auto-creation on first write, multi-row batching,
  * and one append per crawl depth.
  */
class SinksJdbcSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val dbDir = Files.createTempDirectory("graft-derby").toString
  private val url = s"jdbc:derby:$dbDir/graftdb;create=true"

  private def driverProps: Map[String, String] = {
    // Derby 10.16 moved the embedded driver; resolve whichever class this
    // classpath carries so the spec doesn't pin a minor-version layout
    val candidates = Seq("org.apache.derby.jdbc.EmbeddedDriver",
      "org.apache.derby.iapi.jdbc.AutoloadedDriver")
    val cls = candidates.find { c =>
      try { Class.forName(c); true } catch { case _: Throwable => false }
    }
    cls.map(c => Map("driver" -> c)).getOrElse(Map.empty)
  }

  test("K1 jdbcAppend creates the table and appends two crawl depths") {
    val depth1 = Seq((1, "root", "a"), (1, "root", "b"))
      .toDF("pen_depth", "parent_link", "child_link")
    val depth2 = Seq((2, "a", "c"), (2, "b", "d"), (2, "b", "e"))
      .toDF("pen_depth", "parent_link", "child_link")

    // first append auto-creates the table (if_exists="append" semantics);
    // batchsize exercises the multi-row INSERT path
    Sinks.jdbcAppend(depth1, url, "indexing", driverProps, batchSize = 2)
    Sinks.jdbcAppend(depth2, url, "indexing", driverProps, batchSize = 2)

    val reader = driverProps.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", "indexing")) {
      case (r, (k, v)) => r.option(k, v)
    }
    val back = reader.load()
      .select($"pen_depth".cast("int"), $"parent_link", $"child_link")
      .as[(Int, String, String)].collect().toSeq.sorted

    assert(back == Seq((1, "root", "a"), (1, "root", "b"),
      (2, "a", "c"), (2, "b", "d"), (2, "b", "e")))
  }

  test("K1 jdbcAppend into an existing table keeps prior rows (append, not overwrite)") {
    val first = Seq((1, "r", "x")).toDF("pen_depth", "parent_link", "child_link")
    val second = Seq((2, "x", "y")).toDF("pen_depth", "parent_link", "child_link")
    Sinks.jdbcAppend(first, url, "indexing2", driverProps)
    Sinks.jdbcAppend(second, url, "indexing2", driverProps)
    val reader = driverProps.foldLeft(
      spark.read.format("jdbc").option("url", url).option("dbtable", "indexing2")) {
      case (r, (k, v)) => r.option(k, v)
    }
    assert(reader.load().count() == 2)
  }

  test("K1 production shape: streaming foreachBatch appends each micro-batch to Derby") {
    val in = Files.createTempDirectory("graft_jdbc_stream_in").toString
    def mkBatch(rows: Seq[(Int, String, String)]): Unit =
      rows.toDF("pen_depth", "parent_link", "child_link")
        .coalesce(1).write.mode("append").parquet(in)
    mkBatch(Seq((1, "root", "a"), (1, "root", "b")))

    val q = spark.readStream
      .schema("pen_depth INT, parent_link STRING, child_link STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(in)
      .writeStream.outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], _: Long) =>
        Sinks.jdbcAppend(batch, url, "indexing_stream", driverProps, batchSize = 2)
      }
      .start()
    q.processAllAvailable()
    mkBatch(Seq((2, "a", "c"), (2, "b", "d")))
    q.processAllAvailable()
    q.stop()

    val reader = driverProps.foldLeft(
      spark.read.format("jdbc").option("url", url)
        .option("dbtable", "indexing_stream")) {
      case (r, (k, v)) => r.option(k, v)
    }
    val back = reader.load()
      .select($"pen_depth".cast("int"), $"parent_link", $"child_link")
      .as[(Int, String, String)].collect().toSeq.sorted
    assert(back == Seq((1, "root", "a"), (1, "root", "b"),
      (2, "a", "c"), (2, "b", "d")))
  }
}
