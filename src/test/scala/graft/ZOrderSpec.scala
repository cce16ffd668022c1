package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.ZOrder

class ZOrderSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Reference Morton interleave, bit-by-bit. */
  private def mortonRef(x: Long, y: Long, bits: Int): Long =
    (0 until bits).foldLeft(0L) { (acc, i) =>
      acc | (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
    }

  test("zValue2 matches the bitwise reference on random coordinates") {
    val rnd = new scala.util.Random(42)
    val pts = Seq.fill(500)((rnd.nextInt(256).toLong, rnd.nextInt(256).toLong))
    val got = pts.toDF("x", "y")
      .select($"x", $"y", ZOrder.zValue2($"x", $"y", 8).as("z"))
      .as[(Long, Long, Long)].collect()
    got.foreach { case (x, y, z) => assert(z == mortonRef(x, y, 8)) }
  }

  test("z-sorted layout bounds BOTH dimensions per chunk; x-sorted only one") {
    // full 64x64 uniform grid -> deterministic geometry
    val pts = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val byZ = pts.sortBy { case (x, y) => mortonRef(x, y, 6) }
    val byX = pts.sortBy(identity) // linear ORDER BY x, y
    // 16 chunks of a 64x64 grid: z-order gives 16x16 tiles, so a chunk's
    // y-span is 16; the x-major sort gives 4x64 slabs spanning the FULL
    // y range — y-predicates prune nothing in that layout
    val zYSpan = byZ.grouped(byZ.size / 16)
      .map(c => c.map(_._2).max - c.map(_._2).min + 1).max
    val xYSpan = byX.grouped(byX.size / 16)
      .map(c => c.map(_._2).max - c.map(_._2).min + 1).max
    assert(zYSpan == 16, s"z chunks should span 16 y-values, got $zYSpan")
    assert(xYSpan == 64, s"x-sort chunks span the full y range")
  }

  test("writing range-partitioned by z yields per-file bounds on both dims") {
    val out = java.nio.file.Files.createTempDirectory("graft_zlayout").toString
    val df = (for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong))
      .toDF("x", "y")
      .withColumn("z", ZOrder.zValue2($"x", $"y", 6))
    df.repartitionByRange(16, $"z").sortWithinPartitions("z")
      .write.mode("overwrite").parquet(out)
    val spans = spark.read.parquet(out)
      .groupBy(input_file_name().as("f"))
      .agg((max("x") - min("x") + 1).as("xs"), (max("y") - min("y") + 1).as("ys"))
      .as[(String, Long, Long)].collect()
    assert(spans.length > 1)
    // every file covers a bounded tile in BOTH dimensions — a predicate
    // on either x or y skips most files via ordinary min/max stats
    spans.foreach { case (f, xs, ys) =>
      assert(xs <= 16 && ys <= 16, s"file $f spans ${xs}x$ys — not a tile")
    }
  }
}
