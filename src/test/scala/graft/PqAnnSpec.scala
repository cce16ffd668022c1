package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.PqAnn

/** Unit contracts for product quantization: code range/shape, exactness
  * on clustered data, and the ADC score being a faithful inner-product
  * surrogate. */
class PqAnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** 3 well-separated 8-dim blobs, 10 vectors each (deterministic). */
  private def blobs = {
    val rows = for {
      b <- 0 until 3
      i <- 0 until 10
    } yield {
      val base = Array.fill(8)(0.0f)
      base(b * 2) = 10.0f
      base(b * 2 + 1) = 10.0f
      // small deterministic jitter, unique per vector
      base(7) = (b * 10 + i) * 0.01f
      ((b * 10 + i).toLong, base)
    }
    rows.toDF("vec_id", "embedding")
  }

  test("codes are m integers in [0, k)") {
    val cb = PqAnn.trainCodebooks(blobs, m = 4, k = 4, iters = 3)
    assert(cb.length == 4 && cb(0).length == 4 && cb(0)(0).length == 2)
    val codes = blobs.select(PqAnn.encode($"embedding", cb).as("c"))
      .as[Seq[Int]].collect()
    assert(codes.forall(c => c.length == 4 && c.forall(x => x >= 0 && x < 4)))
  }

  test("PQ search on separated blobs returns same-blob neighbors") {
    val cb = PqAnn.trainCodebooks(blobs, m = 4, k = 4, iters = 5)
    val got = PqAnn.pqTopK(blobs.where($"vec_id" < 3), blobs, cb,
      k = 5, shortlist = 12)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
    // queries 0..2 live in blob 0 (ids 0..9): all neighbors must too
    assert(got.nonEmpty)
    got.foreach { case (_, v) => assert(v < 10, s"cross-blob neighbor $v") }
  }

  test("ADC score equals the exact inner product when vectors ARE centroids") {
    // train on the blob corpus, then score a query against codes of
    // vectors whose subvectors quantize to themselves after convergence:
    // use k = corpus-distinct-subvector count so quantization is lossless
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 1.0f)),
      (1L, Array(0.0f, 1.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    val cb = PqAnn.trainCodebooks(df, m = 2, k = 2, iters = 4)
    val adc = df.select(
      PqAnn.adcScore(
        org.apache.spark.sql.functions.array(
          Seq(1.0f, 0.0f, 0.0f, 1.0f).map(org.apache.spark.sql.functions.lit): _*),
        PqAnn.encode($"embedding", cb), cb).as("s"))
      .as[Double].collect().toSeq.sorted
    // exact inner products: self = 2.0, other = 0.0
    assert(adc == Seq(0.0, 2.0))
  }

  test("training rejects a dimension m does not divide") {
    intercept[IllegalArgumentException] {
      PqAnn.trainCodebooks(blobs, m = 3, k = 2, iters = 1)
    }
  }
}
