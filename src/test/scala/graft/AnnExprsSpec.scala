package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{IvfAnn, PqAnn}

/** The native ANN kernels (functions/AnnExprs) must be BIT-IDENTICAL to
  * their composed higher-order-function twins — same IEEE accumulation
  * order, same tie-breaks — on the real fixture embeddings. Anything
  * less would silently shift recall numbers and rows-only hashes when
  * the kernels were swapped in. */
class AnnExprsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private lazy val emb = graft.core.Tables
    .load(spark, "/root/testdata/sf0.001", "embeddings")
  private lazy val centroids = IvfAnn.trainCentroids(emb, k = 16, iters = 5)
  private lazy val codebooks = PqAnn.trainCodebooks(emb, m = 16, k = 16,
    iters = 5)

  test("NearestCentroids == composed probesOf for nprobe 1, 5, 16") {
    for (np <- Seq(1, 5, 16)) {
      val diff = emb.select(
          IvfAnn.probesOf(col("embedding"), centroids, np).as("a"),
          IvfAnn.probesOfComposed(col("embedding"), centroids, np).as("b"))
        .where(not(col("a") === col("b")))
      assert(diff.count() == 0, s"nprobe=$np diverged")
    }
  }

  test("clusterOf == composed clusterOf") {
    val diff = emb.select(
        IvfAnn.clusterOf(col("embedding"), centroids).as("a"),
        IvfAnn.clusterOfComposed(col("embedding"), centroids).as("b"))
      .where(not(col("a") === col("b")))
    assert(diff.count() == 0)
  }

  test("PqEncodeExpr == composed encode") {
    val diff = emb.select(
        PqAnn.encode(col("embedding"), codebooks).as("a"),
        PqAnn.encodeComposed(col("embedding"), codebooks).as("b"))
      .where(not(col("a") === col("b")))
    assert(diff.count() == 0)
  }

  test("AdcScoreExpr == composed adcScore, bitwise") {
    val codes = emb.select(col("vec_id"),
      col("embedding"), PqAnn.encode(col("embedding"), codebooks).as("codes"))
    // every (query, code-row) pair over a slice — scores must agree on
    // EQUALITY OF DOUBLES, not within epsilon
    val q = emb.where(col("vec_id") < 3)
      .select(col("vec_id").as("qid"), col("embedding").as("q_emb"))
    val diff = q.crossJoin(codes)
      .select(
        PqAnn.adcScore(col("q_emb"), col("codes"), codebooks).as("a"),
        PqAnn.adcScoreComposed(col("q_emb"), col("codes"), codebooks).as("b"))
      .where(not(col("a") === col("b")))
    assert(diff.count() == 0)
  }

  test("null and dim-mismatch inputs return null") {
    val bad = Seq(
      (1L, null.asInstanceOf[Array[Float]]),
      (2L, Array(1.0f, 2.0f)) // wrong dim (model dim is 64)
    ).toDF("vec_id", "embedding")
    val out = bad.select(
      IvfAnn.probesOf(col("embedding"), centroids, 3).as("p"),
      PqAnn.encode(col("embedding"), codebooks).as("c"))
      .collect()
    assert(out.forall(r => r.isNullAt(0) && r.isNullAt(1)))
  }

  test("interpreted eval matches codegen eval") {
    // force the interpreted path by evaluating the expression directly
    val row = emb.where(col("vec_id") === 7).select("embedding")
      .collect()(0).getSeq[Float](0).toArray
    val lit = org.apache.spark.sql.functions.typedLit(row)
    val viaLit = spark.range(1).select(
        IvfAnn.probesOf(lit, centroids, 5).as("p"),
        PqAnn.encode(lit, codebooks).as("c"))
      .collect()(0)
    val viaCol = emb.where(col("vec_id") === 7).select(
        IvfAnn.probesOf(col("embedding"), centroids, 5).as("p"),
        PqAnn.encode(col("embedding"), codebooks).as("c"))
      .collect()(0)
    assert(viaLit.getSeq[Int](0) == viaCol.getSeq[Int](0))
    assert(viaLit.getSeq[Int](1) == viaCol.getSeq[Int](1))
  }
}
