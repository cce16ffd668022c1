package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.ClusterOps

/** Exact distributed k-means ([[ClusterOps.kmeans]]): recovers planted
  * blobs, assignments partition the corpus, and the result is invariant
  * to the input partitioning — the property the integer-lattice design
  * exists to guarantee (double-sum k-means gives partitioning-dependent
  * centroids in the last ulp; ours cannot). */
class ClusterOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  /** Planted 2-blob fixture in 3 dims, long-form lattice points.
    * Blob A near (0,0,0), blob B near (800, -600, 400) — far apart, so
    * 2-means with any non-degenerate seeding must separate them. Seeds
    * are vec_id 0 (blob A) and 1 (blob B). */
  private def blobs(nPerBlob: Int) = {
    val rows = (0 until 2 * nPerBlob).flatMap { id =>
      val blob = id % 2 // even → A, odd → B; vec_id 0/1 seed both blobs
      val base = if (blob == 0) Seq(0L, 0L, 0L) else Seq(800L, -600L, 400L)
      // deterministic jitter, ±50 per dim — well under half the
      // inter-blob distance
      base.zipWithIndex.map { case (b, d) =>
        (id.toLong, d, b + ((id * 31 + d * 17) % 101) - 50L)
      }
    }
    rows.toDF("vec_id", "d", "v")
  }

  test("recovers planted blobs exactly") {
    val pts = blobs(40)
    val (assign, cent) = ClusterOps.kmeans(pts, k = 2, rounds = 3)
    val got = assign.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == 80, "every point assigned exactly once")
    // even ids (blob A) all share one cluster, odd ids the other
    val aCl = got.filterKeys(_ % 2 == 0).values.toSet
    val bCl = got.filterKeys(_ % 2 == 1).values.toSet
    assert(aCl.size == 1 && bCl.size == 1 && aCl != bCl,
      s"blobs not separated: A→$aCl B→$bCl")
    // centroids land near the blob centers (within the jitter radius)
    val cm = cent.collect()
      .map(r => (r.getLong(0), r.getInt(1)) -> r.getLong(2)).toMap
    val aId = aCl.head
    assert(math.abs(cm((aId, 0))) <= 50 && math.abs(cm((aId, 1))) <= 50)
    val bId = bCl.head
    assert(math.abs(cm((bId, 0)) - 800) <= 50 &&
      math.abs(cm((bId, 1)) + 600) <= 50)
  }

  test("result is invariant to input partitioning") {
    val pts = blobs(25)
    def run(p: org.apache.spark.sql.DataFrame) = {
      val (assign, cent) = ClusterOps.kmeans(p, k = 2, rounds = 3)
      (assign.orderBy("vec_id").collect().toSeq,
        cent.orderBy("cluster", "d").collect().toSeq)
    }
    val (a1, c1) = run(pts.repartition(1))
    val (a2, c2) = run(pts.repartition(13, col("d")))
    assert(a1 == a2, "assignments changed with partitioning")
    assert(c1 == c2, "centroids changed with partitioning")
  }

  test("quantize flooring is exact on negative components") {
    val emb = Seq((0L, Array(-0.0000015f, 0.0000015f, -1.0f)))
      .toDF("vec_id", "embedding")
    val v = ClusterOps.quantize(emb).orderBy("d")
      .select("v").as[Long].collect().toSeq
    // floor(-1.5)=-2, floor(1.5)=1 (float 1.5e-6 widens slightly under
    // 1e6× but floor stays 1), floor(-1e6)=-1e6
    assert(v == Seq(-2L, 1L, -1000000L))
  }

  test("empty cluster cannot arise from lowest-id tie-break seeding") {
    // degenerate: all points identical → every point ties to every
    // centroid; the cluster-id tie-break sends ALL to cluster 0 and
    // clusters 1..k-1 legitimately empty out — document the semantics
    val pts = (0 until 6).flatMap(id =>
      (0 until 2).map(d => (id.toLong, d, 7L))).toDF("vec_id", "d", "v")
    val (assign, _) = ClusterOps.kmeans(pts, k = 2, rounds = 2)
    val clusters = assign.select("cluster").as[Long].collect().toSet
    assert(clusters == Set(0L))
  }
}
