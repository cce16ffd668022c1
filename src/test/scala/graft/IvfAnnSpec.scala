package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{IvfAnn, SimilarityOps}

class IvfAnnSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // three well-separated gaussian-ish blobs (deterministic)
  def blob(center: Array[Float], n: Int, idBase: Long): Seq[(Long, Array[Float])] =
    (0 until n).map { i =>
      val v = center.zipWithIndex.map { case (c, d) =>
        c + (math.sin(idBase * 131 + i * 17 + d) * 0.1).toFloat
      }
      (idBase + i, v)
    }

  val vectors = (
    blob(Array.fill(8)(5f), 20, 0L) ++
    blob(Array.fill(8)(-5f), 20, 100L) ++
    blob(Array(5f, -5f, 5f, -5f, 5f, -5f, 5f, -5f), 20, 200L)
  ).toDF("vec_id", "embedding")

  test("k-means training is deterministic and separates clear blobs") {
    val c1 = IvfAnn.trainCentroids(vectors, 3, 3)
    val c2 = IvfAnn.trainCentroids(vectors, 3, 3)
    assert(c1.map(_.toSeq).toSeq == c2.map(_.toSeq).toSeq)
    val assigned = vectors.select((col("vec_id") / 100).cast("int").as("blob"),
      IvfAnn.clusterOf(col("embedding"), c1).as("cluster"))
      .distinct().collect()
    // every blob maps to exactly one cluster and clusters are distinct
    val byBlob = assigned.groupBy(_.getInt(0)).view.mapValues(_.map(_.getInt(1)).toSet)
    assert(byBlob.values.forall(_.size == 1))
    assert(byBlob.values.flatten.toSet.size == 3)
  }

  test("IVF search finds the same-blob neighbors brute force finds") {
    val centroids = IvfAnn.trainCentroids(vectors, 3, 3)
    val queries = vectors.where(col("vec_id").isin(0L, 100L, 200L))
    val ivf = IvfAnn.ivfTopK(queries, vectors, centroids, k = 5, nprobe = 1)
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    val brute = SimilarityOps.knnBruteForce(queries, vectors, 6)
      .where(col("vec_id") =!= col("query_id"))
      .select("query_id", "vec_id").as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    // on well-separated blobs, nprobe=1 IVF recall should be total
    for ((q, ns) <- ivf) {
      val recall = ns.intersect(brute(q)).size.toDouble / ns.size
      assert(recall >= 0.8, s"query $q recall $recall")
    }
  }
}
