package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor: partition the vector
  * space with k-means centroids, bucket vectors by nearest centroid, and
  * search only the `nprobe` closest buckets per query.
  *
  * Scale shape (billions of vectors):
  *  - centroids are a tiny model (k × dim doubles) trained once and
  *    broadcast as literals inside a codegen'd argmin expression — the
  *    driver-side collect is k·dim values, not data;
  *  - bucketing is a column expression (no shuffle); the search is an
  *    equi-join on cluster id, shrinking the candidate set ~k/nprobe-fold
  *    versus brute force — the IVF trade of recall for throughput;
  *  - training is deterministic: init = the k lowest vec_ids, fixed
  *    iteration count, no RNG — reproducible across runs and executors.
  */
object IvfAnn {

  /** Centroid-relative score: |c|^2 - 2*x.c — equals squared L2 distance
    * minus the centroid-independent |x|^2 term, so argmin/sort order over
    * centroids is identical while the expression needs ONE dot product
    * per centroid (|c|^2 folds to a literal). */
  private def score(emb: Column, centroid: Array[Double]): Column =
    lit(centroid.map(x => x * x).sum) -
      lit(2.0) * SimilarityOps.dot(emb, array(centroid.map(lit(_)): _*))

  private def distStructs(emb: Column, centroids: Array[Array[Double]]): Column =
    array(centroids.zipWithIndex.map { case (c, j) =>
      struct(score(emb, c).as("d"), lit(j).as("j"))
    }: _*).cast("array<struct<d:double,j:int>>") // cast pins the field names

  /** Nearest-centroid id. With UNIT centroids (trainCentroids
    * normalizes every round — spherical k-means) the score
    * `|c|² - 2x·c = 1 - 2x·c` has its argmin exactly at the cosine
    * argmax for ANY |x|, so the assignment agrees with the cosine
    * ranking the search uses without normalizing the (much larger)
    * corpus side — one dot product per centroid per row, no per-row
    * norm. Runs as the native codegen'd kernel
    * ([[graft.functions.NearestCentroids]]); the composed HOF twin
    * below stays for the bitwise-equality property test. */
  def clusterOf(emb: Column, centroids: Array[Array[Double]]): Column =
    element_at(graft.functions.NearestCentroids(emb, centroids, 1), 1)

  /** `nprobe` nearest centroid ids, closest first (native kernel). */
  def probesOf(emb: Column, centroids: Array[Array[Double]],
               nprobe: Int): Column =
    graft.functions.NearestCentroids(emb, centroids, nprobe)

  /** Composed higher-order-function twin of [[clusterOf]] —
    * interpreted `array_min` over per-centroid score structs; kept as
    * the executable spec of the routing semantics. */
  def clusterOfComposed(emb: Column, centroids: Array[Array[Double]]): Column =
    array_min(distStructs(emb, centroids)).getField("j")

  /** Composed twin of [[probesOf]]. */
  def probesOfComposed(emb: Column, centroids: Array[Array[Double]],
                       nprobe: Int): Column =
    slice(transform(array_sort(distStructs(emb, centroids)),
      s => s.getField("j")), 1, nprobe)

  /** Deterministic codebook training on a bounded sample — the standard
    * IVF recipe (codebooks are trained on a sample, then the full corpus
    * is bucketed). The sample (lowest `sampleSize` vec_ids) is collected
    * once (sampleSize × dim doubles — model-sized, not data-sized) and
    * farthest-point init + `iters` Lloyd rounds run driver-side in plain
    * Scala: zero Spark jobs and zero codegen during training; the cluster
    * assignment of the actual corpus stays a distributed expression. */
  def trainCentroids(vectors: DataFrame, k: Int, iters: Int,
                     sampleSize: Int = 2048): Array[Array[Double]] = {
    // spherical k-means: train on unit vectors and re-normalize each
    // round's means, so centroids quantize DIRECTION — the quantity the
    // cosine ranking actually searches
    def unitize(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      if (n == 0) v else v.map(_ / n)
    }
    val sample: Array[Array[Double]] = vectors.orderBy("vec_id")
      .limit(sampleSize).select("embedding").collect()
      .map(r => unitize(r.getSeq[Float](0).map(_.toDouble).toArray))
    require(sample.length >= k, s"need >= $k sample vectors")
    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // farthest-point seeding from the first sample vector
    val seeds = scala.collection.mutable.ArrayBuffer(sample(0))
    while (seeds.size < k) {
      seeds += sample.maxBy(v => seeds.map(d2(v, _)).min)
    }
    var centroids = seeds.toArray
    // Lloyd rounds; empty clusters keep their centroid
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](sample(0).length))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = (0 until k).minBy(j => d2(v, centroids(j)))
        counts(c) += 1
        var i = 0
        while (i < v.length) { sums(c)(i) += v(i); i += 1 }
      }
      centroids = centroids.zipWithIndex.map { case (old, j) =>
        if (counts(j) == 0) old else unitize(sums(j).map(_ / counts(j)))
      }
    }
    centroids
  }

  /** IVF top-k: queries probe their `nprobe` nearest buckets and rank by
    * exact cosine within the probed candidates. */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              centroids: Array[Array[Double]], k: Int, nprobe: Int): DataFrame = {
    val bucketed = corpus.select(col("vec_id"), col("embedding"),
      clusterOf(col("embedding"), centroids).as("cluster"))
    val probed = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"),
      explode(probesOf(col("embedding"), centroids, nprobe)).as("cluster"))
    val scored = probed.join(bucketed, "cluster")
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(SimilarityOps.cosine(col("q_emb"), col("embedding")), 4).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }
}
