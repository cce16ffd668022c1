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

  private def sq(c: Column): Column = c * c

  /** Squared L2 distance between the embedding column and a constant
    * centroid, as a codegen'd expression. */
  private def distTo(emb: Column, centroid: Array[Double]): Column =
    SimilarityOps.dot(
      zip_with(emb, array(centroid.map(lit(_)): _*), (x, y) => x.cast("double") - y),
      zip_with(emb, array(centroid.map(lit(_)): _*), (x, y) => x.cast("double") - y))

  /** Nearest-centroid id (argmin over the centroid set, deterministic
    * tie-break on centroid index). */
  private def distStructs(emb: Column, centroids: Array[Array[Double]]): Column =
    array(centroids.zipWithIndex.map { case (c, j) =>
      struct(distTo(emb, c).as("d"), lit(j).as("j"))
    }: _*).cast("array<struct<d:double,j:int>>") // cast pins the field names

  def clusterOf(emb: Column, centroids: Array[Array[Double]]): Column =
    array_min(distStructs(emb, centroids)).getField("j")

  /** `nprobe` nearest centroid ids, closest first. */
  def probesOf(emb: Column, centroids: Array[Array[Double]],
               nprobe: Int): Column =
    slice(transform(array_sort(distStructs(emb, centroids)),
      s => s.getField("j")), 1, nprobe)

  /** Deterministic farthest-point init (kmeans++-shaped, no RNG): seed
    * with the lowest vec_id, then greedily add the vector farthest from
    * the chosen set — k-1 small jobs, spreads seeds across the data. */
  def initCentroids(vectors: DataFrame, k: Int): Array[Array[Double]] = {
    def emb(r: org.apache.spark.sql.Row): Array[Double] =
      r.getSeq[Float](0).map(_.toDouble).toArray
    val first = emb(vectors.orderBy("vec_id").limit(1).select("embedding").head())
    val chosen = scala.collection.mutable.ArrayBuffer(first)
    while (chosen.size < k) {
      val minDist = chosen.map(c => distTo(col("embedding"), c.toArray))
        .reduce(least(_, _))
      val far = vectors
        .select(col("embedding"), minDist.as("md"), col("vec_id"))
        .orderBy(col("md").desc, col("vec_id")).limit(1)
        .select("embedding").head()
      chosen += emb(far)
    }
    chosen.map(_.toArray).toArray
  }

  /** Deterministic k-means: farthest-point init, `iters` Lloyd rounds
    * (assignment via the argmin expression, means via one groupBy over
    * (cluster, dim)). Empty clusters keep their centroid. */
  def trainCentroids(vectors: DataFrame, k: Int, iters: Int): Array[Array[Double]] = {
    var centroids: Array[Array[Double]] = initCentroids(vectors, k)
    val dim = centroids.head.length
    for (_ <- 0 until iters) {
      val stats = vectors
        .select(clusterOf(col("embedding"), centroids).as("cluster"),
          posexplode(col("embedding")).as(Seq("pos", "v")))
        .groupBy("cluster", "pos")
        .agg(sum(col("v").cast("double")).as("s"), count(lit(1)).as("n"))
        .collect()
      val next = centroids.map(_.clone())
      stats.foreach { r =>
        val (cl, pos) = (r.getInt(0), r.getInt(1))
        next(cl)(pos) = r.getDouble(2) / r.getLong(3)
      }
      centroids = next
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
