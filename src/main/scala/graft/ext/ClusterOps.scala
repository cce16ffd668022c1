package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed exact k-means (Lloyd's) on an integer lattice.
  *
  * Embedding components are floored onto a fixed-point grid (the caller
  * quantizes, typically `floor(x * 1e6)` as BIGINT) so that every
  * downstream aggregate is an integer sum — order-independent, hence
  * bit-identical across engines and across partitionings (double
  * addition is not associative; integer addition is). Centroid updates
  * use exact floor division (sign-normalized remainder), never double
  * division, so two independent implementations derive the SAME
  * centroids and therefore the SAME assignments every round.
  *
  * Scale design (the full-corpus counterpart of [[IvfAnn]]'s
  * sampled-codebook training):
  *  - points stay long-form (vec_id, d, v) — the corpus;
  *  - centroids are (cluster, d, m) — k×dims rows, model-sized,
  *    BROADCAST into the assignment join each round;
  *  - per round: one broadcast join + one corpus-keyed groupBy
  *    (vec_id) for assignment, then a k×dims-keyed groupBy (map-side
  *    combined partial sums) for the update. `rounds` is fixed, so the
  *    whole run is `rounds` corpus passes — textbook distributed
  *    Lloyd's, no driver-side collect of anything corpus-sized.
  *
  * BIGINT safety: with |v|,|m| ≤ ~1e6 and 64 dims, per-pair squared
  * distance ≤ 64·(2e6)² ≈ 2.6e14 — far inside Long range.
  */
object ClusterOps {

  /** Run `rounds` Lloyd's iterations over long-form points
    * (vec_id, d, v); seeds are the points with vec_id < k.
    * Returns (assignment (vec_id, cluster), centroids (cluster, d, m))
    * after the final round. Ties in the argmin break to the lowest
    * cluster id — pinned, so reruns and re-implementations agree. */
  def kmeans(pts: DataFrame, k: Int, rounds: Int)
      : (DataFrame, DataFrame) = {
    require(rounds >= 1, "kmeans needs at least one round")
    var cent = pts.where(col("vec_id") < k)
      .select(col("vec_id").as("cluster"), col("d"), col("v").as("m"))
    var assign: DataFrame = null
    for (_ <- 1 to rounds) {
      val dist = pts.join(broadcast(cent), "d")
        .groupBy(col("vec_id"), col("cluster"))
        .agg(sum((col("v") - col("m")) * (col("v") - col("m"))).as("dd"))
      assign = dist.withColumn("rk",
          row_number().over(Window.partitionBy(col("vec_id"))
            .orderBy(col("dd"), col("cluster"))))
        .where(col("rk") === 1).select(col("vec_id"), col("cluster"))
      cent = pts.join(assign, "vec_id")
        .groupBy(col("cluster"), col("d"))
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"))
        // exact floor division via sign-normalized remainder — Spark's
        // `/` on longs is double division, which would diverge in the
        // last ulp and flip boundary assignments next round
        .select(col("cluster"), col("d"),
          ((col("sv") - ((col("sv") % col("n")) + col("n")) % col("n"))
            / col("n")).cast("long").as("m"))
    }
    (assign, cent)
  }

  /** Long-form 1e-6-lattice quantization of an array-typed embedding
    * column: (vec_id, d, v) with v = floor(x·1e6) as BIGINT. floor, not
    * round — round-half ties resolve differently across engines. */
  def quantize(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), posexplode(col("embedding")).as(Seq("d", "x")))
      .select(col("vec_id"), col("d"),
        floor(col("x").cast("double") * lit(1000000L)).cast("long").as("v"))
}
