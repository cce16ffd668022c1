package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (ARRAY<FLOAT>), north-star
  * extension: brute-force cosine top-k as the correctness baseline, and a
  * sign-LSH (random-hyperplane-style, but deterministic) bucketed variant
  * as the scale path.
  *
  * Scale design (billions of vectors):
  *  - the brute-force form is queries × corpus — only viable when the
  *    query side is small enough to broadcast (we broadcast it);
  *  - the LSH form buckets both sides by a b-bit sign fingerprint so the
  *    pair space shrinks ~2^b-fold, turning the cross join into an
  *    equi-join on bucket id; recall is tunable via multi-probe (drop to
  *    fewer bits) — the standard IVF/LSH trade.
  *  - dot products are `zip_with`+`aggregate` column expressions: no UDF,
  *    evaluated per-row inside codegen, double accumulation in array order
  *    (deterministic).
  */
object SimilarityOps {

  /** Sequential-order dot product of two ARRAY<FLOAT/DOUBLE> columns in
    * double precision. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity in double precision — the fused codegen'd
    * expression (one allocation-free pass for dot, |a|², |b|² inside
    * whole-stage codegen; see graft.functions.CosineSim). Bit-identical
    * to [[cosineComposed]] (property-tested). */
  def cosine(a: Column, b: Column): Column = graft.functions.CosineSim(a, b)

  /** The composed higher-order-function form (zip_with + aggregate):
    * interpreted eval with an intermediate array per row — kept as the
    * reference semantics the custom expression is tested against. */
  def cosineComposed(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * corpus vectors. Query side is broadcast (small); corpus streams.
    *
    * @return (query_id, vec_id, cos_sim DOUBLE rounded to 4, rn INT)
    */
  def knnBruteForce(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = queries.select(col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val c = corpus.select(col("vec_id"), col("embedding"))
    val scored = c.crossJoin(broadcast(q))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 4).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }

  /** Deterministic sign-LSH bucket id: b pseudo-hyperplanes whose ±1
    * coefficients come from md5 parities of (plane, dim) — reproducible
    * across executors and engines, no RNG. Bucket = b sign bits.
    */
  def signLshBucket(emb: Column, bits: Int, dim: Int): Column = {
    val planeSums = (0 until bits).map { p =>
      // coefficient for (p, i): +1 if md5("p:i") first byte even —
      // expressed as an array literal + dot so codegen loops instead of
      // unrolling bits*dim multiply-adds
      val coeffs = (0 until dim).map { i =>
        val hex = java.security.MessageDigest.getInstance("MD5")
          .digest(s"$p:$i".getBytes("UTF-8"))
        if ((hex(0) & 1) == 0) 1.0 else -1.0
      }
      dot(emb, array(coeffs.map(lit(_)): _*))
    }
    planeSums.zipWithIndex.map { case (s, p) =>
      when(s > 0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)
  }

  /** LSH-bucketed ANN: exact cosine ranking *within* each sign-LSH bucket.
    * The scale path: bucket equi-join instead of cross join.
    */
  def annLshTopK(vectors: DataFrame, bits: Int, dim: Int, k: Int): DataFrame = {
    val bucketed = vectors.select(col("vec_id"), col("embedding"),
      signLshBucket(col("embedding"), bits, dim).as("bucket"))
    val a = bucketed.select(col("bucket"), col("vec_id").as("query_id"),
      col("embedding").as("q_emb"))
    val scored = a.join(bucketed, "bucket")
      .where(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"),
        round(cosine(col("q_emb"), col("embedding")), 4).as("cos_sim"))
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos_sim").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
  }
}
