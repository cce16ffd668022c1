package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Eighty-fourth wave — late-interaction retrieval, exact 1-D optimal
  * transport, and heavy-tail estimation.
  *
  *  - `q_maxsim`: ColBERT-style late interaction (Khattab & Zaharia,
  *    SIGIR 2020): every 64-d vector is treated as EIGHT 8-d token
  *    vectors (contiguous slices); score(q, d) = Σ_i max_j
  *    cos(qᵢ, dⱼ) — the sum-of-max that single-vector cosine cannot
  *    express. Queries (vec_id < 3) explode to 24 token vectors and
  *    BROADCAST; docs explode map-side to 8 slices; the max_j collapses
  *    in a (query, doc, i) aggregate before the final per-pair sum —
  *    top-5 docs per query. The q_knn_cosine parity discipline
  *    (index-ordered folds, round(·,4), id tie-breaks) throughout.
  *  - `q_wasserstein`: EXACT 1-D earth-mover distance (Monge 1781;
  *    the integral-of-|ΔCDF| closed form) between the A/B per-user
  *    event-count distributions. With na·nb as the common denominator
  *    everything is integer: W₁·na·nb = Σ steps |ca·nb − cb·na|·Δv
  *    over the merged support sweep — the distribution-shift measure
  *    that q_ks_test's sup-norm misses when distributions differ in
  *    the tails. Support-sized window sweep.
  *  - `q_hill_tail`: the Hill estimator (Hill 1975) of the
  *    order-value tail index over the top k = 100 order statistics:
  *    α̂ = (mean ln(xᵢ/x₍ₖ₎))⁻¹ — is revenue heavy-tailed enough that
  *    mean-based budgeting lies? Exact integer cents into ln (the
  *    q_theil_index parity precedent), one top-k rank then a
  *    k-sized aggregate.
  */
object R84Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_maxsim ----------

  private val nSlices = 8
  private val sliceDim = 8

  val qMaxsim = QueryDef("q_maxsim",
    (s, dir) => {
      // slice i of v = elements [i*8+1 .. i*8+8] (1-based slice())
      def sliced(df: DataFrame, idCol: String): DataFrame =
        df.select(col("vec_id").as(idCol),
          explode(array((0 until nSlices).map(i =>
            struct(lit(i).as("i"),
              expr(s"slice(embedding, ${i * sliceDim + 1}, $sliceDim)")
                .as("sv"))): _*)).as("tok"))
          .select(col(idCol), col("tok.i").as("i"), col("tok.sv").as("sv"))
          .withColumn("n2", expr("aggregate(sv, CAST(0.0 AS DOUBLE)," +
            " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))"))
      val q = sliced(t(s, dir, "embeddings").where(col("vec_id") < 3), "qid")
        .withColumnRenamed("sv", "qv").withColumnRenamed("n2", "qq")
      val d = sliced(t(s, dir, "embeddings").where(col("vec_id") >= 3), "did")
        .withColumnRenamed("i", "j")
      val scored = d.join(broadcast(q))
        .withColumn("dot", expr("aggregate(zip_with(qv, sv," +
          " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
          " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
        .withColumn("cos",
          round(col("dot") / (sqrt(col("qq")) * sqrt(col("n2"))), 4))
      val maxPer = scored.groupBy("qid", "did", "i")
        .agg(max(col("cos")).as("best"))
      val pair = maxPer.groupBy("qid", "did")
        .agg(round(sum(col("best")), 4).as("maxsim"))
      val w = Window.partitionBy("qid")
        .orderBy(col("maxsim").desc, col("did"))
      pair.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select(col("qid"), col("did"), col("maxsim"),
          col("rn").cast("long").as("rn"))
        .orderBy("qid", "rn")
    },
    Some(
      s"""WITH q AS (
         |  SELECT e.vec_id AS qid, t.i,
         |    list_slice(e.embedding, t.i * $sliceDim + 1, t.i * $sliceDim + $sliceDim) AS qv
         |  FROM embeddings e, (SELECT unnest(generate_series(0, ${nSlices - 1})) AS i) t
         |  WHERE e.vec_id < 3),
         |d AS (
         |  SELECT e.vec_id AS did, t.i AS j,
         |    list_slice(e.embedding, t.i * $sliceDim + 1, t.i * $sliceDim + $sliceDim) AS sv
         |  FROM embeddings e, (SELECT unnest(generate_series(0, ${nSlices - 1})) AS i) t
         |  WHERE e.vec_id >= 3),
         |dots AS (
         |  SELECT q.qid, d.did, q.i, d.j,
         |    sum(CAST(q.qv[k] AS DOUBLE) * CAST(d.sv[k] AS DOUBLE)) AS dot,
         |    sum(CAST(q.qv[k] AS DOUBLE) * CAST(q.qv[k] AS DOUBLE)) AS qq,
         |    sum(CAST(d.sv[k] AS DOUBLE) * CAST(d.sv[k] AS DOUBLE)) AS dd
         |  FROM q, d, generate_series(1, $sliceDim) s(k)
         |  GROUP BY 1, 2, 3, 4),
         |cosed AS (
         |  SELECT qid, did, i, round(dot / (sqrt(qq) * sqrt(dd)), 4) AS cos
         |  FROM dots),
         |best AS (
         |  SELECT qid, did, i, max(cos) AS best FROM cosed GROUP BY 1, 2, 3),
         |pairs AS (
         |  SELECT qid, did, round(sum(best), 4) AS maxsim FROM best GROUP BY 1, 2),
         |ranked AS (
         |  SELECT qid, did, maxsim,
         |    row_number() OVER (PARTITION BY qid ORDER BY maxsim DESC, did) AS rn
         |  FROM pairs)
         |SELECT qid, did, maxsim, CAST(rn AS BIGINT) AS rn
         |FROM ranked WHERE rn <= 5 ORDER BY qid, rn""".stripMargin))

  // ---------- q_wasserstein ----------

  val qWasserstein = QueryDef("q_wasserstein",
    (s, dir) => RewriteGlobalRankWindows.force {
      val per = Tables.events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("v"))
        .withColumn("arm", when(col("user_id") % 2 === 0, "a").otherwise("b"))
      val support = per.groupBy("v")
        .agg(sum(when(col("arm") === "a", 1L).otherwise(0L)).cast("long").as("da"),
          sum(when(col("arm") === "b", 1L).otherwise(0L)).cast("long").as("db"))
      val w = Window.orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(lit(1))
      val swept = support
        .withColumn("ca", sum(col("da")).over(w).cast("long"))
        .withColumn("cb", sum(col("db")).over(w).cast("long"))
        .withColumn("na", sum(col("da")).over(tot).cast("long"))
        .withColumn("nb", sum(col("db")).over(tot).cast("long"))
        .withColumn("next_v", lead(col("v"), 1).over(Window.orderBy("v")))
        .where(col("next_v").isNotNull)
        .withColumn("term",
          abs(col("ca") * col("nb") - col("cb") * col("na")) *
            (col("next_v") - col("v")))
      swept.groupBy("na", "nb")
        .agg(sum(col("term")).cast("long").as("w1_num"))
        .select(col("na"), col("nb"), col("w1_num"),
          round(col("w1_num").cast("double") /
            (col("na") * col("nb")).cast("double"), 6).as("w1"))
    },
    Some(
      """WITH per AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS v,
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm
        |  FROM events GROUP BY user_id),
        |support AS (
        |  SELECT v,
        |    CAST(sum(CASE WHEN arm = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS da,
        |    CAST(sum(CASE WHEN arm = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS db
        |  FROM per GROUP BY v),
        |swept AS (
        |  SELECT v,
        |    CAST(sum(da) OVER wc AS BIGINT) AS ca,
        |    CAST(sum(db) OVER wc AS BIGINT) AS cb,
        |    CAST(sum(da) OVER () AS BIGINT) AS na,
        |    CAST(sum(db) OVER () AS BIGINT) AS nb,
        |    lead(v) OVER (ORDER BY v) AS next_v
        |  FROM support
        |  WINDOW wc AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT na, nb,
        |  CAST(sum(abs(ca * nb - cb * na) * (next_v - v)) AS BIGINT) AS w1_num,
        |  round(CAST(sum(abs(ca * nb - cb * na) * (next_v - v)) AS DOUBLE)
        |    / CAST(na * nb AS DOUBLE), 6) AS w1
        |FROM swept WHERE next_v IS NOT NULL
        |GROUP BY na, nb""".stripMargin))

  // ---------- q_hill_tail ----------

  private val hillK = 100

  val qHillTail = QueryDef("q_hill_tail",
    // r16: route the global window(s) through the distributed rewrite
    (s, dir) => RewriteGlobalRankWindows.force {
      val x = t(s, dir, "orders")
        .select(expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("c"),
          col("o_orderkey"))
      // top-k via TakeOrdered (distributed partial top-k, NO global sort
      // funnel); the rank window then runs on the k-row result only
      val topK = x.orderBy(col("c").desc, col("o_orderkey")).limit(hillK)
      val w = Window.orderBy(col("c").desc, col("o_orderkey"))
      val top = topK.withColumn("rk", row_number().over(w))
      val kth = top.agg(min(col("c")).cast("long").as("xk"))
      top.where(col("rk") < hillK).crossJoin(broadcast(kth))
        .withColumn("lnr", expr("ln(CAST(c AS DOUBLE) / CAST(xk AS DOUBLE))"))
        .agg(count(lit(1)).cast("long").as("k_used"),
          max(col("xk")).as("x_k"),
          round(expr("CAST(count(*) AS DOUBLE) / sum(lnr)"), 6)
            .as("hill_alpha"))
        .select(col("k_used"), col("x_k").cast("long").as("x_k"),
          col("hill_alpha"))
    },
    Some(
      s"""WITH x AS (
         |  SELECT CAST(round(o_totalprice * 100.0) AS BIGINT) AS c, o_orderkey
         |  FROM orders),
         |top AS (
         |  SELECT c, row_number() OVER (ORDER BY c DESC, o_orderkey) AS rk
         |  FROM x QUALIFY rk <= $hillK),
         |kth AS (SELECT CAST(min(c) AS BIGINT) AS xk FROM top)
         |SELECT CAST(count(*) AS BIGINT) AS k_used,
         |  CAST(max(xk) AS BIGINT) AS x_k,
         |  round(CAST(count(*) AS DOUBLE)
         |    / sum(ln(CAST(c AS DOUBLE) / CAST(xk AS DOUBLE))), 6) AS hill_alpha
         |FROM top CROSS JOIN kth WHERE rk < $hillK""".stripMargin))

  val all: Seq[QueryDef] = Seq(qMaxsim, qWasserstein, qHillTail)
}
