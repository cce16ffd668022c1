package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Ninetieth wave — data valuation, optimal sampling allocation, and
  * retrieval ranking metrics.
  *
  *  - `q_data_shapley`: Shapley DATA VALUATION (Ghorbani & Zou 2019)
  *    of the five source groups, with vocabulary coverage as the
  *    utility: v(S) = |distinct tokens covered by ∪S|. Coverage is a
  *    set-union utility, so the whole game reduces to the per-token
  *    membership MASK — one aggregation to a ≤ 2⁵-row (mask, count)
  *    table, then exact integer Shapley against the 80-row
  *    (group, S) weight lattice scaled by 5! = 120 (the q_shapley
  *    machinery, pointed at a different game). Tells you which
  *    SOURCES actually add vocabulary — the first question of corpus
  *    acquisition. Efficiency axiom pinned in the spec.
  *  - `q_neyman`: Neyman optimal stratified allocation (Neyman 1934)
  *    of a 1000-unit sample across nations — n_h ∝ N_h·S_h with S_h
  *    the exact per-stratum balance standard deviation (integer
  *    moments; one shared √ tree), integerized by the largest-
  *    remainder rule (the q_apportion discipline, with IEEE-identical
  *    fractional remainders). Minimum-variance sampling under a fixed
  *    budget — what q_stratified_sample should use instead of
  *    proportional shares when strata variances differ.
  *  - `q_mrr`: retrieval-ranking metrics for the labeled embedding
  *    corpus — per held-out query (vec_id < 20), the rank of the
  *    first same-label neighbor under the q_knn_cosine parity
  *    discipline, its reciprocal rank, and the recall@10 flag. The
  *    per-query companion to q_ndcg's graded gains.
  */
object R90Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_data_shapley ----------

  private val nGroups = 5

  private def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)

  /** (group, gbit, smask, w120) for every group g and S ⊆ G∖{g}. */
  private val shapleyW: Seq[(Int, Int, Int, Long)] =
    for {
      g <- 0 until nGroups
      smask <- 0 until (1 << nGroups)
      if (smask & (1 << g)) == 0
    } yield {
      val sz = Integer.bitCount(smask)
      (g, 1 << g, smask, fact(sz) * fact(nGroups - 1 - sz))
    }

  private val shapleyWSql: String =
    shapleyW.map { case (g, b, m, w) => s"($g, $b, $m, $w)" }.mkString(", ")

  /** source 'srcN' → group N mod 5 — shared verbatim. */
  private val groupSql =
    s"CAST(CAST(substr(source, 4) AS BIGINT) % $nGroups AS BIGINT)"

  val qDataShapley = QueryDef("q_data_shapley",
    (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(expr(groupSql).as("g"),
          explode(array_distinct(split(col("text"), " "))).as("tok"))
        .distinct()
      val masks = toks
        .groupBy("tok")
        .agg(sum(expr("shiftleft(1, CAST(g AS INT))")).cast("long").as("m"))
      val cnt = masks.groupBy("m").agg(count(lit(1)).cast("long").as("c"))
      val w = s.createDataFrame(shapleyW).toDF("grp", "gbit", "smask", "w120")
      def covers(mask: Column, set: Column): Column =
        when(mask.bitwiseAND(set) =!= 0L, 1L).otherwise(0L)
      cnt.crossJoin(broadcast(w))
        .withColumn("contrib", col("w120") * col("c") *
          (covers(col("m"), col("smask").bitwiseOR(col("gbit"))) -
            covers(col("m"), col("smask"))))
        .groupBy("grp")
        .agg(sum(col("contrib")).cast("long").as("phi_x120"))
        .select(col("grp").cast("long").as("grp"), col("phi_x120"))
        .orderBy("grp")
    },
    Some(
      s"""WITH toks AS (
         |  SELECT DISTINCT $groupSql AS g, tok FROM (
         |    SELECT source, unnest(string_split(text, ' ')) AS tok FROM documents)),
         |masks AS (
         |  SELECT tok, CAST(sum(1 << g) AS BIGINT) AS m FROM toks GROUP BY tok),
         |cnt AS (SELECT m, CAST(count(*) AS BIGINT) AS c FROM masks GROUP BY m),
         |w(grp, gbit, smask, w120) AS (VALUES $shapleyWSql)
         |SELECT CAST(w.grp AS BIGINT) AS grp,
         |  CAST(sum(w.w120 * cnt.c *
         |    ((CASE WHEN (cnt.m & (w.smask | w.gbit)) <> 0 THEN 1 ELSE 0 END)
         |   - (CASE WHEN (cnt.m & w.smask) <> 0 THEN 1 ELSE 0 END)))
         |    AS BIGINT) AS phi_x120
         |FROM w CROSS JOIN cnt
         |GROUP BY w.grp ORDER BY grp""".stripMargin))

  // ---------- q_neyman ----------

  private val sampleN = 1000L

  val qNeyman = QueryDef("q_neyman",
    // r16: route the global window(s) through the distributed rewrite
    (s, dir) => RewriteGlobalRankWindows.force {
      val strata = t(s, dir, "customer")
        .select(col("c_nationkey").cast("long").as("nat"),
          expr("CAST(round(c_acctbal * 100.0) AS BIGINT)").as("c"))
        .groupBy("nat")
        .agg(count(lit(1)).cast("long").as("nh"),
          sum(col("c")).cast("long").as("sc"),
          sum(col("c") * col("c")).cast("long").as("scc"))
        // exact population variance: (n·Σx² − (Σx)²)/n² — one shared tree
        .withColumn("sh", expr(
          "sqrt((CAST(nh AS DOUBLE) * CAST(scc AS DOUBLE)" +
            " - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))" +
            " / (CAST(nh AS DOUBLE) * CAST(nh AS DOUBLE)))"))
        .withColumn("wgt", col("nh").cast("double") * col("sh"))
      val tot = Window.partitionBy(lit(1))
      val alloc = strata
        .withColumn("wtot", sum(col("wgt")).over(tot))
        .withColumn("share", col("wgt") / col("wtot") * lit(sampleN.toDouble))
        .withColumn("base", floor(col("share")).cast("long"))
        .withColumn("rem", col("share") - col("base"))
        .withColumn("leftover",
          (lit(sampleN) - sum(col("base")).over(tot)).cast("long"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("nat"))))
      alloc.select(col("nat"), col("nh"), round(col("sh"), 4).as("sh"),
          col("base"),
          (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .cast("long").as("alloc"))
        .orderBy("nat")
    },
    Some(
      s"""WITH strata AS (
         |  SELECT CAST(c_nationkey AS BIGINT) AS nat,
         |    CAST(count(*) AS BIGINT) AS nh,
         |    CAST(sum(CAST(round(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS sc,
         |    CAST(sum(CAST(round(c_acctbal * 100.0) AS BIGINT)
         |      * CAST(round(c_acctbal * 100.0) AS BIGINT)) AS BIGINT) AS scc
         |  FROM customer GROUP BY 1),
         |weighted AS (
         |  SELECT nat, nh, sc, scc,
         |    sqrt((CAST(nh AS DOUBLE) * CAST(scc AS DOUBLE)
         |      - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
         |      / (CAST(nh AS DOUBLE) * CAST(nh AS DOUBLE))) AS sh,
         |    CAST(nh AS DOUBLE) * sqrt((CAST(nh AS DOUBLE) * CAST(scc AS DOUBLE)
         |      - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
         |      / (CAST(nh AS DOUBLE) * CAST(nh AS DOUBLE))) AS wgt
         |  FROM strata),
         |shares AS (
         |  SELECT nat, nh, sh,
         |    wgt / sum(wgt) OVER () * $sampleN AS share
         |  FROM weighted),
         |alloc AS (
         |  SELECT nat, nh, sh, CAST(floor(share) AS BIGINT) AS base,
         |    share - floor(share) AS rem
         |  FROM shares),
         |ranked AS (
         |  SELECT a.*, CAST($sampleN - sum(base) OVER () AS BIGINT) AS leftover,
         |    row_number() OVER (ORDER BY rem DESC, nat) AS rk
         |  FROM alloc a)
         |SELECT nat, nh, round(sh, 4) AS sh, base,
         |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS alloc
         |FROM ranked ORDER BY nat""".stripMargin))

  // ---------- q_mrr ----------

  val qMrr = QueryDef("q_mrr",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("embedding"),
          col("label").cast("long").as("label"),
          expr("aggregate(embedding, CAST(0.0 AS DOUBLE)," +
            " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))").as("n2"))
      val q = e.where(col("vec_id") < 20)
        .select(col("vec_id").as("qid"), col("embedding").as("qe"),
          col("label").as("qlabel"), col("n2").as("qq"))
      val corpus = e.where(col("vec_id") >= 20)
        .select(col("vec_id").as("cid"), col("embedding").as("ce"),
          col("label").as("clabel"), col("n2").as("cc"))
      val scored = corpus.join(broadcast(q))
        .withColumn("dot", expr("aggregate(zip_with(qe, ce," +
          " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
          " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
        .withColumn("cos", round(col("dot") / (sqrt(col("qq")) * sqrt(col("cc"))), 4))
      val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("cid"))
      scored.withColumn("rn", row_number().over(w).cast("long"))
        .where(col("rn") <= 20)
        .groupBy("qid", "qlabel")
        .agg(min(when(col("clabel") === col("qlabel"), col("rn"))).as("first_hit"),
          sum(when(col("clabel") === col("qlabel") && col("rn") <= 10, 1L)
            .otherwise(0L)).cast("long").as("hits_at_10"))
        .select(col("qid"), col("qlabel"),
          coalesce(col("first_hit"), lit(0L)).cast("long").as("first_hit"),
          round(when(col("first_hit").isNotNull,
            lit(1.0) / col("first_hit").cast("double")).otherwise(lit(0.0)), 6)
            .as("rr"),
          when(col("hits_at_10") > 0, 1L).otherwise(0L).as("recall_at_10"))
        .orderBy("qid")
    },
    Some(
      """WITH e AS (
        |  SELECT vec_id, embedding, CAST(label AS BIGINT) AS label FROM embeddings),
        |dots AS (
        |  SELECT q.vec_id AS qid, q.label AS qlabel,
        |    c.vec_id AS cid, c.label AS clabel,
        |    sum(CAST(q.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) AS dot,
        |    sum(CAST(q.embedding[i] AS DOUBLE) * CAST(q.embedding[i] AS DOUBLE)) AS qq,
        |    sum(CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) AS cc
        |  FROM e q, e c, generate_series(1, 64) t(i)
        |  WHERE q.vec_id < 20 AND c.vec_id >= 20
        |  GROUP BY 1, 2, 3, 4),
        |ranked AS (
        |  SELECT qid, qlabel, clabel,
        |    CAST(row_number() OVER (PARTITION BY qid
        |      ORDER BY round(dot / (sqrt(qq) * sqrt(cc)), 4) DESC, cid) AS BIGINT) AS rn
        |  FROM dots),
        |agg AS (
        |  SELECT qid, qlabel,
        |    min(CASE WHEN clabel = qlabel THEN rn END) AS first_hit,
        |    CAST(sum(CASE WHEN clabel = qlabel AND rn <= 10 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS hits_at_10
        |  FROM ranked WHERE rn <= 20 GROUP BY 1, 2)
        |SELECT qid, qlabel, CAST(coalesce(first_hit, 0) AS BIGINT) AS first_hit,
        |  round(CASE WHEN first_hit IS NOT NULL
        |    THEN 1.0 / CAST(first_hit AS DOUBLE) ELSE 0.0 END, 6) AS rr,
        |  CAST(CASE WHEN hits_at_10 > 0 THEN 1 ELSE 0 END AS BIGINT) AS recall_at_10
        |FROM agg ORDER BY qid""".stripMargin))

  val all: Seq[QueryDef] = Seq(qDataShapley, qNeyman, qMrr)
}
