package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Ninety-second wave — boosting, label-noise detection, and active
  * learning.
  *
  *  - `q_boost`: three rounds of stump boosting under MULTIPLICATIVE
  *    weight updates (the Littlestone/Warmuth weighted-majority rule:
  *    mistakes double their weight — all weights stay exact BIGINT
  *    powers of two, unlike AdaBoost's float α). Each round reuses the
  *    q_stump sweep on the weighted label masses; the per-round argmin
  *    compares error NUMERATORS only, valid because every candidate
  *    shares the round's Σw denominator. Both orientations (predict-1
  *    above or below the threshold) compete. The oracle UNROLLS the
  *    three rounds as generated CTE chains from the same Scala
  *    constants (the q_mmr_rerank discipline).
  *  - `q_label_noise`: confident-learning-style label-noise screening
  *    (Northcutt et al. 2021, the kNN-agreement form): for each probed
  *    corpus vector, the share of its 10 nearest neighbors (self
  *    excluded) that DISAGREE with its label; ≥ 8/10 disagreement
  *    flags a suspected mislabel. The audit that runs before any
  *    labeled set becomes training data.
  *  - `q_uncertainty`: uncertainty-sampling batch selection (Lewis &
  *    Gale 1994): per probed vector the top-2 neighbor-vote margin;
  *    the 20 smallest-margin items form the next annotation batch —
  *    the active-learning loop's acquisition step, on the same
  *    deterministic kNN scaffold.
  */
object R92Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_boost ----------

  private val nRounds = 3

  val qBoost = QueryDef("q_boost",
    (s, dir) => {
      val base = Tables.events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("x"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      // r15 (VERDICT r14 task 1): the weighted-majority update depends
      // only on (x, y, best_r) — every user starts at w=1 and users
      // sharing (x, y) take identical doublings, so by induction the
      // per-user weight table IS the per-(x, y) class-mass table. The
      // loop therefore iterates on the |distinct x|-row mass table
      // (wp = Σw over y=1 users at x, wn = over y=0), not the per-user
      // table: ONE data-scale pass (the base groupBy) instead of one
      // per round, no per-round localCheckpoint of corpus-sized state,
      // and the per-round argmin is a plain min(struct) aggregate
      // instead of a distributed-rank window. Oracle unchanged — it
      // unrolls the identical recurrence (wp/wn masses are what its
      // vals$r CTEs aggregate from the per-user w$r chain).
      var cur = Queries.pin(base.groupBy("x")
        .agg(sum(when(col("y") === 1, 1L).otherwise(0L)).cast("long").as("wp"),
          sum(when(col("y") === 0, 1L).otherwise(0L)).cast("long").as("wn")))
      val wsum = Window.orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val results = (1 to nRounds).map { r =>
        // running class masses stay on the distributed running-agg
        // operators (|distinct x| is value-domain-bounded but data-
        // dependent). Everything else collapses into ONE aggregate over
        // the swept rows: the OVER () totals are the running sums' last
        // values (wp/wn ≥ 0 ⇒ cwp/cwn nondecreasing ⇒ max = total), and
        // the (err, x) argmin decomposes per orientation — err1 =
        // (cwp−cwn) + twn and err0 = (cwn−cwp) + twp differ from their
        // orientation-local keys by a row-constant, so min(struct(d, x))
        // per orientation plus a final two-candidate compare reproduces
        // ORDER BY err, x LIMIT 1 exactly (ties: equal errs compare on
        // x; the per-row orient = err1 ≤ err0 falls out of comparing
        // the two candidates lexicographically).
        val swept = RewriteGlobalRankWindows.force(cur
          .withColumn("cwp", sum(col("wp")).over(wsum).cast("long"))
          .withColumn("cwn", sum(col("wn")).over(wsum).cast("long")))
        // ONE action per round: the stump is model-sized driver state
        // (the GraphOps-solver discipline), so the loop carries it as
        // literals instead of a broadcast-join of a pinned 1-row table
        val b = swept.agg(
            max(col("cwp")).as("twp"), max(col("cwn")).as("twn"),
            min(struct((col("cwp") - col("cwn")).as("d"), col("x"))).as("ma"),
            min(struct((col("cwn") - col("cwp")).as("d"), col("x"))).as("mb"))
          .select(
            (col("ma.d") + col("twn")).as("err1"), col("ma.x").as("t1"),
            (col("mb.d") + col("twp")).as("err0"), col("mb.x").as("t0"),
            (col("twp") + col("twn")).as("wtot"))
          .head()
        val (err1, t1, err0, t0, wtot) =
          (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3), b.getLong(4))
        val orient1 = err1 < err0 || (err1 == err0 && t1 <= t0)
        val (t, orient, err) =
          if (orient1) (t1, 1L, err1) else (t0, 0L, err0)
        // mass update = the per-user doubling folded over each (x, y)
        // class: orient 1 misclassifies positives at x ≤ t and
        // negatives at x > t; orient 0 the complements
        cur = cur.select(col("x"),
          when(if (orient1) col("x") <= t else col("x") > t,
            col("wp") * 2L).otherwise(col("wp")).as("wp"),
          when(if (orient1) col("x") > t else col("x") <= t,
            col("wn") * 2L).otherwise(col("wn")).as("wn"))
        (r.toLong, t, orient, err, wtot)
      }
      import s.implicits._
      results.toDF("round", "t", "orient", "err", "wtot").orderBy("round")
    },
    Some {
      def roundSql(r: Int): String =
        s"""vals$r AS (
           |  SELECT x,
           |    CAST(sum(CASE WHEN y = 1 THEN w ELSE 0 END) AS BIGINT) AS wp,
           |    CAST(sum(CASE WHEN y = 0 THEN w ELSE 0 END) AS BIGINT) AS wn
           |  FROM w${r - 1} GROUP BY x),
           |swept$r AS (
           |  SELECT x,
           |    CAST(sum(wp) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
           |      AND CURRENT ROW) AS BIGINT) AS cwp,
           |    CAST(sum(wn) OVER (ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING
           |      AND CURRENT ROW) AS BIGINT) AS cwn,
           |    CAST(sum(wp) OVER () AS BIGINT) AS twp,
           |    CAST(sum(wn) OVER () AS BIGINT) AS twn
           |  FROM vals$r),
           |best$r AS (
           |  SELECT x AS t,
           |    CAST(CASE WHEN cwp + twn - cwn <= twp - cwp + cwn THEN 1 ELSE 0 END
           |      AS BIGINT) AS orient,
           |    CAST(least(cwp + twn - cwn, twp - cwp + cwn) AS BIGINT) AS err,
           |    CAST(twp + twn AS BIGINT) AS wtot
           |  FROM swept$r
           |  ORDER BY least(cwp + twn - cwn, twp - cwp + cwn), x LIMIT 1),
           |w$r AS (
           |  SELECT u.user_id, u.x, u.y,
           |    u.w * CASE WHEN (CASE WHEN b.orient = 1
           |        THEN CASE WHEN u.x > b.t THEN 1 ELSE 0 END
           |        ELSE CASE WHEN u.x <= b.t THEN 1 ELSE 0 END END) <> u.y
           |      THEN 2 ELSE 1 END AS w
           |  FROM w${r - 1} u CROSS JOIN best$r b)""".stripMargin
      val rounds = (1 to nRounds).map(roundSql).mkString(",\n")
      val selects = (1 to nRounds)
        .map(r => s"SELECT CAST($r AS BIGINT) AS round, t, orient, err, wtot FROM best$r")
        .mkString("\nUNION ALL\n")
      s"""WITH w0 AS (
         |  SELECT user_id, CAST(count(*) AS BIGINT) AS x,
         |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS y,
         |    CAST(1 AS BIGINT) AS w
         |  FROM events GROUP BY user_id),
         |$rounds
         |$selects
         |ORDER BY round""".stripMargin
    })

  // ---------- shared kNN scaffold ----------

  private def neighborVotes(s: SparkSession, dir: String): DataFrame = {
    val e = t(s, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label").cast("long").as("label"),
        expr("aggregate(embedding, CAST(0.0 AS DOUBLE)," +
          " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))").as("n2"))
      .where(col("vec_id") >= 20)
    val probes = e.where(col("vec_id") < 120)
      .select(col("vec_id").as("pid"), col("embedding").as("pe"),
        col("label").as("plabel"), col("n2").as("pp"))
    // corpus side is one parquet row-group at this slice — unwidened,
    // the whole corpus×probes cosine fold runs in a single task (~1.9 s
    // measured); at real scale the scan is already many-partitioned
    val scored = e.repartition(s.sparkContext.defaultParallelism)
      .join(broadcast(probes), col("vec_id") =!= col("pid"))
      .withColumn("dot", expr("aggregate(zip_with(pe, embedding," +
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
        " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
      .withColumn("cos", round(col("dot") / (sqrt(col("pp")) * sqrt(col("n2"))), 4))
    val w = Window.partitionBy("pid").orderBy(col("cos").desc, col("vec_id"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 10)
      .select(col("pid"), col("plabel"), col("label").as("nlabel"))
  }

  private val neighborVotesSql =
    """e AS (
      |  SELECT vec_id, embedding, CAST(label AS BIGINT) AS label
      |  FROM embeddings WHERE vec_id >= 20),
      |dots AS (
      |  SELECT p.vec_id AS pid, p.label AS plabel,
      |    c.vec_id AS cid, c.label AS nlabel,
      |    sum(CAST(p.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) AS dot,
      |    sum(CAST(p.embedding[i] AS DOUBLE) * CAST(p.embedding[i] AS DOUBLE)) AS pp,
      |    sum(CAST(c.embedding[i] AS DOUBLE) * CAST(c.embedding[i] AS DOUBLE)) AS cc
      |  FROM e p, e c, generate_series(1, 64) t(i)
      |  WHERE p.vec_id < 120 AND c.vec_id <> p.vec_id
      |  GROUP BY 1, 2, 3, 4),
      |ranked AS (
      |  SELECT pid, plabel, nlabel,
      |    row_number() OVER (PARTITION BY pid
      |      ORDER BY round(dot / (sqrt(pp) * sqrt(cc)), 4) DESC, cid) AS rn
      |  FROM dots),
      |votes AS (SELECT pid, plabel, nlabel FROM ranked WHERE rn <= 10)""".stripMargin

  // ---------- q_label_noise ----------

  val qLabelNoise = QueryDef("q_label_noise",
    (s, dir) => neighborVotes(s, dir)
      .groupBy("pid", "plabel")
      .agg(sum(when(col("nlabel") =!= col("plabel"), 1L).otherwise(0L))
        .cast("long").as("n_disagree"))
      .select(col("pid"), col("plabel"), col("n_disagree"),
        when(col("n_disagree") >= 8L, 1L).otherwise(0L).as("suspect"))
      .orderBy("pid"),
    Some(
      s"""WITH $neighborVotesSql
         |SELECT pid, plabel,
         |  CAST(sum(CASE WHEN nlabel <> plabel THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_disagree,
         |  CAST(CASE WHEN sum(CASE WHEN nlabel <> plabel THEN 1 ELSE 0 END) >= 8
         |    THEN 1 ELSE 0 END AS BIGINT) AS suspect
         |FROM votes GROUP BY pid, plabel ORDER BY pid""".stripMargin))

  // ---------- q_uncertainty ----------

  val qUncertainty = QueryDef("q_uncertainty",
    // r16: route the global window(s) through the distributed rewrite
    (s, dir) => RewriteGlobalRankWindows.force {
      val counts = neighborVotes(s, dir)
        .groupBy("pid", "nlabel")
        .agg(count(lit(1)).cast("long").as("v"))
      val w = Window.partitionBy("pid").orderBy(col("v").desc, col("nlabel"))
      val top2 = counts.withColumn("vr", row_number().over(w))
        .where(col("vr") <= 2)
        .groupBy("pid")
        .agg(max(when(col("vr") === 1, col("v"))).as("v1"),
          coalesce(max(when(col("vr") === 2, col("v"))), lit(0L)).as("v2"),
          max(when(col("vr") === 1, col("nlabel"))).as("top_label"))
        .withColumn("margin", col("v1") - col("v2"))
      top2.withColumn("rank",
          row_number().over(Window.orderBy(col("margin"), col("pid"))).cast("long"))
        .where(col("rank") <= 20)
        .select(col("rank"), col("pid"), col("margin"),
          col("top_label").cast("long").as("top_label"))
        .orderBy("rank")
    },
    Some(
      s"""WITH $neighborVotesSql,
         |counts AS (
         |  SELECT pid, nlabel, CAST(count(*) AS BIGINT) AS v
         |  FROM votes GROUP BY 1, 2),
         |top2 AS (
         |  SELECT pid, nlabel, v,
         |    row_number() OVER (PARTITION BY pid ORDER BY v DESC, nlabel) AS vr
         |  FROM counts),
         |margins AS (
         |  SELECT pid,
         |    max(CASE WHEN vr = 1 THEN v END) AS v1,
         |    coalesce(max(CASE WHEN vr = 2 THEN v END), 0) AS v2,
         |    max(CASE WHEN vr = 1 THEN nlabel END) AS top_label
         |  FROM top2 WHERE vr <= 2 GROUP BY pid),
         |mranked AS (
         |  SELECT pid, v1 - v2 AS margin, top_label,
         |    CAST(row_number() OVER (ORDER BY v1 - v2, pid) AS BIGINT) AS rank
         |  FROM margins)
         |SELECT rank, pid, CAST(margin AS BIGINT) AS margin,
         |  CAST(top_label AS BIGINT) AS top_label
         |FROM mranked WHERE rank <= 20 ORDER BY rank""".stripMargin))

  val all: Seq[QueryDef] = Seq(qBoost, qLabelNoise, qUncertainty)
}
