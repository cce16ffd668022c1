package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Hundred-first wave — 3-sequences, distinctive terms, and weighted
  * medians.
  *
  *  - `q_gsp3`: 3-sequence support (the length-3 step of GSP/SPADE,
  *    extending q_seq_pairs): a user supports (t1 → t2 → t3) iff some
  *    t2 event falls STRICTLY between the user's first t1 and last t3
  *    — so support needs only the per-(user, type) extremes plus a
  *    windowed semi-join probe of the middle type's events, never a
  *    sequence materialization. 60 distinct-type triples, exact
  *    basis-point support, floor ≥ 2 users.
  *  - `q_log_odds`: Dirichlet-smoothed log-odds with variance
  *    ("Fightin' Words", Monroe/Colaresi/Quinn 2008) — the principled
  *    distinctive-term ranking between two source groups: per term
  *    δ = ln-odds difference under the global-count prior, z = δ over
  *    its estimated standard error, top-20 by |z| with deterministic
  *    ties. Exact integer counts; one shared ln/√ tree. What a corpus
  *    card should print instead of raw frequency ratios.
  *  - `q_weighted_median`: the exact WEIGHTED lower median of order
  *    value per nation, weighted by the order's lineitem count — the
  *    first rank where twice the cumulative weight reaches the total
  *    (per-nation windows, bounded groups). q_median_disc medians
  *    rows; real revenue questions weight them.
  */
object R101Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_gsp3 ----------

  private val minSupport3 = 2L

  val qGsp3 = QueryDef("q_gsp3",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("ty"),
          unix_micros(col("ts")).as("us"))
      val ext = ev.groupBy("user_id", "ty")
        .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
      val nUsers = ev.select("user_id").distinct()
        .agg(count(lit(1)).cast("long").as("n_users"))
      val frames = ext.as("a").join(ext.as("c"),
          col("a.user_id") === col("c.user_id") && col("a.ty") =!= col("c.ty") &&
            col("a.first_us") < col("c.last_us"))
        .select(col("a.user_id").as("user_id"), col("a.ty").as("t1"),
          col("c.ty").as("t3"), col("a.first_us").as("lo"),
          col("c.last_us").as("hi"))
      val mids = ev.select(col("user_id"), col("ty").as("t2"), col("us"))
      val sup = frames.join(mids,
          Seq("user_id"), "inner")
        .where(col("t2") =!= col("t1") && col("t2") =!= col("t3") &&
          col("us") > col("lo") && col("us") < col("hi"))
        .select(col("user_id"), col("t1"), col("t2"), col("t3"))
        .distinct()
        .groupBy("t1", "t2", "t3")
        .agg(count(lit(1)).cast("long").as("support"))
        .where(col("support") >= minSupport3)
      sup.crossJoin(broadcast(nUsers))
        .select(col("t1"), col("t2"), col("t3"), col("support"),
          ((col("support") * 10000L - (col("support") * 10000L) % col("n_users"))
            / col("n_users")).cast("long").as("support_bp"))
        .orderBy("t1", "t2", "t3")
    },
    Some(
      s"""WITH ev AS (
         |  SELECT user_id, event_type AS ty, epoch_us(ts) AS us FROM events),
         |ext AS (
         |  SELECT user_id, ty, min(us) AS first_us, max(us) AS last_us
         |  FROM ev GROUP BY 1, 2),
         |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ev),
         |frames AS (
         |  SELECT a.user_id, a.ty AS t1, c.ty AS t3,
         |    a.first_us AS lo, c.last_us AS hi
         |  FROM ext a JOIN ext c ON a.user_id = c.user_id AND a.ty <> c.ty
         |    AND a.first_us < c.last_us),
         |sup AS (
         |  SELECT t1, t2, t3, CAST(count(*) AS BIGINT) AS support FROM (
         |    SELECT DISTINCT f.user_id, f.t1, m.ty AS t2, f.t3
         |    FROM frames f JOIN ev m ON m.user_id = f.user_id
         |    WHERE m.ty <> f.t1 AND m.ty <> f.t3
         |      AND m.us > f.lo AND m.us < f.hi)
         |  GROUP BY 1, 2, 3)
         |SELECT t1, t2, t3, support,
         |  CAST((support * 10000 - (support * 10000) % n_users) / n_users AS BIGINT)
         |    AS support_bp
         |FROM sup CROSS JOIN nu
         |WHERE support >= $minSupport3
         |ORDER BY t1, t2, t3""".stripMargin))

  // ---------- q_log_odds ----------

  val qLogOdds = QueryDef("q_log_odds",
    (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(expr("CAST(CAST(substr(source, 4) AS BIGINT) % 2 AS BIGINT)")
          .as("grp"),
          explode(split(col("text"), " ")).as("term"))
      val counts = toks.groupBy("term")
        .agg(sum(when(col("grp") === 0, 1L).otherwise(0L)).cast("long").as("y1"),
          sum(when(col("grp") === 1, 1L).otherwise(0L)).cast("long").as("y2"))
      val tot = counts.agg(sum(col("y1")).cast("long").as("n1"),
        sum(col("y2")).cast("long").as("n2"),
        sum(col("y1") + col("y2")).cast("long").as("a0"))
      val zExpr =
        "(ln((CAST(y1 AS DOUBLE) + CAST(y1 + y2 AS DOUBLE))" +
          " / (CAST(n1 AS DOUBLE) + CAST(a0 AS DOUBLE) - CAST(y1 AS DOUBLE) - CAST(y1 + y2 AS DOUBLE)))" +
          " - ln((CAST(y2 AS DOUBLE) + CAST(y1 + y2 AS DOUBLE))" +
          " / (CAST(n2 AS DOUBLE) + CAST(a0 AS DOUBLE) - CAST(y2 AS DOUBLE) - CAST(y1 + y2 AS DOUBLE))))" +
          " / sqrt(1.0 / (CAST(y1 AS DOUBLE) + CAST(y1 + y2 AS DOUBLE))" +
          " + 1.0 / (CAST(y2 AS DOUBLE) + CAST(y1 + y2 AS DOUBLE)))"
      val scored = counts.crossJoin(broadcast(tot))
        .withColumn("z", expr(zExpr))
      scored.orderBy(abs(col("z")).desc, col("term")).limit(20)
        .select(col("term"), col("y1"), col("y2"), round(col("z"), 4).as("z"))
        .orderBy(col("term"))
    },
    Some(
      """WITH toks AS (
        |  SELECT CAST(CAST(substr(source, 4) AS BIGINT) % 2 AS BIGINT) AS grp,
        |    unnest(string_split(text, ' ')) AS term
        |  FROM documents),
        |counts AS (
        |  SELECT term,
        |    CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS y1,
        |    CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS y2
        |  FROM toks GROUP BY term),
        |tot AS (
        |  SELECT CAST(sum(y1) AS BIGINT) AS n1, CAST(sum(y2) AS BIGINT) AS n2,
        |    CAST(sum(y1 + y2) AS BIGINT) AS a0
        |  FROM counts),
        |scored AS (
        |  SELECT term, y1, y2,
        |    (ln((CAST(y1 AS DOUBLE) + CAST(y1 + y2 AS DOUBLE))
        |      / (CAST(n1 AS DOUBLE) + CAST(a0 AS DOUBLE) - CAST(y1 AS DOUBLE) - CAST(y1 + y2 AS DOUBLE)))
        |    - ln((CAST(y2 AS DOUBLE) + CAST(y1 + y2 AS DOUBLE))
        |      / (CAST(n2 AS DOUBLE) + CAST(a0 AS DOUBLE) - CAST(y2 AS DOUBLE) - CAST(y1 + y2 AS DOUBLE))))
        |    / sqrt(1.0 / (CAST(y1 AS DOUBLE) + CAST(y1 + y2 AS DOUBLE))
        |      + 1.0 / (CAST(y2 AS DOUBLE) + CAST(y1 + y2 AS DOUBLE))) AS z
        |  FROM counts CROSS JOIN tot),
        |top AS (
        |  SELECT term, y1, y2, z,
        |    row_number() OVER (ORDER BY abs(z) DESC, term) AS rk
        |  FROM scored)
        |SELECT term, y1, y2, round(z, 4) AS z
        |FROM top WHERE rk <= 20
        |ORDER BY term""".stripMargin))

  // ---------- q_weighted_median ----------

  val qWeightedMedian = QueryDef("q_weighted_median",
    (s, dir) => {
      val li = t(s, dir, "lineitem").groupBy(col("l_orderkey").as("ok"))
        .agg(count(lit(1)).cast("long").as("wgt"))
      val orders = t(s, dir, "orders")
        .select(col("o_orderkey").as("ok"), col("o_custkey"),
          expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("cents"))
        .join(li, "ok")
        .join(t(s, dir, "customer"),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_nationkey").cast("long").as("nat"), col("cents"),
          col("wgt"), col("ok"))
      val w = Window.partitionBy("nat").orderBy("cents", "ok")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wn = Window.partitionBy("nat")
      val swept = orders
        .withColumn("cw", sum(col("wgt")).over(w).cast("long"))
        .withColumn("tw", sum(col("wgt")).over(wn).cast("long"))
        // lower weighted median: first value where 2·cumweight ≥ total
        .where(col("cw") * 2L >= col("tw"))
      val wk = Window.partitionBy("nat").orderBy("cents", "ok")
      swept.withColumn("rk", row_number().over(wk))
        .where(col("rk") === 1)
        .select(col("nat"), col("tw").as("total_weight"),
          col("cents").as("wmedian_c"))
        .orderBy("nat")
    },
    Some(
      """WITH li AS (
        |  SELECT l_orderkey AS ok, CAST(count(*) AS BIGINT) AS wgt
        |  FROM lineitem GROUP BY 1),
        |orders0 AS (
        |  SELECT CAST(c_nationkey AS BIGINT) AS nat,
        |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents, wgt, ok
        |  FROM orders JOIN li ON ok = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey),
        |swept AS (
        |  SELECT nat, cents, ok,
        |    CAST(sum(wgt) OVER (PARTITION BY nat ORDER BY cents, ok
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cw,
        |    CAST(sum(wgt) OVER (PARTITION BY nat) AS BIGINT) AS tw
        |  FROM orders0),
        |hits AS (
        |  SELECT nat, tw, cents,
        |    row_number() OVER (PARTITION BY nat ORDER BY cents, ok) AS rk
        |  FROM swept WHERE cw * 2 >= tw)
        |SELECT nat, tw AS total_weight, cents AS wmedian_c
        |FROM hits WHERE rk = 1
        |ORDER BY nat""".stripMargin))

  val all: Seq[QueryDef] = Seq(qGsp3, qLogOdds, qWeightedMedian)
}
