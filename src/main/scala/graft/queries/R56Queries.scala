package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Fifty-sixth wave — collaborative filtering and the gains chart.
  *
  *  - `q_item_cf`: item-item collaborative filtering over the
  *    customer×brand purchase matrix — cosine similarity from integer
  *    co-purchase counts (dot = customers buying BOTH, norms =
  *    customers per brand): the classic "customers who bought X also
  *    bought Y" scorer. The similarity differs from q_assoc_rules'
  *    lift: cosine normalizes by popularity symmetrically. Counts are
  *    exact integers; ONE sqrt-product division per pair, round(4).
  *  - `q_lift_curve`: cumulative gains at population deciles for the
  *    pseudo-probability classifier (q_ece_calibration's setup) — the
  *    "top 10% of scores captures X% of positives" chart that sells a
  *    data-quality filter; decile edges from exact rank arithmetic on
  *    the &#124;distinct scores&#124; aggregate, gains and lift in
  *    exact basis points.
  *
  * Scale design: the CF dot products ride the brand-pair aggregate of
  * a per-customer self-join (fanout = brands per customer, bounded);
  * norms are &#124;brands&#124;-sized broadcasts. The gains curve is
  * the per-score count aggregate + running windows over it.
  */
object R56Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_item_cf ----------

  private val CfMinPairs = 150

  val qItemCf = QueryDef("q_item_cf",
    (s, dir) => {
      val cb = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
        .select(col("o_custkey").as("cust"), col("p_brand").as("br"))
        .distinct()
      val norms = cb.groupBy("br").agg(count(lit(1)).cast("long").as("nc"))
      // the per-customer brand-pair fan-out is the CPU-dense stage, and
      // AQE size-coalesces the bytes-small distinct feeding it to a few
      // partitions. Hash both sides by cust at the session's core count:
      // the self-join is then exchange-free AND wide, and the pair
      // groupBy's map-side partials run in the same width.
      val cbW = cb.repartition(s.sparkContext.defaultParallelism, col("cust"))
      val a = cbW.select(col("cust"), col("br").as("ba"))
      val b = cbW.select(col("cust"), col("br").as("bb"))
      a.join(b, "cust").where(col("ba") < col("bb"))
        .groupBy("ba", "bb").agg(count(lit(1)).cast("long").as("nboth"))
        .where(col("nboth") >= CfMinPairs)
        .join(broadcast(norms.select(col("br").as("ba"), col("nc").as("na"))), "ba")
        .join(broadcast(norms.select(col("br").as("bb"), col("nc").as("nb"))), "bb")
        .selectExpr("ba", "bb", "nboth", "na", "nb",
          "round(CAST(nboth AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 4) AS cos_sim")
        .orderBy(col("cos_sim").desc, col("ba"), col("bb"))
        .limit(40)
    },
    Some(
      s"""WITH cb AS (SELECT DISTINCT o_custkey AS cust, p_brand AS br
         |  FROM lineitem
         |  JOIN part ON l_partkey = p_partkey
         |  JOIN orders ON l_orderkey = o_orderkey),
         |norms AS (SELECT br, CAST(count(*) AS BIGINT) AS nc FROM cb GROUP BY 1),
         |pairs AS (SELECT a.br AS ba, b.br AS bb, CAST(count(*) AS BIGINT) AS nboth
         |  FROM cb a JOIN cb b ON a.cust = b.cust AND a.br < b.br
         |  GROUP BY 1, 2 HAVING count(*) >= $CfMinPairs)
         |SELECT ba, bb, nboth, x.nc AS na, y.nc AS nb,
         |  round(CAST(nboth AS DOUBLE) / sqrt(CAST(x.nc AS DOUBLE) * CAST(y.nc AS DOUBLE)), 4) AS cos_sim
         |FROM pairs JOIN norms x ON x.br = ba JOIN norms y ON y.br = bb
         |ORDER BY cos_sim DESC, ba, bb LIMIT 40""".stripMargin))

  // ---------- q_lift_curve ----------

  val qLiftCurve = QueryDef("q_lift_curve",
    (s, dir) => RewriteGlobalRankWindows.force {
      val ev = t(s, dir, "events").select(
        expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"),
        when(col("event_type") === "purchase", 1L).otherwise(0L).as("label"))
      val g = ev.groupBy("cents").agg(count(lit(1)).cast("long").as("c"),
        sum(col("label")).as("pos"))
      // ranked by score DESC: the "take the top X%" direction
      val wDesc = Window.orderBy(col("cents").desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      val wAll = Window.partitionBy(lit(1))
      val cum = g
        .withColumn("cum_c", sum(col("c")).over(wDesc))
        .withColumn("cum_pos", sum(col("pos")).over(wDesc))
        .withColumn("n", sum(col("c")).over(wAll).cast("long"))
        .withColumn("np", sum(col("pos")).over(wAll).cast("long"))
        .withColumn("decile", expr("((cum_c - c) * 10) div n"))
      cum.groupBy("decile")
        .agg(max(col("cum_c")).as("cum_c"), max(col("cum_pos")).as("cum_pos"),
          max(col("n")).as("n"), max(col("np")).as("np"))
        .selectExpr("decile",
          "CAST(cum_c AS BIGINT) AS cum_rows",
          "CAST(cum_pos AS BIGINT) AS cum_pos",
          "(cum_pos * 10000) div np AS gain_bp",
          "((cum_pos * n) * 10000) div (np * cum_c) AS lift_bp")
        .orderBy("decile")
    },
    Some(
      """WITH ev AS (SELECT CAST(round(value * 100.0) AS BIGINT) AS cents,
        |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS label
        |  FROM events),
        |g AS (SELECT cents, CAST(count(*) AS BIGINT) AS c,
        |        CAST(sum(label) AS BIGINT) AS pos
        |      FROM ev GROUP BY 1),
        |cum AS (SELECT c,
        |    CAST(sum(c) OVER (ORDER BY cents DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_c,
        |    CAST(sum(pos) OVER (ORDER BY cents DESC
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_pos,
        |    CAST(sum(c) OVER () AS BIGINT) AS n,
        |    CAST(sum(pos) OVER () AS BIGINT) AS np
        |  FROM g),
        |binned AS (SELECT ((cum_c - c) * 10) // n AS decile,
        |    max(cum_c) AS cum_c, max(cum_pos) AS cum_pos,
        |    max(n) AS n, max(np) AS np
        |  FROM cum GROUP BY 1)
        |SELECT decile, CAST(cum_c AS BIGINT) AS cum_rows,
        |  CAST(cum_pos AS BIGINT) AS cum_pos,
        |  (cum_pos * 10000) // np AS gain_bp,
        |  ((cum_pos * n) * 10000) // (np * cum_c) AS lift_bp
        |FROM binned ORDER BY decile""".stripMargin))

  val all: Seq[QueryDef] = Seq(qItemCf, qLiftCurve)
}
