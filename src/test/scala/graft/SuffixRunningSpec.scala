package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rules.RewriteGlobalRankWindows

/** Suffix-running windows (r14): `agg(e) OVER (... ORDER BY o
  * ROWS|RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)` rewrites
  * as the MIRRORED running family under exact order reversal
  * (ASC NULLS FIRST <-> DESC NULLS LAST), with First<->Last swapped
  * because the mirror preserves frame CONTENT but inverts frame ORDER.
  * Differentially pinned against WindowExec in both tiers, on ties,
  * nulls, DESC original orders, and mixed nodes; in-cap ROWS
  * offset-start suffix frames mirror onto the delayed/extended
  * composition (DelayedRunningSpec), over-cap ones keep WindowExec. */
class SuffixRunningSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def noAqePlan(df: DataFrame) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def same(windowed: DataFrame, skew: Boolean, tag: String): Unit = {
    val forced = if (skew) RewriteGlobalRankWindows.forceSkew(windowed)
                 else RewriteGlobalRankWindows.force(windowed)
    assert(forced.schema == windowed.schema, tag)
    assert(RowMultiset.of(forced) == RowMultiset.of(windowed), tag)
    val p = noAqePlan(forced)
    assert(p.collect { case w: WindowExec => w }.isEmpty,
      s"$tag kept WindowExec:\n$p")
  }

  private def df = spark.range(1500)
    .select(
      when(col("id") % 2 === 0, lit(-1L)).otherwise(col("id") % 13).as("k"),
      (col("id") * 17L % 211L).as("v"),
      col("id"),
      when(col("id") % 5 === 0, lit(null)).otherwise(col("id") % 37).as("x"))
    .repartition(7)

  test("global suffix ROWS: sum/count/min/avg/last == built-in on a total order") {
    val w = Window.orderBy(col("v"), col("id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    same(df.select(col("v"), col("id"), col("x"),
      sum("x").over(w).as("ss"), count(col("x")).over(w).as("sc"),
      min("x").over(w).as("sm"), avg("x").over(w).as("sa"),
      last("x").over(w).as("sl"), first("x").over(w).as("sf")),
      skew = false, "global-suffix-rows")
  }

  test("global suffix RANGE: tie groups included whole on both sides") {
    // coarse axis: nearly every key is a tie group
    val w = Window.orderBy(col("v") % 5)
      .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    same(df.select((col("v") % 5).as("vb"), col("x"),
      sum("x").over(w).as("ss"), count(lit(1)).over(w).as("sn")),
      skew = false, "global-suffix-range")
  }

  test("global suffix over a DESC NULLS LAST order (double reversal)") {
    val dfn = spark.range(600)
      .select(when(col("id") % 7 === 0, lit(null))
        .otherwise(col("id") * 3L % 101L).as("v"),
        col("id"), (col("id") % 19).as("x"))
    val w = Window.orderBy(col("v").desc_nulls_last, col("id"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    same(dfn.select(col("v"), col("id"), col("x"),
      sum("x").over(w).as("ss"), last("x").over(w).as("sl")),
      skew = false, "global-suffix-desc")
  }

  test("mixed node: suffix members stack over prefix/rank members, one pass each") {
    val wt = Window.orderBy(col("v"), col("id"))
    val wPre = wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wSuf = wt.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    same(df.select(col("v"), col("id"), col("x"),
      row_number().over(wt).as("rn"),
      sum("x").over(wPre).as("pre"),
      sum("x").over(wSuf).as("suf"),
      count(col("x")).over(wSuf).as("sufn")),
      skew = false, "global-mixed")
  }

  test("per-key suffix frames under a hot key (skew tier)") {
    val wt = Window.partitionBy("k").orderBy(col("v"), col("id"))
    val wSuf = wt.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    same(df.select(col("k"), col("v"), col("id"), col("x"),
      sum("x").over(wSuf).as("ss"), min("x").over(wSuf).as("sm"),
      last("x").over(wSuf).as("sl"),
      row_number().over(wt).as("rn")),
      skew = true, "skew-suffix")
    val wr = Window.partitionBy("k").orderBy(col("v") % 4)
      .rangeBetween(Window.currentRow, Window.unboundedFollowing)
    same(df.select(col("k"), (col("v") % 4).as("vb"), col("x"),
      sum("x").over(wr).as("ss"), count(lit(1)).over(wr).as("sn")),
      skew = true, "skew-suffix-range")
  }

  test("share-of-remaining composes: suffix sum / whole-frame total") {
    val wt = Window.orderBy(col("v"), col("id"))
    val wSuf = wt.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    same(df.select(col("v"), col("id"), col("x"),
      (sum("x").over(wSuf) * lit(1000) / sum("x").over(Window.partitionBy()))
        .cast("long").as("share_rem")),
      skew = false, "share-of-remaining")
  }

  test("over-cap offset suffix starts stay on WindowExec") {
    // in-cap offset starts route since late r14 (the mirror lands on
    // the delayed/extended composition — DelayedRunningSpec); an
    // over-cap offset still refuses on both sides of the mirror
    spark.range(100).select(col("id").as("v"), (col("id") % 7).as("x"))
      .createOrReplaceTempView("sfx_nr")
    val p = noAqePlan(RewriteGlobalRankWindows.force(spark.sql(
      """SELECT v, sum(x) OVER (ORDER BY v ROWS BETWEEN 5000 PRECEDING
        |AND UNBOUNDED FOLLOWING) AS s FROM sfx_nr""".stripMargin)))
    assert(p.collect { case w: WindowExec => w }.size == 1, p.toString)
  }
}
