package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rules.RewriteGlobalRankWindows

/** Delayed/extended running windows (r14): `agg(e) OVER (ORDER BY o
  * ROWS BETWEEN UNBOUNDED PRECEDING AND k PRECEDING|FOLLOWING)`
  * composes from already-distributed members on one shared exchange —
  * `lag(running, k, empty-frame-value)` for the delayed end,
  * `IF(rn + k > N, whole-frame, lead(running, k))` for the extended
  * end. Differential against WindowExec: empty frames at the head
  * (lag default = the aggregate's own init eval: 0 for count, NULL
  * otherwise), saturation at the tail, nulls in the input, First/Last
  * (delayed First/Last is the running First/Last at the shifted row),
  * mixed nodes, and both tiers. */
class DelayedRunningSpec extends AnyFunSuite {
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

  private def df = spark.range(1200)
    .select(
      when(col("id") % 2 === 0, lit(-1L)).otherwise(col("id") % 11).as("k"),
      (col("id") * 13L % 307L).as("v"), col("id"),
      when(col("id") % 4 === 0, lit(null)).otherwise(col("id") % 29).as("x"))
    .repartition(7)

  test("global delayed end (k PRECEDING): lag-of-running with empty-frame defaults") {
    val wt = Window.orderBy(col("v"), col("id"))
    val w2 = wt.rowsBetween(Window.unboundedPreceding, -2)
    val w5 = wt.rowsBetween(Window.unboundedPreceding, -5)
    same(df.select(col("v"), col("id"), col("x"),
      sum("x").over(w2).as("s2"), count(col("x")).over(w2).as("c2"),
      min("x").over(w5).as("m5"), avg("x").over(w2).as("a2"),
      first("x").over(w2).as("f2"), last("x").over(w2).as("l2")),
      skew = false, "global-delayed")
  }

  test("global extended end (k FOLLOWING): lead-of-running saturating at the tail") {
    val wt = Window.orderBy(col("v"), col("id"))
    val w3 = wt.rowsBetween(Window.unboundedPreceding, 3)
    val w7 = wt.rowsBetween(Window.unboundedPreceding, 7)
    same(df.select(col("v"), col("id"), col("x"),
      sum("x").over(w3).as("s3"), count(col("x")).over(w3).as("c3"),
      max("x").over(w7).as("m7"), last("x").over(w3).as("l3")),
      skew = false, "global-extended")
  }

  test("mixed node: delayed + extended + running + rank + whole-frame together") {
    val wt = Window.orderBy(col("v"), col("id"))
    same(df.select(col("v"), col("id"), col("x"),
      sum("x").over(wt.rowsBetween(Window.unboundedPreceding, -1)).as("d1"),
      sum("x").over(wt.rowsBetween(Window.unboundedPreceding, 2)).as("e2"),
      sum("x").over(wt.rowsBetween(Window.unboundedPreceding,
        Window.currentRow)).as("run"),
      row_number().over(wt).as("rn"),
      sum("x").over(Window.partitionBy()).as("tot")),
      skew = false, "global-mixed")
  }

  test("per-key delayed/extended ends under a hot key (skew tier)") {
    val wt = Window.partitionBy("k").orderBy(col("v"), col("id"))
    same(df.select(col("k"), col("v"), col("id"), col("x"),
      sum("x").over(wt.rowsBetween(Window.unboundedPreceding, -2)).as("d2"),
      count(col("x")).over(wt.rowsBetween(Window.unboundedPreceding, -2))
        .as("dc2"),
      sum("x").over(wt.rowsBetween(Window.unboundedPreceding, 3)).as("e3"),
      last("x").over(wt.rowsBetween(Window.unboundedPreceding, -1)).as("dl1")),
      skew = true, "skew-delayed")
  }

  test("tiny groups: frames empty or saturated almost everywhere") {
    val tiny = spark.range(300)
      .select((col("id") / 3).as("k"), (col("id") % 9).as("v"), col("id"),
        (col("id") % 5).as("x"))
      .repartition(11)
    val wt = Window.partitionBy("k").orderBy(col("v"), col("id"))
    same(tiny.select(col("k"), col("v"), col("id"), col("x"),
      sum("x").over(wt.rowsBetween(Window.unboundedPreceding, -2)).as("d"),
      count(lit(1)).over(wt.rowsBetween(Window.unboundedPreceding, 2)).as("e")),
      skew = true, "skew-tiny")
  }

  test("mirrored offset suffix starts: k PRECEDING/FOLLOWING .. UNBOUNDED FOLLOWING") {
    val wt = Window.orderBy(col("v"), col("id"))
    same(df.select(col("v"), col("id"), col("x"),
      sum("x").over(wt.rowsBetween(-2, Window.unboundedFollowing)).as("sp2"),
      count(col("x")).over(wt.rowsBetween(1, Window.unboundedFollowing))
        .as("sf1")),
      skew = false, "global-offset-suffix")
  }

  test("over-cap offsets keep WindowExec") {
    spark.range(100).select(col("id").as("v"), (col("id") % 7).as("x"))
      .createOrReplaceTempView("dly_nr")
    val p = noAqePlan(RewriteGlobalRankWindows.force(spark.sql(
      """SELECT v, sum(x) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
        |AND 5000 PRECEDING) AS s FROM dly_nr""".stripMargin)))
    assert(p.collect { case w: WindowExec => w }.size == 1, p.toString)
  }
}
