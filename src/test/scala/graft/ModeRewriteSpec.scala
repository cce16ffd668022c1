package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rules.RewriteGlobalRankWindows

/** Distributed whole-frame `mode()` (r14, VERDICT r13 task 4) — the
  * retirable half of the unbounded-buffer window refusal: `mode(e)
  * OVER ()` / `OVER (PARTITION BY k)` is order-insensitive and equals
  * argmax-of-value-counts, so the rewrite replaces the per-value
  * hash-map buffer with map-side-combined counts → a struct-extreme
  * argmax → a broadcast/equi-join back. `collect_list` stays refused:
  * its value is order-DEFINED.
  *
  * Tie semantics under test: `mode() WITHIN GROUP (ORDER BY v)`
  * carries a deterministic tie-break in the built-in and the rewrite
  * must match it bit-for-bit; plain `mode(e)` is tie-nondeterministic
  * in the built-in (hash-map iteration order), so equality is pinned
  * on tie-FREE fixtures and the deterministic-refinement choice on tie
  * fixtures is pinned against the WITHIN GROUP built-in instead. */
class ModeRewriteSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def noAqePlan(df: DataFrame) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def assertNoWindow(df: DataFrame): Unit = {
    val p = noAqePlan(df)
    assert(p.collect { case w: WindowExec => w }.isEmpty, p.toString)
  }

  test("global mode() OVER (): tie-free fixture == built-in, zero WindowExec") {
    // value 3 appears strictly most often — no ties anywhere
    spark.range(300)
      .select((col("id") % 7).as("v"), col("id").as("x"))
      .union(spark.range(50).select(lit(3L).as("v"), col("id").as("x")))
      .repartition(8)
      .createOrReplaceTempView("mode_g")
    val windowed = spark.sql(
      "SELECT v, x, mode(v) OVER () AS m FROM mode_g")
    val forced = RewriteGlobalRankWindows.force(windowed)
    assert(forced.schema == windowed.schema)
    assert(RowMultiset.of(forced) == RowMultiset.of(windowed))
    assertNoWindow(forced)
  }

  test("global mode() WITHIN GROUP: tie fixtures match the built-in's direction exactly") {
    // values {0,2,3,6} all tie at 10 occurrences; ASC must pick 0, DESC 6
    spark.range(40)
      .select((col("id") % 4 * 3 % 7).as("v"))
      .createOrReplaceTempView("mode_tie")
    for (dir <- Seq("ASC", "DESC")) {
      val windowed = spark.sql(
        s"SELECT v, mode() WITHIN GROUP (ORDER BY v $dir) OVER () AS m FROM mode_tie")
      val forced = RewriteGlobalRankWindows.force(windowed)
      assert(RowMultiset.of(forced) == RowMultiset.of(windowed), dir)
      assertNoWindow(forced)
    }
  }

  test("plain mode() tie-break is the deterministic refinement: first in ascending order") {
    spark.range(40).select((col("id") % 4 * 3 % 7).as("v"))
      .createOrReplaceTempView("mode_tie2")
    val forced = RewriteGlobalRankWindows.force(spark.sql(
      "SELECT v, mode(v) OVER () AS m FROM mode_tie2"))
    val oracle = spark.sql(
      "SELECT v, mode() WITHIN GROUP (ORDER BY v ASC) OVER () AS m FROM mode_tie2")
    assert(RowMultiset.of(forced) == RowMultiset.of(oracle))
  }

  test("global mode(): all-NULL input and empty input both yield NULL / no rows") {
    spark.range(20).select(lit(null).cast("long").as("v"))
      .createOrReplaceTempView("mode_null")
    val windowed = spark.sql("SELECT v, mode(v) OVER () AS m FROM mode_null")
    val forced = RewriteGlobalRankWindows.force(windowed)
    assert(RowMultiset.of(forced) == RowMultiset.of(windowed))
    spark.range(20).where(col("id") < 0)
      .select(col("id").as("v")).createOrReplaceTempView("mode_empty")
    val we = spark.sql("SELECT v, mode(v) OVER () AS m FROM mode_empty")
    val fe = RewriteGlobalRankWindows.force(we)
    assert(fe.count() == 0L && we.count() == 0L)
  }

  test("global mode() stacks with other whole-frame members in one window node") {
    spark.range(200)
      .select((col("id") % 5).as("v"), (col("id") % 11).as("x"))
      .union(spark.range(30).select(lit(2L).as("v"), lit(1L).as("x")))
      .createOrReplaceTempView("mode_mix")
    val windowed = spark.sql(
      """SELECT v, x, mode(v) OVER () AS m, sum(x) OVER () AS s,
        |count(*) OVER () AS n FROM mode_mix""".stripMargin)
    val forced = RewriteGlobalRankWindows.force(windowed)
    assert(RowMultiset.of(forced) == RowMultiset.of(windowed))
    assertNoWindow(forced)
  }

  test("per-key mode(v) OVER (PARTITION BY k): hot key, nulls, tie-free == built-in") {
    // key -1 holds half the corpus (the skew shape); per-key modes are
    // STRICTLY tie-free (v=7 on 3/4 of rows dwarfs every id%5 value
    // even after the null punch); some keys are all-NULL in v and must
    // surface NULL mode, not vanish
    spark.range(2000)
      .select(when(col("id") % 2 === 0, lit(-1L))
        .otherwise(col("id") % 13).as("k"),
        when(col("id") % 13 === 7, lit(null))
          .otherwise(when(col("id") % 4 =!= 3, lit(7L))
            .otherwise(col("id") % 5)).as("v"),
        col("id").as("x"))
      .union(spark.range(10).select(lit(99L).as("k"),
        lit(null).cast("long").as("v"), col("id").as("x")))
      .repartition(8)
      .createOrReplaceTempView("mode_k")
    val windowed = spark.sql(
      "SELECT k, v, x, mode(v) OVER (PARTITION BY k) AS m FROM mode_k")
    val forced = RewriteGlobalRankWindows.forceSkew(windowed)
    assert(forced.schema == windowed.schema)
    assert(RowMultiset.of(forced) == RowMultiset.of(windowed))
    assertNoWindow(forced)
  }

  test("per-key mode mixes with plain whole-frame aggregates; NULL keys group together") {
    spark.range(1200)
      .select(when(col("id") % 7 === 0, lit(null)).otherwise(col("id") % 6).as("k"),
        (col("id") % 4).as("v"), (col("id") % 17).as("x"))
      .union(spark.range(40).select(lit(2L).as("k"), lit(3L).as("v"),
        lit(0L).as("x")))
      .repartition(6)
      .createOrReplaceTempView("mode_k2")
    val windowed = spark.sql(
      """SELECT k, v, x, mode(v) OVER (PARTITION BY k) AS m,
        |sum(x) OVER (PARTITION BY k) AS s,
        |avg(x) OVER (PARTITION BY k) AS a FROM mode_k2""".stripMargin)
    val forced = RewriteGlobalRankWindows.forceSkew(windowed)
    assert(RowMultiset.of(forced) == RowMultiset.of(windowed))
    assertNoWindow(forced)
  }

  test("per-key mode() WITHIN GROUP tie directions match the built-in") {
    spark.range(400)
      .select((col("id") % 3).as("k"), (col("id") % 4 * 3 % 7).as("v"))
      .createOrReplaceTempView("mode_ktie")
    for (dir <- Seq("ASC", "DESC")) {
      val windowed = spark.sql(
        s"""SELECT k, v, mode() WITHIN GROUP (ORDER BY v $dir)
           |OVER (PARTITION BY k) AS m FROM mode_ktie""".stripMargin)
      val forced = RewriteGlobalRankWindows.forceSkew(windowed)
      assert(RowMultiset.of(forced) == RowMultiset.of(windowed), dir)
      assertNoWindow(forced)
    }
  }

  test("collect_list stays refused (order-defined): WindowExec kept") {
    spark.range(50).select((col("id") % 5).as("k"), col("id").as("x"))
      .createOrReplaceTempView("mode_cl")
    val windowed = spark.sql(
      "SELECT k, collect_list(x) OVER (PARTITION BY k) AS l FROM mode_cl")
    val p = noAqePlan(RewriteGlobalRankWindows.forceSkew(windowed))
    assert(p.collect { case w: WindowExec => w }.size == 1, p.toString)
  }

  test("non-deterministic child declines the rewrite: WindowExec kept (ADVICE r14 #1)") {
    // the mode join-back (and every two-pass operator) re-executes the
    // child plan, so a rand()-filtered child would be evaluated over a
    // DIFFERENT row set per execution — admission must bail, leaving
    // the built-in WindowExec (one materialization) in place
    spark.range(200).select((col("id") % 5).as("k"), col("id").as("x"))
      .createOrReplaceTempView("mode_nd")
    val ndGlobal = spark.sql(
      "SELECT x, mode(x) OVER () AS m FROM mode_nd WHERE rand(7) < 0.5")
    val pg = noAqePlan(RewriteGlobalRankWindows.force(ndGlobal))
    assert(pg.collect { case w: WindowExec => w }.size == 1, pg.toString)
    val ndRank = spark.sql(
      "SELECT x, row_number() OVER (ORDER BY x) AS r FROM mode_nd WHERE rand(7) < 0.5")
    val pr = noAqePlan(RewriteGlobalRankWindows.force(ndRank))
    assert(pr.collect { case w: WindowExec => w }.size == 1, pr.toString)
    val ndSkew = spark.sql(
      "SELECT k, x, mode(x) OVER (PARTITION BY k) AS m FROM mode_nd WHERE rand(7) < 0.5")
    val ps = noAqePlan(RewriteGlobalRankWindows.forceSkew(ndSkew))
    assert(ps.collect { case w: WindowExec => w }.size == 1, ps.toString)
  }
}
