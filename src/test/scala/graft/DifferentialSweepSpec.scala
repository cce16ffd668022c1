package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rules.RewriteGlobalRankWindows

/** The operator × hazard MATRIX sweep (r14, VERDICT r13 task 6 —
  * completing what commit a5d677d started): every distributed window
  * operator crossed with every boundary-machinery hazard cell —
  *
  *  - TIES: a coarse order axis (modulus 4) so nearly every key is a
  *    tie group, including ties STRADDLING partition boundaries;
  *  - NULLS: null order keys (leading/trailing blocks), null group
  *    keys, null inputs (offset/nth IGNORE-NULLS starvation);
  *  - SINGLE-KEY-PARTITION: partition counts far above the distinct
  *    group count, so sub-splits hold one key (or less) and the
  *    telescoping / chained-tail machinery carries values across
  *    many empty hops;
  *  - GROUP-AT-BOUNDARY: many small groups over many partitions, so
  *    group edges land ON partition edges with high probability.
  *
  * Every cell compares the forced plan to the built-in WindowExec with
  * the multiplicity-preserving (and since r14 type-tagged) RowMultiset
  * — row-level, not aggregate. Configurations are FIXED-SEED
  * arithmetic, so the sweep is deterministic; the per-operator specs
  * pin crafted shapes, SkewTierSweepSpec pins stack interactions, and
  * this matrix pins each hazard against each operator family
  * independently (a crafted-fixture gap in any one cell fails here).
  */
class DifferentialSweepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def noAqePlan(df: org.apache.spark.sql.DataFrame) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  /** One hazard cell: mult ~ seed multiplier for the value stream. */
  private case class Cell(name: String, seed: Long, rows: Int,
                          keyMod: Long, hotEvery: Int, nullKeyEvery: Int,
                          nullValEvery: Int, tieMod: Long, parts: Int)

  // the matrix: hazards alone and in combination, for both group
  // regimes (few groups = boundary pressure, many groups = edge-on-edge)
  private val cells = Seq(
    Cell("ties-heavy", 101L, 1600, 11L, 0, 0, 0, 4L, 6),
    Cell("ties-cross-partition", 103L, 1400, 3L, 0, 0, 0, 2L, 31),
    Cell("nulls-keys", 107L, 1500, 9L, 0, 3, 0, 7L, 5),
    Cell("nulls-values", 109L, 1500, 9L, 0, 0, 2, 7L, 5),
    Cell("nulls-both+ties", 113L, 1800, 7L, 0, 3, 3, 3L, 9),
    Cell("single-key-partitions", 127L, 1200, 1L, 0, 0, 3, 9L, 37),
    Cell("hot-key+ties", 131L, 2200, 23L, 2, 0, 0, 4L, 8),
    Cell("hot-key+nulls", 137L, 2000, 17L, 3, 4, 3, 11L, 7),
    Cell("groups-at-boundaries", 139L, 1600, 211L, 0, 0, 3, 5L, 41),
    Cell("tiny-groups-many-parts", 149L, 900, 431L, 0, 5, 4, 3L, 29),
    Cell("one-group-one-row-parts", 151L, 64, 1L, 0, 0, 2, 2L, 61),
    Cell("everything-at-once", 157L, 2400, 13L, 2, 4, 3, 3L, 23))

  private def dataset(c: Cell) = {
    val base = spark.range(c.rows).select(
      col("id"),
      (col("id") * c.seed % 997L).as("r1"),
      (col("id") * 6007L % 353L).as("r2"))
    base.select(
      when(lit(c.nullKeyEvery) > 0 && col("id") % c.nullKeyEvery === 0,
        lit(null)).otherwise(
        when(lit(c.hotEvery) > 0 && col("id") % c.hotEvery === 0, lit(-1L))
          .otherwise(col("r1") % c.keyMod)).as("k"),
      (col("r1") % c.tieMod).as("v"), // tie-pressured order axis
      col("id"),
      when(lit(c.nullValEvery) > 0 && col("id") % c.nullValEvery === 0,
        lit(null)).otherwise(col("r2")).as("x"))
      .repartition(c.parts)
  }

  private def same(windowed: org.apache.spark.sql.DataFrame,
                   skew: Boolean, tag: String): Unit = {
    val forced = if (skew) RewriteGlobalRankWindows.forceSkew(windowed)
                 else RewriteGlobalRankWindows.force(windowed)
    assert(RowMultiset.of(forced) == RowMultiset.of(windowed), tag)
    val p = noAqePlan(forced)
    assert(p.collect { case w: WindowExec => w }.isEmpty,
      s"$tag kept WindowExec:\n$p")
  }

  test("matrix: rank family x every hazard cell (per-key + global)") {
    cells.foreach { c =>
      val df = dataset(c)
      val wt = Window.partitionBy("k").orderBy(col("v"), col("id"))
      val wv = Window.partitionBy("k").orderBy("v") // tie-heavy order
      same(df.select(col("k"), col("v"), col("id"),
        row_number().over(wt).as("rn"),
        rank().over(wv).as("rk"), dense_rank().over(wv).as("dr"),
        percent_rank().over(wv).as("pr"), cume_dist().over(wv).as("cd"),
        ntile(3).over(wt).as("nt")), skew = true, s"skew-rank@${c.name}")
      val gt = Window.orderBy(col("v"), col("id"))
      val gv = Window.orderBy("v")
      same(df.select(col("v"), col("id"),
        row_number().over(gt).as("rn"),
        rank().over(gv).as("rk"), dense_rank().over(gv).as("dr"),
        percent_rank().over(gv).as("pr"), cume_dist().over(gv).as("cd"),
        ntile(5).over(gt).as("nt")), skew = false, s"global-rank@${c.name}")
    }
  }

  test("matrix: offset + lookahead family x every hazard cell") {
    cells.foreach { c =>
      val df = dataset(c)
      val wt = Window.partitionBy("k").orderBy(col("v"), col("id"))
      same(df.select(col("k"), col("v"), col("id"), col("x"),
        lag("x", 1).over(wt).as("l1"),
        lag("x", 3).over(wt).as("l3"),
        lead("x", 2).over(wt).as("d2"),
        lag(col("x"), 1, null, ignoreNulls = true).over(wt).as("lnn"),
        lead(col("x"), 2, null, ignoreNulls = true).over(wt).as("dnn")),
        skew = true, s"skew-offset@${c.name}")
      val gt = Window.orderBy(col("v"), col("id"))
      same(df.select(col("v"), col("id"), col("x"),
        lag("x", 2).over(gt).as("l2"),
        lead("x", 1).over(gt).as("d1"),
        lag(col("x"), 2, null, ignoreNulls = true).over(gt).as("lnn"),
        lead(col("x"), 1, null, ignoreNulls = true).over(gt).as("dnn")),
        skew = false, s"global-offset@${c.name}")
    }
  }

  test("matrix: running + ROWS-moving + nth_value x every hazard cell") {
    cells.foreach { c =>
      val df = dataset(c)
      val wt = Window.partitionBy("k").orderBy(col("v"), col("id"))
      val wr = wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      same(df.select(col("k"), col("v"), col("id"), col("x"),
        sum("x").over(wr).as("rs"), count(col("x")).over(wr).as("rc"),
        min("x").over(wr).as("rm"), avg("x").over(wr).as("ra"),
        first("x").over(wr).as("rf"),
        sum("x").over(wt.rowsBetween(-2, 2)).as("mv"),
        max("x").over(wt.rowsBetween(-4, -1)).as("mp"),
        nth_value(col("x"), 2).over(wr).as("n2"),
        expr("nth_value(x, 2)").over(wt.rowsBetween(-2, 0)).as("nm")),
        skew = true, s"skew-agg@${c.name}")
      val gt = Window.orderBy(col("v"), col("id"))
      val gr = gt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      same(df.select(col("v"), col("id"), col("x"),
        sum("x").over(gr).as("rs"), last("x").over(gr).as("rl"),
        sum("x").over(gt.rowsBetween(-3, 1)).as("mv"),
        nth_value(col("x"), 3).over(gr).as("n3")),
        skew = false, s"global-agg@${c.name}")
    }
  }

  test("matrix: RANGE-moving (int + timestamp axes) x every hazard cell") {
    cells.foreach { c =>
      val df = dataset(c)
      // integral tie-heavy axis: frames narrower/wider than tie spacing
      val wc = Window.partitionBy("k").orderBy("v")
      same(df.select(col("k"), col("v"), col("x"),
        sum("x").over(wc.rangeBetween(-2, 0)).as("t2"),
        count(col("x")).over(wc.rangeBetween(-1, 1)).as("c11"),
        min("x").over(wc.rangeBetween(1, 3)).as("f13")),
        skew = true, s"skew-rangemov@${c.name}")
      val gc = Window.orderBy("v")
      same(df.select(col("v"), col("x"),
        sum("x").over(gc.rangeBetween(-2, 1)).as("t21"),
        max("x").over(gc.rangeBetween(-3, -1)).as("p31")),
        skew = false, s"global-rangemov@${c.name}")
      // timestamp axis (r14): second-pure interval frames over a
      // micros lattice derived from the same hazard stream
      df.select(col("k"),
        when(col("v").isNull, lit(null))
          .otherwise(timestamp_micros(lit(1704067200000000L) +
            col("v") * 1500000L + col("id") % 3 * 500000L)).as("t"),
        col("x"))
        .createOrReplaceTempView(s"dsw_ts_${c.seed}")
      same(spark.sql(
        s"""SELECT k, t, x,
           |  sum(x) OVER (PARTITION BY k ORDER BY t RANGE BETWEEN
           |    INTERVAL 3 SECONDS PRECEDING AND CURRENT ROW) AS s3,
           |  count(x) OVER (PARTITION BY k ORDER BY t RANGE BETWEEN
           |    INTERVAL 2 SECONDS PRECEDING AND INTERVAL 2 SECONDS
           |    FOLLOWING) AS c22
           |FROM dsw_ts_${c.seed}""".stripMargin),
        skew = true, s"skew-ts-rangemov@${c.name}")
    }
  }

  test("matrix: suffix-running + delayed/extended running x every hazard cell") {
    // r16 (VERDICT r15 #7, carrying r14 #4): the two r14 rewrite
    // families that were covered only by crafted specs — suffix frames
    // (CURRENT ROW / ±k ROWS .. UNBOUNDED FOLLOWING, mirrored onto the
    // reversed-order running chain) and delayed/extended running ends
    // (UNBOUNDED PRECEDING .. ±k ROWS, composed from lag/lead of a
    // running column) — now sweep the full hazard matrix in both tiers.
    cells.foreach { c =>
      val df = dataset(c)
      val wt = Window.partitionBy("k").orderBy(col("v"), col("id"))
      same(df.select(col("k"), col("v"), col("id"), col("x"),
        sum("x").over(wt.rowsBetween(Window.currentRow,
          Window.unboundedFollowing)).as("sfx"),
        min("x").over(wt.rowsBetween(Window.currentRow,
          Window.unboundedFollowing)).as("sfm"),
        first("x").over(wt.rowsBetween(Window.currentRow,
          Window.unboundedFollowing)).as("sff"),
        count(col("x")).over(wt.rowsBetween(2,
          Window.unboundedFollowing)).as("sfo"),
        avg("x").over(wt.rowsBetween(-2,
          Window.unboundedFollowing)).as("sfp"),
        sum("x").over(wt.rowsBetween(Window.unboundedPreceding, -2)).as("dly"),
        max("x").over(wt.rowsBetween(Window.unboundedPreceding, 3)).as("ext"),
        count(col("x")).over(wt.rowsBetween(Window.unboundedPreceding, -1))
          .as("dlc")), skew = true, s"skew-suffix-delayed@${c.name}")
      // RANGE suffix anchored at CURRENT ROW (tie-exact by value frames)
      val wr = Window.partitionBy("k").orderBy("v")
      same(df.select(col("k"), col("v"), col("x"),
        sum("x").over(wr.rangeBetween(Window.currentRow,
          Window.unboundedFollowing)).as("rsx"),
        count(col("x")).over(wr.rangeBetween(Window.currentRow,
          Window.unboundedFollowing)).as("rsc")),
        skew = true, s"skew-range-suffix@${c.name}")
      val gt = Window.orderBy(col("v"), col("id"))
      same(df.select(col("v"), col("id"), col("x"),
        sum("x").over(gt.rowsBetween(Window.currentRow,
          Window.unboundedFollowing)).as("sfx"),
        last("x").over(gt.rowsBetween(Window.currentRow,
          Window.unboundedFollowing)).as("sfl"),
        avg("x").over(gt.rowsBetween(-1,
          Window.unboundedFollowing)).as("sfe"),
        sum("x").over(gt.rowsBetween(Window.unboundedPreceding, -1)).as("dly"),
        count(col("x")).over(gt.rowsBetween(Window.unboundedPreceding, 2))
          .as("ext")), skew = false, s"global-suffix-delayed@${c.name}")
      val gr = Window.orderBy("v")
      same(df.select(col("v"), col("x"),
        sum("x").over(gr.rangeBetween(Window.currentRow,
          Window.unboundedFollowing)).as("rsx"),
        min("x").over(gr.rangeBetween(Window.currentRow,
          Window.unboundedFollowing)).as("rsm")),
        skew = false, s"global-range-suffix@${c.name}")
    }
  }

  test("matrix: whole-frame (window-to-join + mode) x every hazard cell") {
    cells.foreach { c =>
      val df = dataset(c)
      val wk = Window.partitionBy("k")
      same(df.select(col("k"), col("x"),
        sum("x").over(wk).as("tot"), count(col("x")).over(wk).as("n"),
        min("x").over(wk).as("mn"), avg("x").over(wk).as("av")),
        skew = true, s"skew-frame@${c.name}")
      // mode: the deterministic WITHIN GROUP forms (plain mode() ties
      // are unspecified in the built-in — covered by ModeRewriteSpec's
      // tie-free fixtures)
      df.createOrReplaceTempView(s"dsw_m_${c.seed}")
      same(spark.sql(
        s"""SELECT k, x,
           |  mode() WITHIN GROUP (ORDER BY x) OVER (PARTITION BY k) AS ma,
           |  mode() WITHIN GROUP (ORDER BY x DESC) OVER (PARTITION BY k) AS md
           |FROM dsw_m_${c.seed}""".stripMargin),
        skew = true, s"skew-mode@${c.name}")
      same(spark.sql(
        s"""SELECT x,
           |  mode() WITHIN GROUP (ORDER BY x) OVER () AS ma,
           |  sum(x) OVER () AS tot
           |FROM dsw_m_${c.seed}""".stripMargin),
        skew = false, s"global-mode@${c.name}")
    }
  }
}
