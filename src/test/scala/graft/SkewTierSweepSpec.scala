package graft

import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rules.RewriteGlobalRankWindows

/** Seeded randomized DIFFERENTIAL sweep over the COMPLETE skew tier
  * (late r13): every per-key member — rank family, plain and
  * IGNORE-NULLS offsets, lookahead, running, ROWS-moving,
  * RANGE-moving, start-anchored nth_value, and the whole-frame
  * window-to-join — evaluated in ONE query per configuration and
  * compared to the built-in WindowExec row-for-row. Configurations
  * vary key cardinality (hot-key mixtures through uniform),
  * null fractions on keys and values, input size, and pre-shuffle
  * partitioning; seeds are FIXED so the sweep is deterministic. The
  * per-operator specs pin crafted shapes; this sweep pins the
  * interactions (stacking, shared exchanges, segment machinery under
  * arbitrary key histograms). */
class SkewTierSweepSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def noAqePlan(df: org.apache.spark.sql.DataFrame) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private case class Config(seed: Long, rows: Int, keyMod: Long,
                            hotEvery: Int, nullKeyEvery: Int,
                            nullValEvery: Int, parts: Int)

  private val configs = Seq(
    Config(11L, 2500, 19L, 2, 0, 3, 7),   // hot key, 1/3 null values
    Config(23L, 1800, 5L, 0, 4, 5, 3),    // few keys, null keys
    Config(37L, 3000, 997L, 3, 7, 4, 11), // near-unique keys + hot
    Config(41L, 900, 1L, 0, 0, 2, 13),    // ONE key, tiny partitions
    Config(53L, 2200, 43L, 2, 5, 0, 5),   // no null values
    Config(67L, 60, 7L, 2, 3, 3, 9)       // tiny input, many partitions
  )

  private def dataset(c: Config) = {
    val base = spark.range(c.rows).select(
      col("id"),
      (col("id") * 48271L % 997L).as("r1"),
      (col("id") * 7919L % 101L).as("r2"))
    val keyed = base.select(
      col("id"),
      when(lit(c.hotEvery) > 0 && col("id") % c.hotEvery === 0, lit(-1L))
        .otherwise(col("r1") % c.keyMod).as("k0"),
      col("r1"), col("r2"))
    keyed.select(
      when(lit(c.nullKeyEvery) > 0 && col("id") % c.nullKeyEvery === 0,
        lit(null)).otherwise(col("k0")).as("k"),
      col("r1").as("v"), col("id"),
      when(lit(c.nullValEvery) > 0 && col("id") % c.nullValEvery === 0,
        lit(null)).otherwise(col("r2")).as("x"),
      (col("r2") % 23L).as("vc")) // coarse integral axis for RANGE
      .repartition(c.parts)
  }

  test("randomized differential sweep: the full skew stack == WindowExec on 6 configurations") {
    configs.foreach { c =>
      val df = dataset(c)
      // total order for the positional members; (k, vc) for RANGE;
      // whole-frame per key rides the window-to-join in ITS OWN query
      // (a mixed node keeps WindowExec by design)
      val wt = Window.partitionBy("k").orderBy(col("v"), col("id"))
      val wr = wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wc = Window.partitionBy("k").orderBy("vc")
      val windowed = df.select(col("k"), col("v"), col("id"), col("x"),
        row_number().over(wt).as("rn"),
        rank().over(wt).as("rk"),
        dense_rank().over(wt).as("dr"),
        percent_rank().over(wt).as("pr"),
        cume_dist().over(wt).as("cd"),
        ntile(4).over(wt).as("nt"),
        lag("x", 2).over(wt).as("lag2"),
        lead("x", 1).over(wt).as("lead1"),
        lag(col("x"), 1, null, ignoreNulls = true).over(wt).as("lagnn"),
        lead(col("x"), 2, null, ignoreNulls = true).over(wt).as("leadnn"),
        sum("x").over(wr).as("runsum"),
        count(col("x")).over(wr).as("runn"),
        sum("x").over(wt.rowsBetween(-3, 1)).as("mov"),
        expr("nth_value(x, 2)").over(wt.rowsBetween(-2, 0)).as("nthmov"),
        nth_value(col("x"), 3).over(wr).as("nthrun"),
        sum("x").over(wc.rangeBetween(-4, 2)).as("rngmov"))
      val forced = RewriteGlobalRankWindows.forceSkew(windowed)
      assert(forced.schema == windowed.schema, s"schema @ $c")
      assert(RowMultiset.of(forced) == RowMultiset.of(windowed),
        s"value mismatch @ $c")
      val p = noAqePlan(RewriteGlobalRankWindows.forceSkew(windowed))
      assert(p.collect { case w: WindowExec => w }.isEmpty,
        s"WindowExec survived @ $c:\n$p")

      val whole = df.select(col("k"), col("x"),
        sum("x").over(Window.partitionBy("k")).as("tot"),
        count(lit(1)).over(Window.partitionBy("k")).as("n"),
        max("x").over(Window.partitionBy("k")).as("mx"))
      val forcedW = RewriteGlobalRankWindows.forceSkew(whole)
      assert(RowMultiset.of(forcedW) == RowMultiset.of(whole),
        s"whole-frame mismatch @ $c")
      assert(noAqePlan(RewriteGlobalRankWindows.forceSkew(whole))
        .collect { case w: WindowExec => w }.isEmpty, s"whole-frame kept @ $c")
    }
  }

  test("randomized differential sweep: the full GLOBAL family == WindowExec on 3 configurations") {
    // the unpartitioned siblings, same differential treatment — incl.
    // this session's additions (moving nth_value, DESC/NULLS-LAST
    // RANGE) stacked with the r12 members
    configs.take(3).foreach { c =>
      val df = dataset(c)
      val wt = Window.orderBy(col("v"), col("id"))
      val wr = wt.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wc = Window.orderBy("vc")
      val wcd = Window.orderBy(col("vc").desc)
      val windowed = df.select(col("v"), col("id"), col("x"),
        row_number().over(wt).as("rn"),
        rank().over(wt).as("rk"),
        percent_rank().over(wt).as("pr"),
        ntile(3).over(wt).as("nt"),
        lag("x", 2).over(wt).as("lag2"),
        lead("x", 1).over(wt).as("lead1"),
        lag(col("x"), 1, null, ignoreNulls = true).over(wt).as("lagnn"),
        lead(col("x"), 2, null, ignoreNulls = true).over(wt).as("leadnn"),
        sum("x").over(wr).as("runsum"),
        first("x").over(wr).as("runfirst"),
        sum("x").over(wt.rowsBetween(-3, 1)).as("mov"),
        expr("nth_value(x, 2)").over(wt.rowsBetween(-2, 0)).as("nthmov"),
        nth_value(col("x"), 3).over(wr).as("nthrun"),
        sum("x").over(wc.rangeBetween(-4, 2)).as("rngmov"),
        count(lit(1)).over(wcd.rangeBetween(-3, 0)).as("rngdesc"),
        sum("x").over(Window.partitionBy()).as("tot"),
        expr("percentile(x, 0.5)").over(Window.partitionBy()).as("p50"))
      val forced = RewriteGlobalRankWindows.force(windowed)
      assert(forced.schema == windowed.schema, s"schema @ $c")
      assert(RowMultiset.of(forced) == RowMultiset.of(windowed),
        s"global value mismatch @ $c")
      val p = noAqePlan(RewriteGlobalRankWindows.force(windowed))
      assert(p.collect { case w: WindowExec => w }.isEmpty,
        s"global WindowExec survived @ $c:\n$p")
    }
  }
}
