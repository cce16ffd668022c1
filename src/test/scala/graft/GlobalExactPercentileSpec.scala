package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.{GlobalExactPercentileExec, GlobalFrameAggExec}
import graft.rules.RewriteGlobalRankWindows

/** [[graft.plans.GlobalExactPercentile]] — exact whole-frame
  * percentile/median by iterative histogram narrowing: zero shuffle,
  * no sort, PercentileBase's own interpolation arithmetic. Pinned
  * BIT-equal against the built-in (same order statistics, same
  * formula): duplicates, negatives, nulls, p in {0, .25, .5, .9, 1},
  * median's RuntimeReplaceable unwrap, extreme-Long domains (the
  * unsigned-span bucket math), the all-null column, the mixed stack
  * with GlobalFrameAgg, and the non-rewrites. */
class GlobalExactPercentileSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def noAqePlan(df: DataFrame) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("percentile OVER () == built-in bit-for-bit: dups, negatives, nulls, 5 p-values") {
    val df = spark.range(7000)
      .select(col("id").as("v"),
        when(col("id") % 13 === 0, lit(null))
          .otherwise((col("id") * 48271L % 997L) - 450L).as("x"))
      .repartition(8)
    df.createOrReplaceTempView("pct_t")
    val sqlText =
      """SELECT v,
        |  percentile(x, 0.5) OVER () AS p50,
        |  percentile(x, 0.25) OVER () AS p25,
        |  percentile(x, 0.9) OVER () AS p90,
        |  percentile(x, 0.0) OVER () AS p0,
        |  percentile(x, 1.0) OVER () AS p100,
        |  median(x) OVER () AS med
        |FROM pct_t""".stripMargin
    val windowed = spark.sql(sqlText)
    val forced = RewriteGlobalRankWindows.force(windowed)
    assert(forced.schema == windowed.schema)
    assert(RowMultiset.of(forced) == RowMultiset.of(windowed))
    val p = noAqePlan(RewriteGlobalRankWindows.force(spark.sql(sqlText)))
    assert(p.collect { case x: WindowExec => x }.isEmpty, p.toString)
    assert(p.collect { case g: GlobalExactPercentileExec => g }.size == 1, p.toString)
    assert(p.collect { case e: ShuffleExchangeExec => e }.size == 1,
      s"only the repartition's own exchange:\n$p")
  }

  test("extreme Long domain: the unsigned-span bucket math narrows correctly") {
    val df = Seq(Long.MinValue, Long.MinValue + 1, -7L, 0L, 3L,
      Long.MaxValue - 1, Long.MaxValue)
      .toDF("x").repartition(3).select(col("x"), lit(1).as("v"))
    df.createOrReplaceTempView("pct_ext")
    val sqlText =
      "SELECT v, percentile(x, 0.5) OVER () AS p50, percentile(x, 0.75) OVER () AS p75 FROM pct_ext"
    val windowed = spark.sql(sqlText)
    val forced = RewriteGlobalRankWindows.force(windowed)
    assert(RowMultiset.of(forced) == RowMultiset.of(windowed))
    // median of the 7 sorted values is the 4th: 0
    assert(forced.select("p50").distinct().collect()(0).getDouble(0) == 0.0)
  }

  test("all-null yields null; empty input yields no rows") {
    val nulls = spark.range(40).select(col("id").as("v"),
      lit(null).cast("long").as("x"))
    nulls.createOrReplaceTempView("pct_nulls")
    val forcedN = RewriteGlobalRankWindows.force(
      spark.sql("SELECT v, percentile(x, 0.5) OVER () AS p FROM pct_nulls"))
    assert(forcedN.select("p").distinct().collect().map(_.get(0)).toSeq == Seq(null))
    val empty = spark.range(0).select(col("id").as("v"), col("id").as("x"))
    empty.createOrReplaceTempView("pct_empty")
    assert(RewriteGlobalRankWindows.force(
      spark.sql("SELECT v, percentile(x, 0.5) OVER () AS p FROM pct_empty"))
      .collect().isEmpty)
  }

  test("mixed stack: percentile + sum OVER () — both zero-shuffle nodes, no exchange") {
    val df = spark.range(500).select(col("id").as("v"), (col("id") % 37).as("x"))
    df.createOrReplaceTempView("pct_mix")
    val sqlText =
      "SELECT v, percentile(x, 0.5) OVER () AS p50, sum(x) OVER () AS tot FROM pct_mix"
    val windowed = spark.sql(sqlText)
    val forced = RewriteGlobalRankWindows.force(windowed)
    assert(RowMultiset.of(forced) == RowMultiset.of(windowed))
    val p = noAqePlan(RewriteGlobalRankWindows.force(spark.sql(sqlText)))
    assert(p.collect { case x: WindowExec => x }.isEmpty, p.toString)
    assert(p.collect { case g: GlobalExactPercentileExec => g }.size == 1)
    assert(p.collect { case g: GlobalFrameAggExec => g }.size == 1)
    assert(p.collect { case e: ShuffleExchangeExec => e }.isEmpty,
      s"whole-frame statistics must introduce NO exchange:\n$p")
  }

  test("float/double columns: sortable-bits keys — bit-equal incl. NaN, infinities, -ulp values") {
    val df = spark.range(3000)
      .select(col("id").as("v"),
        when(col("id") % 17 === 0, lit(Double.NaN))
          .when(col("id") % 23 === 0, lit(Double.PositiveInfinity))
          .when(col("id") % 29 === 0, lit(Double.NegativeInfinity))
          .otherwise((col("id") * 48271 % 997 - 450).cast("double") / 7.0)
          .as("xd"),
        ((col("id") * 131 % 211 - 100).cast("float") / lit(3.0f)).as("xf"))
      .repartition(6)
    df.createOrReplaceTempView("pct_fd")
    val sqlText =
      """SELECT v,
        |  percentile(xd, 0.5) OVER () AS d50,
        |  percentile(xd, 0.25) OVER () AS d25,
        |  percentile(xf, 0.9) OVER () AS f90,
        |  median(xf) OVER () AS fmed
        |FROM pct_fd""".stripMargin
    val windowed = spark.sql(sqlText)
    val forced = RewriteGlobalRankWindows.force(windowed)
    assert(forced.schema == windowed.schema)
    // NaN-safe bit comparison: compare the raw bits of each double
    def bitsOf(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), (1 to 4).map(i =>
        java.lang.Double.doubleToLongBits(r.getDouble(i))))).toSet
    assert(bitsOf(forced.collect()) == bitsOf(windowed.collect()))
    val p = noAqePlan(RewriteGlobalRankWindows.force(spark.sql(sqlText)))
    assert(p.collect { case x: WindowExec => x }.isEmpty, p.toString)
    assert(p.collect { case g: GlobalExactPercentileExec => g }.size == 1, p.toString)
  }

  test("decimal columns (precision <= 18): unscaled-long keys — bit-equal incl. negatives, nulls, p=0.9") {
    // r13 (VERDICT r12 task 4): arbitrary cents at scale 2 including
    // negatives and nulls, exact (p=0.0/0.25) and inexact (p=0.9)
    // interpolation weights — the forced plan must reproduce the
    // built-in's doubles bit-for-bit (both interpolate on
    // Decimal.toDouble endpoints)
    val df = spark.range(5000)
      .select(col("id").as("v"),
        when(col("id") % 11 === 0, lit(null))
          .otherwise(((col("id") * 48271L % 99991L) - 45000L)
            .cast("decimal(18,0)") / 100)
          .cast("decimal(18,2)").as("m"))
      .repartition(7)
    df.createOrReplaceTempView("pct_dec")
    val sqlText =
      """SELECT v,
        |  percentile(m, 0.5) OVER () AS p50,
        |  percentile(m, 0.25) OVER () AS p25,
        |  percentile(m, 0.9) OVER () AS p90,
        |  percentile(m, 0.0) OVER () AS p0,
        |  median(m) OVER () AS med
        |FROM pct_dec""".stripMargin
    val windowed = spark.sql(sqlText)
    val forced = RewriteGlobalRankWindows.force(windowed)
    assert(forced.schema == windowed.schema)
    def bitsOf(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), (1 to 5).map(i =>
        java.lang.Double.doubleToLongBits(r.getDouble(i))))).toSet
    assert(bitsOf(forced.collect()) == bitsOf(windowed.collect()))
    val p = noAqePlan(RewriteGlobalRankWindows.force(spark.sql(sqlText)))
    assert(p.collect { case x: WindowExec => x }.isEmpty, p.toString)
    assert(p.collect { case g: GlobalExactPercentileExec => g }.size == 1, p.toString)
  }

  test("WIDE decimals (precision 19..38): two-phase (high, low)-word selection — bit-equal") {
    // late r13, the family's last type refusal: 128-bit unscaled
    // values straddling the 64-bit boundary (x * 2^64-ish magnitudes
    // via multiplication) plus negatives and nulls; p=0.5 exact-weight
    // and p=0.9 inexact-weight interpolation must reproduce the
    // built-in's Decimal.toDouble endpoints bit-for-bit
    val df = spark.range(4000)
      .select(col("id").as("v"),
        when(col("id") % 13 === 0, lit(null))
          .otherwise(
            (((col("id") * 48271L % 9973L) - 4500L).cast("decimal(38,0)")
              * lit("18446744073709551616").cast("decimal(38,0)") / 100 +
              ((col("id") * 7919L % 1000L)).cast("decimal(38,0)") / 100)
              .cast("decimal(38,2)"))
          .as("m"))
      .repartition(7)
    df.createOrReplaceTempView("pct_wide")
    val sqlText =
      """SELECT v,
        |  percentile(m, 0.5) OVER () AS p50,
        |  percentile(m, 0.9) OVER () AS p90,
        |  percentile(m, 0.0) OVER () AS p0,
        |  median(m) OVER () AS med
        |FROM pct_wide""".stripMargin
    val windowed = spark.sql(sqlText)
    val forced = RewriteGlobalRankWindows.force(windowed)
    assert(forced.schema == windowed.schema)
    def bitsOf(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), (1 to 4).map(i =>
        java.lang.Double.doubleToLongBits(r.getDouble(i))))).toSet
    assert(bitsOf(forced.collect()) == bitsOf(windowed.collect()))
    val p = noAqePlan(RewriteGlobalRankWindows.force(spark.sql(sqlText)))
    assert(p.collect { case x: WindowExec => x }.isEmpty, p.toString)
    assert(p.collect { case g: GlobalExactPercentileExec => g }.size == 1, p.toString)
  }

  test("WIDE decimals: values concentrated in ONE high word (the common shape) resolve too") {
    // ordinary magnitudes at precision 38: every unscaled value has
    // high word 0 or -1 — phase 1 must collapse fast and phase 2 carry
    // the full rank
    val df = spark.range(3000)
      .select(col("id").as("v"),
        (((col("id") * 131L % 4999L) - 2500L).cast("decimal(38,4)") / 7)
          .cast("decimal(38,4)").as("m"))
      .repartition(5)
    df.createOrReplaceTempView("pct_wide1")
    val sqlText =
      """SELECT v, percentile(m, 0.25) OVER () AS p25,
        |  percentile(m, 0.75) OVER () AS p75
        |FROM pct_wide1""".stripMargin
    val windowed = spark.sql(sqlText)
    val forced = RewriteGlobalRankWindows.force(windowed)
    def bitsOf(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getLong(0), (1 to 2).map(i =>
        java.lang.Double.doubleToLongBits(r.getDouble(i))))).toSet
    assert(bitsOf(forced.collect()) == bitsOf(windowed.collect()))
  }

  test("non-rewrites: array percentages and running percentile keep WindowExec") {
    val df = spark.range(60).select(col("id").as("v"),
      (col("id") % 9).as("x"))
    df.createOrReplaceTempView("pct_keep")
    def kept(sql: String): Unit = {
      val p = noAqePlan(RewriteGlobalRankWindows.force(spark.sql(sql)))
      assert(p.collect { case g: GlobalExactPercentileExec => g }.isEmpty, sql)
      assert(p.collect { case x: WindowExec => x }.size == 1, sql)
    }
    // (decimals of ANY precision rewrite since late r13, tested above)
    // array percentages return ARRAY<DOUBLE> — out of the scalar form
    kept("SELECT v, percentile(x, array(0.25, 0.75)) OVER () AS s FROM pct_keep")
    // a running frame is not whole-frame: the prefix percentile
    // genuinely needs frame execution
    kept("SELECT v, percentile(x, 0.5) OVER (ORDER BY v) AS s FROM pct_keep")
  }
}
