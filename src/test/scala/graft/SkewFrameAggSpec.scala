package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.execution.window.WindowExec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.rules.RewriteGlobalRankWindows

/** The skew tier's WHOLE-FRAME member (late r13) — `agg(e) OVER
  * (PARTITION BY k)` rewritten to a map-side-combined `Aggregate`
  * null-safe-equi-joined back to the child (window-to-join): no new
  * physical node, and the per-key window shape AQE can actually fix.
  * Pinned bit-for-bit against the built-in on hot keys, NULL keys,
  * expression keys, multi-column keys, duplicate rows (multiplicity),
  * and the plan shape (zero WindowExec, one join). */
class SkewFrameAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def noAqePlan(df: DataFrame) = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try df.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def assertSame(windowed: DataFrame): Unit = {
    val forced = RewriteGlobalRankWindows.forceSkew(windowed)
    assert(forced.schema == windowed.schema)
    assert(RowMultiset.of(forced) == RowMultiset.of(windowed))
    val p = noAqePlan(RewriteGlobalRankWindows.forceSkew(windowed))
    assert(p.collect { case x: WindowExec => x }.isEmpty, p.toString)
    assert(p.collect { case j: BaseJoinExec => j }.size == 1, p.toString)
  }

  test("hot key holding half the rows: per-key totals == built-in") {
    val df = spark.range(4000)
      .select(when(col("id") % 2 === 0, lit(-1L))
        .otherwise(col("id") % 37).as("k"),
        (col("id") % 89).as("x"))
      .repartition(9)
    val w = Window.partitionBy("k")
    assertSame(df.select(col("k"), col("x"),
      sum("x").over(w).as("tot"),
      count(lit(1)).over(w).as("n"),
      min("x").over(w).as("mn"),
      max("x").over(w).as("mx"),
      avg("x").over(w).as("m")))
  }

  test("duplicate rows keep their multiplicity through the join") {
    // 3 identical copies of every row: the inner join back must emit
    // each copy once (one agg row per key), never dedupe or multiply
    val base = spark.range(200)
      .select((col("id") % 6).as("k"), (col("id") % 5).as("x"))
    val df = base.union(base).union(base).repartition(7)
    val w = Window.partitionBy("k")
    assertSame(df.select(col("k"), col("x"),
      sum("x").over(w).as("tot"), count(lit(1)).over(w).as("n")))
  }

  test("NULL keys form one group (null-safe join keys)") {
    val df = spark.range(900)
      .select(when(col("id") % 4 === 0, lit(null)).otherwise(col("id") % 6).as("k"),
        when(col("id") % 9 === 0, lit(null)).otherwise(col("id") % 31).as("x"))
      .repartition(5)
    val w = Window.partitionBy("k")
    assertSame(df.select(col("k"), col("x"),
      sum("x").over(w).as("s"), count(col("x")).over(w).as("nx"),
      count(lit(1)).over(w).as("n")))
  }

  test("expression keys and multi-column keys") {
    val df = spark.range(800)
      .select(col("id"), (col("id") % 7).as("a"), (col("id") % 3).as("b"),
        (col("id") % 13).as("x"))
      .repartition(6)
    assertSame(df.select(col("a"), col("b"), col("x"),
      sum("x").over(Window.partitionBy(col("a") % 2, col("b"))).as("s2")))
    assertSame(df.select(col("a"), col("b"), col("x"),
      max("x").over(Window.partitionBy("a", "b")).as("mab")))
    // two DIFFERENT partition specs stack as two Window nodes — each
    // rewrites to its own aggregate+join (values still exact)
    val both = df.select(col("a"), col("b"), col("x"),
      sum("x").over(Window.partitionBy(col("a") % 2, col("b"))).as("s2"),
      max("x").over(Window.partitionBy("a", "b")).as("mab"))
    val forced = RewriteGlobalRankWindows.forceSkew(both)
    assert(RowMultiset.of(forced) == RowMultiset.of(both))
    val p = noAqePlan(RewriteGlobalRankWindows.forceSkew(both))
    assert(p.collect { case x: WindowExec => x }.isEmpty, p.toString)
    assert(p.collect { case j: BaseJoinExec => j }.size == 2, p.toString)
  }

  test("ratio-to-group-total composes over the rewritten attribute") {
    val df = spark.range(1000)
      .select((col("id") % 11).as("k"), (col("id") % 17 + 1).as("x"))
      .repartition(4)
    val w = Window.partitionBy("k")
    val windowed = df.select(col("k"), col("x"),
      (col("x") * lit(1000000L) / sum("x").over(w)).cast("long").as("ppm"))
    val forced = RewriteGlobalRankWindows.forceSkew(windowed)
    assert(RowMultiset.of(forced) == RowMultiset.of(windowed))
    assert(noAqePlan(RewriteGlobalRankWindows.forceSkew(windowed))
      .collect { case x: WindowExec => x }.isEmpty)
  }

  test("non-rewrites: first_value per key and mixed whole-frame+running keep WindowExec") {
    spark.range(100).select((col("id") % 5).as("k"), col("id").as("v"),
      (col("id") % 7).as("x"))
      .createOrReplaceTempView("sfa_nr")
    def kept(sql: String): Unit = {
      val p = noAqePlan(RewriteGlobalRankWindows.forceSkew(spark.sql(sql)))
      assert(p.collect { case j: BaseJoinExec => j }.isEmpty, sql)
      assert(p.collect { case x: WindowExec => x }.nonEmpty, sql)
    }
    // order-sensitive whole-frame: group-aggregate merge order is
    // arbitrary, the window's is defined — stays on WindowExec
    kept("""SELECT k, first_value(x) OVER (PARTITION BY k ORDER BY v
           |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS f
           |FROM sfa_nr""".stripMargin)
    // a whole-frame member next to a running member in ONE window node
    // (same partition AND order spec): neither shape matches alone
    kept("""SELECT k,
           |  sum(x) OVER (PARTITION BY k ORDER BY v
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS tot,
           |  sum(x) OVER (PARTITION BY k ORDER BY v
           |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
           |FROM sfa_nr""".stripMargin)
  }

  test("session-conf path: spark.graft.rewrite.partitionedRankWindows routes automatically") {
    import org.apache.spark.sql.SparkSession
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "false")
      .withExtensions(new graft.rules.GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      (0L until 300L).map(i => (i % 4, i % 9)).toDF("k", "x")
        .createOrReplaceTempView("sfa_conf")
      val sql = "SELECT k, x, sum(x) OVER (PARTITION BY k) AS tot FROM sfa_conf"
      val off = s2.sql(sql)
      assert(off.queryExecution.executedPlan.collect {
        case x: WindowExec => x
      }.size == 1, "default off must keep WindowExec")
      val expected = off.collect().map(_.toString).sorted.toSeq
      s2.conf.set(RewriteGlobalRankWindows.SkewConfKey, "true")
      try {
        val on = s2.sql(sql)
        val p = on.queryExecution.executedPlan
        assert(p.collect { case x: WindowExec => x }.isEmpty, p.toString)
        assert(p.collect { case j: BaseJoinExec => j }.size == 1, p.toString)
        assert(on.collect().map(_.toString).sorted.toSeq == expected)
      } finally s2.conf.unset(RewriteGlobalRankWindows.SkewConfKey)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }
}
