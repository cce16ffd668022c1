package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.LinkOps
import graft.functions.ContainsAny
import graft.rules.{CollapseContainsOr, GraftExtensions}

class RulesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val links = Seq("/career/x", "/fine/path", "/mail/y", "clean").toDF("link")

  test("rule collapses an OR-of-contains chain into one ContainsAny") {
    val composed = links.filter(LinkOps.hitsBlacklistComposed($"link"))
    val optimized = CollapseContainsOr(composed.queryExecution.analyzed)
    val found = optimized.expressions.flatMap(_.collect {
      case c: graft.functions.ContainsAny => c
    })
    assert(found.nonEmpty && found.head.words == LinkOps.filterWords)
  }

  test("rule keeps mixed OR trees untouched") {
    val mixed = links.filter($"link".contains("a") || $"link".contains("b")
      || length($"link") > 3)
    val optimized = CollapseContainsOr(mixed.queryExecution.analyzed)
    val found = optimized.expressions.flatMap(_.collect {
      case c: graft.functions.ContainsAny => c
    })
    assert(found.isEmpty)
  }

  test("rule in extraOptimizations preserves results end-to-end") {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations :+ CollapseContainsOr
    try {
      val composed = links.filter(LinkOpsComposedForTest($"link"))
        .as[String].collect().toSet
      assert(composed == Set("/career/x", "/mail/y"))
    } finally {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations.filterNot(_ eq CollapseContainsOr)
    }
  }

  private def LinkOpsComposedForTest(c: org.apache.spark.sql.Column) =
    LinkOps.hitsBlacklistComposed(c)

  test("GraftExtensions registers contains_any for SQL over a new session") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = try SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    finally () // restored below regardless
    try {
      import s2.implicits._
      val got = Seq("/career/x", "ok").toDF("link")
        .createOrReplaceTempView("links_ext")
      val out = s2.sql(
        "SELECT link FROM links_ext WHERE contains_any(link, 'career', 'mail', 'tel')")
        .as[String].collect().toSeq
      assert(out == Seq("/career/x"))
      // the planner strategies ride the same extension point (r7):
      // a spark.sql.extensions deployment plans the custom operators
      // without touching experimental.extraStrategies
      val strategies = s2.sessionState.planner.strategies.map(_.toString)
      for (st <- Seq("RangeJoinStrategy", "TopKStrategy", "AsofJoinStrategy"))
        assert(strategies.exists(_.contains(st)),
          s"$st not injected; got $strategies")
      val topk = graft.plans.TopKPerKey.topKPerKey(
        s2.range(100).selectExpr("id % 4 AS k", "id AS v"),
        Seq("k"), "v", 2)
      assert(topk.collect().length == 8)
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("TopKByCount: exact counts across many partitions, deterministic tie-break") {
    // 40 partitions force partial buffers + serialize/merge; counts must
    // still be exact and ties break lexicographically
    val df = spark.range(0, 1000, 1, 40)
      .selectExpr("CASE WHEN id % 10 < 5 THEN 'a' " +
        "WHEN id % 10 < 8 THEN 'b' WHEN id % 10 < 9 THEN 'z' ELSE 'y' END AS v")
    val got = df.agg(graft.functions.TopKByCount(col("v"), 3).as("t"))
      .as[String].collect().head
    assert(got == "a:500,b:300,y:100")
    // nulls are skipped, not counted
    val withNulls = Seq(Some("x"), None, Some("x"), None, Some("w"))
      .toDF("v")
    val got2 = withNulls.agg(graft.functions.TopKByCount(col("v"), 5).as("t"))
      .as[String].collect().head
    assert(got2 == "x:2,w:1")
  }

  test("GraftExtensions registers top_k_by_count for SQL") {
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s2 = SparkSession.builder()
      .master("local[2]")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      import s2.implicits._
      Seq(("g1", "x"), ("g1", "x"), ("g1", "y"), ("g2", "z"))
        .toDF("g", "v").createOrReplaceTempView("tk_ext")
      val out = s2.sql(
        "SELECT g, top_k_by_count(v, 2) AS t FROM tk_ext GROUP BY g ORDER BY g")
        .as[(String, String)].collect().toSeq
      assert(out == Seq(("g1", "x:2,y:1"), ("g2", "z:1")))
    } finally {
      SparkSession.setDefaultSession(spark)
      SparkSession.setActiveSession(spark)
    }
  }

  test("ContainsAny works in both codegen and interpreted eval") {
    val df = links.select(ContainsAny($"link", Seq("career", "mail")).as("r"))
    assert(df.as[Boolean].collect().toSeq == Seq(true, false, true, false))
    // interpreted path
    val expr = graft.functions.ContainsAny(
      org.apache.spark.sql.catalyst.expressions.Literal("xmailx"),
      Seq("career", "mail"))
    assert(expr.eval(null) == true)
  }

  test("ContainsAny rejects an empty word list at construction") {
    intercept[IllegalArgumentException] {
      graft.functions.ContainsAny(
        org.apache.spark.sql.catalyst.expressions.Literal("x"), Seq.empty)
    }
  }
}
