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
