package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.Robots

/** RFC 9309 prefix-rule semantics: longest match wins, Allow beats
  * Disallow on equal length, no-match means allowed — plus the scale
  * property that the whole filter is one map-side expression. */
class RobotsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val rules = Seq(
    "/a" -> false,
    "/a/b" -> true,
    "/a/b/c" -> false,
    "/z" -> true)

  private def keep(urls: String*): Seq[String] =
    Robots.allowed(urls.toDF("url"), rules).as[String].collect().toSeq

  test("longest matching prefix wins at every nesting level") {
    assert(keep("/a/x").isEmpty)          // /a deny
    assert(keep("/a/b/x") == Seq("/a/b/x")) // /a/b allow overrides /a
    assert(keep("/a/b/c/x").isEmpty)      // /a/b/c deny overrides /a/b
  }

  test("no matching rule means allowed") {
    assert(keep("/other", "/z/ok") == Seq("/other", "/z/ok"))
  }

  test("Allow beats Disallow on equal-length prefixes") {
    val tied = Seq("/p" -> false, "/q" -> true, "/p" -> true)
    val got = Robots.allowed(Seq("/p/x").toDF("url"), tied)
      .as[String].collect().toSeq
    assert(got == Seq("/p/x")) // the equal-length Allow rule prevails
  }

  test("robots filter is one map-side expression: no shuffle, no join") {
    val df = Robots.allowed((1 to 100).map(i => s"/a/b/$i").toDF("url"), rules)
    val plan = df.queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }
    val joins = df.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }
    assert(exchanges.isEmpty && joins.isEmpty)
  }
}
