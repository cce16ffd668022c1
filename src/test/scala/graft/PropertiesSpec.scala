package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.LinkOps
import graft.functions.ContainsAny

/** ScalaCheck properties (SURVEY.md §5.3): the custom ContainsAny
  * expression is extensionally equal to the built-in composition and to
  * Scala string semantics; set-operation invariants (A1-A3, F4) hold. */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(20)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  val linkGen: Gen[String] = Gen.listOfN(4, Gen.oneOf(
    "/", "app", "App", "API", "book", "boo", "k", "tel", "#", "@", "x",
    "career", "care", "er", "mail", "MAIL", "", "zzz")).map(_.mkString)

  test("property: ContainsAny == OR-composition for arbitrary strings") {
    check(Prop.forAll(Gen.listOfN(40, linkGen)) { links =>
      links.isEmpty || {
        val df = links.toDF("link").select(
          ContainsAny($"link", LinkOps.filterWords).as("a"),
          LinkOps.hitsBlacklistComposed($"link").as("b"))
        df.where($"a" =!= $"b").count() == 0
      }
    })
  }

  test("property: ContainsAny matches Scala sub.contains semantics") {
    check(Prop.forAll(Gen.listOfN(40, linkGen)) { links =>
      links.isEmpty || {
        val got = links.toDF("link")
          .select(ContainsAny($"link", LinkOps.filterWords))
          .as[Boolean].collect().toSeq
        got == links.map(l => LinkOps.filterWords.exists(l.contains))
      }
    })
  }

  test("property: union+distinct is idempotent and commutative (A1-A3)") {
    check(Prop.forAll(Gen.listOfN(30, Gen.alphaStr), Gen.listOfN(30, Gen.alphaStr)) {
      (xs, ys) =>
        val a = xs.toDF("v"); val b = ys.toDF("v")
        val ab = a.union(b).distinct().as[String].collect().toSet
        val ba = b.union(a).distinct().as[String].collect().toSet
        val abb = a.union(b).union(b).distinct().as[String].collect().toSet
        ab == ba && ab == abb && ab == (xs.toSet ++ ys.toSet)
    })
  }

  test("property: anti-join == set difference (F4 visited semantics)") {
    check(Prop.forAll(Gen.listOfN(30, Gen.choose(0, 20)), Gen.listOfN(15, Gen.choose(0, 20))) {
      (xs, ys) =>
        val anti = xs.distinct.toDF("k")
          .join(ys.distinct.toDF("k"), Seq("k"), "left_anti")
          .as[Int].collect().toSet
        anti == (xs.toSet -- ys.toSet)
    })
  }
}
