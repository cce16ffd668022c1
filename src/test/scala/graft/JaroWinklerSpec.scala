package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.functions.JaroWinkler

/** Pins the JaroWinkler kernel to the textbook values (Winkler '90)
  * that DuckDB's independent built-in also produces (verified against
  * jaro_winkler_similarity — the oracle for q_jaro_rank re-checks the
  * whole surface pairwise on real data). */
class JaroWinklerSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def jw(a: String, b: String): Double = JaroWinkler.compute(a, b)

  test("textbook pairs match the classic parameterization") {
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-12)
    assert(math.abs(jw("DIXON", "DICKSONX") - 0.8133333333333332) < 1e-12)
    assert(math.abs(jw("JELLYFISH", "SMELLYFISH") - 0.8962962962962964) < 1e-12)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-12)
    assert(math.abs(jw("TRATE", "TRACE") - 0.9066666666666667) < 1e-12)
  }

  test("edge contract: empty -> 0, equal -> 1, disjoint -> 0") {
    assert(jw("", "") == 0.0)
    assert(jw("", "abc") == 0.0)
    assert(jw("abc", "abc") == 1.0)
    assert(jw("ab", "ba") == 0.0) // window 0: adjacent transposed, no match
    assert(jw("abc", "xyz") == 0.0)
  }

  test("boost threshold 0.7: low-jaro common-prefix pairs get NO boost") {
    val base = jw("abcdxxxxx", "abcdyyyyy")
    assert(base < 0.7)
    assert(math.abs(base - 0.6296296296296297) < 1e-12)
    // prefix 4 would add 0.4*(1-jaro) if boosted — assert it did not
    assert(base == JaroWinkler.compute("abcdxxxxx", "abcdyyyyy"))
  }

  test("symmetry and codegen/interpreted agreement on a column") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val df = Seq(("MARTHA", "MARHTA"), ("spark", "spork"),
      ("", "x"), ("same", "same")).toDF("a", "b")
    val got = df.select(JaroWinkler(col("a"), col("b")).as("j"),
      JaroWinkler(col("b"), col("a")).as("k"))
      .collect().map(r => (r.getDouble(0), r.getDouble(1)))
    got.foreach { case (j, k) => assert(j == k) }
    assert(math.abs(got(0)._1 - 0.9611111111111111) < 1e-12)
  }
}
