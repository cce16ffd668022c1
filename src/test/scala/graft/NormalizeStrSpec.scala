package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.NormalizeStr

/** Unicode canonicalization kernel: composition, decomposition,
  * accent folding, and the canonical-equivalence idempotence law.
  * Fixtures built from explicit escapes so composed vs decomposed
  * forms are unambiguous in source. */
class NormalizeStrSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val acute = "́" // combining acute
  private val eComposed = "é"
  private val eDecomposed = "e" + acute

  private def norm(s: String, mode: String): String =
    Seq(s).toDF("s").select(NormalizeStr(col("s"), mode).as("n"))
      .as[String].collect()(0)

  test("NFC composes decomposed sequences; NFD decomposes them") {
    assert(norm(eDecomposed, "NFC") == eComposed)
    assert(norm(eComposed, "NFD") == eDecomposed)
    assert(norm(eDecomposed, "NFC").length == 1)
  }

  test("STRIP folds accents from both composed and decomposed input") {
    assert(norm("caf" + eComposed, "STRIP") == "cafe")
    assert(norm("caf" + eDecomposed, "STRIP") == "cafe")
    assert(norm("ñoño", "STRIP") == "nono")
  }

  test("NFC is idempotent and null-safe") {
    val s = "a" + acute + "b̈c"
    assert(norm(norm(s, "NFC"), "NFC") == norm(s, "NFC"))
    val r = Seq[(java.lang.Long, String)]((1L, null)).toDF("i", "s")
      .select(NormalizeStr(col("s"), "NFC")).collect()(0)
    assert(r.isNullAt(0))
  }

  test("NFKC folds compatibility forms (ligature fi)") {
    assert(norm("ﬁle", "NFKC") == "file")
  }

  test("invalid mode fails at construction, not at execution") {
    intercept[IllegalArgumentException] {
      NormalizeStr(col("s"), "NFX")
    }
  }
}
