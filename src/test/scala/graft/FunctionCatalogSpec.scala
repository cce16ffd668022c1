package graft

import org.apache.spark.sql.connector.catalog.Identifier
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{GraftFunctionCatalog, Mix64Bound, TruncDivBound}

/** The DSv2 function-catalog contract (graft.fns.*): resolution,
  * type checking, magic-method semantics, and the codegen path. The
  * end-to-end values are oracle-hashed as q_catalog_function; these pin
  * what the hash cannot see. */
class FunctionCatalogSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def withCatalog[T](body: => T): T = {
    spark.conf.set("spark.sql.catalog.graft",
      "graft.catalog.GraftFunctionCatalog")
    body
  }

  test("catalog lists and loads its functions; unknowns fail loudly") {
    val c = new GraftFunctionCatalog
    c.initialize("graft", new org.apache.spark.sql.util
      .CaseInsensitiveStringMap(java.util.Collections.emptyMap()))
    val names = c.listFunctions(Array("fns")).map(_.name).sorted.toSeq
    assert(names == Seq("mix64", "trunc_div"))
    assert(c.functionExists(Identifier.of(Array("fns"), "mix64")))
    intercept[NoSuchElementException] {
      c.loadFunction(Identifier.of(Array("fns"), "nope"))
    }
    intercept[NoSuchElementException] {
      c.loadFunction(Identifier.of(Array("other"), "mix64"))
    }
  }

  test("magic method and produceResult agree (codegen vs interpreted)") {
    for (x <- Seq(0L, 7L, 32768L, 123456789L)) {
      val viaRow = Mix64Bound.produceResult(
        org.apache.spark.sql.catalyst.InternalRow(x))
      assert(viaRow == Mix64Bound.invoke(x))
    }
    assert(TruncDivBound.invoke(22L, 7L) == 3L)
    assert(TruncDivBound.invoke(-22L, 7L) == -3L,
      "trunc_div must truncate toward zero, not floor")
  }

  test("SQL resolves catalog functions and values match the inline form") {
    withCatalog {
      val got = spark.sql(
        "SELECT graft.fns.mix64(id) AS h, graft.fns.trunc_div(id, 3) AS d " +
          "FROM range(1000)")
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val want = (0L until 1000L).map(i =>
        (((i % 32768) * (i % 32768) * 2654435761L + i * 40503L)
          % 4294967296L, i / 3))
      assert(got.toSeq == want)
    }
  }

  test("the analyzer type-checks the bind (wrong arity/type is rejected)") {
    withCatalog {
      val e = intercept[Exception] {
        spark.sql("SELECT graft.fns.mix64('abc')").collect()
      }
      assert(e.getMessage != null)
      val e2 = intercept[Exception] {
        spark.sql("SELECT graft.fns.trunc_div(1L)").collect()
      }
      assert(e2.getMessage != null)
    }
  }
}
