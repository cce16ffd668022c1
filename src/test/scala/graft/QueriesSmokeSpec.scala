package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke: the driver contract holds — entry returns rows, every declared
  * query runs at sf0.001, every oracle key has a query. (Value-level
  * correctness is the driver's DuckDB compare, exercised via
  * graft.Verify + the project verify skill.) */
class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("entry returns >0 rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name runs at sf0.001") {
      val df = fn(spark, sf)
      assert(df.columns.nonEmpty)
      df.count() // materializes; throws on broken plans
    }
  }
}
