package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.queries.R4Queries

/** Semantic checks for the fourth query wave (value-level parity is the
  * DuckDB compare; these pin the invariants that a refactor could break
  * without changing row counts). */
class R4QueriesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("tpch q5: only ASIA nations, positive revenue, sorted desc") {
    val rows = R4Queries.qSqlQ5.run(spark, sf).collect()
    assert(rows.nonEmpty)
    val asiaNations = spark.read.parquet(s"$sf/nation.parquet")
      .join(spark.read.parquet(s"$sf/region.parquet")
          .where(col("r_name") === "ASIA"),
        col("n_regionkey") === col("r_regionkey"))
      .select("n_name").collect().map(_.getString(0)).toSet
    assert(rows.map(_.getString(0)).forall(asiaNations))
    val revs = rows.map(_.getDouble(1))
    assert(revs.forall(_ > 0))
    assert(revs.sameElements(revs.sortBy(-_)))
  }

  test("tpch q18: every order clears the 300-quantity threshold") {
    val rows = R4Queries.qSqlQ18.run(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getDouble(5) > 300.0))
  }

  test("regr fit: slope/r2 finite, r2 in [0,1]") {
    val rows = R4Queries.qRegrExact.run(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (slope, r2) = (r.getDouble(1), r.getDouble(3))
      assert(!slope.isNaN && !slope.isInfinite)
      assert(r2 >= 0.0 && r2 <= 1.0, s"r2 out of range: $r2")
    }
  }

  test("variant: typed path extraction matches get_json_object") {
    val viaJson = spark.read.parquet(s"$sf/events.parquet")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"))
      .agg(sum("k")).collect()(0).getLong(0)
    val viaVariant = R4Queries.qVariant.run(spark, sf)
      .agg(sum("sum_k")).collect()(0).getLong(0)
    assert(viaVariant == viaJson)
    // missing path counts nothing
    val miss = R4Queries.qVariant.run(spark, sf)
      .agg(sum("n_missing")).collect()(0).getLong(0)
    assert(miss == 0L)
  }

  test("collated group: UTF8_LCASE grouping collapses the case split") {
    val part = spark.read.parquet(s"$sf/part.parquet")
    val nBrands = part.select(lower(col("p_brand"))).distinct().count()
    val out = R4Queries.qCollatedGroup.run(spark, sf)
    assert(out.count() == nBrands)
    // total part count survives the regroup
    val total = out.agg(sum("n_parts")).collect()(0).getLong(0)
    assert(total == part.count())
  }
}
