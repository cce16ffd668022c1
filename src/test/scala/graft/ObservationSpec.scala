package graft

import org.apache.spark.sql.Observation
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pipeline observability: `df.observe` accumulates named metrics on the
  * executors as the job runs — row counts, null rates, domain violations
  * — with NO extra pass over the data and no driver collect. This is the
  * production guardrail shape for a 100 TB run: data-quality counters
  * ride along on the same job that writes the output, and the driver
  * reads them after the action from the [[Observation]] handle. */
class ObservationSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  val sf = "/root/testdata/sf0.001"

  test("observe rides data-quality metrics along a write-shaped action") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val obs = Observation("dq")
    val out = li.observe(obs,
        count(lit(1)).as("rows"),
        sum(when(col("l_quantity") <= 0, 1L).otherwise(0L)).as("bad_qty"),
        sum(when(col("l_discount") < 0 || col("l_discount") > 1, 1L)
          .otherwise(0L)).as("bad_disc"),
        count(when(col("l_returnflag").isNull, 1)).as("null_flag"))
      .groupBy("l_returnflag").count()
    val groups = out.collect().length

    val m = obs.get
    assert(m("rows") == li.count())
    assert(m("bad_qty") == 0L)
    assert(m("bad_disc") == 0L)
    assert(m("null_flag") == 0L)
    assert(groups > 0)
  }

  test("observe on a second branch sees only that branch's rows") {
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val obs = Observation("filtered")
    val filtered = li.where(col("l_returnflag") === "R").observe(obs,
      count(lit(1)).as("rows"))
    val n = filtered.count()
    assert(obs.get("rows") == n)
  }
}
