package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Property checks for the LOCF gap-fill and sweep-line concurrency
  * patterns (q_forward_fill / q_sweepline): the distributed
  * window/aggregation formulations must agree with a naive sequential
  * reference on randomized sparse inputs — fixture-independent evidence
  * beyond the DuckDB oracles.
  */
class FillSweepPropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("LOCF fill equals the sequential carry-forward reference on random sparse series") {
    val rnd = new scala.util.Random(7)
    // 10 keys x sparse observations over a 0..29 index range
    val obs: Seq[(Long, Int, Long)] = for {
      k <- 0L until 10L
      i <- 0 until 30 if rnd.nextDouble() < 0.3
    } yield (k, i, rnd.nextInt(100).toLong)
    assume(obs.nonEmpty)
    val daily = obs.toDF("k", "i", "v")
    // spine = each key's [min_i, max_i]; LOCF via last(ignoreNulls)
    val spine = daily.groupBy("k").agg(min("i").as("i0"), max("i").as("i1"))
      .select(col("k"), explode(sequence(col("i0"), col("i1"))).as("i"))
    val w = Window.partitionBy("k").orderBy("i")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = spine.join(daily, Seq("k", "i"), "left_outer")
      .select(col("k"), col("i"), last(col("v"), ignoreNulls = true).over(w).as("f"))
      .as[(Long, Int, Long)].collect().map(r => (r._1, r._2) -> r._3).toMap

    // sequential reference: walk each key's range carrying the last value
    val byKey = obs.groupBy(_._1)
    byKey.foreach { case (k, rows) =>
      val vals = rows.map(r => r._2 -> r._3).toMap
      val (lo, hi) = (rows.map(_._2).min, rows.map(_._2).max)
      var carry = vals(lo)
      (lo to hi).foreach { i =>
        carry = vals.getOrElse(i, carry)
        assert(got((k, i)) == carry, s"key $k index $i")
      }
    }
    assert(got.size == byKey.map { case (_, r) =>
      r.map(_._2).max - r.map(_._2).min + 1 }.sum)
  }

  test("sweep-line concurrency equals the naive per-point interval count on random intervals") {
    val rnd = new scala.util.Random(11)
    val iv: Seq[(Int, Int)] =
      Seq.fill(200)({ val s = rnd.nextInt(50); (s, s + 1 + rnd.nextInt(10)) })
    val df = iv.toDF("s", "e")
    val pts = df.select(col("s").as("t"), lit(1L).as("d"))
      .unionAll(df.select(col("e").as("t"), lit(-1L).as("d")))
    val w = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val got = pts.groupBy("t").agg(sum("d").as("net"))
      .select(col("t"), sum("net").over(w).cast("long").as("conc"))
      .as[(Int, Long)].collect().toMap
    // conc(t) = number of intervals with s <= t < e ([s, e) semantics)
    got.keys.foreach { t =>
      val naive = iv.count { case (s, e) => s <= t && t < e }
      assert(got(t) == naive, s"at t=$t")
    }
  }
}
