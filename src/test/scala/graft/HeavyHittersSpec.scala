package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.HeavyHitters

class HeavyHittersSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  test("Misra-Gries candidates are a superset of true heavy hitters (random data)") {
    val rnd = new scala.util.Random(13)
    (1 to 20).foreach { trial =>
      val k = 1 + rnd.nextInt(8)
      // skewed universe: small ids much more frequent
      val data = Seq.fill(500 + rnd.nextInt(1500))(
        s"w${(math.sqrt(rnd.nextInt(400)).toInt)}")
      val df = data.toDF("v").repartition(1 + rnd.nextInt(5))
      val (n0, cands) = HeavyHitters.mgCandidatesWithCount(df, k)
      val candidates = cands.toSet
      // the driver-side merge folds through mgMerge(k), so the final
      // summary is itself bounded by k
      assert(candidates.size <= k,
        s"trial $trial: merged summary must hold at most k=$k keys")
      val n = data.size
      assert(n0 == n, s"trial $trial: sketch-pass count mismatch")
      val exact = data.groupBy(identity).view.mapValues(_.size).toMap
      val trueHeavy = exact.filter { case (_, c) => c.toLong * (k + 1) > n }
      trueHeavy.keys.foreach { h =>
        assert(candidates.contains(h),
          s"trial $trial (k=$k): heavy hitter $h missing from candidates")
      }
    }
  }

  test("heavyHitters equals the plain full groupBy answer") {
    val rnd = new scala.util.Random(17)
    val data = Seq.fill(3000)(
      if (rnd.nextDouble() < 0.4) "hot"
      else if (rnd.nextDouble() < 0.3) "warm"
      else s"t${rnd.nextInt(100)}")
    val df = data.toDF("v").repartition(4)
    val k = 10
    val got = HeavyHitters.heavyHitters(df, $"v", k)
      .as[(String, Long)].collect().toMap
    val n = data.size
    val expected = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
      .filter { case (_, c) => c * (k + 1) > n }
    assert(got == expected)
    assert(got.nonEmpty, "fixture should contain at least one heavy hitter")
  }
}
