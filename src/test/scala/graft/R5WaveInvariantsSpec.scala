package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-5 wave queries — properties the
  * oracle hash cannot express (it proves engine agreement, not that
  * the numbers mean what the query claims). Run at sf0.001. */
class R5WaveInvariantsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("q_crawl_schedule: delays sit in the reference's 40-90s band and pace slots") {
    val r = rows("q_crawl_schedule")
    assert(r.nonEmpty)
    r.foreach { row =>
      val rn = row.getAs[Int]("rn"); val delay = row.getAs[Long]("delay_s")
      val sched = row.getAs[Long]("scheduled_s")
      assert(delay >= 40 && delay <= 90, s"delay $delay outside 40-90")
      assert(sched == (rn - 1) * delay)
    }
  }

  test("q_bootstrap_ci: a well-formed interval from exactly B replicates") {
    val r = rows("q_bootstrap_ci").head
    assert(r.getAs[Int]("b") == 40)
    val lo = r.getAs[Double]("mean_lo"); val hi = r.getAs[Double]("mean_hi")
    assert(lo <= hi)
    // the point estimate should be near the interval (Poisson(1)
    // resampling is centered); allow slack but catch unit bugs
    val full = r.getAs[Double]("mean_full")
    assert(math.abs(full - (lo + hi) / 2) < full,
      s"CI [$lo, $hi] wildly off the sample mean $full")
  }

  test("q_ab_test: contingency cells partition the users; chi2 >= 0") {
    val r = rows("q_ab_test").head
    val total = r.getAs[Long]("a") + r.getAs[Long]("b") +
      r.getAs[Long]("c") + r.getAs[Long]("d")
    val users = graft.core.Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    assert(total == users)
    assert(r.getAs[Double]("rate_a") >= 0 && r.getAs[Double]("rate_a") <= 1)
    assert(r.getAs[Double]("chi2") >= 0)
  }

  test("q_winsorize: thresholds ordered, clip counts bounded by k") {
    val r = rows("q_winsorize").head
    assert(r.getAs[Long]("lo_cents") <= r.getAs[Long]("hi_cents"))
    assert(r.getAs[Long]("n_clip_lo") <= r.getAs[Long]("k"))
    assert(r.getAs[Long]("n_clip_hi") <= r.getAs[Long]("k"))
  }

  test("q_matryoshka: overlaps bounded by 5 and include the self-match") {
    rows("q_matryoshka").foreach { row =>
      val o16 = row.getAs[Long]("overlap16"); val o32 = row.getAs[Long]("overlap32")
      assert(o16 >= 1 && o16 <= 5, s"overlap16 $o16")
      assert(o32 >= 1 && o32 <= 5, s"overlap32 $o32")
      assert(row.getAs[Double]("recall16") == o16 / 5.0)
    }
  }

  test("q_survival_km: survival is non-increasing within (0, 1]") {
    // sf0.001's short event span has no churners (empty curve, oracle
    // agrees) — the invariant needs the sf0.01 fixture's real deaths
    val s = SparkEntry.queries("q_survival_km")(spark, "/root/testdata/sf0.01")
      .collect().map(_.getAs[Double]("surv"))
    assert(s.nonEmpty)
    s.foreach(v => assert(v > 0 && v <= 1))
    s.sliding(2).foreach {
      case Array(x, y) => assert(y <= x + 1e-12, s"surv rose: $x -> $y")
      case _ =>
    }
  }

  test("q_auc_exact: AUC within [0,1] and numerator <= denominator") {
    val r = rows("q_auc_exact").head
    assert(r.getAs[Long]("num") <= r.getAs[Long]("den"))
    val auc = r.getAs[Double]("auc")
    assert(auc >= 0 && auc <= 1)
  }

  test("q_prefix_sharing: duplication falls (weakly) as prefixes deepen") {
    val byDepth = rows("q_prefix_sharing")
      .map(r => r.getAs[Int]("depth") -> r.getAs[Long]("dup_bp"))
      .sortBy(_._1).map(_._2)
    byDepth.sliding(2).foreach {
      case Array(x, y) => assert(y <= x, s"dup_bp rose with depth: $x -> $y")
      case _ =>
    }
  }

  test("q_vocab_coverage: coverage ranks are monotone and within vocab") {
    val r = rows("q_vocab_coverage").head
    val (r50, r90, r99) = (r.getAs[Long]("ranks_50"),
      r.getAs[Long]("ranks_90"), r.getAs[Long]("ranks_99"))
    assert(r50 <= r90 && r90 <= r99)
    assert(r99 <= r.getAs[Long]("vocab_size"))
  }

  test("q_minhash_estimate: both measures are basis points; err consistent") {
    rows("q_minhash_estimate").foreach { row =>
      val e = row.getAs[Long]("est_bp"); val x = row.getAs[Long]("exact_bp")
      assert(e >= 0 && e <= 10000); assert(x >= 0 && x <= 10000)
      assert(row.getAs[Long]("err_bp") == math.abs(e - x))
    }
  }
}
