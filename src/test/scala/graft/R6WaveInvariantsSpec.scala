package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the round-6 wave queries (R64-R69) — the
  * properties the oracle hash cannot express (it proves engine
  * agreement, not that the numbers mean what the query claims), plus
  * the non-vacuity guard: every new query must return rows at sf0.001
  * (the q_survival_km lesson). */
class R6WaveInvariantsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  private def rows(name: String) =
    SparkEntry.queries(name)(spark, sf).collect()

  test("TPC-H completion queries are non-vacuous at the smoke scale") {
    // the nation-coverage trap: sf0.001 has only 10 suppliers — a
    // predicate on an absent nation silently returns an empty result
    // that both engines agree on
    for (q <- Seq("q_sql_tpch_q2", "q_sql_tpch_q11", "q_sql_tpch_q12",
        "q_sql_tpch_q20", "q_sql_tpch_q21"))
      assert(rows(q).nonEmpty, s"$q vacuous at sf0.001")
  }

  test("q_dpo_pairs: gap contract holds and chosen != rejected") {
    val r = rows("q_dpo_pairs")
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("chosen_score") -
        row.getAs[Long]("rejected_score") >= 10)
      assert(row.getAs[Long]("chosen_id") != row.getAs[Long]("rejected_id"))
    }
  }

  test("q_temperature_mix: shares form a distribution") {
    val r = rows("q_temperature_mix")
    assert(r.length >= 2)
    val shares = r.map(_.getAs[Double]("share"))
    assert(shares.forall(s => s > 0 && s < 1))
    assert(math.abs(shares.sum - 1.0) < 1e-9, s"shares sum ${shares.sum}")
  }

  test("q_dsir_weights: exactly top-20, non-increasing") {
    val r = rows("q_dsir_weights")
    assert(r.length == 20)
    val w = r.map(_.getAs[Double]("weight"))
    assert(w.zip(w.tail).forall { case (a, b) => a >= b })
  }

  test("q_curriculum_interleave: positions strictly increase, round-robin head") {
    val r = rows("q_curriculum_interleave")
    assert(r.length == 500)
    val pos = r.map(_.getAs[Long]("pos"))
    assert(pos.zip(pos.tail).forall { case (a, b) => a < b })
    // the first |sources| entries are each source's rank-1 (easiest) doc
    val nSrc = r.map(_.getAs[String]("source")).distinct.length
    assert(r.take(nSrc).forall(_.getAs[Long]("rk") == 1L))
  }

  test("q_acf: all 7 lags present with pairs") {
    val r = rows("q_acf")
    assert(r.map(_.getAs[Long]("lag")).toSeq == (1L to 7L))
    assert(r.forall(_.getAs[Long]("n_pairs") > 0))
  }

  test("q_embedding_quantize: nearest-rounding error bound max_err <= absmax/2") {
    val r = rows("q_embedding_quantize")
    assert(r.length == 64)
    r.foreach { row =>
      assert(2 * row.getAs[Long]("max_err_scaled") <= row.getAs[Long]("absmax"),
        s"dim ${row.getAs[Long]("d")} exceeds the nearest-rounding bound")
    }
  }

  test("q_ngram_novelty: novelty is a valid basis-point rate") {
    val r = rows("q_ngram_novelty")
    assert(r.nonEmpty)
    r.foreach { row =>
      val bp = row.getAs[Long]("novelty_bp")
      assert(bp >= 0 && bp <= 10000)
      assert(row.getAs[Long]("new_grams") <= row.getAs[Long]("grams"))
    }
  }

  test("q_windowed_distinct / q_cumulative_distinct: bounded by total users, growth monotone") {
    val users = graft.core.Tables.load(spark, sf, "events")
      .select("user_id").distinct().count()
    val wd = rows("q_windowed_distinct")
    assert(wd.nonEmpty)
    assert(wd.forall(r => r.getAs[Long]("n_users") > 0 &&
      r.getAs[Long]("n_users") <= users))
    val cum = rows("q_cumulative_distinct").map(_.getAs[Long]("cum_users"))
    assert(cum.zip(cum.tail).forall { case (a, b) => a <= b })
    assert(cum.last == users, "every user must be counted by the last day")
  }

  test("q_mmr_rerank: 5 distinct picks, relevance seed first") {
    val r = rows("q_mmr_rerank")
    assert(r.length == 5)
    assert(r.map(_.getAs[Long]("doc_id")).distinct.length == 5)
    assert(r.map(_.getAs[Long]("rank")).toSeq == (1L to 5L))
    assert(r.head.getAs[Long]("score_bp") == 10000L,
      "round 1 must pick the max-relevance doc (rel_bp = 10000)")
  }

  test("q_scc_functional: the known cycle decomposition of i^2+7 mod 1000") {
    val r = rows("q_scc_functional")
    // deterministic fixture-independent ground truth (verified by
    // direct simulation): 14 cycles, 100 cycle nodes total
    assert(r.length == 14)
    assert(r.map(_.getAs[Long]("cycle_len")).sum == 100L)
    assert(r.map(_.getAs[Long]("rep")).distinct.length == 14)
  }

  test("q_triplet_mining: margins are consistent and self never mined") {
    val r = rows("q_triplet_mining")
    assert(r.length == 100)
    r.foreach { row =>
      val a = row.getAs[Long]("vec_id")
      assert(row.getAs[Long]("pos_id") != a && row.getAs[Long]("neg_id") != a)
      assert(row.getAs[Long]("margin") ==
        row.getAs[Long]("pos_dot") - row.getAs[Long]("neg_dot"))
    }
  }

  test("q_hhi: indices sit in the (1/n, 1] band scaled to bp^2") {
    val r = rows("q_hhi")
    assert(r.nonEmpty)
    r.foreach { row =>
      val hhi = row.getAs[Long]("hhi"); val n = row.getAs[Long]("n_nations")
      assert(hhi > 10000L * 10000L / (2 * n.max(1)), s"HHI $hhi implausibly low")
      assert(hhi <= 10000L * 10000L, s"HHI $hhi above the monopoly bound")
    }
  }

  test("q_kneser_ney: probabilities bounded, counts consistent") {
    val r = rows("q_kneser_ney")
    assert(r.length == 50)
    r.foreach { row =>
      assert(row.getAs[Long]("prob_e9") <= 1000000000L)
      assert(row.getAs[Long]("c") <= row.getAs[Long]("c1"))
      assert(row.getAs[Long]("n_after") >= 1 && row.getAs[Long]("n_before") >= 1)
    }
  }

  test("q_lorenz_deciles: partition of customers, monotone shares") {
    val r = rows("q_lorenz_deciles")
    assert(r.length == 10)
    val custs = graft.core.Tables.load(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    assert(r.map(_.getAs[Long]("n_cust")).sum == custs)
    val shares = r.map(_.getAs[Long]("share_bp"))
    assert(shares.zip(shares.tail).forall { case (a, b) => a <= b },
      "ascending-spend deciles must have non-decreasing shares")
  }

  test("q_asof_native: one output row per event, same as the composed form") {
    val events = graft.core.Tables.events(spark, sf).count()
    assert(rows("q_asof_native").length.toLong == events)
    assert(rows("q_asof_join").length.toLong == events)
  }

  test("q_changepoint: the split partitions the day series") {
    val r = rows("q_changepoint")
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[Long]("n_l") > 0 && row.getAs[Long]("n_r") > 0)
    assert(row.getAs[Long]("score") > 0)
    assert(row.getAs[Long]("mean_l_floor") != row.getAs[Long]("mean_r_floor"),
      "a zero mean gap would make the changepoint meaningless")
  }

  test("q_decay_score: non-negative, recency dominated") {
    val r = rows("q_decay_score")
    assert(r.nonEmpty)
    assert(r.forall(_.getAs[Long]("decay_score_q30") >= 0))
  }

  test("q_hilbert_curve: generated SQL levels equal the straight-Scala xy2d") {
    val r = rows("q_hilbert_curve")
    assert(r.nonEmpty)
    r.foreach { row =>
      val e = row.getAs[Long]("event_id")
      val x = ((e * 7919) % 2000 * 256 / 2000).toInt
      val y = ((e * 104729) % 3000 * 256 / 3000).toInt
      assert(row.getAs[Long]("hkey") == queries.R71Queries.xy2d(256, x, y),
        s"event $e hkey diverges from the reference xy2d")
    }
  }

  test("q_point_in_polygon: crossing sum equals the straight-Scala ray caster") {
    val row = rows("q_point_in_polygon").head
    val ids = graft.core.Tables.load(spark, sf, "events")
      .where(org.apache.spark.sql.functions.col("event_id") < 3000)
      .select("event_id").collect().map(_.getLong(0))
    val expected = ids.count { e =>
      queries.R71Queries.insidePoly(
        40000 + (e * 7919) % 2000, -74000 + (e * 104729) % 3000)
    }
    assert(row.getAs[Long]("n_inside") == expected.toLong)
    assert(row.getAs[Long]("n_pts") == ids.length.toLong)
    assert(row.getAs[Long]("n_inside") > 0 &&
      row.getAs[Long]("n_inside") < ids.length, "polygon test must separate")
  }

  test("q_consistent_hashing: every shard participates in the rebalance audit") {
    val r = rows("q_consistent_hashing")
    assert(r.length == 4)
    val moved = r.map(_.getAs[Long]("n_moved")).sum
    val total = r.map(_.getAs[Long]("n_keys")).sum
    // consistent hashing's point: adding 1 of 5 shards moves roughly 1/5
    // of keys, never most of them (the linear-mixer failure mode)
    assert(moved > 0 && moved * 2 < total,
      s"moved $moved of $total — ring placement degenerated")
  }

  test("q_dbscan_cells: the deterministic blob fixture yields 5 clusters") {
    val r = rows("q_dbscan_cells")
    assert(r.length == 5)
    assert(r.map(_.getAs[Long]("n_points")).sum >
      r.map(_.getAs[Long]("n_cells")).sum * 5, "clusters must be dense")
  }

  test("q_kmv_distinct: estimate within 20% of exact at k=64") {
    rows("q_kmv_distinct").foreach { row =>
      assert(row.getAs[Long]("err_bp") < 2000,
        s"flag ${row.getAs[String]("flag")} err ${row.getAs[Long]("err_bp")}bp")
    }
  }

  test("q_calendar_spine: active + zero partitions the spine") {
    val r = rows("q_calendar_spine").head
    assert(r.getAs[Long]("n_active") + r.getAs[Long]("n_zero") ==
      r.getAs[Long]("n_hours"))
    assert(r.getAs[Long]("n_active") > 0 && r.getAs[Long]("n_zero") > 0)
  }

  test("q_dow_profile: 7 weekdays partition the day series") {
    val r = rows("q_dow_profile")
    assert(r.map(_.getAs[Long]("dow")).toSeq == (0L to 6L))
    val days = rows("q_changepoint").head.getAs[Long]("n_l") +
      rows("q_changepoint").head.getAs[Long]("n_r")
    assert(r.map(_.getAs[Long]("n_days")).sum == days)
  }

  test("q_sprt: a decided walk sits beyond its threshold") {
    val r = rows("q_sprt").head
    val llr = r.getAs[Double]("llr_at_decision")
    r.getAs[String]("decision") match {
      case "accept_h1" => assert(llr >= math.log(19.0))
      case "accept_h0" => assert(llr <= -math.log(19.0))
      case "continue" => assert(math.abs(llr) < math.log(19.0))
      case other => fail(s"unknown decision $other")
    }
  }

  test("q_random_projection: 16 distinct projections per vector") {
    val r = rows("q_random_projection")
    assert(r.length % 16 == 0 && r.nonEmpty)
    // the dead-parity mixer bug made all 16 columns identical — pin
    // that at least one vector has non-constant projections
    val byVec = r.groupBy(_.getAs[Long]("vec_id"))
    assert(byVec.values.exists(_.map(_.getAs[Long]("proj")).distinct.length > 1),
      "all projections identical: the sign matrix is constant")
  }

  test("q_wilson_flags: intervals contain their own rates") {
    rows("q_wilson_flags").foreach { row =>
      val rate = row.getAs[Long]("rate_bp").toDouble / 10000.0
      assert(row.getAs[Double]("lo") <= rate + 1e-4 &&
        rate - 1e-4 <= row.getAs[Double]("hi"),
        s"${row.getAs[String]("source")} rate outside its own Wilson interval")
    }
  }

  test("q_mi_categorical: finite partial MI per language") {
    val r = rows("q_mi_categorical")
    assert(r.nonEmpty)
    r.foreach { row =>
      val mi = row.getAs[Double]("mi_part")
      assert(!mi.isNaN && !mi.isInfinite)
    }
  }
}
