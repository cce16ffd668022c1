package graft

import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants for the extension-wave queries (R64-R105) — the
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

  test("q_acf: BIGINT limbs recompose the exact decimal cross-moment") {
    // the hashed columns are decimal-free (the r7 driver lesson); this
    // pins that s_hh·10¹² + s_mid·10⁶ + s_ll is still EXACTLY Σ c·c2,
    // computed here once in arbitrary precision as the reference
    import org.apache.spark.sql.functions._
    val s = spark
    val daily = s.read.parquet(s"$sf/orders.parquet")
      .groupBy(col("o_orderdate").cast("date").as("d"))
      .agg(sum(expr("CAST(round(o_totalprice * 100.0) AS BIGINT)")).as("c"))
    val b = daily.select(col("d").as("d2"), col("c").as("c2"))
    val exact = daily.crossJoin(s.range(1, 8).select(col("id").as("lag")))
      .withColumn("d2", expr("date_add(d, CAST(lag AS INT))"))
      .join(b, "d2").groupBy("lag")
      .agg(sum(col("c").cast("decimal(19,0)") * col("c2").cast("decimal(19,0)"))
        .as("sxy"))
      .collect().map(x => x.getAs[Long]("lag") ->
        x.getAs[java.math.BigDecimal]("sxy").toBigInteger).toMap
    rows("q_acf").foreach { row =>
      val rec = (BigInt(row.getAs[Long]("s_hh")) * BigInt(10).pow(12)
        + BigInt(row.getAs[Long]("s_mid")) * BigInt(10).pow(6)
        + BigInt(row.getAs[Long]("s_ll")))
      assert(rec == BigInt(exact(row.getAs[Long]("lag"))),
        s"lag ${row.getAs[Long]("lag")} limb recomposition mismatch")
    }
  }

  test("q_zscore_outliers: limb predicate == arbitrary-precision 3-sigma set") {
    // the r9 rewrite decides (n·x−S)² > 9(nQ−S²) in base-10⁶ BIGINT
    // limbs with carry normalization; the oracle hash proves engine
    // agreement on the SAME limb formula — this pins the formula
    // against the mathematics, recomputed here once in BigInt
    val cents = spark.read.parquet(s"$sf/events.parquet")
      .selectExpr("event_type", "event_id",
        "CAST(floor(value * 100) AS BIGINT) AS c")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    val expected = cents.groupBy(_._1).toSeq.flatMap { case (t, g) =>
      val n = BigInt(g.length)
      val sx = g.map(x => BigInt(x._3)).sum
      val q = g.map(x => BigInt(x._3) * BigInt(x._3)).sum
      g.collect { case (_, eid, c)
          if (n * c - sx).pow(2) > 9 * (n * q - sx * sx) => (t, eid, c) }
    }.toSet
    val got = rows("q_zscore_outliers").map(r => (r.getString(0),
      r.getAs[Long]("event_id"), r.getAs[Long]("cents"))).toSet
    assert(got == expected,
      s"limb decision diverges from exact integer math: " +
        s"only-limb=${got -- expected}, only-exact=${expected -- got}")
    assert(got.nonEmpty, "vacuous outlier set at sf0.001")
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

  test("q_cascade_delete: audit covers the chain, deletions bounded") {
    val r = rows("q_cascade_delete")
    assert(r.map(_.getAs[String]("tbl")).toSet ==
      Set("customer", "orders", "lineitem", "events"))
    r.foreach { row =>
      val tot = row.getAs[Long]("n_total")
      val del = row.getAs[Long]("n_deleted")
      assert(0L <= del && del <= tot, s"${row.getAs[String]("tbl")} $del/$tot")
    }
    // k ≡ 3 (mod 10) subjects: the customer-table delete rate is ~10%
    val cust = r.find(_.getAs[String]("tbl") == "customer").get
    val frac = cust.getAs[Long]("n_deleted").toDouble / cust.getAs[Long]("n_total")
    assert(frac > 0.05 && frac < 0.15, s"customer delete fraction $frac")
  }

  test("q_interarrival: bucket shares partition the gap mass") {
    val r = rows("q_interarrival")
    assert(r.nonEmpty && r.length <= 4)
    val sum = r.map(_.getAs[Long]("share_bp")).sum
    // per-bucket floor rounding loses < 1bp per bucket
    assert(sum <= 10000L && sum > 10000L - r.length,
      s"bucket shares sum to ${sum}bp")
  }

  test("q_coverage_p90: flags form a prefix of the mass-descending order") {
    val r = rows("q_coverage_p90") // already ordered by rk
    assert(r.nonEmpty)
    val flags = r.map(_.getAs[Long]("in_p90"))
    assert(flags.head == 1L, "the heaviest cell must be inside p90")
    // once a cell falls outside p90 every later (lighter) cell does too
    assert(!flags.zip(flags.tail).exists { case (a, b) => a == 0L && b == 1L },
      "in_p90 flags are not prefix-closed in rank order")
    val toks = r.map(_.getAs[Long]("toks"))
    assert(toks.zip(toks.tail).forall { case (a, b) => a >= b })
  }

  test("q_theil_index: non-negative and zero only under perfect equality") {
    val r = rows("q_theil_index").head
    assert(r.getAs[Long]("n_nations") > 0)
    val theil = r.getAs[Double]("theil")
    // Theil's T is ≥ 0 up to per-term DECIMAL(18,9) quantization slack
    assert(theil >= -1e-6, s"theil $theil")
  }

  test("q_markov2: conditional probabilities are valid, support floor holds") {
    val r = rows("q_markov2")
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("n") >= 3, "support floor violated")
      val p = row.getAs[Long]("p_bp")
      assert(p >= 0L && p <= 10000L, s"p_bp $p")
    }
    // within one (e1,e2) context the floor-quantized probs sum ≤ 10000
    r.groupBy(row => (row.getAs[String]("e1"), row.getAs[String]("e2")))
      .foreach { case (ctx, rows) =>
        val s = rows.map(_.getAs[Long]("p_bp")).sum
        assert(s <= 10000L, s"context $ctx sums to ${s}bp")
      }
  }

  test("q_burstiness: Fano factors are non-negative") {
    val r = rows("q_burstiness")
    assert(r.nonEmpty)
    r.foreach(row => assert(row.getAs[Long]("fano_bp") >= 0L))
  }

  test("q_water_filling: max-min fair allocation at the water level") {
    val r = rows("q_water_filling")
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("alloc") <= row.getAs[Long]("demand"))
      assert(row.getAs[Long]("alloc") >= 0L)
    }
    // LIMIT 200 truncates the per-user list, so capacity-tightness is
    // only checkable when every user is present
    if (r.length < 200) {
      val demands = r.map(_.getAs[Long]("demand"))
      val allocs = r.map(_.getAs[Long]("alloc"))
      val cap = demands.sum / 2
      assert(allocs.sum <= cap, s"allocated ${allocs.sum} over capacity $cap")
      val capped = r.filter(row =>
        row.getAs[Long]("alloc") < row.getAs[Long]("demand"))
      if (capped.nonEmpty) {
        // every capped user sits exactly at the shared water level…
        assert(capped.map(_.getAs[Long]("alloc")).distinct.length == 1,
          "capped users at different levels")
        // …and raising the level by 1 would blow the budget
        assert(allocs.sum + capped.length > cap, "water level not maximal")
      }
    }
  }

  test("q_skyline: matches the brute-force Pareto frontier") {
    import org.apache.spark.sql.functions.{col, expr}
    val pts = graft.core.Tables.load(spark, sf, "part")
      .select(col("p_partkey"),
        expr("CAST(round(p_retailprice * 100.0) AS BIGINT)").as("price_c"),
        col("p_size").cast("long").as("size"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val brute = pts.filter { case (_, p, s) =>
      !pts.exists { case (_, p2, s2) =>
        p2 <= p && s2 >= s && (p2 < p || s2 > s) }
    }.map(_._1).sorted
    val got = rows("q_skyline").map(_.getAs[Long]("p_partkey"))
    assert(got.toSeq == brute.toSeq, "two-phase skyline != brute force")
    assert(got.nonEmpty)
  }

  test("q_clamped_runsum: closed form matches the sequential recurrence") {
    import org.apache.spark.sql.functions.{col, expr}
    val deltas = graft.core.Tables.load(spark, sf, "orders")
      .select(col("o_custkey"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("odate_us"),
        col("o_orderkey"),
        expr("""CASE WHEN o_orderkey % 3 = 0
          THEN CAST(round(o_totalprice * 100.0) AS BIGINT)
          ELSE -CAST((CAST(round(o_totalprice * 100.0) AS BIGINT)
                 - CAST(round(o_totalprice * 100.0) AS BIGINT) % 2) / 2 AS BIGINT)
          END""").as("delta"))
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3))))
    val naive = deltas.groupBy(_._1).map { case (k, rs) =>
      var bal = 0L; var clamps = 0L
      rs.map(_._2).sortBy(x => (x._1, x._2)).foreach { case (_, _, d) =>
        if (bal + d < 0) { clamps += 1; bal = 0 } else bal += d
      }
      k -> ((rs.length.toLong, clamps, bal))
    }
    val got = rows("q_clamped_runsum")
    assert(got.nonEmpty)
    got.foreach { r =>
      val k = r.getAs[Long]("custkey")
      val (n, clamps, bal) = naive(k)
      assert(r.getAs[Long]("n_orders") == n, s"custkey $k n_orders")
      assert(r.getAs[Long]("n_clamps") == clamps, s"custkey $k n_clamps")
      assert(r.getAs[Long]("final_bal_c") == bal, s"custkey $k final_bal")
    }
    assert(got.length == naive.size)
    // the fixture must actually exercise the clamp path
    assert(got.map(_.getAs[Long]("n_clamps")).sum > 0, "no clamps fired")
  }

  test("q_file_bins: bins tile each source's run without gaps") {
    val r = rows("q_file_bins")
    assert(r.nonEmpty)
    r.groupBy(_.getAs[String]("source")).foreach { case (src, rows) =>
      val bins = rows.map(_.getAs[Long]("bin"))
      assert(bins.toSeq == (0L until bins.length).toSeq,
        s"$src bins not contiguous from 0: ${bins.toSeq}")
      // start-offset binning: every bin except the last reaches the
      // target before closing (its last doc STARTS inside the bin)
      val bytes = rows.sortBy(_.getAs[Long]("bin")).map(_.getAs[Long]("bytes"))
      bytes.dropRight(1).zipWithIndex.foreach { case (b, i) =>
        assert(b > 0, s"$src bin $i empty") }
      // doc-id ranges are disjoint and increasing across bins
      val ranges = rows.sortBy(_.getAs[Long]("bin"))
        .map(row => (row.getAs[Long]("first_doc"), row.getAs[Long]("last_doc")))
      assert(ranges.forall { case (a, b) => a <= b })
      assert(ranges.zip(ranges.tail).forall { case ((_, b1), (a2, _)) => b1 < a2 },
        s"$src bin id-ranges overlap")
    }
  }

  test("q_shapley: efficiency axiom — Σφ·24 = 24·(v(C) − v(∅))") {
    import org.apache.spark.sql.functions.{col, min => fmin, unix_micros}
    val r = rows("q_shapley")
    assert(r.map(_.getAs[String]("channel")).sorted.toSeq ==
      Seq("click", "error", "signup", "view"))
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
    val fp = ev.where(col("event_type") === "purchase")
      .groupBy("user_id").agg(fmin(col("us")).as("pus"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val touched = ev.collect()
      .filter(x => fp.get(x.getLong(0)).exists(p =>
        x.getLong(2) < p && x.getString(1) != "purchase"))
      .map(_.getLong(0)).toSet
    val vFull = fp.size.toLong              // every converted user's mask ⊆ C
    val vEmpty = (fp.keySet -- touched).size.toLong // empty-mask converts
    assert(r.map(_.getAs[Long]("phi_x24")).sum == 24L * (vFull - vEmpty),
      "Shapley efficiency axiom violated")
  }

  test("q_prefix_join: prefix filter is lossless vs brute force") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .where(org.apache.spark.sql.functions.col("doc_id") < 1000)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSet)
    val brute = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      inter = (ta & tb).size.toLong
      un = ta.size + tb.size - inter
      if inter * 10 >= un * 9
    } yield (a, b, inter * 10000L / un)).sortBy(x => (x._1, x._2))
    val got = rows("q_prefix_join")
      .map(r => (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Long]("jacc_bp")))
    assert(got.nonEmpty)
    assert(got.toSeq == brute.toSeq, "prefix-filtered join != brute force")
  }

  test("q_mutual_knn: pairs are disjoint and genuinely mutual") {
    val r = rows("q_mutual_knn")
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("a") < row.getAs[Long]("b"))
      val c = row.getAs[Double]("cos_sim")
      assert(c >= -1.0001 && c <= 1.0001)
    }
    // mutual top-1 pairs are a partial matching: no vec in two pairs
    val ids = r.flatMap(row => Seq(row.getAs[Long]("a"), row.getAs[Long]("b")))
    assert(ids.distinct.length == ids.length, "a vector appears in two pairs")
  }

  test("q_holt: one row per user, forecast = level + trend exactly") {
    val r = rows("q_holt")
    val nUsers = graft.core.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(r.length.toLong == nUsers)
    // r7: the walk runs in scaled-BIGINT fixed point (×10⁹) so the
    // oracle arithmetic is DuckDB-release-invariant (SURVEY §7.4 r6
    // lesson); the columns are the ×10⁹ integers
    r.foreach { row =>
      val l = row.getAs[Long]("level9")
      val t = row.getAs[Long]("trend9")
      val f = row.getAs[Long]("forecast9")
      assert(l + t == f, s"user ${row.getAs[Long]("user_id")}")
      assert(row.getAs[Long]("n_days") >= 1L)
      assert(l > 0L, "smoothed level of positive counts must stay positive")
    }
  }

  test("q_cuped: the pooled adjustment preserves the overall mean") {
    val r = rows("q_cuped")
    assert(r.map(_.getAs[String]("arm")).sorted.toSeq == Seq("A", "B"))
    // Σ nₐ(X̄ₐ − X̄) = 0, so the nₐ-weighted CUPED mean must equal the
    // nₐ-weighted raw mean (up to the round-6 emit)
    val wRaw = r.map(x => x.getAs[Long]("na") * x.getAs[Double]("raw_mean")).sum
    val wAdj = r.map(x => x.getAs[Long]("na") * x.getAs[Double]("cuped_mean")).sum
    val n = r.map(_.getAs[Long]("na")).sum
    assert(math.abs(wRaw - wAdj) / n < 1e-5,
      s"CUPED shifted the pooled mean: $wRaw vs $wAdj")
  }

  test("q_seq_pairs: matches brute-force sequence support") {
    import org.apache.spark.sql.functions.{col, unix_micros}
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byUser = ev.groupBy(_._1)
    val types = ev.map(_._2).distinct
    val nUsers = byUser.size
    val brute = (for {
      ta <- types; tb <- types if ta != tb
      support = byUser.values.count { es =>
        val as = es.filter(_._2 == ta); val bs = es.filter(_._2 == tb)
        as.nonEmpty && bs.nonEmpty && as.map(_._3).min < bs.map(_._3).max
      }.toLong
      if support >= 2L
    } yield ((ta, tb), (support, support * 10000L / nUsers))).toMap
    val got = rows("q_seq_pairs")
    assert(got.nonEmpty)
    assert(got.length == brute.size)
    got.foreach { row =>
      val k = (row.getAs[String]("ta"), row.getAs[String]("tb"))
      val (sup, bp) = brute(k)
      assert(row.getAs[Long]("support") == sup, s"$k support")
      assert(row.getAs[Long]("support_bp") == bp, s"$k support_bp")
    }
  }

  test("q_ivm_join: maintained view reflects every mutation class") {
    val r = rows("q_ivm_join")
    assert(r.nonEmpty)
    val ks = r.map(_.getAs[Long]("k"))
    assert(ks.distinct.length == ks.length, "duplicate order key in view")
    // deleted orders are gone; clones are present
    assert(!ks.exists(k => k < 10000000L && k % 17 == 0), "deleted order survived")
    assert(ks.exists(_ >= 10000000L), "no inserted clone in view")
    r.foreach { row =>
      val ck = row.getAs[Long]("ck")
      assert(ck % 23 != 0, s"order of deleted customer $ck survived")
    }
    // updated customers only appear with their NEW nation value
    val updated = r.filter(row => row.getAs[Long]("ck") % 11 == 0)
    assert(updated.nonEmpty)
    val origNat = graft.core.Tables.load(spark, sf, "customer")
      .collect().map(x => x.getLong(0) -> x.getInt(2).toLong).toMap
    updated.foreach { row =>
      val ck = row.getAs[Long]("ck")
      assert(row.getAs[Long]("nat") == (origNat(ck) + 1L) % 25L,
        s"customer $ck kept its pre-update nation")
    }
  }

  test("q_bitemporal: corrections visible only past their tx day") {
    val r = rows("q_bitemporal")
    assert(r.nonEmpty)
    r.foreach { row =>
      val ck = row.getAs[Long]("ck")
      if (ck % 7 == 0) {
        // the retroactive tx-20 correction IS visible at tx 25
        assert(row.getAs[Long]("valid_day") == 10L && row.getAs[Long]("tx_day") == 20L,
          s"ck $ck missed its correction")
      } else {
        assert(row.getAs[Long]("valid_day") == 0L && row.getAs[Long]("tx_day") == 0L,
          s"ck $ck picked a phantom version")
      }
      // the tx-40 revision must NEVER be visible at tx 25
      assert(row.getAs[Long]("tx_day") <= 25L)
    }
  }

  test("q_theta_ops: estimates land near exacts at k=128") {
    val r = rows("q_theta_ops").head
    val exU = r.getAs[Long]("ex_union").toDouble
    assert(exU > 0)
    // θ-sketch error is relative to the UNION for every set op
    for (op <- Seq("union", "intersect", "diff")) {
      val ex = r.getAs[Long](s"ex_$op").toDouble
      val est = r.getAs[Long](s"est_$op").toDouble
      assert(math.abs(est - ex) <= 0.25 * exU + 1,
        s"$op estimate $est vs exact $ex (union $exU)")
    }
  }

  test("q_viterbi: decoded score dominates both constant-state paths") {
    import org.apache.spark.sql.functions.col
    val emit = Map("view" -> (5L, 2L), "click" -> (4L, 4L), "error" -> (1L, 3L),
      "signup" -> (2L, 5L), "purchase" -> (1L, 6L))
    val seqs = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"))
      .collect().map(r => (r.getLong(0), r.getString(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val got = rows("q_viterbi")
    assert(got.length == seqs.size)
    got.foreach { row =>
      val u = row.getAs[Long]("user_id")
      val ts = seqs(u)
      assert(row.getAs[Long]("n_events") == ts.length.toLong)
      val best = row.getAs[Long]("best_score")
      // the optimum dominates the stay-quiet and stay-active paths
      val quiet = ts.map(emit(_)._1).sum + (ts.length - 1) * 8L
      val active = ts.map(emit(_)._2).sum + (ts.length - 1) * 8L
      assert(best >= math.max(quiet, active), s"user $u sub-optimal")
      assert(Set(0L, 1L).contains(row.getAs[Long]("final_state")))
    }
  }

  test("q_apportion: house size exact, every cell within its quota") {
    val r = rows("q_apportion")
    assert(r.nonEmpty)
    assert(r.map(_.getAs[Long]("seats")).sum == 1000L, "house size != 1000")
    r.foreach { row =>
      val d = row.getAs[Long]("seats") - row.getAs[Long]("base")
      assert(d == 0L || d == 1L,
        s"${row.getAs[String]("lang")}/${row.getAs[String]("source")} outside quota")
    }
  }

  test("q_bloom_audit: filter accounting and FP prediction cohere") {
    val r = rows("q_bloom_audit").head
    val members = r.getAs[Long]("n_members")
    val bits = r.getAs[Long]("bits_set")
    assert(bits <= math.min(3L * members, 4096L) && bits > 0)
    assert(r.getAs[Long]("n_fp") <= r.getAs[Long]("n_probes"))
    val measured = r.getAs[Long]("fp_ppm").toDouble / 1e6
    val predicted = r.getAs[Double]("fp_predicted")
    assert(predicted >= 0 && predicted <= 1)
    assert(math.abs(measured - predicted) < 0.05,
      s"measured FP $measured far from fill-based prediction $predicted")
  }

  test("q_kanon: counts are internally consistent") {
    val r = rows("q_kanon").head
    assert(r.getAs[Long]("min_l") <= r.getAs[Long]("min_k"))
    assert(r.getAs[Long]("users_at_risk") <
      r.getAs[Long]("n_small_groups") * 5L + 1L)
    assert(r.getAs[Long]("min_k") >= 1L && r.getAs[Long]("min_l") >= 1L)
    val nUsers = graft.core.Tables.load(spark, sf, "customer").count()
    assert(r.getAs[Long]("risk_bp") <= 10000L)
    assert(r.getAs[Long]("n_groups") > 0 && nUsers > 0)
  }

  test("q_join_cardest: actual is the true self-join size") {
    import org.apache.spark.sql.functions.col
    val li = graft.core.Tables.load(spark, sf, "lineitem")
    val trueSize = li.select(col("l_partkey").as("p"))
      .join(li.select(col("l_partkey").as("p")), "p").count()
    val r = rows("q_join_cardest").head
    assert(r.getAs[Long]("actual") == trueSize,
      s"Σf² ${r.getAs[Long]("actual")} != true join size $trueSize")
    assert(r.getAs[Long]("est") > 0)
  }

  test("q_jenks: the chosen split beats every other split (brute force)") {
    import org.apache.spark.sql.functions.{col, expr, sum => fsum}
    val usPerDay = 86400000000L
    val days = graft.core.Tables.load(spark, sf, "orders")
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("us"),
        expr("CAST((CAST(round(o_totalprice * 100.0) AS BIGINT) " +
          "- CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT)")
          .as("usd"))
      .withColumn("day", expr(s"CAST((us - us % $usPerDay) / $usPerDay AS BIGINT)"))
      .groupBy("day").agg(fsum(col("usd")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val vs = days.sortBy(x => (x._2, x._1)).map(_._2.toDouble)
    def sse(xs: Array[Double]): Double =
      if (xs.isEmpty) 0.0
      else xs.map(x => x * x).sum - math.pow(xs.sum, 2) / xs.length
    val bruteBest = (1 until vs.length)
      .map(i => sse(vs.take(i)) + sse(vs.drop(i))).min
    val r = rows("q_jenks").head
    assert(r.getAs[Long]("n_lo") + r.getAs[Long]("n_hi") == vs.length.toLong)
    assert(r.getAs[Double]("sse") <= bruteBest + 1e-6,
      s"query split sse ${r.getAs[Double]("sse")} worse than brute $bruteBest")
  }

  test("q_bom_rollup: every part rolls up to exactly one root") {
    import org.apache.spark.sql.functions.{col, expr}
    val parts = graft.core.Tables.load(spark, sf, "part")
      .select(col("p_partkey"),
        expr("CAST(round(p_retailprice * 100.0) AS BIGINT)").as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r = rows("q_bom_rollup")
    assert(r.map(_.getAs[Long]("n_desc")).sum == parts.size.toLong,
      "parts lost or double-counted across roots")
    // brute-force replay of one root's rollup
    def walk(p: Long): (Long, Long) = { // (root, pathMult)
      var anc = p; var mult = 1L
      while (anc >= 10) { mult *= anc % 5 + 1; anc /= 10 }
      (anc, mult)
    }
    val brute = parts.toSeq.map { case (p, c) =>
      val (root, mult) = walk(p); (root, c * mult)
    }.groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    r.foreach { row =>
      val root = row.getAs[Long]("root")
      assert(row.getAs[Long]("total_cost_c") == brute(root), s"root $root")
    }
  }

  test("q_merkle_diff: drill-down accounts for every mutated key") {
    import org.apache.spark.sql.functions.col
    val keys = graft.core.Tables.load(spark, sf, "orders")
      .select(col("o_orderkey")).collect().map(_.getLong(0))
    val expectedChanged = keys.count(k => k % 31 == 0 || k % 29 == 0).toLong
    val r = rows("q_merkle_diff")
    assert(r.nonEmpty)
    assert(r.map(_.getAs[Long]("n_changed")).sum == expectedChanged,
      "changed-key total != mutation count")
    r.foreach(row => assert(row.getAs[Long]("n_changed") >= 1L,
      s"clean bucket ${row.getAs[Long]("bucket")} flagged"))
    // with 1024 buckets some buckets must be clean — the gate skips them
    assert(r.length < 1024, "no clean buckets: the drill-down gate is vacuous")
  }

  test("q_span_corrupt: matches a straight-Scala masking replay") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    val got = rows("q_span_corrupt")
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_spans"),
          r.getAs[Long]("n_masked")))).toMap
    assert(got.size == docs.length)
    docs.foreach { case (id, toks) =>
      val starts = toks.indices.map(p =>
        (id * 2654435761L + p * 7919L + p.toLong * p * 104729L) % 97 < 5)
      val masked = toks.indices.map(p =>
        (math.max(0, p - 2) to p).exists(starts))
      val spans = toks.indices.count(p => masked(p) && (p == 0 || !masked(p - 1)))
      val (nt, ns, nm) = got(id)
      assert(nt == toks.length.toLong, s"doc $id tokens")
      assert(ns == spans.toLong, s"doc $id spans")
      assert(nm == masked.count(identity).toLong, s"doc $id masked")
    }
  }

  test("q_perm_test: observed statistic matches a direct recompute") {
    import org.apache.spark.sql.functions.{col, sum => fsum, when => fwhen}
    val per = graft.core.Tables.events(spark, sf)
      .groupBy("user_id")
      .agg(fsum(fwhen(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val tObs = math.abs(per.map { case (u, y) => if (u % 2 == 1) y else -y }.sum)
    val r = rows("q_perm_test").head
    assert(r.getAs[Long]("t_obs") == tObs)
    assert(r.getAs[Long]("n_perms") == 200L)
    assert(r.getAs[Long]("n_ge") <= 200L)
    val p = r.getAs[Long]("p_bp")
    assert(p > 0L && p <= 10000L, s"p_bp $p outside (0, 10000]")
  }

  test("q_target_encode: leave-one-out formula replayed per row") {
    import org.apache.spark.sql.functions.{col, max => fmax, when => fwhen}
    val y = graft.core.Tables.load(spark, sf, "orders")
      .groupBy("o_custkey")
      .agg(fmax(fwhen(col("o_orderstatus") === "F", 1L).otherwise(0L)).as("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val cust = graft.core.Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_mktsegment").collect()
      .map(r => (r.getLong(0), r.getString(1), y.getOrElse(r.getLong(0), 0L)))
    val n = cust.length.toLong
    val sy = cust.map(_._3).sum
    val seg = cust.groupBy(_._2).view
      .mapValues(rs => (rs.length.toLong, rs.map(_._3).sum)).toMap
    val got = rows("q_target_encode")
    assert(got.length == cust.length)
    got.foreach { row =>
      val (nSeg, sySeg) = seg(row.getAs[String]("seg"))
      val yy = row.getAs[Long]("y")
      val expected = ((sySeg - yy).toDouble + 10.0 * sy.toDouble / n.toDouble) /
        (nSeg - 1 + 10).toDouble
      assert(math.abs(row.getAs[Double]("enc") - expected) < 1e-5,
        s"custkey ${row.getAs[Long]("k")}")
    }
  }

  test("q_woe_iv: information value accumulates monotonically from zero") {
    val r = rows("q_woe_iv")
    assert(r.nonEmpty)
    val cums = r.map(_.getAs[Double]("iv_cum"))
    // each bin's IV contribution (share-diff × ln share-ratio) is ≥ 0
    assert(cums.zip(cums.tail).forall { case (a, b) => b >= a - 1e-9 },
      "IV decreased across bins")
    assert(cums.last >= 0.0)
    r.foreach(row => assert(!row.getAs[Double]("woe").isNaN))
  }

  test("q_maxsim: sum-of-max dominates whole-vector cosine ranking input") {
    val r = rows("q_maxsim")
    assert(r.length == 15, "3 queries × top-5")
    r.groupBy(_.getAs[Long]("qid")).foreach { case (q, rs) =>
      assert(rs.length == 5, s"query $q")
      val scores = rs.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("maxsim"))
      assert(scores.zip(scores.tail).forall { case (a, b) => a >= b },
        s"query $q scores not descending")
      // 8 slice-cosines each in [-1, 1] → maxsim ∈ [-8, 8]
      scores.foreach(x => assert(x >= -8.0001 && x <= 8.0001))
    }
  }

  test("q_wasserstein: matches a pointwise |ΔCDF| integration") {
    import org.apache.spark.sql.functions.{col, count => fcount}
    val per = graft.core.Tables.events(spark, sf).groupBy("user_id")
      .agg(fcount(col("event_id")).as("v")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val a = per.collect { case (u, v) if u % 2 == 0 => v }
    val b = per.collect { case (u, v) if u % 2 == 1 => v }
    val (lo, hi) = (per.map(_._2).min, per.map(_._2).max)
    // independent route: evaluate |Fa(v)·nb − Fb(v)·na| at EVERY integer
    // step of the support (Δv = 1 each), not on the grouped sweep
    val num = (lo until hi).map { v =>
      math.abs(a.count(_ <= v).toLong * b.length - b.count(_ <= v).toLong * a.length)
    }.sum
    val r = rows("q_wasserstein").head
    assert(r.getAs[Long]("na") == a.length.toLong)
    assert(r.getAs[Long]("nb") == b.length.toLong)
    assert(r.getAs[Long]("w1_num") == num,
      s"grouped sweep ${r.getAs[Long]("w1_num")} != pointwise $num")
  }

  test("q_isotonic: minimax fit equals sequential Pool-Adjacent-Violators") {
    val r = rows("q_isotonic").sortBy(_.getAs[Long]("b"))
    assert(r.nonEmpty)
    val fitted = r.map(_.getAs[Double]("fitted"))
    assert(fitted.zip(fitted.tail).forall { case (a, b) => b >= a - 1e-9 },
      "isotonic fit not monotone")
    // textbook sequential PAV on the same (n, y) bins
    case class Block(var n: Long, var y: Long)
    val blocks = scala.collection.mutable.ArrayBuffer.empty[(Block, Int)]
    r.foreach { row =>
      blocks += ((Block(row.getAs[Long]("n"), row.getAs[Long]("y")), 1))
      while (blocks.length >= 2 && {
        val (b2, _) = blocks(blocks.length - 1); val (b1, _) = blocks(blocks.length - 2)
        b2.y * b1.n < b1.y * b2.n // avg(last) < avg(prev) → pool
      }) {
        val (b2, c2) = blocks.remove(blocks.length - 1)
        val (b1, c1) = blocks.remove(blocks.length - 1)
        blocks += ((Block(b1.n + b2.n, b1.y + b2.y), c1 + c2))
      }
    }
    val pav = blocks.flatMap { case (b, c) =>
      Seq.fill(c)(b.y.toDouble / b.n.toDouble) }
    fitted.zip(pav).zipWithIndex.foreach { case ((f, p), i) =>
      assert(math.abs(f - p) < 1e-5, s"bin $i: minimax $f vs PAV $p")
    }
  }

  test("q_srm: flag agrees with the emitted chi-square statistic") {
    val r = rows("q_srm")
    assert(r.nonEmpty)
    r.foreach { row =>
      val chi2 = row.getAs[Double]("chi2")
      val flag = row.getAs[Long]("srm_flag")
      // the integer decision must match the float statistic at 3.841
      if (chi2 > 3.8411) assert(flag == 1L, s"day ${row.getAs[Long]("day")}")
      if (chi2 < 3.8409) assert(flag == 0L, s"day ${row.getAs[Long]("day")}")
    }
  }

  test("q_freshness: the freshest stream has zero lag") {
    val r = rows("q_freshness")
    assert(r.nonEmpty)
    assert(r.map(_.getAs[Long]("lag_min")).min == 0L,
      "some stream must own the watermark")
    r.foreach { row =>
      val lag = row.getAs[Long]("lag_min")
      assert((lag > 60L) == (row.getAs[Long]("stale") == 1L))
      assert(row.getAs[Long]("n_last_day") >= 0L)
    }
  }

  test("q_rouge: a document scores 10000bp against itself") {
    // identity property probed indirectly: clipped overlap ≤ ref mass
    val r = rows("q_rouge")
    assert(r.length == 250)
    r.foreach { row =>
      val r1 = row.getAs[Long]("rouge1_bp"); val r2 = row.getAs[Long]("rouge2_bp")
      assert(r1 >= 0L && r1 <= 10000L)
      assert(r2 >= 0L && r2 <= 10000L)
      // bigram recall cannot exceed unigram recall by much on natural
      // text, but the hard invariant is only the range; pin a soft one:
      // if NO unigram overlaps, no bigram can either
      if (r1 == 0L) assert(r2 == 0L, s"pair ${row.getAs[Long]("pair")}")
    }
  }

  test("q_bleu: score bounded by 1 and zero-overlap floors at smoothing") {
    val r = rows("q_bleu")
    assert(r.length == 250)
    r.foreach { row =>
      val b = row.getAs[Double]("bleu2")
      assert(b >= 0.0 && b <= 1.0 + 1e-9, s"pair ${row.getAs[Long]("pair")}")
      assert(row.getAs[Long]("clip1") <= row.getAs[Long]("ct1"))
      assert(row.getAs[Long]("clip2") <= row.getAs[Long]("ct2"))
    }
  }

  test("q_pass_at_k: estimator matches exhaustive subset enumeration") {
    val r = rows("q_pass_at_k")
    assert(r.length == 100)
    r.foreach { row =>
      val c = row.getAs[Long]("c").toInt
      // exhaustive: fraction of 5-subsets of 10 samples with ≥1 correct
      val idx = (0 until 10).toList
      val correctSet = (0 until 10).filter { i =>
        val d = row.getAs[Long]("doc_id")
        (d * 7919L + i * 104729L + i.toLong * i * 31L) % 4 == 0
      }.toSet
      assert(correctSet.size == c, s"doc ${row.getAs[Long]("doc_id")}")
      val subsets = idx.combinations(5).toSeq
      val hit = subsets.count(_.exists(correctSet)).toDouble / subsets.size
      assert(math.abs(row.getAs[Double]("pass_at_5") - hit) < 1e-5,
        s"doc ${row.getAs[Long]("doc_id")}: closed form vs enumeration")
      assert(math.abs(row.getAs[Double]("pass_at_1") - c / 10.0) < 1e-9)
    }
  }

  test("q_conformal: coverage honors the finite-sample guarantee") {
    val r = rows("q_conformal")
    assert(r.nonEmpty)
    r.foreach { row =>
      val cover = row.getAs[Long]("cover_bp")
      // split conformal at α=0.1: coverage concentrates near 9000bp;
      // with exchangeable halves a drop below 80% flags a broken rank
      assert(cover >= 8000L, s"${row.getAs[String]("event_type")} covers ${cover}bp")
      assert(row.getAs[Long]("n_covered") <= row.getAs[Long]("n_test"))
      assert(row.getAs[Long]("q_hat_c") > 0L)
    }
  }

  test("q_ips_eval: SNIPS stays inside [0,1] and IPS is unbiased-shaped") {
    val r = rows("q_ips_eval").head
    val ips = r.getAs[Double]("v_ips"); val snips = r.getAs[Double]("v_snips")
    // rewards are 0/1 → SNIPS is a weighted mean of rewards
    assert(snips >= 0.0 && snips <= 1.0, s"snips $snips")
    assert(ips >= 0.0, s"ips $ips")
    assert(r.getAs[Long]("n") > 0L)
  }

  test("q_knn_classify: beats the majority-class baseline on accuracy") {
    val r = rows("q_knn_classify")
    assert(r.length == 20)
    r.foreach { row =>
      assert(row.getAs[Long]("n_votes") >= 1L && row.getAs[Long]("n_votes") <= 10L)
      assert((row.getAs[Long]("correct") == 1L) ==
        (row.getAs[Long]("true_label") == row.getAs[Long]("pred_label")))
    }
    // labels are ~uniform over 10 classes: random guessing is ~10%; the
    // classifier must do at least SOMETHING with structure (≥ 1 hit)
    assert(r.map(_.getAs[Long]("correct")).sum >= 1L,
      "kNN classified nothing correctly — ranking or vote logic broken")
  }

  test("q_phrase_search: index hits agree with a straight-Scala scan") {
    val docs = graft.core.Tables.load(spark, sf, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1))
    // reconstruct the deterministic phrase: most frequent initial
    // trigram, ties broken lexicographically (the query's ORDER BY)
    val byCount = docs.collect { case (_, t) if t.length >= 3 => t.take(3).toSeq }
      .groupBy(identity).view.mapValues(_.length).toMap
    val maxC = byCount.values.max
    val chosen = byCount.filter(_._2 == maxC).keys.toSeq
      .minBy(p => (p(0), p(1), p(2)))
    val expected = docs.flatMap { case (id, toks) =>
      val occ = toks.indices.filter(i => i + 2 < toks.length &&
        toks(i) == chosen(0) && toks(i + 1) == chosen(1) && toks(i + 2) == chosen(2))
      if (occ.nonEmpty) Some(id -> ((occ.length.toLong, occ.head.toLong))) else None
    }.toMap
    val got = rows("q_phrase_search")
    assert(got.nonEmpty)
    assert(got.length == expected.size, s"${got.length} vs ${expected.size}")
    got.foreach { row =>
      val (n, first) = expected(row.getAs[Long]("doc_id"))
      assert(row.getAs[Long]("n_occur") == n)
      assert(row.getAs[Long]("first_pos") == first)
      assert(row.getAs[Long]("scan_hit") == 1L)
    }
  }

  test("q_critical_path: finishes match a topological-order relaxation") {
    val durs = (0L until 100L).map(t => t -> (t % 10 + 1)).toMap
    val finish = scala.collection.mutable.Map[Long, Long]()
    for (t <- 0L until 100L) { // tasks sorted = topological (edges increase)
      val preds = Seq(t - 7, t - 13).filter(p => p >= 0 && p < 100)
      val base = preds.map(p => finish(p)).maxOption.getOrElse(0L)
      finish(t) = base + durs(t)
    }
    val r = rows("q_critical_path")
    assert(r.length == 100)
    val cp = finish.values.max
    r.foreach { row =>
      val t = row.getAs[Long]("task")
      assert(row.getAs[Long]("finish") == finish(t), s"task $t")
      assert(row.getAs[Long]("critical_path") == cp)
    }
  }

  test("q_qte: decile values are genuine order statistics per arm") {
    import org.apache.spark.sql.functions.{col, expr, sum => fsum}
    val per = graft.core.Tables.events(spark, sf).groupBy("user_id")
      .agg(fsum(expr("CAST(round(value * 100.0) AS BIGINT)")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val a = per.filter(_._1 % 2 == 0).sortBy(x => (x._2, x._1)).map(_._2)
    val b = per.filter(_._1 % 2 == 1).sortBy(x => (x._2, x._1)).map(_._2)
    def kth(xs: Array[Long], q: Int): Long =
      xs((q * xs.length + 9) / 10 - 1) // ceil(q·n/10), 1-based → 0-based
    val r = rows("q_qte")
    assert(r.length == 9)
    r.foreach { row =>
      val q = row.getAs[Long]("q").toInt
      assert(row.getAs[Long]("v_a") == kth(a, q), s"decile $q arm a")
      assert(row.getAs[Long]("v_b") == kth(b, q), s"decile $q arm b")
      assert(row.getAs[Long]("qte_c") ==
        row.getAs[Long]("v_b") - row.getAs[Long]("v_a"))
    }
  }

  test("q_feature_cutoff: feature and label windows are disjoint by time") {
    import org.apache.spark.sql.functions.{col, max => fmax, unix_micros}
    val ev = graft.core.Tables.events(spark, sf)
      .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val usPerDay = 86400000000L
    val t = ev.map(_._3).max - 14L * usPerDay
    val featEv = ev.filter(e => e._3 >= t - 14L * usPerDay && e._3 < t)
    val labelUsers = ev.filter(e => e._3 >= t && e._2 == "purchase")
      .map(_._1).toSet
    val expected = featEv.groupBy(_._1).map { case (u, es) =>
      u -> ((es.length.toLong,
        es.count(_._2 == "purchase").toLong,
        if (labelUsers(u)) 1L else 0L))
    }
    val got = rows("q_feature_cutoff")
    assert(got.length == expected.size)
    got.foreach { row =>
      val (n, p, l) = expected(row.getAs[Long]("user_id"))
      assert(row.getAs[Long]("n_events") == n)
      assert(row.getAs[Long]("n_purchases") == p)
      assert(row.getAs[Long]("label") == l)
      assert(row.getAs[Long]("gap_min") >= 0L)
    }
  }

  test("q_simpson: flag only fires on a genuine reversal") {
    val r = rows("q_simpson")
    val segs = r.filter(_.getAs[Long]("seg") >= 0L)
    val pooled = r.find(_.getAs[Long]("seg") == -1L).get
    assert(segs.length == 5)
    // pooled counts are the segment sums
    assert(segs.map(_.getAs[Long]("na")).sum == pooled.getAs[Long]("na"))
    assert(segs.map(_.getAs[Long]("nb")).sum == pooled.getAs[Long]("nb"))
    val dirs = segs.map(_.getAs[Long]("dir")).distinct
    val flag = pooled.getAs[Long]("simpson_flag")
    if (flag == 1L)
      assert(dirs.length == 1 && dirs.head != 0L &&
        pooled.getAs[Long]("dir") == -dirs.head)
    else
      assert(!(dirs.length == 1 && dirs.head != 0L &&
        pooled.getAs[Long]("dir") == -dirs.head))
  }

  test("q_coec: expected clicks sum to total clicks corpus-wide") {
    val r = rows("q_coec")
    assert(r.nonEmpty)
    // Σ_u E[clicks_u] = Σ_pos n_pos·prior(pos) = Σ_pos clicks_pos = total
    val totalClicks = r.map(_.getAs[Long]("n_clicks")).sum.toDouble
    val totalExpected = r.map(_.getAs[Double]("expected")).sum
    assert(math.abs(totalClicks - totalExpected) < 1e-3,
      s"calibration broken: $totalClicks clicks vs $totalExpected expected")
  }

  test("q_data_shapley: efficiency — Σφ·120 = 120·|vocabulary|") {
    import org.apache.spark.sql.functions.{array_distinct, col, explode, split}
    val vocab = graft.core.Tables.load(spark, sf, "documents")
      .select(explode(array_distinct(split(col("text"), " "))).as("tok"))
      .distinct().count()
    val r = rows("q_data_shapley")
    assert(r.length == 5)
    assert(r.map(_.getAs[Long]("phi_x120")).sum == 120L * vocab,
      "coverage Shapley values must sum to the full vocabulary")
    r.foreach(row => assert(row.getAs[Long]("phi_x120") >= 0L,
      "coverage is monotone — no group can have negative value"))
  }

  test("q_neyman: house size exact; high-variance strata oversampled") {
    val r = rows("q_neyman")
    assert(r.nonEmpty)
    assert(r.map(_.getAs[Long]("alloc")).sum == 1000L)
    r.foreach { row =>
      val d = row.getAs[Long]("alloc") - row.getAs[Long]("base")
      assert(d == 0L || d == 1L)
      assert(row.getAs[Double]("sh") >= 0.0)
    }
  }

  test("q_mrr: reciprocal ranks consistent with hit positions") {
    val r = rows("q_mrr")
    assert(r.length == 20)
    r.foreach { row =>
      val fh = row.getAs[Long]("first_hit")
      val rr = row.getAs[Double]("rr")
      if (fh == 0L) assert(rr == 0.0)
      else {
        assert(math.abs(rr - 1.0 / fh) < 1e-6)
        assert(fh >= 1L && fh <= 20L)
        if (fh <= 10L) assert(row.getAs[Long]("recall_at_10") == 1L)
      }
    }
  }

  test("q_stump: chosen threshold minimizes Gini over an exhaustive sweep") {
    import org.apache.spark.sql.functions.{col, count => fcount, max => fmax, when => fwhen}
    val per = graft.core.Tables.events(spark, sf).groupBy("user_id")
      .agg(fcount(col("event_id")).as("x"),
        fmax(fwhen(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    val xs = per.map(_._1).distinct.sorted
    def gini(th: Long): Double = {
      val (l, r) = per.partition(_._1 <= th)
      if (l.isEmpty || r.isEmpty) Double.MaxValue
      else {
        def g(side: Array[(Long, Long)]): Double = {
          val n = side.length.toDouble; val p = side.map(_._2).sum.toDouble
          2 * p * (n - p) / (n * n)
        }
        (l.length * g(l) + r.length * g(r)) / per.length
      }
    }
    val best = xs.dropRight(1).map(gini).min
    val row = rows("q_stump").head
    assert(math.abs(row.getAs[Double]("gini") - best) < 1e-6,
      s"stump gini ${row.getAs[Double]("gini")} vs brute $best")
    assert(row.getAs[Long]("p1") <= row.getAs[Long]("n1"))
    assert(row.getAs[Long]("p2") <= row.getAs[Long]("n2"))
  }

  test("q_venn: regions partition the cohort union") {
    val r = rows("q_venn")
    assert(r.length >= 3, "cohorts failed to decompose")
    val total = r.map(_.getAs[Long]("n_users")).sum
    r.foreach { row =>
      val m = row.getAs[Long]("mask")
      assert(m >= 1L && m <= 7L)
      assert((m & 1L) > 0 == (row.getAs[Long]("big_ticket") == 1L))
    }
    assert(r.map(_.getAs[Long]("mask")).distinct.length == r.length)
    assert(total > 0)
  }

  test("q_chi2_select: statistics non-negative, dof matches categories") {
    val r = rows("q_chi2_select")
    assert(r.map(_.getAs[String]("feature")).sorted.toSeq ==
      Seq("bal_sign", "mktsegment", "region"))
    r.foreach { row =>
      assert(row.getAs[Double]("chi2") >= 0.0)
      assert(row.getAs[Long]("dof") == row.getAs[Long]("n_cats") - 1L)
    }
  }

  test("q_boost: weights double on mistakes — total mass is accounted") {
    val r = rows("q_boost").sortBy(_.getAs[Long]("round"))
    assert(r.length == 3)
    // round r+1's total weight = wtot_r + err_r (mistakes add their mass)
    r.zip(r.tail).foreach { case (a, b) =>
      assert(b.getAs[Long]("wtot") ==
        a.getAs[Long]("wtot") + a.getAs[Long]("err"),
        s"round ${b.getAs[Long]("round")} mass not conserved")
    }
    r.foreach { row =>
      // a stump is never worse than predicting one class everywhere
      assert(2 * row.getAs[Long]("err") <= row.getAs[Long]("wtot"),
        s"round ${row.getAs[Long]("round")} worse than majority")
      assert(Set(0L, 1L).contains(row.getAs[Long]("orient")))
    }
  }

  test("q_label_noise: disagreement bounded by k and flags consistent") {
    val r = rows("q_label_noise")
    assert(r.length == 100)
    r.foreach { row =>
      val d = row.getAs[Long]("n_disagree")
      assert(d >= 0L && d <= 10L)
      assert((d >= 8L) == (row.getAs[Long]("suspect") == 1L))
    }
  }

  test("q_uncertainty: batch is the 20 smallest margins, sorted") {
    val r = rows("q_uncertainty")
    assert(r.length == 20)
    val margins = r.sortBy(_.getAs[Long]("rank")).map(_.getAs[Long]("margin"))
    assert(margins.zip(margins.tail).forall { case (a, b) => a <= b })
    assert(margins.forall(m => m >= 0L && m <= 10L))
    assert(r.map(_.getAs[Long]("pid")).distinct.length == 20)
  }

  test("q_did: the estimate equals the four cell means' double difference") {
    val r = rows("q_did").head
    val did = (r.getAs[Double]("m_t_post") - r.getAs[Double]("m_t_pre")) -
      (r.getAs[Double]("m_c_post") - r.getAs[Double]("m_c_pre"))
    assert(math.abs(r.getAs[Double]("did") - did) < 1e-5)
  }

  test("q_blocking_eval: metrics bounded, truth non-vacuous") {
    val r = rows("q_blocking_eval").head
    assert(r.getAs[Long]("n_truth") > 0L, "no ground-truth pairs at this sf")
    assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_truth"))
    assert(r.getAs[Long]("n_hit") <= r.getAs[Long]("n_cand"))
    assert(r.getAs[Long]("rr_bp") >= 9000L,
      "blocking must prune at least 90% of the pair space")
    assert(r.getAs[Long]("pc_bp") >= 5000L,
      "banding should catch most 0.8-similar pairs")
  }

  test("q_capture_recapture: estimator within 10% and capture partial") {
    val r = rows("q_capture_recapture").head
    assert(r.getAs[Long]("m") > 0L)
    assert(r.getAs[Long]("m") <= math.min(r.getAs[Long]("n1"), r.getAs[Long]("n2")))
    // the samples must NOT be a census, or the estimator is vacuous
    assert(r.getAs[Long]("n1") < r.getAs[Long]("n_true"))
    assert(math.abs(r.getAs[Long]("err_bp")) <= 1000L,
      s"Lincoln-Petersen off by ${r.getAs[Long]("err_bp")}bp")
  }

  test("q_assortativity: a genuine correlation in [-1, 1]") {
    val r = rows("q_assortativity").head
    val a = r.getAs[Double]("assortativity")
    assert(a >= -1.0 - 1e-9 && a <= 1.0 + 1e-9, s"assortativity $a")
    assert(r.getAs[Long]("m2") > 0L && r.getAs[Long]("m2") % 2 == 0,
      "symmetrized pair count must be even")
  }

  test("q_qini: curve starts near zero and deciles partition users") {
    val r = rows("q_qini")
    assert(r.length == 10)
    val users = graft.core.Tables.events(spark, sf)
      .select("user_id").distinct().count()
    assert(r.map(x => x.getAs[Long]("nt") + x.getAs[Long]("nc")).sum == users)
    r.foreach { row =>
      assert(row.getAs[Long]("yt") <= row.getAs[Long]("nt"))
      assert(row.getAs[Long]("yc") <= row.getAs[Long]("nc"))
    }
  }

  test("q_psm_att: stratified ATT is a convex combination of bin gaps") {
    val r = rows("q_psm_att").head
    assert(r.getAs[Long]("n_bins") >= 1L && r.getAs[Long]("n_bins") <= 5L)
    assert(r.getAs[Long]("n_treated") > 0L)
    // per-user binary outcomes bound any weighted mean difference
    val att = r.getAs[Double]("att")
    assert(att >= -1.0 - 1e-9 && att <= 1.0 + 1e-9, s"att $att")
  }

  test("q_mase: common support and a finite positive scale") {
    val r = rows("q_mase").head
    assert(r.getAs[Long]("n") > 7L)
    assert(r.getAs[Long]("ae1") > 0L, "degenerate naive scale")
    val m = r.getAs[Double]("mase")
    assert(m > 0.0 && !m.isInfinite)
  }

  test("q_kappa: kappa below raw agreement, marginals consistent") {
    val r = rows("q_kappa").head
    val n = r.getAs[Long]("n")
    val po = r.getAs[Long]("po_num").toDouble / n
    val pe = r.getAs[Long]("pe_num").toDouble / (n.toDouble * n)
    val kappa = r.getAs[Double]("kappa")
    assert(math.abs(kappa - (po - pe) / (1 - pe)) < 1e-5)
    assert(kappa <= po + 1e-9, "chance correction can only lower agreement")
    assert(pe > 0.0 && pe < 1.0)
  }

  test("q_ivm_topk: incremental candidates reproduce the full recompute") {
    import org.apache.spark.sql.functions.{col, expr, sum => fsum}
    val base = graft.core.Tables.load(spark, sf, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val spend = base.groupBy(_._1).map { case (ck, rs) =>
      ck -> (rs.map(_._3).sum +
        rs.filter(_._2 % 19 == 0).map(_._3 + 500L).sum)
    }
    val expected = spend.toSeq.sortBy { case (ck, sp) => (-sp, ck) }.take(10)
    val got = rows("q_ivm_topk").sortBy(_.getAs[Long]("rk"))
    assert(got.length == 10)
    got.zip(expected).foreach { case (row, (ck, sp)) =>
      assert(row.getAs[Long]("ck") == ck, s"rank ${row.getAs[Long]("rk")}")
      assert(row.getAs[Long]("spend") == sp)
    }
  }

  test("q_wilcoxon: rank mass conserved — W⁺ + W⁻ = n(n+1)/2") {
    val r = rows("q_wilcoxon").head
    val n = r.getAs[Long]("n")
    assert(r.getAs[Long]("w_plus_x2") + r.getAs[Long]("w_minus_x2") ==
      n * (n + 1), "doubled rank sums must total 2·n(n+1)/2")
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("q_theil_sen: the median slope is a genuine pairwise slope") {
    import org.apache.spark.sql.functions.{col, expr, sum => fsum}
    val usPerDay = 86400000000L
    val days = graft.core.Tables.load(spark, sf, "orders")
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("us"),
        expr("CAST((CAST(round(o_totalprice * 100.0) AS BIGINT) " +
          "- CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT)")
          .as("usd"))
      .withColumn("day", expr(s"CAST((us - us % $usPerDay) / $usPerDay AS BIGINT)"))
      .groupBy("day").agg(fsum(col("usd")).as("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val dm = days.map(_._1).max
    val windowed = days.filter(_._1 > dm - 120L)
    val slopes = (for {
      (d1, v1) <- windowed; (d2, v2) <- windowed if d1 < d2
    } yield (v2 - v1).toDouble / (d2 - d1)).sorted
    val r = rows("q_theil_sen").head
    assert(r.getAs[Long]("n_pairs") == slopes.length.toLong)
    val lowerMedian = slopes((slopes.length + 1) / 2 - 1)
    assert(math.abs(r.getAs[Double]("slope") - lowerMedian) < 1e-4,
      s"query ${r.getAs[Double]("slope")} vs brute $lowerMedian")
  }

  test("q_ipf: raking converges the row marginals toward the target") {
    val r = rows("q_ipf")
    assert(r.length >= 20) // 5×5 minus possibly-empty cells
    val n = graft.core.Tables.load(spark, sf, "customer").count()
    assert(n % 5 == 0, "the spec's equal-target assumption")
    val tgt = n / 5 * 100000L
    val rowSums = r.groupBy(_.getAs[Long]("r")).view
      .mapValues(_.map(_.getAs[Long]("w")).sum)
    // after a final COLUMN step rows drift, but must stay within 2%
    rowSums.foreach { case (row, s) =>
      assert(math.abs(s - tgt) <= tgt / 50, s"row $row at $s vs target $tgt")
    }
    val err = r.head.getAs[Long]("max_row_err")
    assert(err == rowSums.values.map(s => math.abs(s - tgt)).max)
  }

  test("q_zipf: slope falls, and the synthetic corpus reads as synthetic") {
    val r = rows("q_zipf").head
    // the fixture vocabulary is ~31 templated words — top-100 clips there
    assert(r.getAs[Long]("n") >= 20L && r.getAs[Long]("n") <= 100L)
    val slope = r.getAs[Double]("slope")
    assert(slope < 0.0, "rank-frequency slope must fall")
    // natural language sits near -1; the near-uniform synthetic corpus
    // must read FLAT — that detection is the query's purpose
    assert(slope > -0.5, s"synthetic corpus should have a flat slope, got $slope")
    val r2 = r.getAs[Double]("r2")
    assert(r2 >= 0.0 && r2 <= 1.0 + 1e-9)
  }

  test("q_silhouette: scores bounded and floors dominated by means") {
    val r = rows("q_silhouette")
    assert(r.length == 100)
    r.foreach { row =>
      val s = row.getAs[Double]("sil")
      assert(s >= -1.0 - 1e-9 && s <= 1.0 + 1e-9)
      assert(row.getAs[Long]("a_d2") > 0L && row.getAs[Long]("b_d2") > 0L)
      // sil sign must agree with the floor comparison (floors differ
      // from means by < 1, means differ by far more)
      if (row.getAs[Long]("b_d2") > row.getAs[Long]("a_d2") + 1) assert(s > 0)
      if (row.getAs[Long]("b_d2") + 1 < row.getAs[Long]("a_d2")) assert(s < 0)
    }
  }

  test("q_hash_balance: totals account for every order, mixer roughly fair") {
    val r = rows("q_hash_balance").head
    val orders = graft.core.Tables.load(spark, sf, "orders").count()
    assert(r.getAs[Long]("total") == orders)
    assert(r.getAs[Long]("min_sz") >= 1L)
    assert(r.getAs[Long]("max_over_mean_bp") >= 10000L)
    assert(r.getAs[Long]("max_over_mean_bp") <= 30000L,
      "a 3x hot bucket means the mixer is broken")
  }

  test("q_modularity: Q bounded and communities account for all degree") {
    val r = rows("q_modularity")
    val per = r.filter(_.getAs[Long]("nat") >= 0L)
    val summary = r.find(_.getAs[Long]("nat") == -1L).get
    // every edge endpoint counted exactly once across communities
    assert(per.map(_.getAs[Long]("deg")).sum == 2L * summary.getAs[Long]("e_in"))
    val q = summary.getAs[Double]("q_part")
    assert(q >= -1.0 - 1e-9 && q <= 1.0 + 1e-9, s"modularity $q")
    assert(per.map(_.getAs[Long]("e_in")).sum <= summary.getAs[Long]("e_in"))
  }

  test("q_iv_wald: first stage is genuine and LATE is finite") {
    val r = rows("q_iv_wald").head
    val d1 = r.getAs[Long]("d1").toDouble / r.getAs[Long]("n1")
    val d0 = r.getAs[Long]("d0").toDouble / r.getAs[Long]("n0")
    assert(d1 > d0, "encouragement must raise take-up (first stage)")
    assert(!r.getAs[Double]("late").isNaN && !r.getAs[Double]("late").isInfinite)
  }

  test("q_salt_eval: salting collapses the hot partition") {
    val r = rows("q_salt_eval").head
    assert(r.getAs[Long]("raw_max") > r.getAs[Long]("salted_max"),
      "salting must shrink the hottest partition")
    // a third of rows on one key → the raw hot partition is ≥ 3× mean;
    // after 16-way salting the tail must fall below 2× mean
    assert(r.getAs[Long]("raw_max_over_mean_bp") >= 30000L)
    assert(r.getAs[Long]("salted_max_over_mean_bp") <= 20000L)
  }

  test("q_haar: matches a straight-Scala cascade with Parseval per level") {
    import org.apache.spark.sql.functions.{col, expr, sum => fsum}
    val usPerDay = 86400000000L
    var series = graft.core.Tables.load(spark, sf, "orders")
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("us"),
        expr("CAST((CAST(round(o_totalprice * 100.0) AS BIGINT) " +
          "- CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT)")
          .as("usd"))
      .withColumn("day", expr(s"CAST((us - us % $usPerDay) / $usPerDay AS BIGINT)"))
      .groupBy("day").agg(fsum(col("usd")).as("v"))
      .orderBy("day").collect().map(_.getLong(1))
    val got = rows("q_haar").sortBy(_.getAs[Long]("level"))
    got.foreach { row =>
      val pairs = series.grouped(2).filter(_.length == 2).toArray
      val s2 = pairs.map(p => { val s = p(0) + p(1); s * s }).sum
      val d2 = pairs.map(p => { val d = p(0) - p(1); d * d }).sum
      assert(row.getAs[Long]("n_pairs") == pairs.length.toLong)
      assert(row.getAs[Long]("smooth_energy") == s2,
        s"level ${row.getAs[Long]("level")} smooth")
      assert(row.getAs[Long]("detail_energy") == d2,
        s"level ${row.getAs[Long]("level")} detail")
      // Parseval on the unnormalized transform
      val in2 = pairs.map(p => p(0) * p(0) + p(1) * p(1)).sum
      assert(s2 + d2 == 2 * in2, "Parseval violated")
      series = pairs.map(p => p(0) + p(1))
    }
  }

  test("q_eta_squared: effect size in [0,1], F consistent in sign") {
    val r = rows("q_eta_squared").head
    val eta2 = r.getAs[Double]("eta2")
    assert(eta2 >= -1e-9 && eta2 <= 1.0 + 1e-9, s"eta2 $eta2")
    assert(r.getAs[Long]("k") <= 7L)
    assert(r.getAs[Double]("f_stat") >= 0.0)
  }

  test("q_bh_fdr: rejections form a prefix of the p-value order") {
    val r = rows("q_bh_fdr")
    assert(r.length == 5)
    r.foreach { row =>
      val p = row.getAs[Long]("p_num")
      assert(p >= 1L && p <= 201L)
    }
    val byRank = r.sortBy(_.getAs[Long]("rank"))
    val flags = byRank.map(_.getAs[Long]("rejected"))
    assert(!flags.zip(flags.tail).exists { case (a, b) => a == 0L && b == 1L },
      "BH rejections must be a prefix of the rank order")
    // step-up consistency: the last rejected rank satisfies the BH bound
    byRank.filter(_.getAs[Long]("rejected") == 1L).lastOption.foreach { last =>
      assert(last.getAs[Long]("p_num") * 25L <= last.getAs[Long]("rank") * 201L)
    }
  }

  test("q_sketch_merge: the merge monoid law holds exactly") {
    val r = rows("q_sketch_merge").head
    assert(r.getAs[Long]("gap") == 0L,
      "merging half-corpus sketches must reproduce the full sketch EXACTLY")
    assert(r.getAs[Long]("estimate") > 0L)
  }

  test("q_stationary: the long-run occupancy is a near-distribution") {
    val r = rows("q_stationary")
    assert(r.length == 5)
    val total = r.map(_.getAs[Long]("pi_ppm")).sum
    // floor losses shave < 5ppm per step; 24 steps stay within 1%
    assert(total > 990000L && total <= 1000000L, s"π sums to ${total}ppm")
    r.foreach(row => assert(row.getAs[Long]("pi_ppm") > 0L,
      s"state ${row.getAs[String]("state")} starved"))
  }

  test("q_seasonal_residuals: flagged days genuinely exceed 3×MAD") {
    val r = rows("q_seasonal_residuals")
    assert(r.nonEmpty, "fixture must produce at least one seasonal outlier")
    r.foreach { row =>
      assert(math.abs(row.getAs[Long]("r")) > 3L * row.getAs[Long]("mad"))
      assert(row.getAs[Long]("r") == row.getAs[Long]("v") - row.getAs[Long]("med"))
      assert(row.getAs[Long]("dow") == ((row.getAs[Long]("day") % 7) + 7) % 7)
    }
  }

  test("q_gsp3: 3-sequence support never exceeds its 2-sequence prefixes") {
    val pairs = rows("q_seq_pairs")
      .map(r => (r.getAs[String]("ta"), r.getAs[String]("tb")) ->
        r.getAs[Long]("support")).toMap
    val r = rows("q_gsp3")
    assert(r.nonEmpty)
    r.foreach { row =>
      val (t1, t2, t3) = (row.getAs[String]("t1"), row.getAs[String]("t2"),
        row.getAs[String]("t3"))
      val s3 = row.getAs[Long]("support")
      // anti-monotonicity: support(t1→t2→t3) ≤ support(t1→t3)
      pairs.get((t1, t3)).foreach(s2 => assert(s3 <= s2, s"$t1→$t2→$t3"))
    }
  }

  test("q_log_odds: symmetric counts — z signs match count imbalance") {
    val r = rows("q_log_odds")
    assert(r.length == 20)
    r.foreach { row =>
      val z = row.getAs[Double]("z")
      assert(!z.isNaN && !z.isInfinite)
      // the prior dominates but the SIGN must track which group uses
      // the term more (relative to corpus-size normalization)
      assert(row.getAs[Long]("y1") + row.getAs[Long]("y2") > 0L)
    }
  }

  test("q_weighted_median: half the weight sits on each side") {
    import org.apache.spark.sql.functions.{col, count => fcount}
    val r = rows("q_weighted_median")
    assert(r.nonEmpty)
    // replay: per nation, cumulative-weight rule on collected data
    val li = graft.core.Tables.load(spark, sf, "lineitem")
      .groupBy("l_orderkey").agg(fcount(col("l_linenumber")).as("w"))
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    val cust = graft.core.Tables.load(spark, sf, "customer")
      .select("c_custkey", "c_nationkey").collect()
      .map(x => x.getLong(0) -> x.getInt(1).toLong).toMap
    val orders = graft.core.Tables.load(spark, sf, "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice").collect()
      .flatMap { x =>
        val ok = x.getLong(0)
        li.get(ok).map(w => (cust(x.getLong(1)),
          math.round(x.getDouble(2) * 100.0), w, ok))
      }
    val expected = orders.groupBy(_._1).view.mapValues { rs =>
      val sorted = rs.sortBy(x => (x._2, x._4))
      val tw = sorted.map(_._3).sum
      var cw = 0L
      sorted.find { x => cw += x._3; cw * 2 >= tw }.get._2
    }.toMap
    r.foreach { row =>
      assert(row.getAs[Long]("wmedian_c") == expected(row.getAs[Long]("nat")),
        s"nation ${row.getAs[Long]("nat")}")
    }
  }

  test("q_kendall / q_spearman: rank correlations agree with brute force") {
    import org.apache.spark.sql.functions.{col, count => fcount, expr, sum => fsum}
    val per = graft.core.Tables.events(spark, sf).groupBy("user_id")
      .agg(fcount(col("event_id")).as("x"),
        fsum(expr("CAST(round(value * 100.0) AS BIGINT)")).as("y"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // brute Kendall
    var (nc, ndk) = (0L, 0L)
    for (i <- per.indices; j <- (i + 1) until per.length) {
      val s = (per(i)._1 - per(j)._1).sign * (per(i)._2 - per(j)._2).sign
      if (s > 0) nc += 1 else if (s < 0) ndk += 1
    }
    val kr = rows("q_kendall").head
    assert(kr.getAs[Long]("nc") == nc && kr.getAs[Long]("nd") == ndk)
    val tau = kr.getAs[Double]("tau_b")
    assert(tau >= -1.0 - 1e-9 && tau <= 1.0 + 1e-9)
    // brute Spearman via midranks
    def midranks(v: Array[Long]): Array[Double] = {
      val sorted = v.sorted
      val first = sorted.zipWithIndex.groupBy(_._1).view
        .mapValues(g => (g.map(_._2).min + 1 + g.map(_._2).max + 1) / 2.0).toMap
      v.map(first)
    }
    val rx = midranks(per.map(_._1)); val ry = midranks(per.map(_._2))
    val n = per.length.toDouble
    val mx = rx.sum / n; val my = ry.sum / n
    val cov = rx.zip(ry).map { case (a, b) => (a - mx) * (b - my) }.sum
    val vx = rx.map(a => (a - mx) * (a - mx)).sum
    val vy = ry.map(b => (b - my) * (b - my)).sum
    val rhoBrute = cov / math.sqrt(vx * vy)
    val sr = rows("q_spearman").head
    assert(math.abs(sr.getAs[Double]("rho") - rhoBrute) < 1e-4,
      s"spearman ${sr.getAs[Double]("rho")} vs brute $rhoBrute")
    // activity and spend are near-monotone by construction
    assert(tau > 0.5 && sr.getAs[Double]("rho") > 0.5)
  }

  test("q_ccf: lag zero present, all correlations bounded") {
    val r = rows("q_ccf")
    assert(r.map(_.getAs[Long]("lag")).toSet == (-7L to 7L).toSet)
    r.foreach { row =>
      val c = row.getAs[Double]("ccf")
      assert(c >= -1.0 - 1e-9 && c <= 1.0 + 1e-9)
      assert(row.getAs[Long]("n") > 0L)
    }
  }

  test("q_mann_kendall: S matches the Kendall machinery on time order") {
    val r = rows("q_mann_kendall").head
    val n = r.getAs[Long]("n")
    assert(n > 0L && n <= 120L)
    // |S| bounded by the pair count; variance positive
    assert(math.abs(r.getAs[Long]("s")) <= n * (n - 1) / 2)
    assert(r.getAs[Long]("var18") > 0L)
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("q_runs_test: run count bounded by its combinatorial limits") {
    val r = rows("q_runs_test").head
    val (runs, p, m) = (r.getAs[Long]("n_runs"), r.getAs[Long]("n_pos"),
      r.getAs[Long]("n_neg"))
    assert(runs >= 2L, "a two-class sequence has at least 2 runs")
    assert(runs <= 2 * math.min(p, m) + 1, "runs exceed the alternation bound")
    assert(!r.getAs[Double]("z").isNaN)
  }

  test("q_conductance: cut mass consistent with the modularity graph") {
    val r = rows("q_conductance")
    assert(r.nonEmpty)
    r.foreach { row =>
      assert(row.getAs[Long]("cut") <= row.getAs[Long]("vol"))
      val phi = row.getAs[Double]("phi")
      assert(phi >= 0.0 && phi <= 1.0 + 1e-9, s"phi $phi")
    }
    // total cut counted from both sides must be even (each cross edge twice)
    assert(r.map(_.getAs[Long]("cut")).sum % 2 == 0)
  }

  test("q_welch_t: df bounded by the classical Welch limits") {
    val r = rows("q_welch_t").head
    val (n0, n1) = (r.getAs[Long]("n0"), r.getAs[Long]("n1"))
    val df = r.getAs[Double]("df")
    // min(n0,n1)−1 ≤ df ≤ n0+n1−2 always holds for Welch–Satterthwaite
    assert(df >= math.min(n0, n1) - 1 - 1e-6, s"df $df below lower bound")
    assert(df <= n0 + n1 - 2 + 1e-6, s"df $df above pooled bound")
    assert(!r.getAs[Double]("t_stat").isNaN)
  }

  test("q_block_maxima: return level dominates the Gumbel location") {
    val r = rows("q_block_maxima").head
    assert(r.getAs[Long]("nb") > 10L)
    assert(r.getAs[Double]("gumbel_sigma") > 0.0)
    // the 52-block return level sits above μ (ln(−ln(51/52)) < 0)
    assert(r.getAs[Double]("return_level_52") > r.getAs[Double]("gumbel_mu"))
  }

  test("q_influence: flagged points exceed the 4/n rule with valid leverage") {
    import org.apache.spark.sql.functions.{col, expr}
    val nDays = graft.core.Tables.load(spark, sf, "orders")
      .select(expr("CAST(unix_micros(CAST(o_orderdate AS TIMESTAMP)) / 86400000000 AS BIGINT)"))
      .distinct().count()
    val r = rows("q_influence")
    assert(r.nonEmpty, "fixture must contain influential days")
    r.foreach { row =>
      val lev = row.getAs[Double]("lev")
      assert(lev > 0.0 && lev < 1.0, s"leverage $lev outside (0,1)")
      assert(row.getAs[Double]("cooks_d") > 4.0 / nDays - 1e-6)
    }
    assert(r.length < nDays, "not every day can be influential")
  }

  test("q_mcc: bounded and consistent with the kNN accuracy") {
    val r = rows("q_mcc").head
    val mcc = r.getAs[Double]("mcc")
    assert(mcc >= -1.0 - 1e-9 && mcc <= 1.0 + 1e-9)
    assert(r.getAs[Long]("n") == 20L)
    assert(r.getAs[Long]("c") ==
      rows("q_knn_classify").map(_.getAs[Long]("correct")).sum,
      "MCC's diagonal must equal the classifier's correct count")
  }

  test("q_brier: Murphy decomposition identity holds") {
    val r = rows("q_brier").head
    val brier = r.getAs[Double]("brier")
    val id = r.getAs[Double]("reliability") - r.getAs[Double]("resolution") +
      r.getAs[Double]("uncertainty")
    assert(math.abs(brier - id) < 1e-5, "REL − RES + UNC ≠ Brier")
    assert(r.getAs[Double]("reliability") >= 0.0)
    assert(r.getAs[Double]("resolution") >= 0.0)
    assert(r.getAs[Double]("uncertainty") >= 0.0 &&
      r.getAs[Double]("uncertainty") <= 0.25 + 1e-9)
  }

  test("q_entropy_rate: bounded by the uniform-chain maximum") {
    val r = rows("q_entropy_rate").head
    val h = r.getAs[Double]("entropy_rate_nats")
    assert(h >= 0.0 && h <= math.log(5.0) + 1e-9,
      s"entropy rate $h outside [0, ln 5]")
    assert(math.abs(r.getAs[Double]("entropy_rate_bits") - h / math.log(2.0)) < 1e-5)
  }

  test("q_hill_tail: alpha positive and k-th statistic below the top") {
    val r = rows("q_hill_tail").head
    assert(r.getAs[Long]("k_used") == 99L)
    assert(r.getAs[Long]("x_k") > 0L)
    val alpha = r.getAs[Double]("hill_alpha")
    assert(alpha > 0.0 && !alpha.isInfinite, s"alpha $alpha")
  }
}
