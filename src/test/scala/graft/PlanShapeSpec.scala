package graft

import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec, SortMergeJoinExec}
import org.scalatest.funsuite.AnyFunSuite

/** Plan-shape regression guards: the shuffle/broadcast properties that
  * PERF.md claims (and that matter at 100 TB) are pinned here so a
  * refactor that silently adds an exchange or degrades a broadcast join
  * to sort-merge fails loudly instead of just getting slower.
  * Budgets are asserted on the pre-AQE physical plan at sf0.001.
  */
class PlanShapeSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  // executedPlan AFTER EnsureRequirements (sparkPlan has no exchanges
  // yet); AQE off so the plan is deterministic without running the query
  private def plan(name: String): SparkPlan = {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  private def hashShuffles(p: SparkPlan): Int = p.collect {
    case e: ShuffleExchangeExec
      if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
  }.size

  test("q1_pricing_summary: one hash shuffle (partial+final agg), no joins") {
    val p = plan("q1_pricing_summary")
    assert(hashShuffles(p) == 1, p.toString)
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty)
  }

  test("q_join_star_revenue: all-broadcast star, no sort-merge or cartesian") {
    val p = plan("q_join_star_revenue")
    assert(p.collect { case b: BroadcastHashJoinExec => b }.size >= 4,
      p.toString)
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty)
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty)
    assert(hashShuffles(p) <= 1, s"star join grew extra shuffles:\n$p")
  }

  test("q_asof_join: the union+window as-of shape keeps ONE hash shuffle") {
    val p = plan("q_asof_join")
    assert(hashShuffles(p) == 1, s"as-of join must shuffle once:\n$p")
  }

  test("q_histogram: exactly one hash shuffle between partial and final agg") {
    val p = plan("q_histogram")
    assert(hashShuffles(p) == 1, p.toString)
  }

  test("q_sweepline: raw points shuffle once; running sum over distinct days only") {
    val p = plan("q_sweepline")
    // one hash shuffle for the per-day aggregation; the window's global
    // single-partition exchange operates on distinct days, not raw rows
    assert(hashShuffles(p) == 1, p.toString)
  }

  test("q_moving_median: sliding percentile adds no shuffle beyond the partition key") {
    val p = plan("q_moving_median")
    assert(hashShuffles(p) == 1, s"window should reuse one key shuffle:\n$p")
  }

  test("q_sql_tpch_q5: dimensions broadcast, fact tables sort-merge on the order key") {
    val p = plan("q_sql_tpch_q5")
    // region/nation/supplier (and customer at this size) ride broadcasts;
    // no cartesian may sneak in through the two-condition supplier join
    assert(p.collect { case b: BroadcastHashJoinExec => b }.size >= 3,
      p.toString)
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      p.toString)
  }

  test("q_sql_tpch_q18: HAVING subquery reuses the l_orderkey shuffle key") {
    val p = plan("q_sql_tpch_q18")
    // the IN-subquery agg and the outer join both key on l_orderkey /
    // o_orderkey — the plan must not add a repartition beyond those aggs
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty)
    assert(hashShuffles(p) <= 4, s"q18 grew extra shuffles:\n$p")
  }

  test("q_decontaminate: benchmark gram set broadcasts; corpus side never reshuffles for the probe") {
    val p = plan("q_decontaminate")
    assert(p.collect { case b: BroadcastHashJoinExec => b }.size == 1,
      s"eval grams must broadcast:\n$p")
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty,
      s"contamination probe degraded to sort-merge:\n$p")
  }

  test("q_sql_tpch_q8: 8-way join rides broadcasts; one hash shuffle (the year agg)") {
    val p = plan("q_sql_tpch_q8")
    assert(p.collect { case b: BroadcastHashJoinExec => b }.size >= 5,
      s"q8 dimensions must broadcast:\n$p")
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty, p.toString)
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty, p.toString)
    assert(hashShuffles(p) <= 1, s"q8 grew extra hash shuffles:\n$p")
  }

  test("q_sql_tpch_q17: correlated avg decorrelates to a broadcast agg join") {
    val p = plan("q_sql_tpch_q17")
    // no per-row subquery re-execution: the per-part avg is ONE aggregate
    // joined back (broadcast at this SF); shuffles = that agg + nothing else
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty, p.toString)
    assert(p.collect { case b: BroadcastHashJoinExec => b }.size >= 2,
      s"part dim and avg-subquery must broadcast:\n$p")
    assert(hashShuffles(p) <= 2, s"q17 grew extra shuffles:\n$p")
  }

  test("q_pack_sequences: packing reuses the source partitioning (one hash shuffle)") {
    val p = plan("q_pack_sequences")
    // the window shuffles on source; the (source, bin) aggregation is
    // satisfied by that same partitioning — only the presentation sort
    // adds a (range) exchange
    assert(hashShuffles(p) == 1, s"packing must not reshuffle for the agg:\n$p")
  }

  test("q_line_dedup: two hash shuffles — line first-occurrence, doc reassembly") {
    val p = plan("q_line_dedup")
    assert(hashShuffles(p) == 2, s"line dedup shuffle budget:\n$p")
  }

  test("q_lateral_corr: LATERAL LIMIT rewrites to a rank window with group-limit pushdown") {
    val p = plan("q_lateral_corr")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }.nonEmpty, s"expected WindowGroupLimit (top-k pushdown):\n$p")
    assert(hashShuffles(p) == 1, s"lateral top-2 must shuffle once:\n$p")
  }

  test("q_bm25: df/avgdl ride broadcasts — no sort-merge join, no cartesian") {
    val p = plan("q_bm25")
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty,
      s"BM25 joins must broadcast (df is query-terms-sized, dl doc-sized):\n$p")
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty, p.toString)
    assert(p.collect { case b: BroadcastHashJoinExec => b }.size >= 2,
      s"expected broadcast df + dl joins:\n$p")
  }

  test("q_auc_exact: join-free — one hash shuffle to the per-score aggregate") {
    val p = plan("q_auc_exact")
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty, p.toString)
    assert(p.collect { case b: BroadcastHashJoinExec => b }.isEmpty,
      s"AUC needs no joins at all:\n$p")
    assert(hashShuffles(p) == 1,
      s"one shuffle (score groupBy); the running window rides the aggregate:\n$p")
  }

  test("q_assoc_rules: dimension and brand counts broadcast; no cartesian blowup") {
    val p = plan("q_assoc_rules")
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      s"basket self-join must key on the order id:\n$p")
    assert(p.collect { case b: BroadcastHashJoinExec => b }.size >= 2,
      s"part dim and brand-count joins should broadcast:\n$p")
  }

  // Shuffle/broadcast budgets for the rest of the adapted TPC-H suite
  // (Q5/Q8/Q17/Q18 have bespoke pins above). Each entry is the measured
  // sf0.001 budget: (max hash shuffles, min broadcast-hash joins). An
  // optimizer or query regression that adds an exchange or degrades a
  // broadcast to sort-merge/cartesian fails here, not in bench drift.
  private val tpchBudgets = Seq(
    "q_sql_tpch_q3" -> (1, 2), "q_sql_tpch_q4" -> (1, 1),
    "q_sql_tpch_q6" -> (0, 0), "q_sql_tpch_q7" -> (1, 5),
    "q_sql_tpch_q9" -> (1, 4), "q_sql_tpch_q10" -> (1, 3),
    "q_sql_tpch_q11" -> (2, 2), "q_sql_tpch_q12" -> (1, 1),
    "q_sql_tpch_q13" -> (2, 1), "q_sql_tpch_q14" -> (0, 1),
    "q_sql_tpch_q15" -> (1, 1), "q_sql_tpch_q16" -> (2, 2),
    "q_sql_tpch_q19" -> (0, 1), "q_sql_tpch_q20" -> (2, 5),
    "q_sql_tpch_q21" -> (1, 5), "q_sql_tpch_q22" -> (1, 1))

  test("q_sql_tpch_q2: dims broadcast; the partsupp/min-cost join may sort-merge (fact-fact)") {
    val p = plan("q_sql_tpch_q2")
    assert(hashShuffles(p) <= 5, s"q2 grew extra hash shuffles:\n$p")
    assert(p.collect { case b: BroadcastHashJoinExec => b }.size >= 7,
      s"q2 lost a broadcast join:\n$p")
    // the decorrelated min-supplycost join keys two partsupp-sized
    // sides on ps_partkey — sort-merge is the CORRECT 100 TB shape there
    assert(p.collect { case j: SortMergeJoinExec => j }.size <= 1,
      s"q2 degraded further broadcasts to sort-merge:\n$p")
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty, p.toString)
  }

  test("q_dpo_pairs: one shuffle, join-free — argmax rides max(struct) combine") {
    val p = plan("q_dpo_pairs")
    assert(hashShuffles(p) == 1, s"dpo pairs must be one aggregate:\n$p")
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty, p.toString)
    assert(p.toString.toLowerCase.contains("partial_merge") ||
      !p.toString.contains("Window"),
      s"no per-group window sort — the aggregate carries the argmax:\n$p")
  }

  test("q_dsir_weights: bigram LM joins stay hash-keyed; no cartesian blowup") {
    val p = plan("q_dsir_weights")
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      s"dsir must never cross-join corpora:\n$p")
    assert(hashShuffles(p) <= 6,
      s"dsir grew beyond its LM-table shuffle budget:\n$p")
  }

  test("q_skyline: no global-sort window; phase 2 is a broadcast anti-join") {
    val p = plan("q_skyline")
    val s = p.toString
    // the partition-local windows must all carry a partitionBy — a bare
    // Window.orderBy would funnel the corpus through one partition.
    // Assert it on the WindowExec nodes themselves (an unrelated
    // SinglePartition stage elsewhere in the plan must not trip this)
    val windows = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.forall(_.partitionSpec.nonEmpty),
      s"skyline grew a single-partition window funnel:\n$p")
    assert(s.contains("BroadcastNestedLoopJoin") && s.contains("LeftAnti"),
      s"phase-2 dominance must be a broadcast anti-join:\n$p")
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_rfm_ranked: NO WindowExec at all — three distributed GlobalRankExec ranks") {
    val p = plan("q_rfm_ranked")
    // the whole point of the scale twin (VERDICT r11 task 1): the same
    // RFM statistic as q_rfm with ZERO window operators — no
    // unpartitioned WindowExec can exist if no WindowExec exists
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_rfm_ranked must not use windows:\n$p")
    assert(p.collect {
      case g: graft.plans.GlobalRankExec => g
    }.size == 3, s"expected the three chained exact ranks:\n$p")
    // every DATA exchange fans out: range exchanges for the ranks (+
    // presentation sort), hash for the aggregates, broadcast for the
    // 1-row n. The only allowed SinglePartition exchange is the one
    // under the global scalar count — it carries one PARTIAL-AGG row
    // per upstream partition (cluster-sized), never data rows
    import org.apache.spark.sql.execution.aggregate.BaseAggregateExec
    val funnels = p.collect {
      case e: ShuffleExchangeExec
        if e.outputPartitioning.numPartitions == 1 &&
          // nearest aggregate below the exchange must be the scalar
          // (no-grouping) partial — anything else is a data funnel
          !e.child.collectFirst { case a: BaseAggregateExec => a }
            .exists(_.groupingExpressions.isEmpty) => e
    }
    assert(funnels.isEmpty, s"q_rfm_ranked grew a 1-partition DATA funnel:\n$p")
  }

  test("q_rank_family / q_ntile_rewrite: the rewrite rule leaves zero WindowExec, one GlobalRankExec") {
    // both queries are WRITTEN with built-in window functions; the
    // RewriteGlobalRankWindows force() path must have replaced the
    // single-partition WindowExec with one distributed GlobalRankExec
    // (all functions of the window node in ONE operator)
    for (name <- Seq("q_rank_family", "q_ntile_rewrite")) {
      val p = plan(name)
      assert(p.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }.isEmpty, s"$name kept a WindowExec:\n$p")
      assert(p.collect {
        case g: graft.plans.GlobalRankExec => g
      }.size == 1, s"$name must rank through ONE GlobalRankExec:\n$p")
    }
    // the offset-family sibling: lead/lag through ONE GlobalShiftExec
    val ps = plan("q_shift_rewrite")
    assert(ps.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_shift_rewrite kept a WindowExec:\n$ps")
    assert(ps.collect {
      case g: graft.plans.GlobalShiftExec => g
    }.size == 1, s"q_shift_rewrite must shift through ONE GlobalShiftExec:\n$ps")
    // the running-aggregate family: cumulative sums through ONE
    // GlobalRunningAggExec
    val pr = plan("q_runagg_rewrite")
    assert(pr.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_runagg_rewrite kept a WindowExec:\n$pr")
    assert(pr.collect {
      case g: graft.plans.GlobalRunningAggExec => g
    }.size == 1, s"q_runagg_rewrite must run through ONE GlobalRunningAggExec:\n$pr")
    // the widened allowlist (bit/bool reducers): all five functions of
    // the window node still land in ONE operator
    val pb = plan("q_runagg_bitbool")
    assert(pb.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_runagg_bitbool kept a WindowExec:\n$pb")
    assert(pb.collect {
      case g: graft.plans.GlobalRunningAggExec => g
    }.size == 1, s"q_runagg_bitbool must run through ONE GlobalRunningAggExec:\n$pb")
    // the moving-frame family: three different bounded ROWS frames
    // (trailing/centered/pure-future), all in ONE operator
    val pm = plan("q_movagg_rewrite")
    assert(pm.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_movagg_rewrite kept a WindowExec:\n$pm")
    assert(pm.collect {
      case g: graft.plans.GlobalMovingAggExec => g
    }.size == 1, s"q_movagg_rewrite must run through ONE GlobalMovingAggExec:\n$pm")
    // the whole-frame family (r12): ratio-to-total through ONE
    // GlobalFrameAggExec with NO exchange below it at all — the
    // OVER () constant attaches to rows where they already live
    val pf = plan("q_frameagg_rewrite")
    assert(pf.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_frameagg_rewrite kept a WindowExec:\n$pf")
    val frameExecs = pf.collect { case g: graft.plans.GlobalFrameAggExec => g }
    assert(frameExecs.size == 1,
      s"q_frameagg_rewrite must total through ONE GlobalFrameAggExec:\n$pf")
    // exactly the day-rollup's own hash exchange (plus the final
    // presentation sort's range exchange) — the whole-frame window adds
    // NO exchange and certainly no single-partition funnel
    assert(hashShuffles(pf) == 1,
      s"the whole-frame aggregate must introduce NO exchange:\n$pf")
    assert(pf.collect { case e: ShuffleExchangeExec => e }
      .forall(_.outputPartitioning.numPartitions > 1),
      s"q_frameagg_rewrite grew a 1-partition exchange:\n$pf")
    // first_value/last_value (plain + IGNORE NULLS) as running windows:
    // the ordered-allowlist widening routes all four through ONE
    // GlobalRunningAggExec
    val pfl = plan("q_firstlast_rewrite")
    assert(pfl.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_firstlast_rewrite kept a WindowExec:\n$pfl")
    assert(pfl.collect {
      case g: graft.plans.GlobalRunningAggExec => g
    }.size == 1, s"q_firstlast_rewrite must run through ONE GlobalRunningAggExec:\n$pfl")
    // nth_value (plain + IGNORE NULLS + whole-frame): all four
    // expressions through ONE GlobalNthValueExec
    val pn = plan("q_nthvalue_rewrite")
    assert(pn.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_nthvalue_rewrite kept a WindowExec:\n$pn")
    assert(pn.collect {
      case g: graft.plans.GlobalNthValueExec => g
    }.size == 1, s"q_nthvalue_rewrite must run through ONE GlobalNthValueExec:\n$pn")
    // lag IGNORE NULLS (the non-null ring) mixed with a plain lag:
    // one GlobalShiftExec for all three offsets
    val psn = plan("q_shiftnn_rewrite")
    assert(psn.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_shiftnn_rewrite kept a WindowExec:\n$psn")
    assert(psn.collect {
      case g: graft.plans.GlobalShiftExec => g
    }.size == 1, s"q_shiftnn_rewrite must shift through ONE GlobalShiftExec:\n$psn")
    // exact whole-frame percentiles: four statistics through ONE
    // GlobalExactPercentileExec, and — beyond the day-rollup's own
    // hash exchange — NO other exchange and NO 1-partition funnel
    val pp = plan("q_pctexact_rewrite")
    assert(pp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_pctexact_rewrite kept a WindowExec:\n$pp")
    assert(pp.collect {
      case g: graft.plans.GlobalExactPercentileExec => g
    }.size == 1, s"q_pctexact_rewrite must select through ONE GlobalExactPercentileExec:\n$pp")
    assert(pp.collect { case e: ShuffleExchangeExec => e }
      .forall(_.outputPartitioning.numPartitions > 1),
      s"q_pctexact_rewrite grew a 1-partition exchange:\n$pp")
    // the r13 dense-domain RANGE tier: three value-bounded frames
    // through ONE GlobalRangeMovingAggExec, zero WindowExec, no
    // 1-partition exchange anywhere
    val prm = plan("q_rangemov_rewrite")
    assert(prm.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_rangemov_rewrite kept a WindowExec:\n$prm")
    assert(prm.collect {
      case g: graft.plans.GlobalRangeMovingAggExec => g
    }.size == 1,
      s"q_rangemov_rewrite must run through ONE GlobalRangeMovingAggExec:\n$prm")
    assert(prm.collect { case e: ShuffleExchangeExec => e }
      .forall(_.outputPartitioning.numPartitions > 1),
      s"q_rangemov_rewrite grew a 1-partition exchange:\n$prm")
    // the r13 skew tier: the hot-key partitioned window runs through
    // ONE PartitionedRankExec under a composite RANGE exchange — no
    // hash-clustered WindowExec funnel for key -1's third of the corpus
    val psk = plan("q_skewrank_rewrite")
    assert(psk.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_skewrank_rewrite kept a WindowExec:\n$psk")
    assert(psk.collect {
      case g: graft.plans.PartitionedRankExec => g
    }.size == 1,
      s"q_skewrank_rewrite must rank through ONE PartitionedRankExec:\n$psk")
    // its running-aggregate sibling: cumulative per-key statistics
    // through ONE PartitionedRunningAggExec, zero WindowExec
    val psr = plan("q_skewrunagg_rewrite")
    assert(psr.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_skewrunagg_rewrite kept a WindowExec:\n$psr")
    assert(psr.collect {
      case g: graft.plans.PartitionedRunningAggExec => g
    }.size == 1,
      s"q_skewrunagg_rewrite must run through ONE PartitionedRunningAggExec:\n$psr")
    // late r13: lead IGNORE NULLS (the offset family's last retired
    // refusal) through one GlobalLookaheadExec, the plain lead through
    // GlobalShift, both on the shared range exchange
    val pln = plan("q_leadnn_rewrite")
    assert(pln.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_leadnn_rewrite kept a WindowExec:\n$pln")
    // TWO lookahead execs: each lead-IGNORE-NULLS expression gets its
    // own single-column node by design (the O(k) deque bound is
    // per-column — see GlobalLookaheadNode's rationale)
    assert(pln.collect {
      case g: graft.plans.GlobalLookaheadExec => g
    }.size == 2,
      s"q_leadnn_rewrite must look ahead through TWO single-column GlobalLookaheadExec:\n$pln")
    assert(pln.collect {
      case g: graft.plans.GlobalShiftExec => g
    }.size == 1, s"the plain lead must ride GlobalShift:\n$pln")
    // late r13: the skew tier's total-dependent modes — pr/cd in one
    // operator, ntile's total-order window in a second, zero WindowExec
    val psp = plan("q_skewpct_rewrite")
    assert(psp.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_skewpct_rewrite kept a WindowExec:\n$psp")
    assert(psp.collect {
      case g: graft.plans.PartitionedRankExec => g
    }.size == 2,
      s"q_skewpct_rewrite must rank through TWO PartitionedRankExec (pr/cd + ntile):\n$psp")
    // the skew tier's lead/lag member: all four offsets in ONE
    // PartitionedShiftExec, zero WindowExec
    val pss = plan("q_skewshift_rewrite")
    assert(pss.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_skewshift_rewrite kept a WindowExec:\n$pss")
    assert(pss.collect {
      case g: graft.plans.PartitionedShiftExec => g
    }.size == 1,
      s"q_skewshift_rewrite must shift through ONE PartitionedShiftExec:\n$pss")
    // late r13: the skew tier's bounded-ROWS moving-frame member —
    // four frames (trailing/centered/future/first_value) through ONE
    // PartitionedMovingAggExec, zero WindowExec
    val psm = plan("q_skewmovagg_rewrite")
    assert(psm.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_skewmovagg_rewrite kept a WindowExec:\n$psm")
    assert(psm.collect {
      case g: graft.plans.PartitionedMovingAggExec => g
    }.size == 1,
      s"q_skewmovagg_rewrite must run through ONE PartitionedMovingAggExec:\n$psm")
    // late r13: the whole-frame window-to-join member — zero
    // WindowExec, zero graft exec (the REWRITE is the operator: one
    // aggregate + one join over built-ins, the shape AQE can fix)
    val psf = plan("q_skewframeagg_rewrite")
    assert(psf.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_skewframeagg_rewrite kept a WindowExec:\n$psf")
    assert(psf.collect {
      case j: org.apache.spark.sql.execution.joins.BaseJoinExec => j
    }.size == 1,
      s"q_skewframeagg_rewrite must join back through ONE join:\n$psf")
    assert(psf.collect {
      case a: org.apache.spark.sql.execution.aggregate.BaseAggregateExec => a
    }.nonEmpty, s"q_skewframeagg_rewrite must aggregate per key:\n$psf")
    // late r13: moving-lower-bound nth_value (the retired non-rewrite)
    // — global frames through ONE GlobalMovingAggExec, the per-key
    // frame through ONE PartitionedMovingAggExec, zero WindowExec
    val pnm = plan("q_nthmov_rewrite")
    assert(pnm.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_nthmov_rewrite kept a WindowExec:\n$pnm")
    assert(pnm.collect {
      case g: graft.plans.GlobalMovingAggExec => g
    }.size == 1,
      s"q_nthmov_rewrite's global frames must ride ONE GlobalMovingAggExec:\n$pnm")
    assert(pnm.collect {
      case g: graft.plans.PartitionedMovingAggExec => g
    }.size == 1,
      s"q_nthmov_rewrite's per-key frame must ride ONE PartitionedMovingAggExec:\n$pnm")
    // late r13: per-key lag IGNORE NULLS (the skew tier's retired
    // non-null-ring refusal) — one PartitionedShiftExec, zero WindowExec
    val pshn = plan("q_skewshiftnn_rewrite")
    assert(pshn.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_skewshiftnn_rewrite kept a WindowExec:\n$pshn")
    assert(pshn.collect {
      case g: graft.plans.PartitionedShiftExec => g
    }.size == 1,
      s"q_skewshiftnn_rewrite must shift through ONE PartitionedShiftExec:\n$pshn")
    // late r13: the skew tier's dense-domain member — per-key RANGE
    // moving frames through ONE PartitionedRangeMovingAggExec
    val prmv = plan("q_skewrangemov_rewrite")
    assert(prmv.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_skewrangemov_rewrite kept a WindowExec:\n$prmv")
    assert(prmv.collect {
      case g: graft.plans.PartitionedRangeMovingAggExec => g
    }.size == 1,
      s"q_skewrangemov_rewrite must ride ONE PartitionedRangeMovingAggExec:\n$prmv")
    // late r13: per-key lead IGNORE NULLS — TWO single-column
    // lookahead execs (one per expression, by design) + the plain
    // lead's shift exec, zero WindowExec
    val plnn = plan("q_skewleadnn_rewrite")
    assert(plnn.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_skewleadnn_rewrite kept a WindowExec:\n$plnn")
    assert(plnn.collect {
      case g: graft.plans.PartitionedLookaheadExec => g
    }.size == 2,
      s"q_skewleadnn_rewrite must look ahead through TWO single-column PartitionedLookaheadExec:\n$plnn")
    assert(plnn.collect {
      case g: graft.plans.PartitionedShiftExec => g
    }.size == 1,
      s"q_skewleadnn_rewrite's plain lead must ride PartitionedShift:\n$plnn")
    // late r13: per-key start-anchored nth_value — the skew tier's
    // last member: ONE PartitionedNthValueExec, zero WindowExec
    val pnth = plan("q_skewnth_rewrite")
    assert(pnth.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_skewnth_rewrite kept a WindowExec:\n$pnth")
    assert(pnth.collect {
      case g: graft.plans.PartitionedNthValueExec => g
    }.size == 1,
      s"q_skewnth_rewrite must ride ONE PartitionedNthValueExec:\n$pnth")
    // late r13: descending RANGE moving frames (the retired
    // ascending-only restriction) — one global + one per-key node
    val prd = plan("q_rangemov_desc")
    assert(prd.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_rangemov_desc kept a WindowExec:\n$prd")
    assert(prd.collect {
      case g: graft.plans.GlobalRangeMovingAggExec => g
    }.size == 1, s"q_rangemov_desc's global DESC window:\n$prd")
    assert(prd.collect {
      case g: graft.plans.PartitionedRangeMovingAggExec => g
    }.size == 1, s"q_rangemov_desc's per-key DESC window:\n$prd")
  }

  test("retired ENTITY whitelist queries: zero unpartitioned WindowExec, ranks via the Global* family") {
    // r13 (VERDICT r12 task 1): the seven former ENTITY-class
    // WindowWhitelist entries now route through
    // RewriteGlobalRankWindows.force — these pins are what replaced the
    // whitelist review. Counts are exact: a query silently growing (or
    // losing) a distributed operator fails here.
    def winExecs(p: SparkPlan) = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    def ranks(p: SparkPlan) = p.collect { case g: graft.plans.GlobalRankExec => g }.size
    def frames(p: SparkPlan) = p.collect { case g: graft.plans.GlobalFrameAggExec => g }.size
    def runs(p: SparkPlan) = p.collect { case g: graft.plans.GlobalRunningAggExec => g }.size
    val expected = Seq(
      // name -> (ranks, frameAggs, runningAggs, partitioned WindowExec)
      ("q_rfm", 3, 0, 0, 0), // three ntile quartiles, one per ORDER BY
      ("q_spearman", 2, 0, 0, 2), // ranks distributed; per-x/per-y tie
      // counts stay on KEYED WindowExec (scales by key)
      ("q_brier", 1, 1, 0, 0), // decile rank + total count
      ("q_skew_audit", 2, 1, 0, 0), // asc+desc ranks + key count
      ("q_join_cardest", 1, 0, 0, 0), // frequency rank
      ("q_qini", 1, 1, 1, 0), // score rank + count + cumulative deciles
      ("q_psm_att", 1, 2, 0, 0)) // quintile rank + two totals
    for ((name, nRank, nFrame, nRun, nKeyedWin) <- expected) {
      val p = plan(name)
      val wins = winExecs(p)
      assert(wins.forall(_.partitionSpec.nonEmpty),
        s"$name kept an UNPARTITIONED WindowExec:\n$p")
      assert(wins.size == nKeyedWin,
        s"$name: expected $nKeyedWin keyed WindowExec, got ${wins.size}:\n$p")
      assert(ranks(p) == nRank,
        s"$name: expected $nRank GlobalRankExec, got ${ranks(p)}:\n$p")
      assert(frames(p) == nFrame,
        s"$name: expected $nFrame GlobalFrameAggExec, got ${frames(p)}:\n$p")
      assert(runs(p) == nRun,
        s"$name: expected $nRun GlobalRunningAggExec, got ${runs(p)}:\n$p")
    }
  }

  test("retired VALUE-DOMAIN whitelist queries: zero unpartitioned WindowExec, ops pinned") {
    // r14 (VERDICT r13 task 3): the VALUE-DOMAIN WindowWhitelist class
    // is retired — all 21 members route their global windows (several
    // written as partitionBy(lit(1)) — the foldable-spec widening)
    // through RewriteGlobalRankWindows.force. These exact operator
    // counts replaced the whitelist review; the whitelist is now
    // CALENDAR-only.
    def winExecs(p: SparkPlan) = p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    def count[T <: SparkPlan](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]) =
      p.collect(pf).size
    val expected = Seq(
      // name -> (ranks, frameAggs, runningAggs, shifts) — r15 counts:
      // force() now merges same-spec withColumn window chains before
      // matching (mergeWindowChains), so same-frame functions batch
      // into ONE operator node where no computing Project intervenes
      ("q_apportion", 1, 2, 0, 0),
      ("q_auc_exact", 0, 0, 1, 1), // late r14: lag-of-running (delayed end)
      ("q_bh_fdr", 2, 0, 0, 0),
      // r15: q_boost iterates on the (x, y) class-mass table — each
      // round is ONE action over the force-rewritten running sums, and
      // the returned relation is the collected stump table, so no
      // Global* operator (and no WindowExec) remains at top level
      ("q_boost", 0, 0, 0, 0),
      ("q_bootstrap_ci", 1, 0, 0, 0),
      ("q_coverage_p90", 1, 1, 1, 0),
      ("q_domain_mix", 0, 1, 0, 0),
      ("q_domain_mix_temp", 0, 2, 0, 0),
      ("q_equidepth_hist", 0, 1, 1, 0),
      ("q_funnel_time", 0, 1, 1, 0),
      ("q_isotonic", 0, 0, 2, 0),
      ("q_ks_test", 1, 1, 1, 0),
      ("q_lift_curve", 0, 1, 1, 0),
      ("q_lorenz_deciles", 0, 2, 1, 0),
      ("q_mad_outliers", 0, 2, 2, 0),
      ("q_psi", 0, 3, 1, 0),
      ("q_stump", 1, 1, 1, 0),
      ("q_survival_km", 0, 0, 2, 0),
      ("q_wasserstein", 0, 1, 1, 1),
      ("q_water_filling", 0, 2, 4, 0),
      ("q_winsorize", 0, 0, 3, 0))
    for ((name, nRank, nFrame, nRun, nShift) <- expected) {
      val p = plan(name)
      assert(winExecs(p).isEmpty,
        s"$name kept a WindowExec:\n$p")
      assert(count(p) { case g: graft.plans.GlobalRankExec => g } == nRank,
        s"$name: expected $nRank GlobalRankExec:\n$p")
      assert(count(p) { case g: graft.plans.GlobalFrameAggExec => g } == nFrame,
        s"$name: expected $nFrame GlobalFrameAggExec:\n$p")
      assert(count(p) { case g: graft.plans.GlobalRunningAggExec => g } == nRun,
        s"$name: expected $nRun GlobalRunningAggExec:\n$p")
      assert(count(p) { case g: graft.plans.GlobalShiftExec => g } == nShift,
        s"$name: expected $nShift GlobalShiftExec:\n$p")
      spark.catalog.clearCache() // release the iterative queries' pins
    }
  }

  test("retired CALENDAR whitelist queries: zero unpartitioned WindowExec, ops pinned") {
    // r15 (VERDICT r14 task 2): the CALENDAR WindowWhitelist class is
    // retired — the final 12 members route their global windows through
    // RewriteGlobalRankWindows.force. The whitelist is now EMPTY; these
    // exact operator counts replace the review. q_seasonal_residuals
    // keeps 2 PARTITIONED WindowExec (the per-dow medians) — only
    // unpartitioned sites are banned. q_haar's seed rank lives inside
    // its pinned level-1 block (materialized at construction), so its
    // top-level plan shows no operator.
    def count[T <: SparkPlan](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]) =
      p.collect(pf).size
    val expected = Seq(
      // name -> (ranks, frameAggs, runningAggs, shifts, movingAggs)
      ("q_changepoint", 1, 1, 1, 0, 0),
      ("q_cusum", 1, 2, 1, 0, 0),
      ("q_drawdown", 0, 0, 2, 0, 0),
      ("q_haar", 0, 0, 0, 0, 0),
      ("q_jenks", 1, 2, 2, 0, 0),
      ("q_mase", 0, 0, 0, 1, 0),
      ("q_mom_growth", 0, 0, 0, 1, 0),
      ("q_rolling_corr", 0, 0, 0, 0, 4),
      ("q_runs_test", 1, 1, 0, 1, 0),
      ("q_seasonal_residuals", 1, 1, 0, 0, 0),
      ("q_sprt", 0, 0, 3, 0, 0),
      ("q_theil_sen", 1, 1, 0, 0, 0))
    for ((name, nRank, nFrame, nRun, nShift, nMov) <- expected) {
      val p = plan(name)
      val unpart = p.collect {
        case w: org.apache.spark.sql.execution.window.WindowExec
            if w.partitionSpec.isEmpty => w
      }
      assert(unpart.isEmpty, s"$name kept an UNPARTITIONED WindowExec:\n$p")
      assert(count(p) { case g: graft.plans.GlobalRankExec => g } == nRank,
        s"$name: expected $nRank GlobalRankExec:\n$p")
      assert(count(p) { case g: graft.plans.GlobalFrameAggExec => g } == nFrame,
        s"$name: expected $nFrame GlobalFrameAggExec:\n$p")
      assert(count(p) { case g: graft.plans.GlobalRunningAggExec => g } == nRun,
        s"$name: expected $nRun GlobalRunningAggExec:\n$p")
      assert(count(p) { case g: graft.plans.GlobalShiftExec => g } == nShift,
        s"$name: expected $nShift GlobalShiftExec:\n$p")
      assert(count(p) { case g: graft.plans.GlobalMovingAggExec => g } == nMov,
        s"$name: expected $nMov GlobalMovingAggExec:\n$p")
      spark.catalog.clearCache() // release the pinned level blocks
    }
  }

  test("q_clamped_runsum: per-key windows only — one hash shuffle, no funnel") {
    val p = plan("q_clamped_runsum")
    assert(hashShuffles(p) == 1,
      s"clamped runsum must shuffle once on custkey:\n$p")
    assert(!p.toString.contains("SinglePartition"),
      s"clamped runsum grew a single-partition stage:\n$p")
  }

  test("q_merkle_diff: drill-down gated by broadcast joins, no sort-merge") {
    val p = plan("q_merkle_diff")
    val bhj = p.collect { case b: BroadcastHashJoinExec => b }.size
    assert(bhj >= 2, s"merkle drill-down lost its broadcast gates:\n$p")
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty)
  }

  test("q_shapley: corpus folds to masks once; lattice join is broadcast") {
    val p = plan("q_shapley")
    assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty,
      s"shapley degraded to sort-merge:\n$p")
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty ||
      p.toString.contains("Broadcast"),
      s"the 32-row weight lattice must broadcast:\n$p")
  }

  test("timestamp RANGE tier (r14): interval frames over TIMESTAMP keys route, zero WindowExec") {
    // global: three hour/day-pure interval frames over the hourly axis
    // through ONE GlobalRangeMovingAggExec, no 1-partition exchange
    val pts = plan("q_rangemov_ts")
    assert(pts.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_rangemov_ts kept a WindowExec:\n$pts")
    assert(pts.collect {
      case g: graft.plans.GlobalRangeMovingAggExec => g
    }.size == 1,
      s"q_rangemov_ts must run through ONE GlobalRangeMovingAggExec:\n$pts")
    assert(pts.collect { case e: ShuffleExchangeExec => e }
      .forall(_.outputPartitioning.numPartitions > 1),
      s"q_rangemov_ts grew a 1-partition exchange:\n$pts")
    // skew: per-user 7-day rolling totals on the raw micros axis
    // through ONE PartitionedRangeMovingAggExec — no hash-clustered
    // WindowExec funnel for key -1's third of the corpus
    val pskts = plan("q_skewrangemov_ts")
    assert(pskts.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_skewrangemov_ts kept a WindowExec:\n$pskts")
    assert(pskts.collect {
      case g: graft.plans.PartitionedRangeMovingAggExec => g
    }.size == 1,
      s"q_skewrangemov_ts must ride ONE PartitionedRangeMovingAggExec:\n$pskts")
    // decimal widening: same-lattice money frames over a DECIMAL(12,2)
    // axis through ONE GlobalRangeMovingAggExec
    val pdec = plan("q_rangemov_dec")
    assert(pdec.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_rangemov_dec kept a WindowExec:\n$pdec")
    assert(pdec.collect {
      case g: graft.plans.GlobalRangeMovingAggExec => g
    }.size == 1,
      s"q_rangemov_dec must run through ONE GlobalRangeMovingAggExec:\n$pdec")
    // suffix-running mirror: global suffix sums/last ride ONE reversed
    // GlobalRunningAggExec, the per-key forms ONE reversed
    // PartitionedRunningAggExec — zero WindowExec
    val psfx = plan("q_suffix_running")
    assert(psfx.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_suffix_running kept a WindowExec:\n$psfx")
    assert(psfx.collect {
      case g: graft.plans.GlobalRunningAggExec => g
    }.size == 1,
      s"q_suffix_running must mirror through ONE GlobalRunningAggExec:\n$psfx")
    assert(psfx.collect {
      case g: graft.plans.PartitionedRunningAggExec => g
    }.size == 1,
      s"q_suffix_running must mirror through ONE PartitionedRunningAggExec:\n$psfx")
    // delayed/extended running ends (late r14): lag/lead-of-running
    // compositions — running + shift execs in both tiers, zero
    // WindowExec anywhere
    val pdly = plan("q_delayed_running")
    assert(pdly.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_delayed_running kept a WindowExec:\n$pdly")
    assert(pdly.collect {
      case g: graft.plans.GlobalRunningAggExec => g
    }.nonEmpty && pdly.collect {
      case g: graft.plans.GlobalShiftExec => g
    }.nonEmpty,
      s"q_delayed_running must compose global lag/lead-of-running:\n$pdly")
    assert(pdly.collect {
      case g: graft.plans.PartitionedRunningAggExec => g
    }.nonEmpty && pdly.collect {
      case g: graft.plans.PartitionedShiftExec => g
    }.nonEmpty,
      s"q_delayed_running must compose per-key lag/lead-of-running:\n$pdly")
  }

  test("co-purchase derivation (r14): per-pk cap via bounded-heap TopKPerKey, zero WindowExec") {
    // VERDICT r13 task 5: the row_number cap (a full per-pk sort of the
    // (pk, ck) corpus feeding the bench's slowest family) became the
    // bounded-heap TopKPerKey — partial map-side capping, no sort.
    // Asserted on the derivation's own plan: the consumer queries
    // (q_modularity / q_conductance / q_assortativity) pin the edge
    // list, so their top-level plans read the cache, not the build.
    val dir = "/root/testdata/sf0.001"
    val edges = graft.ext.GraphOps.coPurchaseEdges(
      spark.read.parquet(s"$dir/lineitem.parquet"),
      spark.read.parquet(s"$dir/orders.parquet"))
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val p = try edges.queryExecution.executedPlan
    finally spark.conf.set("spark.sql.adaptive.enabled", prev)
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"co-purchase cap kept a WindowExec:\n$p")
    assert(p.collect {
      case t: graft.plans.TopKPerKeyExec => t
    }.size == 1, s"co-purchase cap must run through ONE TopKPerKeyExec:\n$p")
    assert(p.collect {
      case t: graft.plans.TopKPerKeyPartialExec => t
    }.size == 1, s"co-purchase cap lost the map-side partial:\n$p")
  }

  test("q_mode_rewrite (r14): whole-frame mode via counts+argmax joins, zero WindowExec") {
    val p = plan("q_mode_rewrite")
    assert(p.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.isEmpty, s"q_mode_rewrite kept a WindowExec:\n$p")
    // per-key mode joins back on the key; the global mode's argmax is a
    // global Aggregate over the per-value COUNTS (value-domain-sized,
    // already reduced map-side), so its single-partition exchange
    // carries counts, never corpus rows — the corpus side must never
    // funnel through a cartesian product
    assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
      s"q_mode_rewrite grew a cartesian product:\n$p")
  }

  for ((name, (maxShuffles, minBhj)) <- tpchBudgets)
    test(s"$name: <=$maxShuffles hash shuffle(s), >=$minBhj broadcast join(s), no SMJ/cartesian") {
      val p = plan(name)
      assert(hashShuffles(p) <= maxShuffles,
        s"$name grew extra hash shuffles:\n$p")
      assert(p.collect { case b: BroadcastHashJoinExec => b }.size >= minBhj,
        s"$name lost a broadcast join:\n$p")
      assert(p.collect { case j: SortMergeJoinExec => j }.isEmpty,
        s"$name degraded a broadcast to sort-merge:\n$p")
      assert(p.collect { case c: CartesianProductExec => c }.isEmpty,
        s"$name grew a cartesian product:\n$p")
    }
}
