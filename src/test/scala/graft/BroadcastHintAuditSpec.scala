package graft

import scala.collection.mutable

import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.execution.{LogicalRDD, QueryExecution}
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.util.QueryExecutionListener
import org.scalatest.funsuite.AnyFunSuite

/** r7 mechanical broadcast-hint audit across EVERY registered query.
  *
  * The class being made unrepresentable: a compulsory `broadcast(...)`
  * whose build side derives from a FACT table (r6 found
  * `broadcast(orders-key-map)` pasted into two graph queries — harmless
  * at bench scale where AQE would broadcast anyway, but a compulsory
  * driver OOM at 100 TB where orders is billions of rows; "keys-only"
  * narrowness does not bound cardinality). Catalyst's own size-based
  * broadcasts are fine — they adapt to the data; only HINTS are audited,
  * because only hints survive a 100× scale-up unconditionally.
  *
  * Every BROADCAST hint must have a build side that is bounded by
  * construction, i.e. one of:
  *   - all leaves are dimension tables (region/nation/customer/supplier/
  *     part) or generated relations (range/local/one-row) — model-sized
  *     regardless of corpus scale;
  *   - the subtree contains an Aggregate (grouping collapses the corpus
  *     to a key-space-sized table; every such group key in this repo is
  *     reviewed to be bounded — flags, types, buckets) or a Limit.
  *
  * Plans hidden behind `localCheckpoint()` (which truncates lineage to a
  * LogicalRDD) are covered too: a QueryExecutionListener audits every
  * plan the session actually executes while the queries are being
  * CONSTRUCTED, so the checkpoint-materialization job exposes the
  * pre-checkpoint hints — reverting the r7 q_assortativity fix makes
  * this spec fail even though the hint never appears in the final plan.
  *
  * Streaming queries are excluded: building them RUNS their micro-batch
  * pipelines (seconds each); their sources are rate/memory streams and
  * their hint surface is the same dimension-broadcast idiom audited
  * here in batch form.
  */
class BroadcastHintAuditSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private val dims = Set("region", "nation", "customer", "supplier", "part")

  private def leaves(p: LogicalPlan): Seq[String] = p.collectLeaves().map {
    case lr: LogicalRelation => lr.relation match {
      case h: HadoopFsRelation =>
        val n = h.location.rootPaths.headOption.map(_.getName).getOrElse("?")
        n.replaceAll("\\.[a-z]+$", "")
      case other => "@" + other.getClass.getSimpleName
    }
    case _: LocalRelation => "@local"
    case _: Range => "@range"
    case _: OneRowRelation => "@onerow"
    case _: LogicalRDD => "@checkpoint"
    case other => "@" + other.nodeName
  }

  // a Filter comparing a BARE key attribute against an integral literal
  // from above (attr < K, attr <= K, attr = K, attr IN (...)) caps the
  // subtree at a CONSTANT key range — the query-side idiom of the kNN /
  // embedding family (`embeddings.where(vec_id < 300)`). Deliberately
  // narrow: `expr % m < K` (a PROPORTIONAL slice that scales with the
  // corpus) has a non-attribute left side and does not qualify.
  private def literalKeyBounded(t: LogicalPlan): Boolean = {
    import org.apache.spark.sql.catalyst.expressions._
    def attr(e: Expression): Boolean = e match {
      case _: AttributeReference => true
      case Cast(c, _, _, _) => attr(c)
      case _ => false
    }
    def intLit(e: Expression): Boolean = e match {
      case Literal(_, t) =>
        import org.apache.spark.sql.types._
        t == ByteType || t == ShortType || t == IntegerType || t == LongType
      case Cast(c, _, _, _) => intLit(c)
      case _ => false
    }
    t.exists {
      case Filter(cond, _) => cond.exists {
        case LessThan(a, l) => attr(a) && intLit(l)
        case LessThanOrEqual(a, l) => attr(a) && intLit(l)
        case GreaterThan(l, a) => attr(a) && intLit(l)
        case GreaterThanOrEqual(l, a) => attr(a) && intLit(l)
        case EqualTo(a, l) => attr(a) && intLit(l)
        case EqualTo(l, a) => attr(a) && intLit(l)
        case In(a, vs) => attr(a) && vs.forall(intLit)
        case _ => false
      }
      case _ => false
    }
  }

  private def bounded(t: LogicalPlan): Boolean =
    t.exists {
      case _: Aggregate => true
      case _: GlobalLimit => true
      case _ => false
    } || leaves(t).forall(l => dims.contains(l) ||
      l == "@local" || l == "@range" || l == "@onerow") ||
      literalKeyBounded(t)

  // Residual hints whose bound is real but invisible to the static
  // walk — each entry is REVIEWED and must state why it is bounded.
  // Anything new landing here fails the audit until reviewed + listed.
  private val reviewed: Map[String, String] = Map(
    "q_phrase_search" ->
      ("the broadcast side is the limit(1) phrase artifact, " +
        "localCheckpoint()ed (materialize-once) — the checkpoint " +
        "truncates lineage to a LogicalRDD so the GlobalLimit bound " +
        "is invisible here; the materialization plan itself was " +
        "audited by the listener"),
    "q_boost" ->
      ("the broadcast sides are the per-round best-stump artifacts — " +
        "aggregate+limit derivations materialized via localCheckpoint " +
        "inside the boosting loop; each materialization plan was " +
        "audited by the listener"),
    "q_ivm_join" ->
      ("the broadcast sides are the CDC delta slices (delA/updB/" +
        "touchedB) — the IVM contract is delta ≪ corpus (bounded by " +
        "CHANGE RATE per maintenance batch, not corpus size); the " +
        "modulo predicates are the fixture's deterministic stand-in " +
        "for a real change feed"),
    "q_decontaminate" ->
      ("the broadcast side is the eval-benchmark gram set — a FIXED " +
        "evaluation suite in production (the doc_id % 19 slice is the " +
        "fixture stand-in); PlanShapeSpec pins this exact broadcast " +
        "as the intended shape"),
    "q_conformal" ->
      ("the broadcast side is q-hat: exactly one calibration-quantile " +
        "row per event_type (rank = k filter on a partitioned window) " +
        "— key-space-sized, but the rank equality compares two " +
        "attributes so the literal-bound rule cannot see it"))

  private def audit(name: String, plan: LogicalPlan,
                    out: mutable.Buffer[String]): Unit =
    plan.foreach {
      case h: ResolvedHint if h.hints.strategy.contains(BROADCAST) =>
        if (!bounded(h.child) &&
            !reviewed.contains(name.takeWhile(_ != '[')))
          out += s"$name: forced broadcast of unbounded build side " +
            s"(leaves=${leaves(h.child).mkString(",")})"
      case _ => ()
    }

  // Global-window audit (the generalized q_sketch_merge/q_edges_actual
  // lesson): an UNPARTITIONED Window funnels its whole input through
  // one partition for a full sort, so its input must be bounded BELOW
  // it. STRICTER than the broadcast bound on purpose (r11): an Aggregate
  // below the window does NOT auto-qualify — aggregate output cardinality
  // is the grouping-key space, and a corpus-keyed groupBy (doc_id, url)
  // is as unbounded as the scan it reads. Auto-pass is limited to bounds
  // that hold by CONSTRUCTION (a GlobalLimit below, dim/generated-only
  // leaves, a constant literal key range); every aggregate-riding global
  // window must be reviewed and NAMED in [[windowReviewed]] with its
  // cardinality argument, so a future query cannot sneak a corpus-sized
  // global sort past review by riding any old aggregate. Raw-scan global
  // sorts are exactly what r7 rewrote to the bounded-heap TopKPerKey in
  // q_kmv_distinct/q_sketch_merge/q_theta_ops.
  private def windowBounded(t: LogicalPlan): Boolean =
    t.exists { case _: GlobalLimit => true; case _ => false } ||
      leaves(t).forall(l => dims.contains(l) ||
        l == "@local" || l == "@range" || l == "@onerow") ||
      literalKeyBounded(t)

  // Each entry is a REVIEWED aggregate-riding (or otherwise invisible)
  // bound: the window's input cardinality and why it stays model-sized at
  // 100 TB. Anything new fails the audit until reviewed + listed.
  private val windowReviewed: Map[String, WindowWhitelist.Entry] =
    WindowWhitelist.entries

  /** The shape fingerprint of one reviewed global window: its nearest
    * aggregate's grouping keys (the reviewer's cardinality handle), or
    * "NO AGGREGATE BELOW". */
  private def windowShape(w: org.apache.spark.sql.catalyst.plans.logical.Window): String =
    w.child.collectFirst {
      case a: Aggregate =>
        a.groupingExpressions.map(_.sql).mkString("[", ", ", "]")
    }.getOrElse("NO AGGREGATE BELOW")

  private def auditWindows(name: String, plan: LogicalPlan,
                           out: mutable.Buffer[String],
                           shapes: mutable.Map[String, mutable.Set[String]]): Unit =
    plan.foreach {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty =>
        if (!windowBounded(w.child)) {
          val base = name.takeWhile(_ != '[')
          if (!windowReviewed.contains(base)) {
            // surface the nearest aggregate's grouping keys: the reviewer's
            // question is always "what is this window's input cardinality"
            out += s"$name: global (unpartitioned) window over unbounded " +
              s"input (leaves=${leaves(w.child).mkString(",")}; " +
              s"nearest agg keys=${windowShape(w)})"
          } else {
            // whitelisted: record the OBSERVED shape so the shape-pin
            // test can compare it against the reviewed one (r12,
            // VERDICT r11 task 3 — a name alone must not auto-pass)
            shapes.getOrElseUpdate(base, mutable.Set.empty) += windowShape(w)
          }
        }
      case _ => ()
    }

  // SQL CTE references are leaves (CTERelationRef) whose definition
  // lives in the plan's WithCTE node — inline them (bounded depth, in
  // case of self-reference) so the audits see through `WITH x AS (…)`
  private def inlineCtes(plan: LogicalPlan): LogicalPlan = {
    val defs = plan.collect {
      case w: WithCTE => w.cteDefs.map(d => d.id -> d.child)
    }.flatten.toMap
    def go(p: LogicalPlan, depth: Int): LogicalPlan =
      if (depth > 8) p
      else p.transformUp {
        case r: CTERelationRef =>
          defs.get(r.cteId).map(go(_, depth + 1)).getOrElse(r)
      }
    go(plan, 0)
  }

  // one pass builds every query once; all audits read the same plans
  private lazy val (hintViolations, windowViolations, observedShapes) = {
    val hints = mutable.Buffer[String]()
    val windows = mutable.Buffer[String]()
    val shapes = mutable.Map[String, mutable.Set[String]]()
    val current = new java.util.concurrent.atomic.AtomicReference("?")
    val listener = new QueryExecutionListener {
      override def onSuccess(f: String, qe: QueryExecution, d: Long): Unit = {
        val pl = inlineCtes(qe.analyzed)
        audit(s"${current.get}[exec:$f]", pl, hints)
        auditWindows(s"${current.get}[exec:$f]", pl, windows, shapes)
      }
      override def onFailure(f: String, qe: QueryExecution,
                             e: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)
           if !name.startsWith("q_stream") && name != "q_crawl_stream") {
        current.set(name)
        val df = fn(spark, "/root/testdata/sf0.001")
        val pl = inlineCtes(df.queryExecution.analyzed)
        audit(name, pl, hints)
        auditWindows(name, pl, windows, shapes)
      }
      GraftSqlBridge.waitForListenerBus(spark)
    } finally spark.listenerManager.unregister(listener)
    (hints.toSeq, windows.toSeq, shapes.view.mapValues(_.toSet).toMap)
  }

  test("every BROADCAST hint builds from a dim table, aggregate, or limit") {
    assert(hintViolations.isEmpty,
      s"${hintViolations.size} fact-table broadcast hint(s):\n" +
        hintViolations.mkString("\n"))
  }

  test("every global window rides a bounded input, never a raw scan") {
    assert(windowViolations.isEmpty,
      s"${windowViolations.size} raw-scan global window(s):\n" +
        windowViolations.mkString("\n"))
  }

  // r12 (VERDICT r11 task 3 + ADVICE r11): a whitelist entry is keyed
  // by query name — alone, that would let a renamed query leave a stale
  // entry, and a whitelisted query whose plan later grows a DIFFERENT
  // (bigger) global window would still auto-pass on name. Pin both: the
  // key set must be live query names, and the OBSERVED window shapes
  // (nearest agg keys) must equal the reviewed ones recorded in the
  // entry.
  test("WindowWhitelist: every entry names a live query") {
    windowViolations // force the shared audit pass
    val stale = WindowWhitelist.entries.keySet -- SparkEntry.queries.keySet
    assert(stale.isEmpty, s"stale whitelist entries (no such query): $stale")
  }

  test("WindowWhitelist: observed window shapes match the reviewed ones") {
    windowViolations // force the shared audit pass
    val mismatches = WindowWhitelist.entries.toSeq.sortBy(_._1).flatMap {
      case (name, entry) =>
        WindowWhitelist.shapeViolation(name,
          observedShapes.getOrElse(name, Set.empty), entry)
    }
    assert(mismatches.isEmpty,
      s"${mismatches.size} reviewed-window shape change(s) — re-review " +
        s"and update the entry's aggKeys:\n" + mismatches.mkString("\n"))
  }

  test("a deliberately mutated reviewed window fails the shape pin (fixture)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // the fixture "query" grew a corpus-keyed aggregate under its global
    // window — same name, same whitelist entry, DIFFERENT shape
    // (r13: re-pointed from q_rfm to q_cusum — q_rfm's ENTITY entry was
    // retired when the query started routing through GlobalRank)
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val mutated = docs.groupBy(col("doc_id"))
      .agg(sum(length(col("text"))).as("sz"))
      .withColumn("rk", row_number().over(Window.orderBy(col("sz"))))
    val out = mutable.Buffer[String]()
    val shapes = mutable.Map[String, mutable.Set[String]]()
    auditWindows("q_cusum", mutated.queryExecution.analyzed, out, shapes)
    // r15: the live whitelist is empty (CALENDAR retired) — the
    // unlisted-site audit MUST now fire on the mutated plan, and the
    // shape-pin machinery is exercised against the archived q_cusum
    // entry with the observed shape read off the plan directly
    assert(out.nonEmpty, "an unlisted global-window site must raise the audit")
    val observed = mutated.queryExecution.analyzed.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window
          if w.partitionSpec.isEmpty => windowShape(w)
    }.toSet
    val v = WindowWhitelist.shapeViolation("q_cusum", observed,
      WindowWhitelist.fixtureEntry)
    assert(v.nonEmpty, "mutated window shape must fail the pin")
    assert(v.get.contains("doc_id"), v.get)
  }
}

/** Reviewed unpartitioned-window sites (r11, VERDICT r10 task 3): each
  * query here runs a global window whose bound is real but invisible to
  * the static walk — "the window rides an aggregate whose grouping key
  * space is bounded by review". The entry documents that cardinality
  * argument; the audit fails on any unlisted site. Three bound classes:
  *
  *  - CALENDAR: the aggregate groups by a date truncation (day, or
  *    (year, month)) — input = |distinct periods|, bounded by the data's
  *    time span, independent of corpus row count.
  *  - VALUE-DOMAIN (RETIRED r14, VERDICT r13 task 3): the aggregate
  *    groups by a measured VALUE (price cents, model score, histogram
  *    bin, duration-days, replicate id) — bounded by |distinct
  *    values|, which unlike the CALENDAR class GROWS with data. All
  *    21 members now route through RewriteGlobalRankWindows.force
  *    (several via the foldable-partition widening: partitionBy(lit(1))
  *    is semantically global); PlanShapeSpec pins their exact
  *    operator counts, and the whitelist below is CALENDAR-only.
  *  - ENTITY: the aggregate groups by an entity key (user, customer,
  *    part) — bounded by |entities|, far below corpus EVENTS but itself
  *    data-scaled. These are the exact-statistic fixture forms; at
  *    100 TB the same statistic runs via approx_percentile / a
  *    range-partitioned sort (no single-partition funnel), which is why
  *    they are whitelisted rather than silently auto-passed: any new
  *    entity-keyed global window must argue its own bound here.
  */
private[graft] object WindowWhitelist {
  /** One reviewed unpartitioned-window site: `bound` is the reviewer's
    * cardinality argument (which class, which key space); `aggKeys`
    * pins the reviewed SHAPE — the set of nearest-aggregate grouping
    * key lists (`Expression.sql` form) observed under the query's
    * global windows at review time. The audit compares the live plan
    * against `aggKeys`, so a whitelisted query cannot silently swap in
    * a bigger aggregate on the strength of its name (r12, VERDICT r11
    * task 3). */
  final case class Entry(bound: String, aggKeys: Set[String])

  /** None if the observed shapes equal the reviewed ones; otherwise a
    * human-readable violation (also used by the mutation fixture). */
  def shapeViolation(name: String, observed: Set[String],
                     entry: Entry): Option[String] =
    if (observed == entry.aggKeys) None
    else Some(s"$name: reviewed agg keys ${entry.aggKeys.toSeq.sorted}" +
      s" but plan shows ${observed.toSeq.sorted}")

  // since late r12 the CALENDAR class also has executed scale twins:
  // day-over-day windows run distributed via graft.plans.GlobalShift
  // (q_shift_rewrite), cumulative windows via GlobalRunningAgg
  // (q_runagg_rewrite/q_runagg_bitbool), and bounded moving frames via
  // GlobalMovingAgg (q_movagg_rewrite), all reachable automatically
  // through RewriteGlobalRankWindows
  private val CAL = "CALENDAR: day-keyed aggregate — |distinct days|"
  private val YM = "CALENDAR: (year, month)-keyed aggregate — |distinct months|"
  // The former ENTITY class (per-user/customer/partkey rollups —
  // "bounded by |entities|, itself data-scaled") is RETIRED as of r13
  // (VERDICT r12 task 1): every member (q_brier, q_join_cardest,
  // q_psm_att, q_qini, q_rfm, q_skew_audit, q_spearman) now routes its
  // global windows through RewriteGlobalRankWindows.force — GlobalRank
  // for ranks, GlobalFrameAgg for OVER () totals, GlobalRunningAgg for
  // cumulative frames — so their plans contain no unpartitioned
  // WindowExec to whitelist (PlanShapeSpec pins the shapes). Only the
  // CALENDAR / VALUE-DOMAIN classes remain: their window inputs are
  // bounded by time span or value domain, independent of corpus rows.
  private def E(bound: String, keys: String*): Entry =
    Entry(bound, keys.toSet)
  // r15 (VERDICT r14 task 2): the CALENDAR class is retired — the final
  // 12 members (q_changepoint, q_cusum, q_drawdown, q_haar, q_jenks,
  // q_mase, q_mom_growth, q_rolling_corr, q_runs_test,
  // q_seasonal_residuals, q_sprt, q_theil_sen) now route their global
  // windows through RewriteGlobalRankWindows.force like the ENTITY and
  // VALUE-DOMAIN classes before them. The whitelist is EMPTY: zero
  // unpartitioned WindowExec remains in any live query, and the audit
  // keeps failing on unlisted sites, so any future global-window site
  // must either route or argue a new entry here. PlanShapeSpec pins the
  // 12 retired queries' operator counts; `fixtureEntry` below keeps the
  // shape-pin machinery itself under test.
  val entries: Map[String, Entry] = Map.empty
  /** Synthetic entry for the mutation fixture (the shape-pin test) —
    * the q_cusum review as it stood while the CALENDAR class was live. */
  val fixtureEntry: Entry = E(CAL, "[day]")
  // silence unused warnings for the retired class descriptions, kept as
  // the review record
  locally { val _ = (CAL, YM) }
}

