package graft.rules

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Ascending, Attribute, AttributeMap, AttributeReference, AttributeSet, Cast, CumeDist, CurrentRow, DenseRank, EqualNullSafe, Expression, Lag, Lead, Literal, NTile, NamedExpression, NthValue, PercentRank, RangeFrame, Rank, RowFrame, RowNumber, SortOrder, SpecifiedWindowFrame, UnaryMinus, UnboundedFollowing, UnboundedPreceding, WindowExpression, WindowSpecDefinition}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, AggregateFunction, Average, BitAndAgg, BitOrAgg, BitXorAgg, Complete, Count, DeclarativeAggregate, First, Last, Max, Min, StddevPop, StddevSamp, Sum, VariancePop, VarianceSamp}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, JoinHint, LogicalPlan, Project, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.internal.SQLConf
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.plans.{GlobalExactPercentile, GlobalExactPercentileNode, GlobalFrameAgg, GlobalFrameAggNode, GlobalLookahead, GlobalLookaheadNode, GlobalMovingAgg, GlobalMovingAggNode, GlobalNthValue, GlobalNthValueNode, GlobalRangeMovingAgg, GlobalRangeMovingAggNode, GlobalRank, GlobalRankNode, GlobalRunningAgg, GlobalRunningAggNode, GlobalShift, GlobalShiftNode, PartitionedLookahead, PartitionedLookaheadNode, PartitionedMovingAgg, PartitionedMovingAggNode, PartitionedNthValue, PartitionedNthValueNode, PartitionedRangeMovingAgg, PartitionedRangeMovingAggNode, PartitionedRank, PartitionedRankNode, PartitionedRunningAgg, PartitionedRunningAggNode, PartitionedShift, PartitionedShiftNode}
import graft.plans.GlobalRank.{RankCol, RankMode}
import graft.plans.GlobalShift.ShiftCol

/** Optimizer rule: rewrite an UNPARTITIONED rank-family or
  * offset-family `Window` into the distributed two-pass
  * [[graft.plans.GlobalRankNode]] / [[graft.plans.GlobalShiftNode]] —
  * the engine removing its own worst plan shape instead of merely
  * auditing it.
  *
  * `row_number()/rank()/dense_rank()/percent_rank()/cume_dist()/
  * ntile(k)/lead(e,k)/lag(e,k) OVER (ORDER BY ...)` with no PARTITION
  * BY plans as a WindowExec that
  * warns "No Partition Defined ... moving all data to a single
  * partition": one task sorts and ranks everything — the funnel the
  * `WindowWhitelist` audit reviews case-by-case, and the one plan shape
  * that cannot survive 100 TB. Every rank function is
  * position-arithmetic over the globally sorted order — exactly what
  * [[GlobalRankNode]] computes range-partitioned in two passes over one
  * shuffle — and every literal-offset lead/lag is a bounded-distance
  * lookup over the same order, which [[GlobalShiftNode]] resolves with
  * bounded boundary state. The rewrite is an equivalence, not an
  * approximation:
  *
  *  - all window expressions of one `Window` node share its ORDER BY
  *    (Catalyst groups window expressions by spec), so they land in ONE
  *    GlobalRankNode and/or ONE GlobalShiftNode — stacked nodes share
  *    the range partitioning, one shuffle regardless of how many
  *    functions;
  *  - `row_number`/`ntile`/`lead`/`lag` keep their tie caveat (physical
  *    position breaks ties — nondeterministic under a non-total order,
  *    same as the built-ins); `rank`/`dense_rank`/`percent_rank`/
  *    `cume_dist` are tie-exact (see the range-partitioning
  *    tie-containment argument on [[GlobalRankNode]]);
  *  - output attributes keep their exprIds (the rewrite projects the
  *    generated LONG rank back to the built-in's INT / DOUBLE type
  *    under the original alias; lead/lag types pass through), so
  *    nothing upstream re-resolves.
  *
  * Seven families rewrite: rank (GlobalRank), offset lead/lag
  * (GlobalShift), running aggregates incl. first_value/last_value
  * (GlobalRunningAgg), bounded-ROWS moving aggregates
  * (GlobalMovingAgg), bounded-RANGE moving aggregates on a single
  * ascending integral key (GlobalRangeMovingAgg — the r13
  * dense-domain tier: per-key buffers bounded by the VALUE extent),
  * whole-frame aggregates — `agg(e) OVER ()` / `UNBOUNDED ..
  * UNBOUNDED`, the ratio-to-total shape, which [[GlobalFrameAggNode]]
  * computes with ZERO shuffle — and `nth_value` under frames anchored
  * at the global start ([[GlobalNthValueNode]]: one global constant
  * gated on frame length). Late r13 retired the offset family's last
  * refusal: `lead(e, k) IGNORE NULLS` routes through
  * [[GlobalLookaheadNode]] (the zipped lead/lag pass holds k VALUES,
  * never the null-run row gap; lag IGNORE NULLS was already the
  * non-null ring), and moving-lower-bound `nth_value` rides the
  * moving-frame rebuffer (NthValue is itself a DeclarativeAggregate —
  * see [[movAggOf]]'s second arm). A `Window` node is left alone when
  * any of its expressions is outside the families (RANGE moving frames
  * on non-integral or descending/multi-key orders and nth_value under
  * an unbounded-FOLLOWING moving frame need real frame execution;
  * non-literal or over-cap offsets fall back), when it HAS a partition
  * spec (partitioned windows scale fine; the r13 SKEW tier routes
  * rank/shift/running/moving/whole-frame members behind its own gate),
  * or when an ordered-family member rides a non-deterministic order
  * key.
  *
  * OFF by default — enable with `spark.graft.rewrite.globalRankWindows=
  * true` (session conf; the rule is injected by [[GraftExtensions]] as
  * a pre-CBO rule so it runs once, after pushdowns settle below the
  * window) — or apply explicitly to one DataFrame with [[force]], which
  * rewrites unconditionally without touching session state: the
  * registry's queries use that form so a shared Bench/Verify session
  * never has plans silently change shape mid-suite.
  */
object RewriteGlobalRankWindows extends Rule[LogicalPlan] {

  val ConfKey = "spark.graft.rewrite.globalRankWindows"

  /** The r13 skew tier's own gate (VERDICT r12 task 6): PARTITIONED
    * rank windows through [[graft.plans.PartitionedRankNode]]. A
    * separate conf on purpose — on a FLAT key histogram the built-in's
    * hash exchange beats a range exchange plus a count job, so the
    * skew route must be an explicit choice (this conf, or
    * [[forceSkew]]), never a side effect of enabling the global-window
    * rewrite. */
  val SkewConfKey = "spark.graft.rewrite.partitionedRankWindows"

  private def enabled: Boolean =
    SQLConf.get.getConfString(ConfKey, "false").trim.equalsIgnoreCase("true")
  private def skewEnabled: Boolean =
    SQLConf.get.getConfString(SkewConfKey, "false").trim.equalsIgnoreCase("true")

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val p1 = if (!enabled) plan else rewrite(plan)
    if (!skewEnabled) p1 else rewriteSkew(p1)
  }

  /** The rank statistic `fn` computes, if `fn` is in the rewritable
    * family. `ntile` only with a positive integer-literal bucket count
    * (the analyzer requires a foldable bucket expression; non-literal
    * folds are rare enough to skip rather than evaluate here). */
  private def modeOf(fn: Expression): Option[RankMode] = fn match {
    case _: RowNumber => Some(RankMode.RowNumber)
    case _: Rank => Some(RankMode.Rank)
    case _: DenseRank => Some(RankMode.DenseRank)
    case _: PercentRank => Some(RankMode.PercentRank)
    case _: CumeDist => Some(RankMode.CumeDist)
    case nt: NTile => nt.buckets match {
      case Literal(k: Int, IntegerType) if k > 0 => Some(RankMode.NTile(k))
      case _ => None
    }
    case _ => None
  }

  /** (alias, mode) iff `ne` is `<rank-family fn> OVER (ORDER BY ...)`
    * with no PARTITION BY. The frame is irrelevant: every family member
    * is position-determined, and the analyzer has already pinned each
    * one's required frame. */
  /** Matches a window PARTITION BY spec that is GLOBAL in effect:
    * empty, or all-FOLDABLE (the `partitionBy(lit(1))` idiom several
    * statistics queries use to name the funnel explicitly) — a
    * constant key puts every row in ONE partition, so the window is
    * semantically unpartitioned and the whole global family applies
    * (r14, VERDICT r13 task 3: this is what lets the VALUE-DOMAIN
    * whitelist class route instead of being reviewed). */
  private object GlobalPart {
    def unapplySeq(ps: Seq[Expression]): Option[Seq[Expression]] =
      // ADVICE r14 #5: eagerly evaluate each foldable key and decline
      // the rewrite if evaluation throws — discarding an expression
      // like PARTITION BY 1/0 unevaluated would optimize away its ANSI
      // runtime error, changing observable behavior
      if (ps.forall(e => e.foldable && {
        try { e.eval(); true } catch { case _: Exception => false }
      })) Some(Nil) else None
  }

  private def rankOf(ne: NamedExpression): Option[(Alias, RankMode)] = ne match {
    case a @ Alias(WindowExpression(fn, WindowSpecDefinition(GlobalPart(), _, _)), _) =>
      modeOf(fn).map(m => (a, m))
    case _ => None
  }

  /** Max |offset| the rule will route through GlobalShift: its boundary
    * state is `numPartitions * offset` values per shift column, so an
    * absurd literal offset must fall back to the built-in rather than
    * bloat the driver. */
  val MaxShiftKey = "spark.graft.rewrite.maxShiftOffset"
  private def maxShift: Int =
    SQLConf.get.getConfString(MaxShiftKey, "1024").toInt

  /** (input, signed offset, default, ignoreNulls) iff `ne` is a
    * rewritable `lead`/`lag` global window: literal int offset within
    * the cap, and a default the offset node can evaluate (null
    * literal, or same type as the input, evaluated against the current
    * row — WindowExec's own offset-frame semantics). The sign is
    * normalized so positive looks ahead: `lag(e, -2)` IS `lead(e, 2)`,
    * as with the built-ins. IGNORE NULLS routes only when the
    * NORMALIZED offset looks BACK: the k-th non-null behind is a
    * k-value ring over the stream, but the k-th non-null AHEAD can be
    * arbitrarily far (a null run has no bound) and keeps WindowExec. */
  private def shiftOf(ne: NamedExpression): Option[(Alias, ShiftCol)] = {
    def spec(fn: Expression): Option[(Expression, Int, Expression, Boolean)] = fn match {
      case l: Lag => l.inputOffset match {
        case Literal(k: Int, IntegerType) => Some((l.input, -k, l.default, l.ignoreNulls))
        case _ => None
      }
      case l: Lead => l.offset match {
        case Literal(k: Int, IntegerType) => Some((l.input, k, l.default, l.ignoreNulls))
        case _ => None
      }
      case _ => None
    }
    ne match {
      case a @ Alias(we @ WindowExpression(fn, WindowSpecDefinition(GlobalPart(), _, _)), _) =>
        spec(fn).collect {
          case (input, off, default, ignoreNulls)
              if math.abs(off) <= maxShift && input.deterministic &&
                (!ignoreNulls || off < 0) &&
                default.deterministic &&
                (default.foldable && default.eval() == null ||
                  org.apache.spark.sql.types.DataType.equalsStructurally(
                    default.dataType, input.dataType, ignoreNullability = true)) =>
            (a, ShiftCol(AttributeReference(s"__graft_${a.name}",
              input.dataType, nullable = we.nullable)(), input, off, default,
              ignoreNulls))
        }
      case _ => None
    }
  }

  /** (alias, input, k, default, generated attr) iff `ne` is a
    * `lead(e, k) IGNORE NULLS` global window with a positive literal
    * offset within the cap — the r13 [[GlobalLookaheadNode]] tier (the
    * former "unbounded lookahead" refusal: the VALUE state is k
    * values; the zipped pass 2 never buffers the null-run row gap).
    * One node per expression — see the operator's single-column
    * rationale. */
  private def leadNNOf(ne: NamedExpression): Option[(Alias, Expression, Int, Expression, AttributeReference)] = {
    def spec(fn: Expression): Option[(Expression, Int, Expression)] = fn match {
      case l: Lead if l.ignoreNulls => l.offset match {
        case Literal(kk: Int, IntegerType) if kk > 0 => Some((l.input, kk, l.default))
        case _ => None
      }
      case l: Lag if l.ignoreNulls => l.inputOffset match {
        // lag(e, -k) IGNORE NULLS is lead(e, k) IGNORE NULLS
        case Literal(kk: Int, IntegerType) if kk < 0 => Some((l.input, -kk, l.default))
        case _ => None
      }
      case _ => None
    }
    ne match {
      case a @ Alias(we @ WindowExpression(fn, WindowSpecDefinition(GlobalPart(), _, _)), _) =>
        spec(fn).collect {
          case (input, kk, default)
              if kk <= maxShift && input.deterministic &&
                default.deterministic &&
                (default.foldable && default.eval() == null ||
                  org.apache.spark.sql.types.DataType.equalsStructurally(
                    default.dataType, input.dataType, ignoreNullability = true)) =>
            (a, input, kk, default,
              AttributeReference(s"__graft_${a.name}", input.dataType,
                nullable = we.nullable)())
        }
      case _ => None
    }
  }

  /** (alias, function, isRowsFrame, generated attr) iff `ne` is a
    * rewritable RUNNING AGGREGATE global window: an allowlisted
    * DeclarativeAggregate (sum/min/max/count/avg, moments, bit/bool —
    * plus first_value/last_value via [[allowedOrderedAgg]], whose
    * order-sensitivity the running operator's in-order prefix merge
    * satisfies) in Complete mode with no DISTINCT and no FILTER,
    * framed UNBOUNDED PRECEDING .. CURRENT ROW (ROWS or RANGE — RANGE
    * is the SQL default and ends at the tie group, which
    * GlobalRunningAgg honors). */
  /** The shared frame-aggregate allowlist: order-insensitive within
    * the frame. Used by both the running (UNBOUNDED PRECEDING) and
    * moving (bounded ROWS) matchers. */
  private def allowedAgg(fn: DeclarativeAggregate): Boolean = fn match {
    case _: Sum | _: Min | _: Max | _: Count | _: Average => true
    // the moment/central-moment and bitwise/boolean reducers are
    // equally order-insensitive within the frame
    case _: StddevSamp | _: StddevPop | _: VarianceSamp | _: VariancePop => true
    // bool_and/bool_or need no arms of their own: they are
    // RuntimeReplaceableAggregate, so unwrapAgg hands this matcher
    // their Min/Max replacement
    case _: BitAndAgg | _: BitOrAgg | _: BitXorAgg => true
    case _ => false
  }

  /** The ORDERED-frame widening of [[allowedAgg]]: first_value/last_value
    * (Spark's First/Last aggregates, IGNORE NULLS included) are
    * order-SENSITIVE, but the running and moving operators guarantee the
    * order those functions see — pass 1 updates each partition's buffer
    * in its sort order, the driver prefix-merges in partition order
    * (which IS global order under the range exchange), and the moving
    * ring rebuffers each frame's rows in sequence — so First's
    * keep-left / Last's keep-right merges are exact there. NOT valid
    * for the whole-frame family, whose driver merge order is partition
    * order with no ordering requirement at all. */
  private def allowedOrderedAgg(fn: DeclarativeAggregate): Boolean = fn match {
    case _: First | _: Last => true
    case _ => allowedAgg(fn)
  }

  /** bool_and/bool_or/every/any arrive as RuntimeReplaceableAggregate
    * in the ANALYZED plan (the optimizer's ReplaceExpressions turns
    * them into Min/Max later) — unwrap so force(), which rewrites the
    * analyzed plan, sees the same function the session path would. */
  private def unwrapAgg(fn: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction)
      : Option[DeclarativeAggregate] = fn match {
    case d: DeclarativeAggregate => Some(d)
    case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceableAggregate =>
      r.replacement match {
        case d: DeclarativeAggregate => Some(d)
        case _ => None
      }
    case _ => None
  }

  private def runAggOf(ne: NamedExpression): Option[(Alias, DeclarativeAggregate, Boolean, AttributeReference)] = {
    def allowed(fn: DeclarativeAggregate): Boolean = allowedOrderedAgg(fn)
    def unwrap(fn: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction)
        : Option[DeclarativeAggregate] = unwrapAgg(fn)
    ne match {
      case a @ Alias(we @ WindowExpression(
          AggregateExpression(fn0, Complete, false, None, _),
          WindowSpecDefinition(GlobalPart(), _,
            SpecifiedWindowFrame(ft, UnboundedPreceding, CurrentRow))), _) =>
        unwrap(fn0).collect {
          case fn if allowed(fn) && fn.deterministic =>
            (a, fn, ft == RowFrame,
              AttributeReference(s"__graft_${a.name}", fn.dataType,
                nullable = we.nullable)())
        }
      case _ => None
    }
  }

  /** (alias, function, frame offsets, generated attr) iff `ne` is a
    * rewritable MOVING-FRAME global window: an allowlisted aggregate
    * over `ROWS BETWEEN lo AND hi` with literal row offsets within the
    * boundary-state cap — trailing (`-6..0`), centered (`-1..1`),
    * pure-past, or pure-future. UNBOUNDED PRECEDING frames are the
    * running family; RANGE moving frames are value-bounded, not
    * row-bounded, and keep WindowExec. */
  private def movAggOf(ne: NamedExpression): Option[(Alias, DeclarativeAggregate, Int, Int, AttributeReference)] = {
    // the parser writes "k PRECEDING" as UnaryMinus(Literal(k)); the
    // DataFrame API writes rowsBetween offsets as signed literals;
    // CurrentRow is offset 0 on either end
    def bound(e: Expression): Option[Int] = e match {
      case CurrentRow => Some(0)
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
      case UnaryMinus(Literal(v: Int, IntegerType), _) => Some(-v)
      case UnaryMinus(Literal(v: Long, LongType), _) if v.isValidInt => Some(-v.toInt)
      case _ => None
    }
    ne match {
      case a @ Alias(we @ WindowExpression(
          AggregateExpression(fn0, Complete, false, None, _),
          WindowSpecDefinition(GlobalPart(), _,
            SpecifiedWindowFrame(RowFrame, lo0, hi0))), _) =>
        for {
          lo <- bound(lo0)
          hi <- bound(hi0)
          if lo <= hi && math.max(math.abs(lo), math.abs(hi)) <= maxShift
          if !(lo0 == UnboundedPreceding) // belongs to the running family
          fn <- unwrapAgg(fn0)
          if allowedOrderedAgg(fn) && fn.deterministic
        } yield (a, fn, lo, hi,
          AttributeReference(s"__graft_${a.name}", fn.dataType,
            nullable = we.nullable)())
      // MOVING-LOWER-BOUND nth_value (late r13 — previously a
      // documented non-rewrite): NthValue is itself a
      // DeclarativeAggregate (AggregateWindowFunction) whose
      // initial/update/evaluate expressions the frame REBUFFER runs
      // verbatim in frame order — exactly how WindowExec's
      // AggregateProcessor evaluates it — so a literal-bounded ROWS
      // frame rides the moving ring like any other ordered aggregate.
      // (Start-anchored frames are GlobalNthValue's one-constant
      // family; frames with an unbounded FOLLOWING end have unbounded
      // forward state and keep WindowExec.)
      case a @ Alias(we @ WindowExpression(
          nv @ NthValue(input, Literal(n: Int, IntegerType), _),
          WindowSpecDefinition(GlobalPart(), _,
            SpecifiedWindowFrame(RowFrame, lo0, hi0))), _) =>
        for {
          lo <- bound(lo0)
          hi <- bound(hi0)
          if lo <= hi && math.max(math.abs(lo), math.abs(hi)) <= maxShift
          if !(lo0 == UnboundedPreceding) // GlobalNthValue's family
          if n > 0 && input.deterministic
        } yield (a, nv, lo, hi,
          AttributeReference(s"__graft_${a.name}", nv.dataType,
            nullable = we.nullable)())
      case _ => None
    }
  }

  /** (alias, function, lo, hi, generated attr) iff `ne` is a rewritable
    * RANGE-MOVING global window (r13, the dense-domain tier): an
    * order-INSENSITIVE allowlisted aggregate ([[allowedAgg]] — not the
    * ordered widening: per-key buffers make First/Last undefined) over
    * `RANGE BETWEEN lo AND hi` with integral-literal value offsets
    * within the boundary-state cap, on a SINGLE order key that is
    * INTEGRAL (int/long/short/byte/date — the dense-domain
    * precondition: the value window holds at most `hi - lo + 1`
    * distinct keys, so [[GlobalRangeMovingAggNode]] ships per-key
    * BUFFERS bounded by the value extent, never rows bounded by
    * density) or a TIMESTAMP (r14 — epoch micros with micros-exact
    * interval bounds; see [[graft.plans.GlobalRangeMovingAgg.timeKey]]
    * for the changed buffer bound and the day-denominated cap).
    * `UNBOUNDED PRECEDING .. CURRENT ROW` RANGE frames are the running
    * family; multi-key orders, non-integral numeric keys,
    * month-bearing interval bounds, and half-unbounded bounded frames
    * keep WindowExec. */
  private def rangeMovAggOf(ne: NamedExpression): Option[(Alias, DeclarativeAggregate, Long, Long, AttributeReference)] = {
    ne match {
      case a @ Alias(we @ WindowExpression(
          AggregateExpression(fn0, Complete, false, None, _),
          WindowSpecDefinition(GlobalPart(),
            // ANY direction and null placement since late r13: a
            // DESCENDING key reads through the bitwise-NOT reversal
            // (frame bounds carry over unchanged — see longReader),
            // and the one-shot null compute handles a LEADING or
            // TRAILING null block alike (the r13 self-review
            // nulls-first restriction, retired)
            Seq(SortOrder(key, _, _, _)),
            SpecifiedWindowFrame(RangeFrame, lo0, hi0))), _)
          if lo0 != UnboundedPreceding && hi0 != UnboundedFollowing &&
            GlobalRangeMovingAgg.rangeKey(key.dataType) &&
            key.deterministic =>
        for {
          lo <- rangeValueBound(lo0, key.dataType)
          hi <- rangeValueBound(hi0, key.dataType)
          if lo <= hi &&
            math.max(math.abs(lo), math.abs(hi)) <= rangeExtentCap(key.dataType)
          fn <- unwrapAgg(fn0)
          if allowedAgg(fn) && fn.deterministic
        } yield (a, fn, lo, hi,
          AttributeReference(s"__graft_${a.name}", fn.dataType,
            nullable = we.nullable)())
      case _ => None
    }
  }

  /** Sub-gate for the sketch tier (ADVICE r12): routing
    * `approx_percentile OVER ()` through GlobalFrameAgg makes that one
    * function's RESULT partitioning-dependent — the GK summary merge
    * order is partition order, so output bits can change when the
    * partition count changes (AQE, cluster size), within the
    * function's rank-error contract but unlike the single-task
    * built-in. (HLL++ has no such dependence: register maxima are
    * bit-identical under any partitioning.) Exact-reproducibility runs
    * can disable JUST the sketch tier here without giving up the exact
    * families. Default on — the whole-frame rewrite is the documented
    * 100 TB path and the error contract is the function's own. */
  val SketchConfKey = "spark.graft.rewrite.sketchFrameAgg"
  private def sketchTierEnabled: Boolean =
    SQLConf.get.getConfString(SketchConfKey, "true").trim.equalsIgnoreCase("true")

  /** The BOUNDED-SKETCH allowlist for the whole-frame family:
    * imperative aggregates whose buffer is sketch-sized by
    * construction and whose merge is order-robust —
    * approx_count_distinct's HLL++ (register maxima: bit-identical
    * under any partitioning) and approx_percentile's GK summary
    * (within its rank-error bound across partitionings, the same
    * property Spark's own partial aggregation gives it; see
    * [[SketchConfKey]] for the reproducibility caveat and its own
    * off-switch). This is the WindowWhitelist's documented "at 100 TB
    * the same statistic runs via approx_percentile" alternative,
    * executed. Unbounded-buffer imperatives (collect_list/percentile/
    * mode) stay on WindowExec. */
  private def sketchAllowed(fn: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction): Boolean =
    sketchTierEnabled && (fn match {
      case _: org.apache.spark.sql.catalyst.expressions.aggregate.HyperLogLogPlusPlus => true
      case _: org.apache.spark.sql.catalyst.expressions.aggregate.ApproximatePercentile => true
      case _ => false
    })

  /** (alias, function, generated attr) iff `ne` is a rewritable
    * WHOLE-FRAME global window: an order-insensitive allowlisted
    * aggregate — declarative, or a bounded-sketch imperative from
    * [[sketchAllowed]] — over `... BETWEEN UNBOUNDED PRECEDING AND
    * UNBOUNDED FOLLOWING` (ROWS or RANGE — over the full frame they
    * are the same set) or the analyzer's resolution of `OVER ()`. The
    * value is one constant — the aggregate of the whole input — so no
    * order is needed at all and [[GlobalFrameAggNode]] computes it
    * with zero shuffle. First/Last stay out: their whole-frame value
    * depends on the global order, which this family never
    * establishes. */
  private def frameAggOf(ne: NamedExpression): Option[(Alias, org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction, AttributeReference)] = ne match {
    case a @ Alias(we @ WindowExpression(
        AggregateExpression(fn0, Complete, false, None, _),
        WindowSpecDefinition(GlobalPart(), _,
          SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing))), _) =>
      val fn: Option[org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction] =
        unwrapAgg(fn0) match {
          case Some(d) if allowedAgg(d) => Some(d)
          case _ if sketchAllowed(fn0) => Some(fn0)
          case _ => None
        }
      fn.collect {
        case f if f.deterministic =>
          (a, f, AttributeReference(s"__graft_${a.name}", f.dataType,
            nullable = we.nullable)())
      }
    case _ => None
  }

  /** (alias, input, k, ignoreNulls, frame kind, generated attr) iff
    * `ne` is a rewritable `nth_value` global window: a positive
    * integer-literal offset within the boundary-state cap, under a
    * running (`UNBOUNDED PRECEDING .. CURRENT ROW`, ROWS or RANGE) or
    * whole-frame spec — every such frame starts at global row 1, so
    * the k-th frame row is ONE global constant and each row's value is
    * that constant gated on its frame reaching k rows
    * ([[GlobalNthValueNode]]). Frames with a moving lower bound need
    * real frame execution and keep WindowExec. */
  private def nthOf(ne: NamedExpression): Option[(Alias, Expression, Int, Boolean, Int, AttributeReference)] = ne match {
    case a @ Alias(we @ WindowExpression(
        NthValue(input, Literal(k: Int, IntegerType), ignoreNulls),
        WindowSpecDefinition(GlobalPart(), _, SpecifiedWindowFrame(ft, lo, hi))), _)
        if lo == UnboundedPreceding && k > 0 && k <= maxShift &&
          input.deterministic =>
      val kind = (ft, hi) match {
        case (_, UnboundedFollowing) => Some(2)
        case (RowFrame, CurrentRow) => Some(0)
        case (_, CurrentRow) => Some(1)
        case _ => None
      }
      kind.map(fk => (a, input, k, ignoreNulls, fk,
        AttributeReference(s"__graft_${a.name}", input.dataType,
          nullable = we.nullable)()))
    case _ => None
  }

  /** (alias, input, percentage, generated attr) iff `ne` is a
    * rewritable EXACT-PERCENTILE whole-frame global window:
    * `percentile(e, p) OVER ()` / `median(e) OVER ()` (Median is
    * RuntimeReplaceable to Percentile) with a scalar literal
    * percentage, unit frequency, no REVERSE, and an integral or
    * float/double input — [[GlobalExactPercentileNode]] finds the two
    * order statistics by iterative histogram narrowing (floating
    * columns through the IEEE sortable-bits keys), zero shuffle, no
    * sort, and interpolates with PercentileBase's own arithmetic.
    * Decimal inputs of ANY precision select exactly — on the unscaled
    * long for precision <= 18 (r13), in two (high, low)-word phases on
    * the 128-bit unscaled value for 19..38 (late r13). Array
    * percentages, weighted frequencies, and percentile_disc's reverse
    * form keep WindowExec. */
  private def pctOf(ne: NamedExpression): Option[(Alias, Expression, Double, AttributeReference)] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.Percentile
    ne match {
      case a @ Alias(WindowExpression(
          AggregateExpression(fn0, Complete, false, None, _),
          WindowSpecDefinition(GlobalPart(), _,
            SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing))), _) =>
        val pctFn = fn0 match {
          case p: Percentile => Some(p)
          case r: org.apache.spark.sql.catalyst.expressions.RuntimeReplaceableAggregate =>
            r.replacement match {
              case p: Percentile => Some(p)
              case _ => None
            }
          case _ => None
        }
        // the ANALYZED plan wraps SQL literals in implicit casts
        // (0.5 parses as DECIMAL(1,1) then casts to double), so fold
        // rather than pattern-match the literals
        def foldedDouble(e: Expression): Option[Double] =
          if (e.foldable && e.dataType == org.apache.spark.sql.types.DoubleType)
            Option(e.eval()).map(_.asInstanceOf[Double])
          else None
        def unitFrequency(e: Expression): Boolean =
          e.foldable && (e.eval() match {
            case 1L | 1 => true
            case _ => false
          })
        pctFn.flatMap { p =>
          val ok = !p.reverse && p.child.deterministic &&
            (p.child.dataType match {
              case LongType | IntegerType |
                   org.apache.spark.sql.types.ShortType |
                   org.apache.spark.sql.types.ByteType |
                   org.apache.spark.sql.types.DoubleType |
                   org.apache.spark.sql.types.FloatType => true
              // r13 (VERDICT r12 task 4): bounded-precision decimals
              // select on the exact unscaled long; WIDE decimals
              // (precision 19..38) select in two phases on the 128-bit
              // unscaled value's (high, low) words — late r13, the
              // family's last type refusal retired
              case _: org.apache.spark.sql.types.DecimalType => true
              case _ => false
            }) && unitFrequency(p.frequencyExpression)
          if (!ok) None
          else foldedDouble(p.percentageExpression)
            .filter(d => d >= 0.0 && d <= 1.0)
            .map(d => (a, p.child, d,
              AttributeReference(s"__graft_${a.name}",
                org.apache.spark.sql.types.DoubleType, nullable = true)()))
        }
      case _ => None
    }
  }

  private sealed trait Rewritten
  private case class AsRank(a: Alias, mode: RankMode, rc: RankCol) extends Rewritten
  private case class AsShift(a: Alias, sc: ShiftCol) extends Rewritten
  private case class AsRunAgg(a: Alias, fn: DeclarativeAggregate,
                              rows: Boolean, attr: AttributeReference) extends Rewritten
  private case class AsMovAgg(a: Alias, fn: DeclarativeAggregate,
                              lo: Int, hi: Int,
                              attr: AttributeReference) extends Rewritten
  private case class AsRangeMov(a: Alias, fn: DeclarativeAggregate,
                                lo: Long, hi: Long,
                                attr: AttributeReference) extends Rewritten
  private case class AsLeadNN(a: Alias, input: Expression, k: Int,
                              default: Expression,
                              attr: AttributeReference) extends Rewritten
  private case class AsFrameAgg(a: Alias,
                                fn: org.apache.spark.sql.catalyst.expressions.aggregate.AggregateFunction,
                                attr: AttributeReference) extends Rewritten
  private case class AsNth(a: Alias, input: Expression, k: Int,
                           ignoreNulls: Boolean, kind: Int,
                           attr: AttributeReference) extends Rewritten
  private case class AsPct(a: Alias, input: Expression, pct: Double,
                           attr: AttributeReference) extends Rewritten
  private case class AsMode(a: Alias, input: Expression, reverse: Boolean,
                            attr: AttributeReference) extends Rewritten

  /** (alias, input, reverse, generated attr) iff `ne` is a whole-frame
    * GLOBAL `mode()` window (r14, VERDICT r13 task 4) — the
    * unbounded-buffer imperative that IS retirable: `mode(e)` is
    * order-insensitive and equals argmax-of-value-counts, so it
    * rewrites to the two-level counts→argmax aggregate joined back
    * (see [[globalModeRel]]) instead of shipping a per-value hash-map
    * buffer anywhere. Tie-break: `mode() WITHIN GROUP (ORDER BY v)`
    * carries its direction in `reverseOpt` and the rewrite reproduces
    * it exactly; plain `mode(e)` (reverseOpt empty) is
    * tie-NONDETERMINISTIC in the built-in (hash-map iteration order),
    * so the rewrite's first-in-ascending-order choice is a
    * deterministic refinement of an unspecified result, not a
    * divergence. `collect_list` stays refused — its value is
    * order-DEFINED, which no order-free aggregation can reproduce. */
  /** True iff every expression in the plan subtree is deterministic.
    * Every rewrite target is a MULTI-EXECUTION shape — the two-pass
    * Global and Partitioned operators re-execute their child RDD once
    * per pass (pass-1 boundary partials, pass-2 emission), and the
    * mode/frame-agg join-backs reference the child subtree twice — so a
    * non-deterministic child (rand(), sample, a non-deterministic UDF
    * upstream) would be evaluated over DIFFERENT row sets across
    * passes, producing internally inconsistent results that WindowExec
    * (one materialization) never shows. Admission therefore requires a
    * deterministic child plan in every Window case (ADVICE r14 #1,
    * generalized from the mode join-back to the whole family). */
  private def planDeterministic(p: LogicalPlan): Boolean =
    !p.exists(n => n.expressions.exists(e => !e.deterministic))

  private def modeFrameAggOf(ne: NamedExpression): Option[(Alias, Expression, Boolean, AttributeReference)] = ne match {
    case a @ Alias(we @ WindowExpression(
        AggregateExpression(m: org.apache.spark.sql.catalyst.expressions.aggregate.Mode,
          Complete, false, None, _),
        WindowSpecDefinition(GlobalPart(), _,
          SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing))), _)
        if m.child.deterministic &&
          org.apache.spark.sql.catalyst.expressions.RowOrdering
            .isOrderable(m.child.dataType) =>
      Some((a, m.child, m.reverseOpt.getOrElse(true),
        AttributeReference(s"__graft_${a.name}", m.dataType,
          nullable = we.nullable)()))
    case _ => None
  }

  /** The PARTITIONED sibling of [[modeFrameAggOf]]:
    * `mode(e) OVER (PARTITION BY k)` — the skew tier's member
    * (per-key value counts are map-side combined; the hot key costs
    * one combiner slot per task, never a task). */
  private def skewModeOf(ne: NamedExpression): Option[(Alias, Expression, Boolean, AttributeReference)] = ne match {
    case a @ Alias(we @ WindowExpression(
        AggregateExpression(m: org.apache.spark.sql.catalyst.expressions.aggregate.Mode,
          Complete, false, None, _),
        WindowSpecDefinition(ps, _,
          SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing))), _)
        if ps.nonEmpty && m.child.deterministic &&
          org.apache.spark.sql.catalyst.expressions.RowOrdering
            .isOrderable(m.child.dataType) =>
      Some((a, m.child, m.reverseOpt.getOrElse(true),
        AttributeReference(s"__graft_${a.name}", m.dataType,
          nullable = we.nullable)()))
    case _ => None
  }

  /** The one-row relation `SELECT mode-of(input) FROM child`: per-value
    * counts (map-side combined, nulls excluded — mode ignores null
    * inputs), then a global argmax with the tie-break encoded as a
    * struct extreme — `min(struct(-cnt, v))` picks (max count, min
    * value), `max(struct(cnt, v))` picks (max count, max value) — so
    * driver/executor state is one struct, never a value→count map. The
    * empty-input case (no rows, or all inputs null) yields one row with
    * a NULL struct → NULL mode, matching the built-in. The output
    * attribute carries the caller's generated exprId, so the join-back
    * projection resolves without re-aliasing. */
  private def globalModeRel(child: LogicalPlan, input: Expression,
                            tieSmallest: Boolean,
                            attr: AttributeReference): LogicalPlan = {
    import org.apache.spark.sql.catalyst.expressions.{CreateStruct, GetStructField, IsNotNull}
    val freshAliases: Seq[Alias] = child.output.map(o => Alias(o, o.name)())
    val subst = AttributeMap(child.output.zip(freshAliases.map(_.toAttribute)))
    val v = input.transform { case at: Attribute => subst.getOrElse(at, at) }
    val vA = Alias(v, "__graft_mode_v")()
    val proj = Project(Seq(vA), Project(freshAliases, child))
    val nonNull = org.apache.spark.sql.catalyst.plans.logical
      .Filter(IsNotNull(vA.toAttribute), proj)
    val cntA = Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
      isDistinct = false), "__graft_mode_c")()
    val counts = Aggregate(Seq(vA.toAttribute),
      Seq(vA.toAttribute, cntA), nonNull)
    val pair: Expression =
      if (tieSmallest) CreateStruct(Seq(UnaryMinus(cntA.toAttribute), vA.toAttribute))
      else CreateStruct(Seq(cntA.toAttribute, vA.toAttribute))
    val bestFn: AggregateFunction = if (tieSmallest) Min(pair) else Max(pair)
    val bestA = Alias(AggregateExpression(bestFn, Complete,
      isDistinct = false), "__graft_mode_s")()
    val arg = Aggregate(Nil, Seq(bestA), counts)
    Project(Seq(Alias(GetStructField(bestA.toAttribute, 1), attr.name)(
      exprId = attr.exprId)), arg)
  }

  /** True iff `ne` is a SUFFIX-running window aggregate (r14):
    * `agg(e) OVER (... ORDER BY o ROWS|RANGE BETWEEN CURRENT ROW AND
    * UNBOUNDED FOLLOWING)` over the ordered allowlist — "the total of
    * everything from here on". The frame is the exact MIRROR of the
    * running family's under order REVERSAL, so no new operator is
    * needed: [[mirrorSuffix]] flips every sort direction and null
    * placement (a total reversal), mirrors the frame to `UNBOUNDED
    * PRECEDING .. CURRENT ROW`, and swaps First<->Last (frame CONTENT
    * is preserved by the mirror, but those two read frame ORDER, which
    * the reversal inverts); the rewritten node then routes through the
    * existing running machinery. RANGE forms are tie-exact (value
    * frames contain whole tie groups on both sides); ROWS forms carry
    * the running family's existing total-order caveat under ties.
    * ROWS frames starting at a literal offset
    * (`k PRECEDING/FOLLOWING .. UNBOUNDED FOLLOWING`, within the shift
    * cap) mirror onto `UNBOUNDED PRECEDING .. k-offset`, which the
    * delayed/extended composition ([[delayedRunAggOf]]) then routes;
    * offset RANGE starts and over-cap offsets stay on WindowExec. */
  private def suffixRunningOf(ne: NamedExpression): Option[(Alias, Boolean)] = {
    // CurrentRow anchors mirror for ROWS and RANGE; literal ROW-offset
    // anchors mirror onto the r14 delayed/extended composition (ROWS
    // only, within the shift cap)
    def loOk(lo: Expression, ft: Any): Boolean = lo match {
      case CurrentRow => true
      case Literal(k: Int, IntegerType) =>
        ft == RowFrame && k != 0 && math.abs(k) <= maxShift
      case Literal(k: Long, LongType) =>
        ft == RowFrame && k.isValidInt && k != 0L &&
          math.abs(k.toInt) <= maxShift
      case UnaryMinus(Literal(k: Int, IntegerType), _) =>
        ft == RowFrame && k != 0 && math.abs(k) <= maxShift
      case UnaryMinus(Literal(k: Long, LongType), _) =>
        ft == RowFrame && k.isValidInt && k != 0L &&
          math.abs(k.toInt) <= maxShift
      case _ => false
    }
    ne match {
      case a @ Alias(WindowExpression(
          AggregateExpression(fn0, Complete, false, None, _),
          WindowSpecDefinition(_, os,
            SpecifiedWindowFrame(ft, lo, UnboundedFollowing))), _)
          if os.nonEmpty && loOk(lo, ft) =>
        val swapped = fn0 match {
          case f: First => Last(f.child, f.ignoreNulls)
          case l: Last => First(l.child, l.ignoreNulls)
          case other => other
        }
        unwrapAgg(swapped) match {
          case Some(fn) if allowedOrderedAgg(fn) && fn.deterministic =>
            Some((a, ft == RowFrame))
          case _ => None
        }
      case _ => None
    }
  }

  /** Exact total-order reversal: ASC NULLS FIRST <-> DESC NULLS LAST
    * (and the off-default pairings likewise), per sort key. */
  private def reverseOrder(so: SortOrder): SortOrder = {
    val dir = so.direction match {
      case Ascending => org.apache.spark.sql.catalyst.expressions.Descending
      case _ => Ascending
    }
    val no = so.nullOrdering match {
      case org.apache.spark.sql.catalyst.expressions.NullsFirst =>
        org.apache.spark.sql.catalyst.expressions.NullsLast
      case _ => org.apache.spark.sql.catalyst.expressions.NullsFirst
    }
    SortOrder(so.child, dir, no, so.sameOrderExpressions)
  }

  /** Rebuild a suffix-running window expression as its prefix-running
    * MIRROR (same alias exprId, so downstream projection is
    * untouched): reversed order, mirrored frame, First<->Last swap. */
  private def mirrorSuffix(ne: NamedExpression): NamedExpression = ne match {
    case a @ Alias(we @ WindowExpression(
        ae @ AggregateExpression(fn0, _, _, _, _),
        WindowSpecDefinition(ps, os,
          SpecifiedWindowFrame(ft, lo, UnboundedFollowing))), _) =>
      val swapped = fn0 match {
        case f: First => Last(f.child, f.ignoreNulls)
        case l: Last => First(l.child, l.ignoreNulls)
        case other => other
      }
      // the mirrored END is the NEGATED start: CURRENT ROW stays,
      // `k PRECEDING` becomes `k FOLLOWING` and vice versa (the r14
      // delayed/extended composition then handles the offset ends)
      val hi: Expression = lo match {
        case CurrentRow => CurrentRow
        case Literal(k: Int, IntegerType) => Literal(-k)
        case Literal(k: Long, LongType) => Literal(-k.toInt)
        case UnaryMinus(Literal(k: Int, IntegerType), _) => Literal(k)
        case UnaryMinus(Literal(k: Long, LongType), _) => Literal(k.toInt)
        case other => other // unreachable under suffixRunningOf
      }
      Alias(WindowExpression(ae.copy(aggregateFunction = swapped),
        WindowSpecDefinition(ps, os.map(reverseOrder),
          SpecifiedWindowFrame(ft, UnboundedPreceding, hi))),
        a.name)(exprId = a.exprId, qualifier = a.qualifier,
          explicitMetadata = Some(a.metadata))
    case other => other
  }

  /** (alias, original AggregateExpression, signed end offset k, fn)
    * iff `ne` is a DELAYED/EXTENDED running window aggregate (r14):
    * `agg(e) OVER (... ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING AND
    * k PRECEDING|FOLLOWING)` with a literal offset within the shift
    * cap. These COMPOSE from already-distributed members on ONE shared
    * exchange instead of needing an operator:
    *
    *  - `.. k PRECEDING` (k < 0 here) is the running value k rows ago:
    *    `lag(running, k, <empty-frame value>)` — the lag default fires
    *    exactly when the frame is empty (pos < k), and the empty-frame
    *    value is the aggregate's own eval over its initial buffer
    *    (0 for count, NULL for the rest of the allowlist);
    *  - `.. k FOLLOWING` (k > 0) is the running value k rows ahead,
    *    saturating at the end: `IF(rn + k > N, whole-frame-agg,
    *    lead(running, k))` — the frame is never empty, and past the
    *    end it is the ENTIRE input, i.e. the whole-frame aggregate.
    *
    * ROWS only (a value-offset RANGE end is a shifted value window,
    * not a row shift) and the running allowlist ([[allowedOrderedAgg]]
    * — First/Last work verbatim: their delayed value is the running
    * First/Last at the shifted row). */
  private def delayedRunAggOf(ne: NamedExpression): Option[(Alias, AggregateExpression, Int, DeclarativeAggregate)] = ne match {
    case a @ Alias(WindowExpression(
        ae @ AggregateExpression(fn0, Complete, false, None, _),
        WindowSpecDefinition(_, os,
          SpecifiedWindowFrame(RowFrame, UnboundedPreceding, hi))), _)
        if os.nonEmpty =>
      val kOpt: Option[Int] = hi match {
        case Literal(k: Int, IntegerType) if k != 0 => Some(k)
        case Literal(k: Long, LongType) if k.isValidInt && k != 0L => Some(k.toInt)
        case UnaryMinus(Literal(k: Int, IntegerType), _) if k != 0 => Some(-k)
        case UnaryMinus(Literal(k: Long, LongType), _)
          if k.isValidInt && k != 0L => Some(-k.toInt)
        case _ => None // CurrentRow = running; UnboundedFollowing = whole-frame
      }
      for {
        k <- kOpt
        if math.abs(k) <= maxShift
        fn <- unwrapAgg(fn0)
        if allowedOrderedAgg(fn) && fn.deterministic
      } yield (a, ae, k, fn)
    case _ => None
  }

  /** The aggregate's value over an EMPTY frame: its own
    * `evaluateExpression` over the initial buffer (0 for count, NULL
    * for every other allowlisted member) — computed once at rule time
    * so the lag default is a plain literal. */
  private def emptyFrameLiteral(fn: DeclarativeAggregate): Literal = {
    import org.apache.spark.sql.catalyst.expressions.{BindReferences, MutableProjection, SpecificInternalRow}
    val buf = new SpecificInternalRow(fn.aggBufferAttributes.map(_.dataType))
    MutableProjection.create(fn.initialValues, Nil).target(buf)(
      org.apache.spark.sql.catalyst.InternalRow.empty)
    val v = BindReferences
      .bindReference(fn.evaluateExpression, fn.aggBufferAttributes).eval(buf)
    Literal.create(v, fn.dataType)
  }

  /** Unconditional rewrite (the conf gate lives in [[apply]]).
    * Idempotent: the result contains no matching `Window`, so a
    * fixed-point batch terminates immediately. */
  def rewrite(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // delayed/extended running windows (r14): compose lag/lead over a
    // generated running column (plus row_number + whole-frame totals
    // for the k-FOLLOWING end), all riding the chain's ONE exchange —
    // peel them, stack helper + shift windows, rewrite each half, and
    // restore the original columns in a final Project
    case Window(wexprs, ps, orderSpec, child, hint)
        if wexprs.nonEmpty && ps.forall(_.foldable) &&
          planDeterministic(child) &&
          orderSpec.nonEmpty && orderSpec.forall(_.deterministic) &&
          wexprs.exists(e => delayedRunAggOf(e).isDefined) &&
          wexprs.forall(e => delayedRunAggOf(e).isDefined ||
            suffixRunningOf(e).isDefined ||
            frameAggOf(e).isDefined || pctOf(e).isDefined ||
            modeFrameAggOf(e).isDefined ||
            rankOf(e).isDefined || shiftOf(e).isDefined ||
            leadNNOf(e).isDefined || runAggOf(e).isDefined ||
            movAggOf(e).isDefined || rangeMovAggOf(e).isDefined ||
            nthOf(e).isDefined) =>
      val delayed = wexprs.flatMap(e => delayedRunAggOf(e).map(e -> _))
      val rest = wexprs.filterNot(e => delayedRunAggOf(e).isDefined)
      val base: LogicalPlan =
        if (rest.isEmpty) child
        else rewrite(Window(rest, ps, orderSpec, child, hint))
      def freshAe(ae: AggregateExpression): AggregateExpression =
        ae.copy(resultId = NamedExpression.newExprId)
      val needTotals = delayed.exists(_._2._3 > 0)
      // helper window: one running column per delayed expr, plus
      // row_number and per-aggregate whole-frame totals when any end
      // EXTENDS (k > 0) — rank, running, and whole-frame members all
      // stack in one node on one exchange
      val runA = delayed.map { case (_, (a, ae, _, _)) =>
        Alias(WindowExpression(freshAe(ae),
          WindowSpecDefinition(ps, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
          s"__graft_dr_${a.name}")()
      }
      val rnA =
        if (!needTotals) None
        else Some(Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(ps, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
          "__graft_dr_rn")())
      val cntA =
        if (!needTotals) None
        else Some(Alias(WindowExpression(
          AggregateExpression(Count(Seq(Literal(1))), Complete,
            isDistinct = false),
          WindowSpecDefinition(ps, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
              UnboundedFollowing))), "__graft_dr_n")())
      val totA = delayed.map { case (_, (a, ae, k, _)) =>
        if (k <= 0) None
        else Some(Alias(WindowExpression(freshAe(ae),
          WindowSpecDefinition(ps, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
              UnboundedFollowing))), s"__graft_dt_${a.name}")())
      }
      val helperExprs: Seq[NamedExpression] =
        runA ++ rnA.toSeq ++ cntA.toSeq ++ totA.flatten
      val helper = rewrite(Window(helperExprs, ps, orderSpec, base))
      // shift window over the helper outputs
      val shiftA = delayed.zip(runA).map { case ((_, (a, _, k, fn)), ra) =>
        val shifted: Expression =
          if (k < 0) Lag(ra.toAttribute, Literal(-k), emptyFrameLiteral(fn),
            false)
          // the default never surfaces (the If picks the whole-frame
          // value past the end) but the empty-frame literal keeps the
          // STATIC nullability identical to the built-in's (count stays
          // non-nullable)
          else Lead(ra.toAttribute, Literal(k), emptyFrameLiteral(fn), false)
        Alias(WindowExpression(shifted,
          WindowSpecDefinition(ps, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnaryMinus(Literal(math.abs(k))),
              Literal(math.abs(k))))), s"__graft_ds_${a.name}")()
      }
      val shifted = rewrite(Window(shiftA, ps, orderSpec, helper))
      val restored: Seq[NamedExpression] = wexprs.map { e =>
        delayed.indexWhere(_._1 eq e) match {
          case -1 => e.toAttribute
          case i =>
            val (a, _, k, _) = delayed(i)._2
            val value: Expression =
              if (k < 0) shiftA(i).toAttribute
              else org.apache.spark.sql.catalyst.expressions.If(
                org.apache.spark.sql.catalyst.expressions.GreaterThan(
                  org.apache.spark.sql.catalyst.expressions.Add(
                    Cast(rnA.get.toAttribute, LongType), Literal(k.toLong)),
                  cntA.get.toAttribute),
                totA(i).get.toAttribute, shiftA(i).toAttribute)
            Alias(value, a.name)(exprId = a.exprId, qualifier = a.qualifier,
              explicitMetadata = Some(a.metadata))
        }
      }
      Project(child.output ++ restored, shifted)
    // suffix-running windows (r14): peel them onto a REVERSED-order
    // running chain stacked over the rest of the node, then let the
    // standard case below rewrite both halves — each half is
    // row-preserving and column-appending, so stacking composes, and
    // the final Project restores the original column order
    case Window(wexprs, ps, orderSpec, child, hint)
        if wexprs.nonEmpty && ps.forall(_.foldable) &&
          planDeterministic(child) &&
          orderSpec.nonEmpty && orderSpec.forall(_.deterministic) &&
          wexprs.exists(e => suffixRunningOf(e).isDefined) &&
          wexprs.forall(e => suffixRunningOf(e).isDefined ||
            frameAggOf(e).isDefined || pctOf(e).isDefined ||
            modeFrameAggOf(e).isDefined ||
            rankOf(e).isDefined || shiftOf(e).isDefined ||
            leadNNOf(e).isDefined || runAggOf(e).isDefined ||
            movAggOf(e).isDefined || rangeMovAggOf(e).isDefined ||
            nthOf(e).isDefined) =>
      val (suffix, rest) = wexprs.partition(e => suffixRunningOf(e).isDefined)
      val base: LogicalPlan =
        if (rest.isEmpty) child
        else rewrite(Window(rest, ps, orderSpec, child, hint))
      val mirrored = Window(suffix.map(mirrorSuffix), ps,
        orderSpec.map(reverseOrder), base, hint)
      Project(child.output ++ wexprs.map(_.toAttribute), rewrite(mirrored))
    case Window(wexprs, GlobalPart(), orderSpec, child, _)
        if wexprs.nonEmpty && planDeterministic(child) && {
          // whole-frame expressions are order-independent, so a window
          // of nothing else rewrites even with no (or a nondeterministic)
          // ORDER BY — `sum(x) OVER ()` has an empty orderSpec by
          // construction; the ordered families still require a
          // deterministic order
          val orderedOk = orderSpec.nonEmpty && orderSpec.forall(_.deterministic)
          wexprs.forall(e => frameAggOf(e).isDefined || pctOf(e).isDefined ||
            modeFrameAggOf(e).isDefined ||
            (orderedOk && (rankOf(e).isDefined || shiftOf(e).isDefined ||
              leadNNOf(e).isDefined || runAggOf(e).isDefined ||
              movAggOf(e).isDefined || rangeMovAggOf(e).isDefined ||
              nthOf(e).isDefined)))
        } =>
      // classify once (fresh generated attrs must be created exactly
      // once per expression); the families are disjoint — a whole-frame
      // spec (UNBOUNDED..UNBOUNDED) can match neither the running
      // (..CURRENT ROW) nor the moving (literal bounds) matcher
      val classified: Seq[Rewritten] = wexprs.map { e =>
        modeFrameAggOf(e) match {
          case Some((a, input, rev, attr)) => AsMode(a, input, rev, attr)
          case None =>
        frameAggOf(e) match {
          case Some((a, fn, attr)) => AsFrameAgg(a, fn, attr)
          case None => pctOf(e) match {
            case Some((a, input, pct, attr)) => AsPct(a, input, pct, attr)
            case None => rankOf(e) match {
            case Some((a, m)) => AsRank(a, m,
              RankCol(AttributeReference(s"__graft_${a.name}", m.dataType,
                nullable = false)(), m))
            case None => shiftOf(e) match {
              case Some((a, sc)) => AsShift(a, sc)
              case None => leadNNOf(e) match {
                case Some((a, input, kk, default, attr)) =>
                  AsLeadNN(a, input, kk, default, attr)
              case None => runAggOf(e) match {
                case Some((a, fn, rows, attr)) => AsRunAgg(a, fn, rows, attr)
                case None => movAggOf(e) match {
                  case Some((a, fn, lo, hi, attr)) => AsMovAgg(a, fn, lo, hi, attr)
                  case None => rangeMovAggOf(e) match {
                    case Some((a, fn, lo, hi, attr)) =>
                      AsRangeMov(a, fn, lo, hi, attr)
                    case None =>
                      val (a, input, k, ign, kind, attr) = nthOf(e).get
                      AsNth(a, input, k, ign, kind, attr)
                  }
                }
              }
              }
            }
            }
          }
        }
        }
      }
      val rankCols = classified.collect { case AsRank(_, _, rc) => rc }
      val shiftCols = classified.collect { case AsShift(_, sc) => sc }
      val leadNNCols = classified.collect { case r: AsLeadNN => r }
      val aggCols = classified.collect { case r: AsRunAgg => r }
      val movCols = classified.collect { case r: AsMovAgg => r }
      val rangeMovCols = classified.collect { case r: AsRangeMov => r }
      val frameCols = classified.collect { case r: AsFrameAgg => r }
      val nthCols = classified.collect { case r: AsNth => r }
      val pctCols = classified.collect { case r: AsPct => r }
      // rank node below, shift above, running agg, moving agg on top —
      // all four declare the same OrderedDistribution and pass
      // partitioning + ordering through, so stacking costs no extra
      // exchange
      val withRanks: LogicalPlan =
        if (rankCols.isEmpty) child
        else GlobalRankNode(orderSpec, rankCols, child)
      val withShifts: LogicalPlan =
        if (shiftCols.isEmpty) withRanks
        else GlobalShiftNode(orderSpec, shiftCols.map(_.attr),
          shiftCols.map(_.input), shiftCols.map(_.offset),
          shiftCols.map(_.default), shiftCols.map(_.ignoreNulls), withRanks)
      // one lookahead node per expression (single-column by design —
      // the deque bound is per-column; see GlobalLookaheadNode)
      val withLookaheads: LogicalPlan = leadNNCols.foldLeft(withShifts) {
        case (p, AsLeadNN(_, input, kk, default, attr)) =>
          GlobalLookaheadNode(orderSpec, attr, input, kk, default, p)
      }
      val withRunAggs: LogicalPlan =
        if (aggCols.isEmpty) withLookaheads
        else GlobalRunningAggNode(orderSpec, aggCols.map(_.attr),
          aggCols.map(_.fn), aggCols.map(_.rows), withLookaheads)
      val withMovAggs: LogicalPlan =
        if (movCols.isEmpty) withRunAggs
        else GlobalMovingAggNode(orderSpec, movCols.map(_.attr),
          movCols.map(_.fn), movCols.map(_.lo), movCols.map(_.hi),
          withRunAggs)
      val withRangeMov: LogicalPlan =
        if (rangeMovCols.isEmpty) withMovAggs
        else GlobalRangeMovingAggNode(orderSpec, rangeMovCols.map(_.attr),
          rangeMovCols.map(_.fn), rangeMovCols.map(_.lo),
          rangeMovCols.map(_.hi),
          orderSpec.head.direction == org.apache.spark.sql.catalyst.expressions.Descending,
          withMovAggs)
      val withNth: LogicalPlan =
        if (nthCols.isEmpty) withRangeMov
        else GlobalNthValueNode(orderSpec, nthCols.map(_.attr),
          nthCols.map(_.input), nthCols.map(_.k),
          nthCols.map(_.ignoreNulls), nthCols.map(_.kind), withRangeMov)
      // the whole-frame nodes require nothing and preserve everything,
      // so they ride the ordered siblings' shared range exchange when
      // mixed, and introduce NO exchange when alone
      val withFrameAggs: LogicalPlan =
        if (frameCols.isEmpty) withNth
        else GlobalFrameAggNode(frameCols.map(_.attr),
          frameCols.map(_.fn), withNth)
      val node0: LogicalPlan =
        if (pctCols.isEmpty) withFrameAggs
        else GlobalExactPercentileNode(pctCols.map(_.attr),
          pctCols.map(_.input), pctCols.map(_.pct), withFrameAggs)
      // whole-frame mode (r14): each distinct mode expression joins its
      // ONE-ROW counts→argmax relation back onto the chain — a
      // broadcast of a single row, zero shuffle of the big side
      val modeCols = classified.collect { case r: AsMode => r }
      val node: LogicalPlan = modeCols.foldLeft(node0) {
        case (p, AsMode(_, input, rev, attr)) =>
          Join(p, globalModeRel(child, input, rev, attr),
            org.apache.spark.sql.catalyst.plans.Cross, None, JoinHint.NONE)
      }
      val projected = child.output ++ classified.map {
        case AsRank(a, m, rc) =>
          val value: Expression = m match {
            // percent_rank / cume_dist are DOUBLE on both sides — as-is
            case RankMode.PercentRank | RankMode.CumeDist => rc.attr
            // the built-ins are INT; the node emits LONG (it exists for
            // row counts past 2^31) — cast back so downstream types and
            // the user-visible schema are unchanged
            case _ => Cast(rc.attr, IntegerType)
          }
          Alias(value, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata))
        case AsShift(a, sc) =>
          Alias(sc.attr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata))
        case AsLeadNN(a, _, _, _, attr) =>
          Alias(attr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata))
        case AsRunAgg(a, _, _, attr) =>
          Alias(attr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata))
        case AsMovAgg(a, _, _, _, attr) =>
          Alias(attr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata))
        case AsRangeMov(a, _, _, _, attr) =>
          Alias(attr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata))
        case AsFrameAgg(a, _, attr) =>
          Alias(attr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata))
        case AsNth(a, _, _, _, _, attr) =>
          Alias(attr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata))
        case AsPct(a, _, _, attr) =>
          Alias(attr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata))
        case AsMode(a, _, _, attr) =>
          Alias(attr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata))
      }
      Project(projected, node)
  }

  /** The skew tier's rewrite, two disjoint shapes:
    *
    *  1. a PARTITIONED `Window` whose expressions are ALL stitchable —
    *     rank modes (row_number/rank/dense_rank: the per-key position
    *     arithmetic that telescopes across a hot key's range
    *     sub-split), plain literal-offset lead/lag, running aggregates
    *     (UNBOUNDED PRECEDING .. CURRENT ROW over the ordered
    *     allowlist: per-key prefix buffers stitch the same way),
    *     and/or bounded-ROWS moving aggregates (key-gated frame rings
    *     with key-matched boundary rows) — becomes
    *     [[PartitionedRankNode]] / [[PartitionedShiftNode]] /
    *     [[PartitionedRunningAggNode]] / [[PartitionedMovingAggNode]],
    *     stacked on ONE composite range exchange;
    *  2. a PARTITIONED `Window` whose expressions are ALL per-key
    *     WHOLE-FRAME aggregates (`agg(e) OVER (PARTITION BY k)` — the
    *     ratio-to-group-total shape) — becomes a map-side-combined
    *     `Aggregate` on the keys null-safe-equi-JOINED back to the
    *     child (see [[rewriteSkewFrameAgg]]): no new physical node at
    *     all, and the one per-key window shape AQE can then actually
    *     fix — a skewed sort-merge join splits, the one-row-per-key
    *     aggregate side replicates, or broadcasts outright when the
    *     key count is small, while WindowExec's hash exchange funnels
    *     the whole hot key through one task no matter what.
    *
    * A window mixing the two shapes (same partition AND order spec,
    * whole-frame next to running members in one node) keeps WindowExec
    * — rare, and correctly handled there. */
  private[graft] def rewriteSkew(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    // per-key delayed/extended running windows (r14): the same
    // composition as the global tier — lag/lead of a generated per-key
    // running column, with per-key row_number + whole-frame totals
    // (via the window-to-join shape) for the extended end — stacked
    // windows each routed through the standard skew machinery
    case Window(wexprs, partSpec, orderSpec, child, hint)
        if wexprs.nonEmpty && partSpec.nonEmpty &&
          partSpec.forall(_.deterministic) && planDeterministic(child) &&
          orderSpec.nonEmpty && orderSpec.forall(_.deterministic) &&
          wexprs.exists(e => delayedRunAggOf(e).isDefined) &&
          wexprs.forall(e => delayedRunAggOf(e).isDefined ||
            suffixRunningOf(e).isDefined || classifySkew(e).isDefined) =>
      val delayed = wexprs.flatMap(e => delayedRunAggOf(e).map(e -> _))
      val rest = wexprs.filterNot(e => delayedRunAggOf(e).isDefined)
      val base: LogicalPlan =
        if (rest.isEmpty) child
        else rewriteSkew(Window(rest, partSpec, orderSpec, child, hint))
      def freshAe(ae: AggregateExpression): AggregateExpression =
        ae.copy(resultId = NamedExpression.newExprId)
      val needTotals = delayed.exists(_._2._3 > 0)
      // per-key totals ride their OWN whole-frame node (the
      // window-to-join shape); rank + running stack in shape 1
      val cntA =
        if (!needTotals) None
        else Some(Alias(WindowExpression(
          AggregateExpression(Count(Seq(Literal(1))), Complete,
            isDistinct = false),
          WindowSpecDefinition(partSpec, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
              UnboundedFollowing))), "__graft_dr_n")())
      val totA = delayed.map { case (_, (a, ae, k, _)) =>
        if (k <= 0) None
        else Some(Alias(WindowExpression(freshAe(ae),
          WindowSpecDefinition(partSpec, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding,
              UnboundedFollowing))), s"__graft_dt_${a.name}")())
      }
      val withTotals: LogicalPlan =
        if (!needTotals) base
        else rewriteSkew(Window(cntA.toSeq ++ totA.flatten, partSpec,
          orderSpec, base))
      val runA = delayed.map { case (_, (a, ae, _, _)) =>
        Alias(WindowExpression(freshAe(ae),
          WindowSpecDefinition(partSpec, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
          s"__graft_dr_${a.name}")()
      }
      val rnA =
        if (!needTotals) None
        else Some(Alias(WindowExpression(RowNumber(),
          WindowSpecDefinition(partSpec, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))),
          "__graft_dr_rn")())
      val helper = rewriteSkew(Window(runA ++ rnA.toSeq, partSpec,
        orderSpec, withTotals))
      val shiftA = delayed.zip(runA).map { case ((_, (a, _, k, fn)), ra) =>
        val shifted: Expression =
          if (k < 0) Lag(ra.toAttribute, Literal(-k), emptyFrameLiteral(fn),
            false)
          // the default never surfaces (the If picks the whole-frame
          // value past the end) but the empty-frame literal keeps the
          // STATIC nullability identical to the built-in's (count stays
          // non-nullable)
          else Lead(ra.toAttribute, Literal(k), emptyFrameLiteral(fn), false)
        Alias(WindowExpression(shifted,
          WindowSpecDefinition(partSpec, orderSpec,
            SpecifiedWindowFrame(RowFrame, UnaryMinus(Literal(math.abs(k))),
              Literal(math.abs(k))))), s"__graft_ds_${a.name}")()
      }
      val shifted = rewriteSkew(Window(shiftA, partSpec, orderSpec, helper))
      val restored: Seq[NamedExpression] = wexprs.map { e =>
        delayed.indexWhere(_._1 eq e) match {
          case -1 => e.toAttribute
          case i =>
            val (a, _, k, _) = delayed(i)._2
            val value: Expression =
              if (k < 0) shiftA(i).toAttribute
              else org.apache.spark.sql.catalyst.expressions.If(
                org.apache.spark.sql.catalyst.expressions.GreaterThan(
                  org.apache.spark.sql.catalyst.expressions.Add(
                    Cast(rnA.get.toAttribute, LongType), Literal(k.toLong)),
                  cntA.get.toAttribute),
                totA(i).get.toAttribute, shiftA(i).toAttribute)
            Alias(value, a.name)(exprId = a.exprId, qualifier = a.qualifier,
              explicitMetadata = Some(a.metadata))
        }
      }
      Project(child.output ++ restored, shifted)
    // per-key suffix-running windows (r14): the same mirror as the
    // global tier — reversed (k, v) order, mirrored frame, First<->Last
    // swap — stacked over the node's other members, each half routed
    // through the standard skew machinery below
    case Window(wexprs, partSpec, orderSpec, child, hint)
        if wexprs.nonEmpty && partSpec.nonEmpty &&
          partSpec.forall(_.deterministic) && planDeterministic(child) &&
          orderSpec.nonEmpty && orderSpec.forall(_.deterministic) &&
          wexprs.exists(e => suffixRunningOf(e).isDefined) &&
          wexprs.forall(e => suffixRunningOf(e).isDefined ||
            classifySkew(e).isDefined) =>
      val (suffix, rest) = wexprs.partition(e => suffixRunningOf(e).isDefined)
      val base: LogicalPlan =
        if (rest.isEmpty) child
        else rewriteSkew(Window(rest, partSpec, orderSpec, child, hint))
      val mirrored = Window(suffix.map(mirrorSuffix), partSpec,
        orderSpec.map(reverseOrder), base, hint)
      Project(child.output ++ wexprs.map(_.toAttribute), rewriteSkew(mirrored))
    case Window(wexprs, partSpec, _, child, _)
        if wexprs.nonEmpty && partSpec.nonEmpty &&
          partSpec.forall(_.deterministic) &&
          // the per-key frame-agg/mode rewrite is a JOIN-BACK that
          // re-executes the child plan on its aggregate branch, so the
          // child PLAN must be deterministic — see the global mode
          // admission note (ADVICE r14 #1)
          planDeterministic(child) &&
          wexprs.forall(e => skewFrameAggOf(e).isDefined ||
            skewModeOf(e).isDefined) =>
      rewriteSkewFrameAgg(wexprs, partSpec, child)
    case Window(wexprs, partSpec, orderSpec, child, _)
        if wexprs.nonEmpty && partSpec.nonEmpty &&
          partSpec.forall(_.deterministic) && planDeterministic(child) &&
          orderSpec.nonEmpty && orderSpec.forall(_.deterministic) &&
          wexprs.forall(e => classifySkew(e).isDefined) =>
      // classify each expression ONCE into the ADT (ADVICE r13: the
      // previous per-class exclusion chains re-invoked every earlier
      // matcher per expression — O(k²) matcher calls, each allocating
      // fresh exprIds along the way); the guard above costs one more
      // chain pass per expression, nothing downstream re-matches
      val skClassified: Seq[(NamedExpression, SkewClass)] =
        wexprs.map(e => e -> classifySkew(e).get)
      val rankClassified = skClassified.collect {
        case (e, SkRank(a, m)) => e -> (a, m)
      }
      val shiftClassified = skClassified.collect {
        case (e, SkShift(a, sc2, sc3, sc4, sc5, sc6)) =>
          e -> (a, sc2, sc3, sc4, sc5, sc6)
      }
      val leadNNClassified = skClassified.collect {
        case (e, SkLeadNN(a, input, kk, default, lkAttr)) =>
          e -> (a, input, kk, default, lkAttr)
      }
      val runClassified = skClassified.collect {
        case (e, SkRun(a, fn, rows, attr)) => e -> (a, fn, rows, attr)
      }
      val movClassified = skClassified.collect {
        case (e, SkMov(a, fn, lo, hi, attr)) => e -> (a, fn, lo, hi, attr)
      }
      val rangeMovClassified = skClassified.collect {
        case (e, SkRangeMov(a, fn, lo, hi, attr)) => e -> (a, fn, lo, hi, attr)
      }
      val nthClassified = skClassified.collect {
        case (e, SkNth(a, input, k, ign, kind, attr)) =>
          e -> (a, input, k, ign, kind, attr)
      }
      val rankCols = rankClassified.map { case (_, (a, m)) =>
        RankCol(AttributeReference(s"__graft_${a.name}", m.dataType,
          nullable = false)(), m)
      }
      val withRanks: LogicalPlan =
        if (rankCols.isEmpty) child
        else PartitionedRankNode(partSpec, orderSpec, rankCols, child)
      val withShifts: LogicalPlan =
        if (shiftClassified.isEmpty) withRanks
        else PartitionedShiftNode(partSpec, orderSpec,
          shiftClassified.map(_._2._6), shiftClassified.map(_._2._2),
          shiftClassified.map(_._2._3), shiftClassified.map(_._2._4),
          shiftClassified.map(_._2._5), withRanks)
      // one lookahead node per expression (single-column by design —
      // the GlobalLookahead deque-bound argument, per key)
      val withLookaheads: LogicalPlan = leadNNClassified.foldLeft(withShifts) {
        case (p, (_, (_, input, kk, default, lkAttr))) =>
          PartitionedLookaheadNode(partSpec, orderSpec, lkAttr, input, kk,
            default, p)
      }
      val withRuns: LogicalPlan =
        if (runClassified.isEmpty) withLookaheads
        else PartitionedRunningAggNode(partSpec, orderSpec,
          runClassified.map(_._2._4), runClassified.map(_._2._2),
          runClassified.map(_._2._3), withLookaheads)
      val withMovs: LogicalPlan =
        if (movClassified.isEmpty) withRuns
        else PartitionedMovingAggNode(partSpec, orderSpec,
          movClassified.map(_._2._5), movClassified.map(_._2._2),
          movClassified.map(_._2._3), movClassified.map(_._2._4), withRuns)
      val withRangeMovs: LogicalPlan =
        if (rangeMovClassified.isEmpty) withMovs
        else PartitionedRangeMovingAggNode(partSpec, orderSpec,
          rangeMovClassified.map(_._2._5), rangeMovClassified.map(_._2._2),
          rangeMovClassified.map(_._2._3), rangeMovClassified.map(_._2._4),
          orderSpec.head.direction == org.apache.spark.sql.catalyst.expressions.Descending,
          withMovs)
      val node: LogicalPlan =
        if (nthClassified.isEmpty) withRangeMovs
        else PartitionedNthValueNode(partSpec, orderSpec,
          nthClassified.map(_._2._6), nthClassified.map(_._2._2),
          nthClassified.map(_._2._3), nthClassified.map(_._2._4),
          nthClassified.map(_._2._5), withRangeMovs)
      // replacement aliases keyed by SOURCE expression so the Project
      // preserves the original per-expression column ORDER even when
      // ranks and running aggregates interleave in wexprs (r13
      // self-review: grouping by class would silently reorder the
      // user-visible schema when the Window is the plan root)
      val rankAliasByExpr: Map[NamedExpression, NamedExpression] =
        rankClassified.zip(rankCols).map { case ((e, (a, m)), rc) =>
          val value: Expression = m match {
            // percent_rank / cume_dist are DOUBLE on both sides — as-is
            case RankMode.PercentRank | RankMode.CumeDist => rc.attr
            // the integral built-ins are INT; the node emits LONG —
            // cast back so the user-visible schema is unchanged
            case _ => Cast(rc.attr, IntegerType)
          }
          (e, Alias(value, a.name)(exprId = a.exprId,
            qualifier = a.qualifier, explicitMetadata = Some(a.metadata)))
        }.toMap
      val shiftAliasByExpr: Map[NamedExpression, NamedExpression] =
        shiftClassified.map { case (e, (a, _, _, _, _, attr)) =>
          (e, Alias(attr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata)))
        }.toMap
      val leadNNAliasByExpr: Map[NamedExpression, NamedExpression] =
        leadNNClassified.map { case (e, (a, _, _, _, lkAttr)) =>
          (e, Alias(lkAttr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata)))
        }.toMap
      val runAliasByExpr: Map[NamedExpression, NamedExpression] =
        runClassified.map { case (e, (a, _, _, attr)) =>
          (e, Alias(attr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata)))
        }.toMap
      val movAliasByExpr: Map[NamedExpression, NamedExpression] =
        movClassified.map { case (e, (a, _, _, _, attr)) =>
          (e, Alias(attr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata)))
        }.toMap
      val rangeMovAliasByExpr: Map[NamedExpression, NamedExpression] =
        rangeMovClassified.map { case (e, (a, _, _, _, attr)) =>
          (e, Alias(attr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata)))
        }.toMap
      val nthAliasByExpr: Map[NamedExpression, NamedExpression] =
        nthClassified.map { case (e, (a, _, _, _, _, attr)) =>
          (e, Alias(attr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
            explicitMetadata = Some(a.metadata)))
        }.toMap
      Project(child.output ++ wexprs.map(e =>
        rankAliasByExpr.getOrElse(e,
          shiftAliasByExpr.getOrElse(e,
            leadNNAliasByExpr.getOrElse(e,
              runAliasByExpr.getOrElse(e,
                movAliasByExpr.getOrElse(e,
                  rangeMovAliasByExpr.getOrElse(e, nthAliasByExpr(e)))))))),
        node)
  }

  /** Shape 2 of [[rewriteSkew]]: per-key whole-frame aggregates become
    * `Aggregate` + null-safe equi-`Join` — window-to-join, the classic
    * relational unnesting of `agg(e) OVER (PARTITION BY k)`.
    *
    * Equivalence: the join's right side groups the SAME child by the
    * SAME keys, so every left row matches exactly one right row (its
    * own group — never zero: the group exists because the row does),
    * preserving left multiplicity exactly; `<=>` matches window
    * partitioning's null bucket (and Spark's NaN-equal, -0.0 = 0.0
    * comparison semantics match its grouping normalization). The
    * admitted functions are [[allowedAgg]] only — order-insensitive
    * within the frame; First/Last stay out because group-aggregate
    * partial merges run in arbitrary order while a window's
    * whole-partition First/Last is order-defined.
    *
    * Scale shape: the aggregate side is map-side combined (partial
    * aggregation — the hot key costs one combiner slot per task, not a
    * task), its result is one narrow row per distinct key, and the
    * join back is the plan AQE already knows how to save: skewed SMJ
    * partitions split (the one-row-per-key right side replicates
    * free), or the whole right side broadcasts when |keys| is small —
    * ZERO shuffle of the big side. The cost is reading the child
    * twice; at any scale where the hot key doesn't fit one task, two
    * parallel scans beat one serial window by construction.
    *
    * The right subtree re-aliases every child attribute (fresh
    * exprIds), so the self-join carries no ambiguous references; the
    * final Project restores the original window aliases under their
    * exprIds, leaving upstream operators untouched. */
  private def rewriteSkewFrameAgg(wexprs: Seq[NamedExpression],
                                  partSpec: Seq[Expression],
                                  child: LogicalPlan): LogicalPlan = {
    val classified: Seq[(Alias, AggregateFunction)] =
      wexprs.flatMap(e => skewFrameAggOf(e))
    val modeClassified: Seq[(NamedExpression, (Alias, Expression, Boolean, AttributeReference))] =
      wexprs.flatMap { e =>
        if (skewFrameAggOf(e).isDefined) None else skewModeOf(e).map(e -> _)
      }
    // Stacked whole-frame windows over DIFFERENT keys (share-of-region
    // next to share-of-nation) rewrite bottom-up, so the outer window's
    // child is already a join-back — and aggregating over it would
    // re-derive every lower join inside this aggregate branch. When the
    // child is PROVABLY one of this method's own 1:1 join-backs (see
    // [[keyCompleteJoinBase]]) and this window's keys and functions
    // only reference base attributes, the aggregate branch descends to
    // the shared base: each stacked window costs one base aggregation,
    // never a re-derivation of the stack below it.
    val needed = AttributeSet(
      partSpec.flatMap(_.references) ++ classified.flatMap(_._2.references) ++
        modeClassified.flatMap(_._2._2.references))
    @annotation.tailrec
    def peel(p: LogicalPlan): LogicalPlan =
      keyCompleteJoinBase(p) match {
        case Some(base) if needed.subsetOf(base.outputSet) => peel(base)
        case _ => p
      }
    val aggBase = peel(child)
    // fresh right subtree over the (peeled) base: re-alias every output
    // attribute so the two join sides share no exprIds
    val freshAliases: Seq[Alias] =
      aggBase.output.map(a => Alias(a, a.name)())
    val subst = AttributeMap(aggBase.output.zip(freshAliases.map(_.toAttribute)))
    def sub(e: Expression): Expression = e.transform {
      case a: Attribute => subst.getOrElse(a, a)
    }
    val rightChild = Project(freshAliases, aggBase)
    val groupKeys: Seq[Expression] = partSpec.map(sub)
    val keyAliases: Seq[Alias] = groupKeys.zipWithIndex.map {
      case (e, i) => Alias(e, s"__graft_k$i")()
    }
    val aggAliases: Seq[Alias] = classified.map { case (a, fn) =>
      Alias(AggregateExpression(sub(fn).asInstanceOf[AggregateFunction],
        Complete, isDistinct = false), s"__graft_${a.name}")()
    }
    val withPlain: LogicalPlan = if (classified.isEmpty) child else {
      val agg = Aggregate(groupKeys, keyAliases ++ aggAliases, rightChild)
      val cond: Expression = partSpec.zip(keyAliases)
        .map { case (l, ka) => EqualNullSafe(l, ka.toAttribute) }
        .reduce[Expression](And(_, _))
      Join(child, agg, Inner, Some(cond), JoinHint.NONE)
    }
    // per-key mode members (r14): each joins its own counts→argmax
    // relation back LEFT OUTER — a group whose mode input is all-NULL
    // has no counts row (mode ignores nulls) and must surface NULL, not
    // vanish. Exactly one right row per key, so left multiplicity is
    // preserved either way.
    val withModes: LogicalPlan = modeClassified.foldLeft(withPlain) {
      case (cur, (_, (_, input, rev, attr))) =>
        val (rel, keyAttrs) = skewModeRel(aggBase, partSpec, input, rev, attr)
        val cond: Expression = partSpec.zip(keyAttrs)
          .map { case (l, ka) => EqualNullSafe(l, ka) }
          .reduce[Expression](And(_, _))
        Join(cur, rel, org.apache.spark.sql.catalyst.plans.LeftOuter,
          Some(cond), JoinHint.NONE)
    }
    val plainAliasByExpr: Map[NamedExpression, NamedExpression] =
      wexprs.flatMap(e => skewFrameAggOf(e).map(e -> _)).zip(aggAliases).map {
        case ((e, (a, _)), aa) =>
          (e, Alias(aa.toAttribute, a.name)(exprId = a.exprId,
            qualifier = a.qualifier, explicitMetadata = Some(a.metadata)))
      }.toMap
    val modeAliasByExpr: Map[NamedExpression, NamedExpression] =
      modeClassified.map { case (e, (a, _, _, attr)) =>
        (e, Alias(attr, a.name)(exprId = a.exprId, qualifier = a.qualifier,
          explicitMetadata = Some(a.metadata)))
      }.toMap
    Project(child.output ++ wexprs.map(e =>
      plainAliasByExpr.getOrElse(e, modeAliasByExpr(e))), withModes)
  }

  /** The per-key sibling of [[globalModeRel]]: one row per distinct
    * key combination with that group's mode-of(input) — per-(key,
    * value) counts (map-side combined; a hot key costs one combiner
    * slot per task), then a per-key argmax via the same struct-extreme
    * tie-break encoding. Returns the relation plus its key attributes
    * for the caller's join condition; the mode output attribute
    * carries the caller's generated exprId. */
  private def skewModeRel(base: LogicalPlan, partSpec: Seq[Expression],
                          input: Expression, tieSmallest: Boolean,
                          attr: AttributeReference): (LogicalPlan, Seq[Attribute]) = {
    import org.apache.spark.sql.catalyst.expressions.{CreateStruct, GetStructField, IsNotNull}
    val freshAliases: Seq[Alias] = base.output.map(a => Alias(a, a.name)())
    val subst = AttributeMap(base.output.zip(freshAliases.map(_.toAttribute)))
    def sub(e: Expression): Expression = e.transform {
      case a: Attribute => subst.getOrElse(a, a)
    }
    val keyAliases: Seq[Alias] = partSpec.zipWithIndex.map {
      case (e, i) => Alias(sub(e), s"__graft_mk$i")()
    }
    val vA = Alias(sub(input), "__graft_mode_v")()
    val proj = Project(keyAliases :+ vA, Project(freshAliases, base))
    val nonNull = org.apache.spark.sql.catalyst.plans.logical
      .Filter(IsNotNull(vA.toAttribute), proj)
    val keyAttrs: Seq[Attribute] = keyAliases.map(_.toAttribute)
    val cntA = Alias(AggregateExpression(Count(Seq(Literal(1))), Complete,
      isDistinct = false), "__graft_mode_c")()
    val counts = Aggregate(keyAttrs :+ vA.toAttribute,
      (keyAttrs :+ vA.toAttribute) :+ cntA, nonNull)
    val pair: Expression =
      if (tieSmallest) CreateStruct(Seq(UnaryMinus(cntA.toAttribute), vA.toAttribute))
      else CreateStruct(Seq(cntA.toAttribute, vA.toAttribute))
    val bestFn: AggregateFunction = if (tieSmallest) Min(pair) else Max(pair)
    val bestA = Alias(AggregateExpression(bestFn, Complete,
      isDistinct = false), "__graft_mode_s")()
    val arg = Aggregate(keyAttrs, keyAttrs :+ bestA, counts)
    val rel = Project(keyAttrs :+ Alias(GetStructField(bestA.toAttribute, 1),
      attr.name)(exprId = attr.exprId), arg)
    (rel, keyAttrs)
  }

  /** `Some(base)` iff `p` is structurally one of
    * [[rewriteSkewFrameAgg]]'s own join-backs over `base`, verified
    * 1:1 from the plan alone (no trust in provenance):
    *
    *  - `Project(_, Join(base, Aggregate(gk, aggList, Project(_, c)),
    *    Inner, cond))` with `c eq base` — the aggregate reads EXACTLY
    *    the base's rows (Project never filters; object identity pins
    *    the same-pass construction), so every base key combination has
    *    its group row: every left row matches AT LEAST one right row;
    *  - `cond` is a conjunction of `EqualNullSafe(leftExpr, keyAttr)`
    *    whose key attributes cover ALL of the aggregate's grouping
    *    keys (each grouping expression aliased by exactly one matched
    *    key output): a left row can match AT MOST one group row.
    *
    * Together: exactly one match per left row — the join preserves
    * base multiplicity, so aggregating over `base` and over `p` are
    * the same aggregation. */
  private def keyCompleteJoinBase(p: LogicalPlan): Option[LogicalPlan] = p match {
    case Project(_, Join(base,
        Aggregate(gk, aggList, Project(_, c), _), Inner, Some(cond), _))
        if c eq base =>
      val keyAliases: Seq[Alias] = aggList.collect {
        case a: Alias if !a.child.exists(_.isInstanceOf[AggregateExpression]) => a
      }
      val keyAttrById = keyAliases.map(a => a.exprId -> a).toMap
      def conjuncts(e: Expression): Seq[Expression] = e match {
        case And(l, r) => conjuncts(l) ++ conjuncts(r)
        case other => Seq(other)
      }
      val pairs = conjuncts(cond).map {
        case EqualNullSafe(le, ka: Attribute)
            if keyAttrById.contains(ka.exprId) &&
              le.references.subsetOf(base.outputSet) && le.deterministic =>
          Some(ka.exprId)
        case _ => None
      }
      val ok = pairs.forall(_.isDefined) && {
        val matched = pairs.flatten.toSet
        // every grouping key must be aliased by a MATCHED key output
        gk.forall(g => keyAliases.exists(a =>
          matched.contains(a.exprId) && a.child.semanticEquals(g)))
      }
      if (ok) Some(base) else None
    case _ => None
  }

  /** (alias, unwrapped function) iff `ne` is a PARTITIONED whole-frame
    * aggregate window — `agg(e) OVER (PARTITION BY k)` (the analyzer
    * normalizes the frame to UNBOUNDED .. UNBOUNDED; an explicit
    * ORDER BY with that frame is the same whole partition). Admission
    * is [[allowedAgg]] (order-insensitive only — no First/Last, no
    * DISTINCT, no FILTER). */
  private def skewFrameAggOf(ne: NamedExpression): Option[(Alias, AggregateFunction)] = ne match {
    case a @ Alias(WindowExpression(
        AggregateExpression(fn0, Complete, false, None, _),
        WindowSpecDefinition(ps, _,
          SpecifiedWindowFrame(_, UnboundedPreceding, UnboundedFollowing))), _)
        if ps.nonEmpty =>
      unwrapAgg(fn0).collect {
        case fn if allowedAgg(fn) && fn.deterministic => (a, fn)
      }
    case _ => None
  }

  /** (alias, function, lo, hi, generated attr) iff `ne` is a
    * PARTITIONED bounded-ROWS moving-frame window over the ordered
    * allowlist with literal offsets within the boundary-state cap —
    * the skew tier's [[PartitionedMovingAggNode]] (late r13).
    * UNBOUNDED PRECEDING frames are the running member's; RANGE moving
    * frames keep WindowExec in this tier. */
  private def skewMovAggOf(ne: NamedExpression): Option[(Alias, DeclarativeAggregate, Int, Int, AttributeReference)] = {
    def bound(e: Expression): Option[Int] = e match {
      case CurrentRow => Some(0)
      case Literal(v: Int, IntegerType) => Some(v)
      case Literal(v: Long, LongType) if v.isValidInt => Some(v.toInt)
      case UnaryMinus(Literal(v: Int, IntegerType), _) => Some(-v)
      case UnaryMinus(Literal(v: Long, LongType), _) if v.isValidInt => Some(-v.toInt)
      case _ => None
    }
    ne match {
      case a @ Alias(we @ WindowExpression(
          AggregateExpression(fn0, Complete, false, None, _),
          WindowSpecDefinition(ps, _,
            SpecifiedWindowFrame(RowFrame, lo0, hi0))), _) if ps.nonEmpty =>
        for {
          lo <- bound(lo0)
          hi <- bound(hi0)
          if lo <= hi && math.max(math.abs(lo), math.abs(hi)) <= maxShift
          if !(lo0 == UnboundedPreceding) // the running member's shape
          fn <- unwrapAgg(fn0)
          if allowedOrderedAgg(fn) && fn.deterministic
        } yield (a, fn, lo, hi,
          AttributeReference(s"__graft_${a.name}", fn.dataType,
            nullable = we.nullable)())
      // per-key moving-lower-bound nth_value: the same rebuffer-only
      // admission as the global matcher (NthValue is a
      // DeclarativeAggregate; the segment-gated frame rebuffer runs
      // its own expressions in frame order)
      case a @ Alias(we @ WindowExpression(
          nv @ NthValue(input, Literal(n: Int, IntegerType), _),
          WindowSpecDefinition(ps, _,
            SpecifiedWindowFrame(RowFrame, lo0, hi0))), _) if ps.nonEmpty =>
        for {
          lo <- bound(lo0)
          hi <- bound(hi0)
          if lo <= hi && math.max(math.abs(lo), math.abs(hi)) <= maxShift
          if !(lo0 == UnboundedPreceding)
          if n > 0 && input.deterministic
        } yield (a, nv, lo, hi,
          AttributeReference(s"__graft_${a.name}", nv.dataType,
            nullable = we.nullable)())
      case _ => None
    }
  }

  /** (alias, function, lo, hi, generated attr) iff `ne` is a
    * PARTITIONED RANGE-moving window on a single ascending
    * NULLS-FIRST integral order key with integral-literal value
    * offsets within the cap — the skew tier's dense-domain member
    * ([[PartitionedRangeMovingAggNode]], late r13): "the last 7 days'
    * total, per user". The same admission as the global
    * [[rangeMovAggOf]] (order-insensitive [[allowedAgg]] only — per-
    * value buffers; bounded both sides; day-pure interval bounds on
    * DATE keys; micros-exact interval bounds on TIMESTAMP keys since
    * r14), with a partition spec present. */
  private def skewRangeMovAggOf(ne: NamedExpression): Option[(Alias, DeclarativeAggregate, Long, Long, AttributeReference)] = ne match {
    case a @ Alias(we @ WindowExpression(
        AggregateExpression(fn0, Complete, false, None, _),
        WindowSpecDefinition(ps,
          // any direction / null placement — the same late-r13
          // widening as the global matcher
          Seq(SortOrder(key, _, _, _)),
          SpecifiedWindowFrame(RangeFrame, lo0, hi0))), _)
        if ps.nonEmpty &&
          lo0 != UnboundedPreceding && hi0 != UnboundedFollowing &&
          GlobalRangeMovingAgg.rangeKey(key.dataType) &&
          key.deterministic =>
      for {
        lo <- rangeValueBound(lo0, key.dataType)
        hi <- rangeValueBound(hi0, key.dataType)
        if lo <= hi &&
          math.max(math.abs(lo), math.abs(hi)) <= rangeExtentCap(key.dataType)
        fn <- unwrapAgg(fn0)
        if allowedAgg(fn) && fn.deterministic
      } yield (a, fn, lo, hi,
        AttributeReference(s"__graft_${a.name}", fn.dataType,
          nullable = we.nullable)())
    case _ => None
  }

  /** RANGE value bound → Long in the KEY's long domain — shared by the
    * global and skew dense-domain matchers: CurrentRow is 0; otherwise
    * a foldable integral expression (the parser's `k PRECEDING` arrives
    * as UnaryMinus(Literal(k)), the DataFrame API as a signed literal,
    * and the analyzer may wrap either in a cast to the key type).
    * INTERVAL-typed bounds fold to the key's own unit:
    *
    *  - DATE keys (int days): day-PURE intervals → days; sub-day or
    *    month-bearing intervals are not fixed day counts → WindowExec;
    *  - TIMESTAMP keys (long epoch micros, the r14 widening): any
    *    DayTimeInterval IS an exact micro count by definition, and a
    *    CalendarInterval is one iff it carries no month or day part
    *    (months vary in micros; CalendarInterval DAY parts add through
    *    the session zone, so only the micros field is zone-free).
    *    `INTERVAL '7' DAY` parses as DayTimeIntervalType under ANSI
    *    intervals (the Spark 4 default), so the production rolling-
    *    window shape folds exactly; month-bearing bounds keep
    *    WindowExec. */
  private def rangeValueBound(e: Expression,
                              keyType: org.apache.spark.sql.types.DataType): Option[Long] = {
    val usPerDay = 86400000000L
    val timeKey = graft.plans.GlobalRangeMovingAgg.timeKey(keyType)
    // DECIMAL keys (r14): the key domain is the unscaled 10^-s lattice,
    // so ANY numeric foldable bound folds through BigDecimal to the
    // KEY's scale — exactly (setScale with no rounding) or not at all
    // (a bound finer than the key lattice is not a whole step count)
    keyType match {
      case k: org.apache.spark.sql.types.DecimalType if k.precision <= 18 =>
        return (e match {
          case CurrentRow => Some(java.math.BigDecimal.ZERO)
          case _ if e.foldable => Option(e.eval()).flatMap {
            case d: org.apache.spark.sql.types.Decimal =>
              Some(d.toJavaBigDecimal)
            case i: java.lang.Integer => Some(new java.math.BigDecimal(i.toString))
            case l: java.lang.Long => Some(new java.math.BigDecimal(l.toString))
            case s: java.lang.Short => Some(new java.math.BigDecimal(s.toString))
            case b: java.lang.Byte => Some(new java.math.BigDecimal(b.toString))
            case _ => None
          }
          case _ => None
        }).flatMap { bd =>
          try Some(bd.setScale(k.scale).unscaledValue().longValueExact())
          catch { case _: ArithmeticException => None }
        }
      case _ => ()
    }
    e match {
      case CurrentRow => Some(0L)
      case _ if e.foldable => e.dataType match {
        case IntegerType => Option(e.eval()).map(_.asInstanceOf[Int].toLong)
        case LongType => Option(e.eval()).map(_.asInstanceOf[Long])
        case org.apache.spark.sql.types.ShortType =>
          Option(e.eval()).map(_.asInstanceOf[Short].toLong)
        case org.apache.spark.sql.types.ByteType =>
          Option(e.eval()).map(_.asInstanceOf[Byte].toLong)
        case _: org.apache.spark.sql.types.DayTimeIntervalType =>
          if (timeKey) Option(e.eval()).map(_.asInstanceOf[Long]) // micros
          else Option(e.eval()).map(_.asInstanceOf[Long])
            .filter(_ % usPerDay == 0L).map(_ / usPerDay)
        case org.apache.spark.sql.types.CalendarIntervalType =>
          Option(e.eval())
            .map(_.asInstanceOf[org.apache.spark.unsafe.types.CalendarInterval])
            .flatMap { ci =>
              if (timeKey) {
                if (ci.months == 0 && ci.days == 0) Some(ci.microseconds)
                else None
              } else {
                if (ci.months == 0 && ci.microseconds == 0L) Some(ci.days.toLong)
                else None
              }
            }
        case _ => None
      }
      case _ => None
    }
  }

  /** Extent cap for the RANGE tiers, in the key's long domain:
    * `maxShiftOffset` key values on dense integral/day axes and
    * `maxShiftOffset` UNSCALED steps on compact-decimal axes (boundary
    * buffers are pigeonhole-bounded by the extent there), and
    * `maxShiftOffset` DAYS of micros on timestamp axes (where the
    * bound is the distinct timestamps inside the extent — see
    * [[graft.plans.GlobalRangeMovingAgg.timeKey]]). */
  private def rangeExtentCap(keyType: org.apache.spark.sql.types.DataType): Long =
    if (graft.plans.GlobalRangeMovingAgg.timeKey(keyType))
      maxShift.toLong * 86400000000L
    else maxShift.toLong

  /** (alias, mode) iff `ne` is a PARTITIONED window over the rank
    * family — since late r13 the FULL family: the total-dependent
    * modes (percent_rank/cume_dist/ntile) stitch each straddling key's
    * total on the driver and count interior keys with the zipped
    * key/group leads (see [[PartitionedRankNode]]). */
  /** One-pass skew-tier classification (ADVICE r13): each window
    * expression runs the matcher chain at most ONCE, in the same
    * priority order the exclusion chains encoded — the result carries
    * every generated attribute, so no matcher re-fires (and no stray
    * exprIds are allocated) after classification. */
  private sealed trait SkewClass
  private case class SkRank(a: Alias, m: RankMode) extends SkewClass
  private case class SkShift(a: Alias, input: Expression, off: Int,
                             default: Expression, ignoreNulls: Boolean,
                             attr: AttributeReference) extends SkewClass
  private case class SkLeadNN(a: Alias, input: Expression, k: Int,
                              default: Expression,
                              attr: AttributeReference) extends SkewClass
  private case class SkRun(a: Alias, fn: DeclarativeAggregate, rows: Boolean,
                           attr: AttributeReference) extends SkewClass
  private case class SkMov(a: Alias, fn: DeclarativeAggregate, lo: Int,
                           hi: Int, attr: AttributeReference) extends SkewClass
  private case class SkRangeMov(a: Alias, fn: DeclarativeAggregate, lo: Long,
                                hi: Long, attr: AttributeReference) extends SkewClass
  private case class SkNth(a: Alias, input: Expression, k: Int,
                           ignoreNulls: Boolean, kind: Int,
                           attr: AttributeReference) extends SkewClass

  private def classifySkew(ne: NamedExpression): Option[SkewClass] =
    skewRankOf(ne).map { case (a, m) => SkRank(a, m) }
      .orElse(skewShiftOf(ne).map { case (a, i, o, d, g, at) =>
        SkShift(a, i, o, d, g, at) })
      .orElse(skewLeadNNOf(ne).map { case (a, i, k, d, at) =>
        SkLeadNN(a, i, k, d, at) })
      .orElse(skewRunAggOf(ne).map { case (a, f, r, at) => SkRun(a, f, r, at) })
      .orElse(skewMovAggOf(ne).map { case (a, f, lo, hi, at) =>
        SkMov(a, f, lo, hi, at) })
      .orElse(skewRangeMovAggOf(ne).map { case (a, f, lo, hi, at) =>
        SkRangeMov(a, f, lo, hi, at) })
      .orElse(skewNthOf(ne).map { case (a, i, k, g, kd, at) =>
        SkNth(a, i, k, g, kd, at) })

  private def skewRankOf(ne: NamedExpression): Option[(Alias, RankMode)] = ne match {
    case a @ Alias(WindowExpression(fn, WindowSpecDefinition(ps, _, _)), _)
        if ps.nonEmpty =>
      modeOf(fn).map(m => (a, m))
    case _ => None
  }

  /** (alias, input, signed offset, default, ignoreNulls, generated
    * attr) iff `ne` is a PARTITIONED lead/lag with a literal offset
    * within the cap — the skew tier's [[PartitionedShiftNode]] (late
    * r13). `lag IGNORE NULLS` is admitted (the per-SEGMENT non-null
    * ring, seeded key-matched — the ring reset at the key boundary);
    * `lead IGNORE NULLS` keeps WindowExec in this tier (the zipped
    * per-key lookahead, when a query needs it). */
  private def skewShiftOf(ne: NamedExpression): Option[(Alias, Expression, Int, Expression, Boolean, AttributeReference)] = {
    def spec(fn: Expression): Option[(Expression, Int, Expression, Boolean)] = fn match {
      case l: Lag => l.inputOffset match {
        case Literal(k: Int, IntegerType) if !l.ignoreNulls || k > 0 =>
          Some((l.input, -k, l.default, l.ignoreNulls))
        case _ => None
      }
      case l: Lead if !l.ignoreNulls => l.offset match {
        case Literal(k: Int, IntegerType) => Some((l.input, k, l.default, false))
        case _ => None
      }
      case _ => None
    }
    ne match {
      case a @ Alias(we @ WindowExpression(fn,
          WindowSpecDefinition(ps, _, _)), _) if ps.nonEmpty =>
        spec(fn).collect {
          case (input, off, default, ignoreNulls)
              if math.abs(off) <= maxShift && input.deterministic &&
                default.deterministic &&
                (default.foldable && default.eval() == null ||
                  org.apache.spark.sql.types.DataType.equalsStructurally(
                    default.dataType, input.dataType, ignoreNullability = true)) =>
            (a, input, off, default, ignoreNulls,
              AttributeReference(s"__graft_${a.name}", input.dataType,
                nullable = we.nullable)())
        }
      case _ => None
    }
  }

  /** (alias, input, k, default, generated attr) iff `ne` is a
    * PARTITIONED `lead(e, k) IGNORE NULLS` (or its `lag(e, -k)`
    * spelling) with a positive literal offset within the cap — the
    * skew tier's [[PartitionedLookaheadNode]] (late r13, the per-key
    * offset family's last retired refusal). Same admission as the
    * global [[leadNNOf]], with a partition spec present. */
  private def skewLeadNNOf(ne: NamedExpression): Option[(Alias, Expression, Int, Expression, AttributeReference)] = {
    def spec(fn: Expression): Option[(Expression, Int, Expression)] = fn match {
      case l: Lead if l.ignoreNulls => l.offset match {
        case Literal(kk: Int, IntegerType) if kk > 0 => Some((l.input, kk, l.default))
        case _ => None
      }
      case l: Lag if l.ignoreNulls => l.inputOffset match {
        case Literal(kk: Int, IntegerType) if kk < 0 => Some((l.input, -kk, l.default))
        case _ => None
      }
      case _ => None
    }
    ne match {
      case a @ Alias(we @ WindowExpression(fn,
          WindowSpecDefinition(ps, _, _)), _) if ps.nonEmpty =>
        spec(fn).collect {
          case (input, kk, default)
              if kk <= maxShift && input.deterministic &&
                default.deterministic &&
                (default.foldable && default.eval() == null ||
                  org.apache.spark.sql.types.DataType.equalsStructurally(
                    default.dataType, input.dataType, ignoreNullability = true)) =>
            (a, input, kk, default,
              AttributeReference(s"__graft_${a.name}", input.dataType,
                nullable = we.nullable)())
        }
      case _ => None
    }
  }

  /** (alias, function, isRowsFrame, generated attr) iff `ne` is a
    * PARTITIONED running-aggregate window over the ordered allowlist
    * (same admission as [[runAggOf]] — the per-key prefix merge runs
    * in partition order, which is global order under the composite
    * exchange, so First/Last stay exact). */
  private def skewRunAggOf(ne: NamedExpression): Option[(Alias, DeclarativeAggregate, Boolean, AttributeReference)] = ne match {
    case a @ Alias(we @ WindowExpression(
        AggregateExpression(fn0, Complete, false, None, _),
        WindowSpecDefinition(ps, _,
          SpecifiedWindowFrame(ft, UnboundedPreceding, CurrentRow))), _)
        if ps.nonEmpty =>
      unwrapAgg(fn0).collect {
        case fn if allowedOrderedAgg(fn) && fn.deterministic =>
          (a, fn, ft == RowFrame,
            AttributeReference(s"__graft_${a.name}", fn.dataType,
              nullable = we.nullable)())
      }
    case _ => None
  }

  /** (alias, input, k, ignoreNulls, frame kind, generated attr) iff
    * `ne` is a PARTITIONED start-anchored `nth_value` — the skew
    * tier's [[PartitionedNthValueNode]] (late r13, the tier's last
    * member). Same admission as the global [[nthOf]] (running ROWS /
    * running RANGE / whole frame; positive literal k within the cap),
    * with a partition spec present. */
  private def skewNthOf(ne: NamedExpression): Option[(Alias, Expression, Int, Boolean, Int, AttributeReference)] = ne match {
    case a @ Alias(we @ WindowExpression(
        NthValue(input, Literal(k: Int, IntegerType), ignoreNulls),
        WindowSpecDefinition(ps, _, SpecifiedWindowFrame(ft, lo, hi))), _)
        if ps.nonEmpty && lo == UnboundedPreceding && k > 0 &&
          k <= maxShift && input.deterministic =>
      val kind = (ft, hi) match {
        case (_, UnboundedFollowing) => Some(2)
        case (RowFrame, CurrentRow) => Some(0)
        case (_, CurrentRow) => Some(1)
        case _ => None
      }
      kind.map(fk => (a, input, k, ignoreNulls, fk,
        AttributeReference(s"__graft_${a.name}", input.dataType,
          nullable = we.nullable)()))
    case _ => None
  }

  /** [[force]]'s sibling for the skew tier: apply BOTH the global
    * rewrite and the partitioned-rank rewrite to one DataFrame,
    * unconditionally and without session-conf side effects. Separate
    * from [[force]] so existing force() call sites keep their plans
    * (the skew route costs a range exchange + count job and must be
    * chosen, not inherited). */
  def forceSkew(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    PartitionedRank.ensureStrategy(spark)
    PartitionedRunningAgg.ensureStrategy(spark)
    PartitionedShift.ensureStrategy(spark)
    PartitionedMovingAgg.ensureStrategy(spark)
    PartitionedRangeMovingAgg.ensureStrategy(spark)
    PartitionedLookahead.ensureStrategy(spark)
    PartitionedNthValue.ensureStrategy(spark)
    val globalised = force(df)
    GraftSqlBridge.ofRows(spark,
      rewriteSkew(mergeWindowChains(GraftSqlBridge.withCachedData(spark,
        globalised.queryExecution.analyzed))))
  }

  /** Merge same-spec window chains BEFORE matching (r15). The rewrite
    * runs on the ANALYZED plan, where a `.withColumn` chain leaves one
    * Window node per column with a pass-through Project between them —
    * so six same-frame moving sums planned SIX two-pass operator
    * instances (six boundary collects) instead of one batched node.
    * Dropping exact pass-through Projects and applying the optimizer's
    * own CollapseWindow to a fixed point restores the single-node
    * batching the operators were built for (their funcs are Seqs).
    * Projects that COMPUTE anything (q_cusum's n·p − i·t between its
    * window layers) are not pass-through and correctly block the merge. */
  private def mergeWindowChains(plan: LogicalPlan): LogicalPlan = {
    var p = plan
    var changed = true
    var i = 0
    while (changed && i < 16) {
      // CollapseProject first: withColumn leaves stacked Projects with
      // duplicated columns that are only pass-through once merged
      val collapsed =
        org.apache.spark.sql.catalyst.optimizer.CollapseProject(p)
      val dropped = collapsed.transformUp {
        case Project(list, c) if list == c.output => c
      }
      val n = org.apache.spark.sql.catalyst.optimizer.CollapseWindow(dropped)
      changed = !(n fastEquals p)
      p = n
      i += 1
    }
    p
  }

  /** Apply the rewrite to ONE DataFrame, unconditionally and without
    * session-conf side effects — re-analyzes the rewritten plan with
    * the strategy registered, so the result plans and executes like any
    * other GlobalRank query. */
  def force(df: DataFrame): DataFrame = {
    val spark = df.sparkSession
    GlobalRank.ensureStrategy(spark)
    GlobalShift.ensureStrategy(spark)
    GlobalLookahead.ensureStrategy(spark)
    GlobalRunningAgg.ensureStrategy(spark)
    GlobalMovingAgg.ensureStrategy(spark)
    GlobalRangeMovingAgg.ensureStrategy(spark)
    GlobalFrameAgg.ensureStrategy(spark)
    GlobalNthValue.ensureStrategy(spark)
    GlobalExactPercentile.ensureStrategy(spark)
    // substitute cached subtrees FIRST (r16): the chain merge must see
    // pinned intermediates as InMemoryRelation leaves, or its
    // CollapseProject rewrites them and the cache lookup misses at
    // execution (q_bootstrap_ci's replicate pipeline ran twice)
    GraftSqlBridge.ofRows(spark,
      rewrite(mergeWindowChains(GraftSqlBridge.withCachedData(spark,
        df.queryExecution.analyzed))))
  }
}
