package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, MutableProjection, SortOrder, SpecificInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{ByteType, DataType, DateType, IntegerType, LongType, ShortType}

/** Distributed EXACT global RANGE-frame moving aggregate (r13, VERDICT
  * r12 task 3) — the dense-domain tier that retires the larger of the
  * two documented non-rewrites: `agg(e) OVER (ORDER BY k RANGE BETWEEN
  * x PRECEDING AND y FOLLOWING)` on a single ASCENDING INTEGRAL order
  * key, without the single-partition WindowExec funnel.
  *
  * A RANGE frame is value-bounded, not row-bounded, so the
  * [[GlobalMovingAgg]] argument (ship the `maxBack`/`maxFwd` boundary
  * ROWS) does not apply: a value window `[v - x, v + y]` can hold
  * arbitrarily many rows (density is unbounded). The argument that DOES
  * carry over is on VALUES:
  *
  *  - the frame of a row depends only on its KEY `v` — every row of a
  *    tie group shares one frame, and the frame is a contiguous key
  *    interval `[v + lo, v + hi]`;
  *  - on an integral key that interval holds at most `hi - lo + 1`
  *    DISTINCT key values;
  *  - range partitioning maps each key value to exactly ONE partition
  *    (the tie-containment argument on [[GlobalRankNode]]), so the
  *    per-key partial aggregate buffer built inside a partition is the
  *    key's COMPLETE buffer — no cross-partition merge per key, ever.
  *
  * So the operator ships per-KEY aggregate BUFFERS instead of rows:
  *
  *  1. pass 1 collects, per partition, its row count, first/last
  *     non-null key, and the complete per-key buffers for the keys
  *     within `backExtent` of its last key and within `fwdExtent` of
  *     its first key — at most `backExtent + fwdExtent + 2` fixed-size
  *     buffers per function per partition, bounded by the requested
  *     VALUE extents, never by row density (the property that makes
  *     this the 100 TB design: a million rows on one hot day ship as
  *     ONE sum/count buffer, not a million rows);
  *  2. the driver assembles each partition's "keys just before it" /
  *     "keys just after it" boundary buffer lists (no buffer merging —
  *     keys are unique across partitions);
  *  3. pass 2 zips the sorted stream with ITSELF
  *     (`rdd.zipPartitions(rdd)`): a LEAD iterator runs ahead building
  *     complete per-key buffers into a sliding deque over the key
  *     window `[v - backExtent, v + fwdExtent]`, and a LAG iterator
  *     emits rows, evaluating each function by merging the deque
  *     buffers inside its own `[v + lo_j, v + hi_j]` with the
  *     function's Catalyst `mergeExpressions`. Memory is
  *     `O((backExtent + fwdExtent) * nFuncs)` buffers plus the two
  *     iterators — never a buffered row range. The price is reading
  *     (and per-partition sorting) the shuffle output twice per task,
  *     the same two-scan cost the whole family's pass-1/pass-2 split
  *     already pays; buffering the lead-lag row gap instead would be
  *     density-unbounded, exactly the failure mode this tier exists to
  *     avoid.
  *
  * NULL keys: the sort puts the null block at the stream HEAD
  * (nulls-first orders) or TAIL (nulls-last — the late-r13 widening),
  * all in one partition (one tie group), and a null row's RANGE frame
  * is the null tie group itself (null boundary values compare equal to
  * null keys only — pinned against WindowExec in
  * GlobalRangeMovingAggSpec). The lead folds the block into one buffer
  * set per function whenever it reaches it, the lag computes it once
  * (a sorted stream has exactly one null block); null keys never enter
  * the boundary maps because their frames are fully partition-local.
  *
  * Only order-INSENSITIVE aggregates are admitted (the
  * [[RewriteGlobalRankWindows]] `allowedAgg` set — sum/min/max/count/
  * avg, moments, bit/bool): per-key buffers make tie order irrelevant,
  * so unlike the ROWS siblings this tier has NO total-order caveat —
  * the two zipped scans may even interleave ties differently (shuffle
  * fetch order is nondeterministic) and every value is still exact.
  * First/Last stay out by construction.
  *
  * TIMESTAMP keys (r14, VERDICT r13 task 1): a timestamp is epoch
  * MICROS in a Long, and a day/hour-pure interval bound is an exact
  * micro count, so the frame `[ts + lo_us, ts + hi_us]` is the same
  * long arithmetic — [[timeKey]] admits TimestampType/TimestampNTZType
  * with extents parsed to micros (see the rule's `rangeValueBound`).
  * The buffer-count bound changes character: on a dense int/day axis
  * it is `hi - lo + 1` by pigeonhole; on a micro axis it is the number
  * of DISTINCT timestamps inside the extent — data-dependent, which is
  * why the production pattern is to pre-bucket the axis to the frame's
  * natural grain (hour/day) before windowing, and why the matcher caps
  * the extent at `maxShiftOffset` DAYS.
  *
  * COMPACT DECIMAL keys (r14, second widening): Decimal(p <= 18, s)
  * is an unscaled Long on a fixed 10^-s lattice ([[decimalKey]]), so
  * same-lattice decimal bounds fold to exact unscaled extents — see
  * the rule's `rangeValueBound`.
  *
  * What still keeps WindowExec: DOUBLE keys (no exact lattice), WIDE
  * decimals (p > 18 — int128 unscaled), bounds finer than the key's
  * lattice, month-bearing interval bounds (not a fixed micro count),
  * unbounded-one-side bounded-other frames, and value extents past the
  * `spark.graft.rewrite.maxShiftOffset` cap (boundary buffers scale
  * linearly with the extent).
  */
case class GlobalRangeMovingAggNode(order: Seq[SortOrder],
                                    attrs: Seq[AttributeReference],
                                    funcs: Seq[DeclarativeAggregate],
                                    lowers: Seq[Long],
                                    uppers: Seq[Long],
                                    descending: Boolean,
                                    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ attrs
  override def producedAttributes: AttributeSet = AttributeSet(attrs)
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRangeMovingAggNode =
    copy(child = newChild)
}

object GlobalRangeMovingAggStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRangeMovingAggNode(order, attrs, funcs, lowers, uppers, desc, child) =>
      GlobalRangeMovingAggExec(order, attrs, funcs, lowers, uppers, desc,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GlobalRangeMovingAggExec(order: Seq[SortOrder],
                                    attrs: Seq[AttributeReference],
                                    funcs: Seq[DeclarativeAggregate],
                                    lowers: Seq[Long],
                                    uppers: Seq[Long],
                                    descending: Boolean,
                                    child: SparkPlan) extends UnaryExecNode {
  import GlobalRangeMovingAgg.{KeyBufs, addSat}

  override def output: Seq[Attribute] = child.output ++ attrs
  override def producedAttributes: AttributeSet = AttributeSet(attrs)

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override lazy val metrics =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  import GlobalRangeMovingAgg.PartMeta

  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    val childOutput = child.output
    val nFuncs = funcs.length
    val funcsArr = funcs.toArray
    val lowersArr = lowers.toArray
    val uppersArr = uppers.toArray
    val dataTypes = funcsArr.map(_.dataType)
    // farthest any function reaches behind / ahead of the current key,
    // in key-VALUE units
    val backExtent = lowersArr.collect { case lo if lo < 0 => -lo }
      .maxOption.getOrElse(0L)
    val fwdExtent = uppersArr.collect { case hi if hi > 0 => hi }
      .maxOption.getOrElse(0L)
    val keyExpr = order.head.child
    val keyType = keyExpr.dataType

    def newBuffers(): Array[SpecificInternalRow] =
      funcsArr.map(AggPlumbing.newBuffer)
    def updateProjs(): Array[MutableProjection] =
      funcsArr.map(AggPlumbing.updateProj(_, childOutput))

    // pass 1: stream the sorted partition once; per-key buffers are
    // built for the CURRENT key (keys are contiguous) and snapshotted
    // on key change into the head list (while still within fwdExtent of
    // the first key) and a pruned tail deque (within backExtent of the
    // running last key)
    val metas: Array[PartMeta] =
      rdd.mapPartitionsWithIndex({ (pid, it) =>
        val keyProj = UnsafeProjection.create(Seq(keyExpr), childOutput)
        val keyOf = GlobalRangeMovingAgg.longReader(keyType, descending)
        val upds = updateProjs()
        val joins = Array.fill(nFuncs)(new JoinedRow)
        val toUnsafes = funcsArr.map(AggPlumbing.toUnsafe)
        var firstKey: Option[Long] = None
        var lastKey = 0L
        val head = scala.collection.mutable.ArrayBuffer.empty[KeyBufs]
        val tail = new java.util.ArrayDeque[KeyBufs]()
        // one buffer set + one init projection set per PARTITION,
        // re-targeted per key (not re-created per key — r13 self-review:
        // MutableProjection.create per distinct key is per-key codegen
        // cache traffic the siblings don't pay)
        val curBufs = newBuffers()
        val inits = funcsArr.zipWithIndex.map { case (f, j) =>
          val p = AggPlumbing.initProj(f); p.target(curBufs(j)); p
        }
        locally {
          var j = 0
          while (j < nFuncs) { upds(j).target(curBufs(j)); j += 1 }
        }
        var curKey = 0L
        var haveCur = false
        def snapshot(): KeyBufs = new KeyBufs(curKey,
          funcsArr.indices.map(j => toUnsafes(j)(curBufs(j)).copy()).toArray)
        def closeKey(): Unit = if (haveCur) {
          val kb = snapshot()
          firstKey match {
            case Some(fk) if kb.key <= addSat(fk, fwdExtent) => head += kb
            case _ => ()
          }
          tail.addLast(kb)
          while (!tail.isEmpty &&
            tail.peekFirst().key < addSat(curKey, -backExtent)) tail.pollFirst()
          haveCur = false
        }
        it.foreach { row =>
          val kr = keyProj(row)
          if (!kr.isNullAt(0)) { // null keys never cross partitions
            val k = keyOf(kr)
            if (!haveCur || k != curKey) {
              closeKey()
              curKey = k
              if (firstKey.isEmpty) firstKey = Some(k)
              lastKey = k
              var j = 0
              while (j < nFuncs) { inits(j)(InternalRow.empty); j += 1 }
              haveCur = true
            }
            var j = 0
            while (j < nFuncs) { upds(j)(joins(j)(curBufs(j), row)); j += 1 }
          }
        }
        closeKey()
        // final prune: only keys within backExtent of the LAST key can
        // matter to later partitions
        while (!tail.isEmpty &&
          tail.peekFirst().key < addSat(lastKey, -backExtent)) tail.pollFirst()
        Iterator((pid, PartMeta(firstKey,
          firstKey.map(_ => lastKey), head.toArray,
          tail.toArray(new Array[KeyBufs](tail.size())))))
      }, preservesPartitioning = true).collect().sortBy(_._1).map(_._2)

    val nParts = metas.length
    // prevKeys(pid): complete per-key buffers from partitions BEFORE
    // pid for keys >= firstKey(pid) - backExtent, ascending. Keys are
    // unique across partitions, so assembly is insert + prune — no
    // buffer merging on the driver.
    val prevKeys: Array[Array[KeyBufs]] = {
      val acc = new java.util.ArrayDeque[KeyBufs]()
      Array.tabulate(nParts) { pid =>
        val snapshot = metas(pid).firstKey match {
          case Some(fk) =>
            val lo = addSat(fk, -backExtent)
            acc.toArray(new Array[KeyBufs](acc.size())).filter(_.key >= lo)
          case None => Array.empty[KeyBufs]
        }
        metas(pid).tail.foreach(acc.addLast)
        metas(pid).lastKey.foreach { lk =>
          val lo = addSat(lk, -backExtent)
          while (!acc.isEmpty && acc.peekFirst().key < lo) acc.pollFirst()
        }
        snapshot
      }
    }
    // nextKeys(pid): keys AFTER pid within fwdExtent of its last key
    val nextKeys: Array[Array[KeyBufs]] = {
      val out = new Array[Array[KeyBufs]](nParts)
      val acc = new java.util.ArrayDeque[KeyBufs]() // ascending
      var pid = nParts - 1
      while (pid >= 0) {
        out(pid) = metas(pid).lastKey match {
          case Some(lk) =>
            val hi = addSat(lk, fwdExtent)
            acc.toArray(new Array[KeyBufs](acc.size())).filter(_.key <= hi)
          case None => Array.empty[KeyBufs]
        }
        // prepend this partition's head (it sits BEFORE everything in acc)
        var i = metas(pid).head.length - 1
        while (i >= 0) { acc.addFirst(metas(pid).head(i)); i -= 1 }
        metas(pid).firstKey.foreach { fk =>
          val hi = addSat(fk, fwdExtent)
          while (!acc.isEmpty && acc.peekLast().key > hi) acc.pollLast()
        }
        pid -= 1
      }
      out
    }

    val out = output
    val numOutputRows = longMetric("numOutputRows")
    // boundary buffers ride a BROADCAST, not the task closure: the
    // closure would ship (and each task deserialize) every partition's
    // buffers when a task needs only its own two slices (r13
    // self-review); a broadcast deserializes once per executor
    val bcPrevKeys = sparkContext.broadcast(prevKeys)
    val bcNextKeys = sparkContext.broadcast(nextKeys)
    // pass 2: zip the sorted stream with itself — LEAD builds complete
    // per-key buffers into the sliding deque, LAG emits
    rdd.zipPartitions(rdd, preservesPartitioning = true) { (leadIt0, lagIt) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val keyProj = UnsafeProjection.create(Seq(keyExpr), childOutput)
      val keyProj2 = UnsafeProjection.create(Seq(keyExpr), childOutput)
      val keyOf = GlobalRangeMovingAgg.longReader(keyType, descending)
      val outProj = UnsafeProjection.create(out, out)
      val upds = updateProjs()
      val toUnsafes = funcsArr.map(AggPlumbing.toUnsafe)
      val joins = Array.fill(nFuncs)(new JoinedRow)

      // the sliding per-key windows (ascending keys, amortized-O(1)
      // two-stack evaluation per function — ADVICE r13; see
      // [[SlidingFrames]]), seeded with the boundary keys before this
      // partition
      val frames = new SlidingFrames(funcsArr, lowersArr, uppersArr)
      bcPrevKeys.value(pid).foreach(frames.append)
      val nexts = bcNextKeys.value(pid)
      var nextIdx = 0

      // the null block (nulls first => consumed before any key)
      val nullBufs = newBuffers()
      var sawNull = false

      // lead state: buffers for the key currently being built — one
      // buffer/projection set per partition, re-targeted per key (r13
      // self-review: no per-key MutableProjection.create)
      val curBufs = newBuffers()
      val leadInits = funcsArr.zipWithIndex.map { case (f, j) =>
        val p = AggPlumbing.initProj(f); p.target(curBufs(j)); p
      }
      var curKey = 0L
      var haveCur = false
      var leadDone = false
      val leadIt = leadIt0.buffered
      def leadNextKeyRow(): UnsafeRow = keyProj(leadIt.head)
      def closeCur(): Unit = if (haveCur) {
        frames.append(new KeyBufs(curKey,
          funcsArr.indices.map(j => toUnsafes(j)(curBufs(j)).copy()).toArray))
        haveCur = false
      }
      def consumeLead(): Unit = {
        val row = leadIt.next()
        val kr = keyProj(row)
        if (kr.isNullAt(0)) {
          sawNull = true
          var j = 0
          while (j < nFuncs) {
            upds(j).target(nullBufs(j))
            upds(j)(joins(j)(nullBufs(j), row))
            j += 1
          }
        } else {
          val k = keyOf(kr)
          if (!haveCur || k != curKey) {
            closeCur()
            curKey = k
            var j = 0
            while (j < nFuncs) {
              leadInits(j)(InternalRow.empty)
              upds(j).target(curBufs(j))
              j += 1
            }
            haveCur = true
          }
          var j = 0
          while (j < nFuncs) { upds(j)(joins(j)(curBufs(j), row)); j += 1 }
        }
      }
      /** Advance the lead until every key <= target is complete and in
        * the window (partition rows first, then the pre-built boundary
        * keys after this partition). */
      def feedLead(target: Long): Unit = {
        var go = !leadDone
        while (go) {
          if (leadIt.hasNext) {
            val kr = leadNextKeyRow()
            if (kr.isNullAt(0) || keyOf(kr) <= target) consumeLead()
            else go = false
          } else { leadDone = true; go = false }
        }
        if ((leadDone || (leadIt.hasNext && !leadNextKeyRow().isNullAt(0) &&
          keyOf(leadNextKeyRow()) > target)) && haveCur && curKey <= target)
          closeCur()
        while (nextIdx < nexts.length && leadDone && nexts(nextIdx).key <= target) {
          frames.append(nexts(nextIdx)); nextIdx += 1
        }
      }
      /** Consume the entire leading null block (nulls sort first). */
      def feedLeadNulls(): Unit = {
        var go = !leadDone
        while (go) {
          if (leadIt.hasNext) {
            if (leadNextKeyRow().isNullAt(0)) consumeLead() else go = false
          } else { leadDone = true; go = false }
        }
      }

      // frame evaluation plumbing (scratch buffer per function)
      val frameBufs = funcsArr.map { f =>
        new SpecificInternalRow(f.aggBufferAttributes.map(_.dataType))
      }
      val inits = funcsArr.zipWithIndex.map { case (f, j) =>
        val p = AggPlumbing.initProj(f); p.target(frameBufs(j)); p
      }
      val merges = funcsArr.zipWithIndex.map { case (f, j) =>
        val p = AggPlumbing.mergeProj(f); p.target(frameBufs(j)); p
      }
      val mergeJoins = Array.fill(nFuncs)(new JoinedRow)
      val evalRows = funcsArr.map(f => new SpecificInternalRow(Seq(f.dataType)))
      val evals = funcsArr.zipWithIndex.map { case (f, j) =>
        val p = AggPlumbing.evalProj(f); p.target(evalRows(j)); p
      }
      val aggRow = new GenericInternalRow(nFuncs)
      val joined = new JoinedRow
      def valueOf(j: Int): Any = {
        evals(j)(frameBufs(j))
        if (evalRows(j).isNullAt(0)) null else evalRows(j).get(0, dataTypes(j))
      }
      def computeFor(v: Long): Unit = {
        frames.computeInto(v, frameBufs, inits, merges, mergeJoins)
        var j = 0
        while (j < nFuncs) { aggRow.update(j, valueOf(j)); j += 1 }
      }
      def computeNull(): Unit = {
        var j = 0
        while (j < nFuncs) {
          evals(j)(nullBufs(j))
          aggRow.update(j,
            if (evalRows(j).isNullAt(0)) null else evalRows(j).get(0, dataTypes(j)))
          j += 1
        }
      }

      var haveMemo = false
      var memoKey = 0L
      // one-shot: the null block appears exactly once in a sorted
      // stream — LEADING (nulls-first orders) or TRAILING (nulls-last,
      // the r13 widening) — and computes its own frame either way
      var nullComputed = false
      lagIt.map { row =>
        val kr = keyProj2(row)
        if (kr.isNullAt(0)) {
          if (!nullComputed) { feedLeadNulls(); computeNull()
            nullComputed = true; haveMemo = false }
        } else {
          val v = keyOf(kr)
          if (!haveMemo || v != memoKey) {
            feedLead(addSat(v, fwdExtent))
            computeFor(v)
            // prune AFTER computing: only then has every function
            // consumed all keys <= v + hi_j >= v - backExtent, so
            // nothing below the widest lookback is still uncursored
            frames.dropBelowKey(addSat(v, -backExtent))
            memoKey = v; haveMemo = true
          }
        }
        numOutputRows += 1
        outProj(joined(row, aggRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRangeMovingAggExec =
    copy(child = newChild)
}

object GlobalRangeMovingAgg {

  /** One complete per-key buffer set: the key plus one partial buffer
    * per function (complete because a key lives in exactly one range
    * partition). */
  final class KeyBufs(val key: Long, val bufs: Array[UnsafeRow])
    extends Serializable

  /** Per-partition pass-1 payload: first/last NON-NULL key, complete
    * per-key buffers near each end (ascending key order). Top-level on
    * purpose: an exec-inner class would drag the whole physical plan
    * into the task-result serialization via `$outer`. */
  private[plans] case class PartMeta(firstKey: Option[Long],
                                     lastKey: Option[Long],
                                     head: Array[KeyBufs],
                                     tail: Array[KeyBufs])

  /** Integral order-key types this tier serves — the "dense domain"
    * precondition (DateType is day-integral). */
  def integralKey(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType | DateType => true
    case _ => false
  }

  /** Timestamp order-key types (r14, VERDICT r13 task 1): both store
    * epoch MICROS as a Long, so `ts + interval` with a day/hour-pure
    * (micros-exact) bound is plain long arithmetic on the key domain —
    * the per-key-buffer argument carries unchanged. The domain is NOT
    * dense the way a day axis is (adjacent keys can be a single micro
    * apart), so boundary state is bounded by the DISTINCT timestamps
    * inside the extent at each partition edge, not by the extent
    * value; the scale guidance is to pre-bucket the axis to the
    * frame's natural grain first (the q_rangemov_ts pattern), and the
    * matcher caps the extent at `maxShiftOffset` DAYS of micros. */
  def timeKey(dt: DataType): Boolean = dt match {
    case org.apache.spark.sql.types.TimestampType |
         org.apache.spark.sql.types.TimestampNTZType => true
    case _ => false
  }

  /** Compact DECIMAL order keys (r14, the second widening): a
    * Decimal(p <= 18, s) is an unscaled Long on a fixed 10^-s lattice,
    * so a same-scale decimal frame bound is an exact unscaled-long
    * extent and the whole per-key-buffer argument carries — the
    * pigeonhole bound is `hi - lo + 1` UNSCALED steps (a money axis at
    * scale 2 holds at most 100·x + 1 distinct keys per x-currency
    * extent). Wide decimals (p > 18, int128 unscaled) stay on
    * WindowExec — same refusal boundary as GlobalExactPercentile's
    * phase split. */
  def decimalKey(dt: DataType): Boolean = dt match {
    case d: org.apache.spark.sql.types.DecimalType => d.precision <= 18
    case _ => false
  }

  /** Order-key admission for the RANGE tiers: dense integral domains
    * plus the r14 timestamp and compact-decimal widenings. */
  def rangeKey(dt: DataType): Boolean =
    integralKey(dt) || timeKey(dt) || decimalKey(dt)

  /** Read the single-column key row as Long for the given type. A
    * DESCENDING order reads the bitwise NOT (`~v = -1 - v`): a
    * monotone REVERSAL with no overflow (two's complement), under
    * which the descending stream ascends and the frame bounds carry
    * over UNCHANGED — for `ORDER BY v DESC RANGE BETWEEN x PRECEDING
    * AND y FOLLOWING`, v in [v0 - y, v0 + x] iff ~v in
    * [~v0 - x, ~v0 + y], exactly the parsed [lo, hi]. */
  private[plans] def longReader(dt: DataType,
                                descending: Boolean = false): InternalRow => Long = {
    val raw: InternalRow => Long = dt match {
      case LongType => r => r.getLong(0)
      // timestamps read their epoch-micros physical long (r14)
      case org.apache.spark.sql.types.TimestampType |
           org.apache.spark.sql.types.TimestampNTZType => r => r.getLong(0)
      // compact decimals read their unscaled long (r14) — same scale
      // everywhere, so unscaled order == decimal order
      case d: org.apache.spark.sql.types.DecimalType if d.precision <= 18 =>
        r => r.getDecimal(0, d.precision, d.scale).toUnscaledLong
      case IntegerType | DateType => r => r.getInt(0).toLong
      case ShortType => r => r.getShort(0).toLong
      case ByteType => r => r.getByte(0).toLong
      case other => throw new IllegalArgumentException(
        s"GlobalRangeMovingAgg: non-integral order key type $other")
    }
    if (descending) r => ~raw(r) else raw
  }

  /** Saturating add: `v + extent` must not wrap at the Long edges (the
    * window comparisons treat the result as an inclusive bound). */
  private[plans] def addSat(a: Long, b: Long): Long = {
    val r = a + b
    if (((a ^ r) & (b ^ r)) < 0L) { if (b > 0L) Long.MaxValue else Long.MinValue }
    else r
  }

  /** Idempotent, race-safe strategy registration — same idiom as the
    * sibling operators. */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    GlobalRangeMovingAgg.synchronized {
      if (!spark.experimental.extraStrategies.contains(GlobalRangeMovingAggStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GlobalRangeMovingAggStrategy
      }
    }
}
