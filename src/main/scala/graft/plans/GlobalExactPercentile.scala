package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{ByteType, DataType, Decimal, DecimalType, DoubleType, FloatType, IntegerType, LongType, ShortType}

/** Distributed EXACT whole-frame percentile (r12) — `percentile(e, p)
  * OVER ()` / `median(e) OVER ()` over an integral column, with ZERO
  * shuffle and NO sort: iterative histogram narrowing (distributed
  * selection) finds the exact order statistics.
  *
  * The built-in runs Spark's `Percentile`, whose buffer is a counts
  * map over EVERY distinct value, inside a single-partition WindowExec
  * — at 100 TB that is one task holding a corpus-sized map under a
  * corpus-wide sort. But an exact percentile is just two order
  * statistics, and an order statistic needs no sort:
  *
  *  1. one stats pass: per-partition non-null count / min / max per
  *     column — merged on the driver; `pos = p * (N-1)` fixes the two
  *     target ranks (floor and ceil), rank 0 and rank N-1 resolve to
  *     min/max immediately;
  *  2. selection passes: each unresolved rank holds a candidate range
  *     `[lo, hi]`; every pass histograms the values inside each range
  *     into 4096 equal-width integer buckets (all columns and ranks in
  *     ONE pass over the data), the driver walks the counts to the
  *     bucket containing the rank and recurses into it. The range
  *     shrinks 4096x per pass, so a 64-bit domain resolves in at most
  *     6 passes — 2-3 in practice — each a fully parallel scan with
  *     4096 longs per rank of driver state;
  *  3. the driver interpolates EXACTLY Spark's `PercentileBase`
  *     arithmetic (`(higher-pos)*lower + (pos-lower)*higher`, with its
  *     equal-endpoint early-outs), so the result is bit-identical to
  *     the built-in; one output pass attaches the constant to every
  *     row, preserving the child's partitioning and ordering.
  *
  * Input columns: INTEGRAL (byte/short/int/long — selection keys are
  * the values themselves), FLOAT/DOUBLE (keys are the IEEE
  * sortable-bits mapping, whose signed-long order equals the double
  * total order on the UnsafeRow-normalized values both this operator
  * and the built-in see — so integer bucket arithmetic stays exact and
  * the recovered endpoints are bit-identical), and — since r13
  * (VERDICT r12 task 4) — BOUNDED-PRECISION DECIMALS (precision <= 18:
  * the key is the unscaled long, whose signed order equals the decimal
  * order at the column's fixed scale; the endpoint maps back through
  * `Decimal(key, p, s).toDouble`, the exact `toDoubleValue` the
  * built-in interpolates with — `percentile` over money columns is the
  * common case at scale). WIDE decimals (precision 19..38 — late r13,
  * the family's last type refusal) select in TWO PHASES on the same
  * machinery: the 128-bit unscaled value's signed order is the
  * lexicographic (high-64 signed, low-64 unsigned) order, so phase 1
  * narrows on the high word, and once one high word remains, phase 2
  * narrows on the sortable low word among that high word's rows with
  * the carried remaining rank — at most ~12 passes by construction,
  * far fewer in practice (real wide-decimal populations concentrate
  * in one or two high words). Nulls are ignored (Percentile's own semantics); an
  * all-null / empty input yields null; NaN maps canonical-greatest,
  * exactly the built-in's sort position.
  *
  * The passes scan the child O(log_4096(range)) times; like
  * [[GlobalFrameAgg]], when the child is shuffle output the re-reads
  * hit shuffle files, and on a bare scan they are parallel re-scans —
  * against the built-in's single task buffering a corpus-sized map,
  * not a contest at scale.
  *
  * Parallel-seq layout for the same reason as the siblings: QueryPlan
  * only collects top-level Expression fields into `references`.
  */
case class GlobalExactPercentileNode(attrs: Seq[AttributeReference],
                                     inputs: Seq[Expression],
                                     percentages: Seq[Double],
                                     child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ attrs
  override def producedAttributes: AttributeSet = AttributeSet(attrs)
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalExactPercentileNode =
    copy(child = newChild)
}

object GlobalExactPercentileStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalExactPercentileNode(attrs, inputs, pcts, child) =>
      GlobalExactPercentileExec(attrs, inputs, pcts, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GlobalExactPercentileExec(attrs: Seq[AttributeReference],
                                     inputs: Seq[Expression],
                                     percentages: Seq[Double],
                                     child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ attrs
  override def producedAttributes: AttributeSet = AttributeSet(attrs)
  override def outputOrdering: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
    child.outputOrdering
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override lazy val metrics =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
      "selectionPasses" -> org.apache.spark.sql.execution.metric.SQLMetrics
        .createMetric(sparkContext, "selection passes"))

  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    val childOutput = child.output
    val nCols = inputs.length
    val inputsArr = inputs.toArray
    val dts = inputsArr.map(_.dataType)
    // statics aliased to locals so the task closures capture ONLY
    // these (and never `this` — shipping the whole plan subtree per
    // selection pass, or dragging a closure-unsafe child into the
    // closure, like the sibling operators avoid)
    val Buckets = GlobalExactPercentile.Buckets
    val longOf = GlobalExactPercentile.longOf _
    val lowKeyOf = GlobalExactPercentile.lowKeyOf _

    // r15 (guide §1.2, per-task work): the common multi-percentile call
    // (percentile(m, .25/.5/.75) + median(m)) feeds the SAME expression
    // to every column — deduplicate semantically-equal inputs so each
    // scan pass projects and key-extracts once per row per DISTINCT
    // expression, not once per target (measured 4-8 projections/row
    // collapsing to 1 on q_pctexact_wide's decimal-divide input)
    val uniqBuf = new scala.collection.mutable.ArrayBuffer[Expression]
    val colU: Array[Int] = inputsArr.map { e =>
      val i = uniqBuf.indexWhere(_.semanticEquals(e))
      if (i >= 0) i else { uniqBuf += e; uniqBuf.length - 1 }
    }
    val uniqArr: Array[Expression] = uniqBuf.toArray
    val nU = uniqArr.length
    val dtsU: Array[DataType] = Array.tabulate(nU) { u =>
      dts(colU.indexOf(u))
    }

    // pass 0: per-unique-expression (non-null count, min, max), fanned
    // back out to columns
    val stats: Array[(Long, Long, Long)] = {
      val partial = rdd.mapPartitions({ it =>
        val projs = uniqArr.map(e => UnsafeProjection.create(Seq(e), childOutput))
        val cnt = new Array[Long](nU)
        val mn = Array.fill(nU)(Long.MaxValue)
        val mx = Array.fill(nU)(Long.MinValue)
        it.foreach { row =>
          var u = 0
          while (u < nU) {
            val r = projs(u)(row)
            if (!r.isNullAt(0)) {
              val v = longOf(dtsU(u), r.get(0, dtsU(u)))
              cnt(u) += 1L
              if (v < mn(u)) mn(u) = v
              if (v > mx(u)) mx(u) = v
            }
            u += 1
          }
        }
        Iterator((cnt, mn, mx))
      }, preservesPartitioning = true).collect()
      Array.tabulate(nCols) { j =>
        val u = colU(j)
        val c = partial.map(_._1(u)).sum
        val mn = partial.map(_._2(u)).foldLeft(Long.MaxValue)(math.min)
        val mx = partial.map(_._3(u)).foldLeft(Long.MinValue)(math.max)
        (c, mn, mx)
      }
    }

    val isWide: Array[Boolean] = dts.map {
      case d: DecimalType => d.precision > Decimal.MAX_LONG_DIGITS
      case _ => false
    }
    // the ranks each column needs: floor/ceil of p*(N-1). WIDE decimals
    // (precision 19..38, 128-bit unscaled values — r13) select in TWO
    // phases on the same Long machinery: phase 1 narrows on the HIGH
    // 64 bits of the unscaled value (signed), and once a single high
    // word remains, phase 2 narrows on the LOW 64 bits (unsigned,
    // sign-flipped to sortable-signed) among the rows of that high
    // word, carrying the remaining rank — the 128-bit signed order IS
    // the lexicographic (high signed, low unsigned) order.
    final case class Target(col: Int, rank: Long,
                            var lo: Long, var hi: Long, var rankLeft: Long,
                            var phase2: Boolean = false,
                            var highKey: Long = 0L) {
      def resolved: Boolean = lo == hi && (!isWide(col) || phase2)
    }
    val positions: Array[Double] = Array.tabulate(nCols) { j =>
      val n = stats(j)._1
      if (n == 0) 0.0 else percentages(j) * (n - 1)
    }
    val targets: Array[Target] = (0 until nCols).flatMap { j =>
      val (n, mn, mx) = stats(j)
      if (n == 0) Nil
      else {
        val lower = math.floor(positions(j)).toLong
        val higher = math.ceil(positions(j)).toLong
        Seq(lower, higher).distinct.flatMap { r =>
          // rank 0 / N-1 are the stats pass's min/max — already exact
          if (r == 0L) Some(Target(j, r, mn, mn, 0L))
          else if (r == n - 1) Some(Target(j, r, mx, mx, 0L))
          else Some(Target(j, r, mn, mx, r))
        }
      }
    }.toArray

    // selection passes: histogram each active target's [lo, hi] into
    // equal-width integer buckets, recurse into the rank's bucket
    var passes = 0L
    while (targets.exists(!_.resolved)) {
      passes += 1L
      // wide-decimal phase transition: a collapsed HIGH range fixes the
      // target's high word; ONE seeding scan then bounds the low-word
      // range to the actual min/max low among that high word's rows
      // (starting from the full 64-bit span instead costs ~6 narrowing
      // scans; the seed usually leaves 1-2)
      val transitioned = targets.filter { t =>
        val hit = isWide(t.col) && !t.phase2 && t.lo == t.hi
        if (hit) {
          t.phase2 = true
          t.highKey = t.lo
        }
        hit
      }
      if (transitioned.nonEmpty) {
        val tU = transitioned.map(t => colU(t.col))
        val tHigh = transitioned.map(_.highKey)
        val nT = transitioned.length
        val seeds: (Array[Long], Array[Long]) =
          rdd.mapPartitions({ it =>
            val tUsed = tU.distinct
            val projs = tUsed.map(u =>
              UnsafeProjection.create(Seq(uniqArr(u)), childOutput))
            val uSlot: Map[Int, Int] = tUsed.zipWithIndex.toMap
            val mn = Array.fill(nT)(Long.MaxValue)
            val mx = Array.fill(nT)(Long.MinValue)
            val rawHigh = new Array[Long](tUsed.length)
            val rawLow = new Array[Long](tUsed.length)
            val rawNull = new Array[Boolean](tUsed.length)
            it.foreach { row =>
              var s = 0
              while (s < tUsed.length) {
                val r = projs(s)(row)
                rawNull(s) = r.isNullAt(0)
                if (!rawNull(s)) {
                  val raw = r.get(0, dtsU(tUsed(s)))
                  rawHigh(s) = longOf(dtsU(tUsed(s)), raw)
                  rawLow(s) = lowKeyOf(raw)
                }
                s += 1
              }
              var i = 0
              while (i < nT) {
                val s = uSlot(tU(i))
                if (!rawNull(s) && rawHigh(s) == tHigh(i)) {
                  val v = rawLow(s)
                  if (v < mn(i)) mn(i) = v
                  if (v > mx(i)) mx(i) = v
                }
                i += 1
              }
            }
            Iterator((mn, mx))
          }, preservesPartitioning = true).reduce { (a, b) =>
            var i = 0
            while (i < nT) {
              a._1(i) = math.min(a._1(i), b._1(i))
              a._2(i) = math.max(a._2(i), b._2(i))
              i += 1
            }
            a
          }
        var i = 0
        while (i < nT) {
          // the high word was selected from live counts, so rows exist
          transitioned(i).lo = seeds._1(i)
          transitioned(i).hi = seeds._2(i)
          i += 1
        }
        passes += 1L
      }
      val active = targets.zipWithIndex.filter(!_._1.resolved)
      val aIdx = active.map(_._2)
      val aCol = active.map(_._1.col)
      val aLo = active.map(_._1.lo)
      val aHi = active.map(_._1.hi)
      val aPhase2 = active.map(_._1.phase2)
      val aHigh = active.map(_._1.highKey)
      val nActive = active.length
      if (nActive == 0) {
        // the seeding scan resolved everything that was left (a
        // single-low-value high word) — nothing to histogram
        passes -= 1L
      } else {
      // width via unsigned span so a full-Long range cannot overflow:
      // span = hi - lo computed in BigInt once per pass, per target
      val widths: Array[Long] = Array.tabulate(nActive) { i =>
        val span = BigInt(aHi(i)) - BigInt(aLo(i)) + 1
        ((span + Buckets - 1) / Buckets).max(1).toLong
      }
      val aU = aCol.map(colU)
      // r16 (VERDICT r15 #6, guide §1.2): FUSE the wide-decimal phase-2
      // seed into this histogram pass. When a wide phase-1 target's
      // buckets have width 1, the pass is about to collapse the HIGH
      // range to a single word — the old flow then paid a SEPARATE
      // seeding scan for the low-word min/max of that word's rows.
      // Tracking per-bucket low-word min/max during THIS pass (only for
      // width-1 wide phase-1 targets) makes the winning bucket's
      // (lowMin, lowMax) the seed, one full scan earlier. The standalone
      // seed path below survives only for targets whose high range
      // collapses WITHOUT a histogram pass (mn == mx at creation).
      val aSeedLow: Array[Boolean] = Array.tabulate(nActive) { i =>
        isWide(aCol(i)) && !aPhase2(i) && widths(i) == 1L
      }
      val (counts: Array[Array[Long]], lowMn: Array[Array[Long]], lowMx: Array[Array[Long]]) =
        rdd.mapPartitions({ it =>
          val aUsed = aU.distinct
          val projs = aUsed.map(u =>
            UnsafeProjection.create(Seq(uniqArr(u)), childOutput))
          val uSlot: Map[Int, Int] = aUsed.zipWithIndex.toMap
          // does any phase-2 (or low-seeding) target read this unique
          // expr's LOW word?
          val needLow: Array[Boolean] = Array.tabulate(aUsed.length) { s =>
            (0 until nActive).exists(i => aU(i) == aUsed(s) &&
              (aPhase2(i) || aSeedLow(i)))
          }
          val rawHigh = new Array[Long](aUsed.length)
          val rawLow = new Array[Long](aUsed.length)
          val rawNull = new Array[Boolean](aUsed.length)
          val cts = Array.fill(nActive)(new Array[Long](Buckets))
          val lMn = Array.tabulate(nActive)(i =>
            if (aSeedLow(i)) Array.fill(Buckets)(Long.MaxValue) else Array.emptyLongArray)
          val lMx = Array.tabulate(nActive)(i =>
            if (aSeedLow(i)) Array.fill(Buckets)(Long.MinValue) else Array.emptyLongArray)
          it.foreach { row =>
            var s = 0
            while (s < aUsed.length) {
              val r = projs(s)(row)
              rawNull(s) = r.isNullAt(0)
              if (!rawNull(s)) {
                val raw = r.get(0, dtsU(aUsed(s)))
                rawHigh(s) = longOf(dtsU(aUsed(s)), raw)
                if (needLow(s)) rawLow(s) = lowKeyOf(raw)
              }
              s += 1
            }
            var i = 0
            while (i < nActive) {
              val s = uSlot(aU(i))
              if (!rawNull(s)) {
                // phase-2 targets histogram the LOW word of rows whose
                // HIGH word matches; everything else keys as phase 1
                val inPhase = !aPhase2(i) || rawHigh(s) == aHigh(i)
                val v = if (aPhase2(i)) rawLow(s) else rawHigh(s)
                if (inPhase && v >= aLo(i) && v <= aHi(i)) {
                  // (v - lo) cannot overflow: v,lo share [lo,hi] whose
                  // width/Buckets fits by construction of widths
                  val b = math.min(
                    java.lang.Long.divideUnsigned(v - aLo(i), widths(i)).toInt,
                    Buckets - 1)
                  cts(i)(b) += 1L
                  if (aSeedLow(i)) {
                    val lw = rawLow(s)
                    if (lw < lMn(i)(b)) lMn(i)(b) = lw
                    if (lw > lMx(i)(b)) lMx(i)(b) = lw
                  }
                }
              }
              i += 1
            }
          }
          Iterator((cts, lMn, lMx))
        }, preservesPartitioning = true)
          .reduce { (a, b) =>
            var i = 0
            while (i < nActive) {
              var k = 0
              while (k < Buckets) {
                a._1(i)(k) += b._1(i)(k)
                k += 1
              }
              if (aSeedLow(i)) {
                var m = 0
                while (m < Buckets) {
                  a._2(i)(m) = math.min(a._2(i)(m), b._2(i)(m))
                  a._3(i)(m) = math.max(a._3(i)(m), b._3(i)(m))
                  m += 1
                }
              }
              i += 1
            }
            a
          }
      var i = 0
      while (i < nActive) {
        val t = targets(aIdx(i))
        var cum = 0L
        var k = 0
        var found = false
        while (!found && k < Buckets) {
          val c = counts(i)(k)
          if (cum + c > t.rankLeft) {
            // two's-complement wraparound in newLo/rawHi is benign —
            // the true values are inside [lo, hi] ⊂ Long — EXCEPT the
            // last bucket's raw end, which can exceed Long.MaxValue
            // and wrap negative: detect and clamp to hi
            val newLo = t.lo + widths(i) * k
            val rawHi = newLo + widths(i) - 1L
            val newHi = if (rawHi < newLo) t.hi else math.min(t.hi, rawHi)
            t.rankLeft -= cum
            if (aSeedLow(i)) {
              // fused transition: this width-1 bucket IS the final high
              // word, and its tracked low min/max seed phase 2 (the
              // bucket is non-empty — c > rankLeft ≥ 0)
              t.phase2 = true
              t.highKey = newLo
              t.lo = lowMn(i)(k)
              t.hi = lowMx(i)(k)
            } else {
              t.lo = newLo
              t.hi = newHi
            }
            found = true
          } else { cum += c; k += 1 }
        }
        require(found,
          s"selection bookkeeping: rank ${t.rank} not found in [${t.lo}, ${t.hi}]")
        i += 1
      }
      }
    }
    longMetric("selectionPasses") += passes

    // driver: Spark PercentileBase's own interpolation, bit-for-bit.
    // Keys are (high, low) PAIRS — (key, 0) for the single-long types —
    // so the kHi == kLo equality stays exactly one-to-one with VALUE
    // equality (the longOf normalization-precondition note)
    val byColRank: Map[(Int, Long), (Long, Long)] =
      targets.map(t => (t.col, t.rank) ->
        (if (t.phase2) (t.highKey, t.lo) else (t.lo, 0L))).toMap
    val finals: Array[Any] = Array.tabulate(nCols) { j =>
      val n = stats(j)._1
      if (n == 0) null
      else {
        val pos = positions(j)
        val lower = math.floor(pos).toLong
        val higher = math.ceil(pos).toLong
        val kLo = byColRank((j, lower))
        val vLo = GlobalExactPercentile.endpointDouble(dts(j), kLo._1, kLo._2)
        if (higher == lower) vLo
        else {
          val kHi = byColRank((j, higher))
          if (kHi == kLo) vLo
          else {
            val vHi = GlobalExactPercentile.endpointDouble(dts(j), kHi._1, kHi._2)
            (higher - pos) * vLo + (pos - lower) * vHi
          }
        }
      }
    }

    val out = output
    val numOutputRows = longMetric("numOutputRows")
    rdd.mapPartitions({ it =>
      val proj = UnsafeProjection.create(out, out)
      val aggRow = new GenericInternalRow(finals.asInstanceOf[Array[Any]])
      val joined = new JoinedRow
      it.map { row =>
        numOutputRows += 1
        proj(joined(row, aggRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalExactPercentileExec =
    copy(child = newChild)
}

object GlobalExactPercentile {
  private[plans] val Buckets = 4096

  /** The value as a SELECTION KEY long whose signed order equals the
    * column type's total order. Integrals map to themselves;
    * float/double map through the IEEE sortable-bits trick (flip
    * all-but-sign for negatives): signed-long order then equals Java's
    * Double total order (-0.0 < 0.0, canonical NaN greatest) — which
    * is Spark's order on the UnsafeRow-normalized values both this
    * operator and the built-in actually see. Bounded-precision
    * decimals (precision <= 18) map to the unscaled long — exact, and
    * order-equal at the column's fixed scale. Static so task closures
    * capture no operator state.
    *
    * NORMALIZATION PRECONDITION (ADVICE r12): the driver-side
    * interpolation treats selection-KEY equality (`kHi == kLo`) as
    * PercentileBase's double VALUE equality. For float/double that
    * equivalence holds only because every input row here has passed
    * through UnsafeRow writes, which normalize -0.0 to +0.0 and every
    * NaN to the canonical bits — distinct raw bit patterns of an
    * equal/unordered value cannot reach this mapping. A future input
    * path that bypasses UnsafeRow normalization, or a type extension
    * whose key is many-to-one on distinct values, must re-derive that
    * equivalence before reusing `endpointDouble`. (The decimal key is
    * exactly one-to-one at fixed scale, so the equivalence is
    * structural there.) */
  private[plans] def longOf(dt: DataType, v: Any): Long = dt match {
    case LongType => v.asInstanceOf[Long]
    case IntegerType => v.asInstanceOf[Int].toLong
    case ShortType => v.asInstanceOf[Short].toLong
    case ByteType => v.asInstanceOf[Byte].toLong
    case DoubleType => sortableBits(v.asInstanceOf[Double])
    case FloatType => sortableBits(v.asInstanceOf[Float].toDouble)
    case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
      v.asInstanceOf[Decimal].toUnscaledLong
    // WIDE decimals (r13): phase-1 key = the unscaled 128-bit value's
    // HIGH 64 bits (arithmetic shift keeps sign; |unscaled| < 10^38 <
    // 2^127, so the high word is exact) — the signed order of high
    // words is the first tier of the 128-bit lexicographic order
    case _: DecimalType =>
      v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue()
        .shiftRight(64).longValueExact()
    case other => throw new IllegalStateException(s"unsupported $other")
  }

  /** Phase-2 selection key for WIDE decimals: the unscaled value's LOW
    * 64 bits, sign-flipped so UNSIGNED low-word order (the second tier
    * of the 128-bit lexicographic order) equals signed-long order. */
  private[plans] def lowKeyOf(v: Any): Long =
    v.asInstanceOf[Decimal].toJavaBigDecimal.unscaledValue()
      .longValue() ^ Long.MinValue

  private def sortableBits(d: Double): Long = {
    val b = java.lang.Double.doubleToLongBits(d) // canonical NaN
    if (b < 0) b ^ Long.MaxValue else b
  }

  /** The interpolation endpoint as the DOUBLE the built-in would use:
    * the selection key mapped back for floating columns, the integer
    * widened for integral ones, the (high, low) pair reassembled into
    * the 128-bit unscaled value for wide decimals. Driver-side only.
    * For single-long types `low` is 0 by construction. */
  private[plans] def endpointDouble(dt: DataType, key: Long, low: Long = 0L): Double = dt match {
    case DoubleType | FloatType =>
      val b = if (key < 0) key ^ Long.MaxValue else key
      java.lang.Double.longBitsToDouble(b)
    case d: DecimalType if d.precision <= Decimal.MAX_LONG_DIGITS =>
      // the built-in interpolates PercentileBase.toDoubleValue =
      // Decimal.toDouble — rebuild the decimal at the column's scale
      Decimal(key, d.precision, d.scale).toDouble
    case d: DecimalType =>
      val rawLow = low ^ Long.MinValue // undo the sortable flip
      val unscaled = java.math.BigInteger.valueOf(key).shiftLeft(64)
        .add(java.math.BigInteger.valueOf(rawLow)
          .and(java.math.BigInteger.ONE.shiftLeft(64)
            .subtract(java.math.BigInteger.ONE)))
      Decimal(new java.math.BigDecimal(unscaled, d.scale),
        d.precision, d.scale).toDouble
    case _ => key.toDouble
  }

  /** Idempotent, race-safe strategy registration — same idiom as the
    * sibling operators. */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    GlobalExactPercentile.synchronized {
      if (!spark.experimental.extraStrategies.contains(GlobalExactPercentileStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GlobalExactPercentileStrategy
      }
    }
}
