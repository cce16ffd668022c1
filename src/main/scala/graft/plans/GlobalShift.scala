package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, Expression, GenericInternalRow, JoinedRow, Literal, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Distributed EXACT global `lead`/`lag` (late r12) — the
  * offset-window sibling of [[GlobalRank]]: `lag(e, k)` / `lead(e, k)
  * OVER (ORDER BY ...)` with no PARTITION BY, without the
  * single-partition WindowExec funnel.
  *
  * The shape matters for the `WindowWhitelist` CALENDAR class the way
  * GlobalRank matters for its ENTITY class: day-over-day / next-period
  * deltas are global offset windows, and at 100 TB the built-in form
  * sorts everything in one task. Here the physical node declares
  * `OrderedDistribution(order)` (range exchange + per-partition sorts,
  * identical to GlobalRank), and the offset lookups cross partition
  * boundaries through BOUNDED boundary state instead of a funnel:
  *
  *  1. pass 1 collects, per partition, its row count plus the FIRST
  *     `k` evaluated input values of every lead column and the LAST
  *     `k` of every lag column (each as 1-field UnsafeRow copies) — at
  *     most `numPartitions * k` values per shift column on the driver,
  *     independent of data volume;
  *  2. the driver concatenates them in partition order into each
  *     partition's "previous tail" / "next head" — the only values a
  *     partition can ever need from outside itself, because a row's
  *     source offset is at most `k` away and partitions tile the
  *     global order (a tail shorter than `k` simply reaches through to
  *     the tail before it, which the concatenation already encodes);
  *  3. pass 2 re-reads the same shuffle output streaming: a ring of
  *     the last `maxLag` evaluated values serves in-partition lags, a
  *     read-ahead of at most `maxLead` row copies serves in-partition
  *     leads, and anything off either end resolves from the driver
  *     arrays or the column's `default` (evaluated against the CURRENT
  *     row, matching WindowExec's offset-frame semantics).
  *
  * IGNORE NULLS (late r12, lag-only): `lag(e, k) IGNORE NULLS` is the
  * k-th most recent NON-NULL value strictly before the current row —
  * still k values of state, just k non-null ones. Pass 1 collects the
  * last k non-null values per partition, the driver telescopes them
  * (a partition with fewer than k non-nulls — even zero — reaches
  * through to earlier partitions), and pass 2 streams a k-capacity
  * non-null ring seeded from that boundary. The LEAD mirror is NOT
  * routed here: the k-th non-null ahead can be arbitrarily far (a
  * null run has no bound), which is WindowExec's whole-partition
  * territory.
  *
  * Memory: pass 2 buffers `maxLead + 1` full rows and
  * `maxLag + maxLead + 1` value tuples — bounded by the requested
  * offsets, never by the data. The built-in buffers the entire input
  * in its single partition. Offsets are capped by the caller (the
  * rewrite rule refuses offsets above `spark.graft.rewrite.
  * maxShiftOffset`) because boundary state scales linearly with them.
  *
  * Tie caveat: like the built-ins, offset windows under a non-total
  * order are tie-order-dependent; pass a unique trailing sort key for
  * deterministic output. Stronger than the built-in caveat, in fact:
  * the two passes re-read the shuffle independently, so under a
  * NON-total order a boundary-crossing value may reflect a different
  * permutation of a tie group than the in-partition values do — under
  * a total order both passes see the identical sequence and every
  * value is exact.
  *
  * Parallel-seq layout (attrs(i) carries inputs(i) shifted by
  * offsets(i) with defaults(i)) rather than a Seq of bundles: QueryPlan
  * collects `expressions` only from TOP-LEVEL Expression/Seq[Expression]
  * constructor fields, so nesting the inputs inside a carrier case
  * class would hide them from `references` — and ColumnPruning would
  * prune the shifted columns out of the child. */
case class GlobalShiftNode(order: Seq[SortOrder], attrs: Seq[AttributeReference],
                           inputs: Seq[Expression], offsets: Seq[Int],
                           defaults: Seq[Expression],
                           ignoreNullsFlags: Seq[Boolean],
                           child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ attrs
  override def producedAttributes: AttributeSet = AttributeSet(attrs)
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalShiftNode =
    copy(child = newChild)
}

object GlobalShiftStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalShiftNode(order, attrs, inputs, offsets, defaults, ign, child) =>
      GlobalShiftExec(order, attrs, inputs, offsets, defaults, ign,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GlobalShiftExec(order: Seq[SortOrder], attrs: Seq[AttributeReference],
                           inputs: Seq[Expression], offsets: Seq[Int],
                           defaults: Seq[Expression],
                           ignoreNullsFlags: Seq[Boolean],
                           child: SparkPlan) extends UnaryExecNode {

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

  /** default == null-literal means "emit null", skipping evaluation —
    * also dodges NullType, which UnsafeProjection cannot write. */
  private def isNullDefault(e: Expression): Boolean = e match {
    case Literal(null, _) => true
    case _ => false
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    val childOutput = child.output
    val nShifts = attrs.length
    val offsets = this.offsets.toArray
    val inputs = this.inputs
    val defaults = this.defaults
    // IGNORE NULLS columns (lag-only by construction: the k-th non-null
    // AHEAD needs unbounded lookahead, so the matcher never routes it):
    // boundary tails and the pass-2 ring hold NON-NULL values only —
    // the state stays k values, just k non-null ones
    val ign = (if (ignoreNullsFlags.isEmpty) Seq.fill(nShifts)(false)
               else ignoreNullsFlags).toArray
    val nullDefault = defaults.map(isNullDefault).toArray
    val dataTypes = inputs.map(_.dataType).toArray
    val maxLag = offsets.collect { case o if o < 0 => -o }.maxOption.getOrElse(0)
    val maxLead = offsets.collect { case o if o > 0 => o }.maxOption.getOrElse(0)

    // pass 1: per partition (count, first-k values per lead col,
    // last-k (non-null for IGNORE NULLS) values per lag col) — 1-field
    // UnsafeRow copies, at most |offset| per column per partition
    val boundary: Array[(Long, Array[Array[UnsafeRow]], Array[Array[UnsafeRow]])] =
      rdd.mapPartitionsWithIndex({ (pid, it) =>
        val projs = inputs.map(e => UnsafeProjection.create(Seq(e), childOutput)).toArray
        val heads = Array.fill(nShifts)(
          scala.collection.mutable.ArrayBuffer.empty[UnsafeRow])
        val tails = Array.fill(nShifts)(
          new java.util.ArrayDeque[UnsafeRow]())
        var count = 0L
        it.foreach { row =>
          var j = 0
          while (j < nShifts) {
            val o = offsets(j)
            if (o > 0 && count < o) heads(j) += projs(j)(row).copy()
            if (o < 0) {
              val v = projs(j)(row)
              if (!ign(j) || !v.isNullAt(0)) {
                val t = tails(j)
                if (t.size == -o) t.pollFirst()
                t.addLast(v.copy())
              }
            }
            j += 1
          }
          count += 1L
        }
        Iterator((pid, (count, heads.map(_.toArray),
          tails.map(t => t.toArray(new Array[UnsafeRow](t.size))))))
      }, preservesPartitioning = true).collect().sortBy(_._1).map(_._2)

    val nParts = boundary.length
    val counts = boundary.map(_._1)
    // prevTail(j)(pid): the |offset_j| values immediately BEFORE
    // partition pid in global order (shorter near the global start);
    // nextHead(j)(pid): the offset_j values immediately AFTER it
    val prevTail: Array[Array[Array[UnsafeRow]]] = Array.tabulate(nShifts) { j =>
      val k = math.max(0, -offsets(j))
      val acc = new java.util.ArrayDeque[UnsafeRow]()
      Array.tabulate(nParts) { pid =>
        val snapshot = acc.toArray(new Array[UnsafeRow](acc.size))
        boundary(pid)._3(j).foreach { v =>
          if (k > 0) {
            if (acc.size == k) acc.pollFirst()
            acc.addLast(v)
          }
        }
        snapshot
      }
    }
    val nextHead: Array[Array[Array[UnsafeRow]]] = Array.tabulate(nShifts) { j =>
      val k = math.max(0, offsets(j))
      val out = new Array[Array[UnsafeRow]](nParts)
      val acc = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
      var pid = nParts - 1
      while (pid >= 0) {
        out(pid) = acc.take(k).toArray
        if (k > 0) acc.prependAll(boundary(pid)._2(j).take(k))
        if (acc.length > k) acc.takeInPlace(k)
        pid -= 1
      }
      out
    }

    val out = output
    val numOutputRows = longMetric("numOutputRows")
    // pass 2: stream with a bounded value ring + row read-ahead
    rdd.mapPartitionsWithIndex({ (pid, it) =>
      val proj = UnsafeProjection.create(out, out)
      val inputProjs = inputs.map(e => UnsafeProjection.create(Seq(e), childOutput)).toArray
      val defaultProjs = defaults.zipWithIndex.map { case (d, j) =>
        if (nullDefault(j)) null else UnsafeProjection.create(Seq(d), childOutput)
      }.toArray
      val joined = new JoinedRow
      val shiftRow = new GenericInternalRow(nShifts)
      val partCount = counts(pid)
      val rowCap = maxLead + 1
      val valCap = maxLag + maxLead + 1
      val rowRing = new Array[InternalRow](rowCap)
      val valRing = new Array[Array[UnsafeRow]](valCap)
      var readIdx = 0L // local rows pulled from the iterator
      var emitIdx = 0L // local rows emitted
      // IGNORE NULLS lag columns: a k-capacity ring of the last k
      // NON-NULL values strictly before the current row, seeded from
      // the telescoped driver boundary (the last <=k non-nulls before
      // this partition, globally); the k-th most recent is the oldest
      // retained slot once the total count reaches k
      val nnRing = new Array[Array[UnsafeRow]](nShifts)
      val nnPos = new Array[Int](nShifts)
      val nnCount = new Array[Long](nShifts)
      locally {
        var j = 0
        while (j < nShifts) {
          if (ign(j)) {
            val kk = -offsets(j)
            nnRing(j) = new Array[UnsafeRow](kk)
            prevTail(j)(pid).foreach { v =>
              nnRing(j)(nnPos(j)) = v
              nnPos(j) = (nnPos(j) + 1) % kk
              nnCount(j) += 1L
            }
          }
          j += 1
        }
      }
      def valueOf(row1: UnsafeRow, dt: org.apache.spark.sql.types.DataType): Any =
        if (row1.isNullAt(0)) null else row1.get(0, dt)
      def evalInputs(r: InternalRow): Unit = {
        val vs = new Array[UnsafeRow](nShifts)
        var j = 0
        while (j < nShifts) { vs(j) = inputProjs(j)(r).copy(); j += 1 }
        valRing((readIdx % valCap).toInt) = vs
        readIdx += 1L
      }
      def fill(row: InternalRow): InternalRow = {
        var j = 0
        while (j < nShifts) {
          val src = emitIdx + offsets(j)
          val v: Any =
            if (ign(j)) {
              // the k-th most recent non-null strictly before this row
              val kk = -offsets(j)
              if (nnCount(j) >= kk) valueOf(nnRing(j)(nnPos(j)), dataTypes(j))
              else if (nullDefault(j)) null
              else valueOf(defaultProjs(j)(row), dataTypes(j))
            } else if (src >= 0L && src < partCount) {
              // in-partition: the ring retains [emitIdx-maxLag,
              // emitIdx+maxLead], and reads have been pulled to src
              valueOf(valRing((src % valCap).toInt)(j), dataTypes(j))
            } else if (src < 0L) {
              val pt = prevTail(j)(pid)
              val idx = pt.length + src // src negative
              if (idx >= 0L) valueOf(pt(idx.toInt), dataTypes(j))
              else if (nullDefault(j)) null
              else valueOf(defaultProjs(j)(row), dataTypes(j))
            } else {
              val nh = nextHead(j)(pid)
              val idx = src - partCount
              if (idx < nh.length) valueOf(nh(idx.toInt), dataTypes(j))
              else if (nullDefault(j)) null
              else valueOf(defaultProjs(j)(row), dataTypes(j))
            }
          shiftRow.update(j, v)
          j += 1
        }
        // the current row's value becomes visible to LATER rows only:
        // push into the non-null rings after every column was computed
        j = 0
        while (j < nShifts) {
          if (ign(j)) {
            val cur = valRing((emitIdx % valCap).toInt)(j)
            if (!cur.isNullAt(0)) {
              nnRing(j)(nnPos(j)) = cur
              nnPos(j) = (nnPos(j) + 1) % nnRing(j).length
              nnCount(j) += 1L
            }
          }
          j += 1
        }
        emitIdx += 1L
        numOutputRows += 1
        proj(joined(row, shiftRow))
      }
      if (maxLead == 0) {
        // lag-only fast path: no look-ahead, so the current row streams
        // through uncopied — only the small evaluated-value ring buffers
        it.map { row =>
          evalInputs(row)
          fill(row)
        }
      } else new Iterator[InternalRow] {
        private def readOne(): Unit = {
          val r = it.next()
          rowRing((readIdx % rowCap).toInt) = r.copy()
          evalInputs(r)
        }
        private def ensureRead(): Unit =
          while (readIdx <= emitIdx + maxLead && it.hasNext) readOne()
        override def hasNext: Boolean = { ensureRead(); emitIdx < readIdx }
        override def next(): InternalRow = {
          ensureRead()
          fill(rowRing((emitIdx % rowCap).toInt))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalShiftExec =
    copy(child = newChild)
}

object GlobalShift {
  import GlobalRank.Key

  /** One output shift column: generated attribute, the expression whose
    * value is shifted, the offset (positive = lead, negative = lag,
    * 0 = current row), the out-of-range default (evaluated against
    * the current row; `Literal(null)` for the SQL default), and the
    * IGNORE NULLS flag (lag-only: the k-th most recent NON-NULL value
    * instead of the value k rows back). */
  case class ShiftCol(attr: AttributeReference, input: Expression,
                      offset: Int, default: Expression,
                      ignoreNulls: Boolean = false)

  /** One requested shift for the column-name API: `offset > 0` looks
    * ahead (lead), `< 0` behind (lag); out-of-range rows get null. */
  case class Shift(name: String, input: String, offset: Int)

  def ensureStrategy(spark: SparkSession): Unit = GlobalShift.synchronized {
    if (!spark.experimental.extraStrategies.contains(GlobalShiftStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GlobalShiftStrategy
    }
  }

  /** Append global lead/lag columns ordered by `keys` — distributed:
    * range-partitioned with bounded boundary state, no
    * single-partition WindowExec anywhere in the plan. */
  def globalShift(df: DataFrame, shifts: Seq[Shift], keys: Seq[Key]): DataFrame = {
    require(keys.nonEmpty, "globalShift needs at least one sort key")
    require(shifts.nonEmpty, "globalShift needs at least one shift column")
    val spark = df.sparkSession
    ensureStrategy(spark)
    val analyzed = df.queryExecution.analyzed
    def attr(n: String): Attribute =
      analyzed.output.filter(_.name == n) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(s"no column $n")
        case many => throw new IllegalArgumentException(
          s"ambiguous column $n: ${many.size} matches — disambiguate first")
      }
    val order = keys.map(k =>
      SortOrder(attr(k.col), if (k.desc) Descending else Ascending))
    val dup = shifts.groupBy(_.name).collect { case (n, cs) if cs.size > 1 => n }
    require(dup.isEmpty, s"duplicate shift column name(s): ${dup.mkString(", ")}")
    shifts.foreach { s =>
      require(!analyzed.output.exists(_.name == s.name),
        s"shift column '${s.name}' already exists in the input")
    }
    val cols = shifts.map { s =>
      val in = attr(s.input)
      ShiftCol(AttributeReference(s.name, in.dataType, nullable = true)(),
        in, s.offset, Literal.create(null, in.dataType))
    }
    GraftSqlBridge.ofRows(spark, GlobalShiftNode(order, cols.map(_.attr),
      cols.map(_.input), cols.map(_.offset), cols.map(_.default),
      cols.map(_.ignoreNulls), analyzed))
  }
}
