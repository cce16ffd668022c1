package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Distributed EXACT global `nth_value` (r12) — the last member of the
  * global-window coverage: `nth_value(e, k [IGNORE NULLS]) OVER (ORDER
  * BY ...)` under a running (`UNBOUNDED PRECEDING .. CURRENT ROW`,
  * ROWS or RANGE) or whole-frame (`.. UNBOUNDED FOLLOWING`) spec,
  * without the single-partition WindowExec funnel.
  *
  * Every such frame STARTS at global row 1, so the k-th frame row is
  * one GLOBAL constant — the k-th row (plain) or k-th non-null row
  * (IGNORE NULLS) of the whole ordered input — and each row's result
  * is either that constant or NULL depending only on whether its frame
  * already reaches k rows:
  *
  *  1. pass 1 collects, per partition, its row count, each IGNORE
  *     NULLS column's non-null count, and each column's FIRST
  *     `min(k, available)` (non-null) evaluated values —
  *     `numPartitions * k` single values on the driver, bounded by the
  *     requested offset (capped by the rewrite rule), never by data;
  *  2. the driver telescopes the per-partition heads in partition
  *     order (the global k-th (non-null) row lives in the partition
  *     whose prefix first reaches k, at a local (non-null) index < k,
  *     so the concatenated heads contain it) and takes element k —
  *     plus per-partition prefix row / non-null counts, the same
  *     offsets GlobalRank broadcasts;
  *  3. pass 2 streams: a row's frame length is its global position
  *     (ROWS), its tie-GROUP-end position (RANGE — groups never
  *     straddle the range exchange, so one group is buffered at a
  *     time, exactly [[GlobalRunningAggExec]]'s treatment), or the
  *     global total (whole frame); the result is the constant when
  *     the (non-null) frame length reaches `k`, else NULL — matching
  *     WindowExec's un-updated buffer.
  *
  * Tie caveat (same as row_number/GlobalShift): under a non-total
  * order the k-th row of a tie-heavy prefix is tie-order-dependent,
  * plain OR ignore-nulls, here and in the built-in alike; under a
  * total order every value is exact. RANGE frames only gate WHETHER
  * the constant is visible to a tie group, so they are deterministic
  * whenever the built-in is.
  *
  * Parallel-seq layout for the same reason as the siblings: QueryPlan
  * only collects top-level Expression fields into `references`, and
  * hiding `inputs` in carrier objects would let ColumnPruning strip
  * the referenced columns from the child.
  */
case class GlobalNthValueNode(order: Seq[SortOrder],
                              attrs: Seq[AttributeReference],
                              inputs: Seq[Expression],
                              offsets: Seq[Int],
                              ignoreNullsFlags: Seq[Boolean],
                              // 0 = running ROWS, 1 = running RANGE,
                              // 2 = whole frame
                              frameKinds: Seq[Int],
                              child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ attrs
  override def producedAttributes: AttributeSet = AttributeSet(attrs)
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalNthValueNode =
    copy(child = newChild)
}

object GlobalNthValueStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalNthValueNode(order, attrs, inputs, offsets, ign, kinds, child) =>
      GlobalNthValueExec(order, attrs, inputs, offsets, ign, kinds,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GlobalNthValueExec(order: Seq[SortOrder],
                              attrs: Seq[AttributeReference],
                              inputs: Seq[Expression],
                              offsets: Seq[Int],
                              ignoreNullsFlags: Seq[Boolean],
                              frameKinds: Seq[Int],
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

  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    val childOutput = child.output
    val nCols = inputs.length
    val inputsArr = inputs.toArray
    val ksArr = offsets.toArray
    val ignArr = ignoreNullsFlags.toArray
    val kindArr = frameKinds.toArray
    val anyRange = kindArr.contains(1)
    val dataTypes = inputsArr.map(_.dataType)
    val keyExprs = order.map(_.child)
    val keyTypes = keyExprs.map(_.dataType)

    // pass 1: (rowCount, per-col non-null count, per-col first
    // min(k, available) (non-null) single-value rows)
    val stats: Array[(Long, Array[Long], Array[Array[UnsafeRow]])] =
      rdd.mapPartitionsWithIndex({ (pid, it) =>
        val valProjs = inputsArr.map(e =>
          UnsafeProjection.create(Seq(e), childOutput))
        val heads = Array.fill(nCols)(
          scala.collection.mutable.ArrayBuffer.empty[UnsafeRow])
        val nn = new Array[Long](nCols)
        var count = 0L
        it.foreach { row =>
          var j = 0
          while (j < nCols) {
            // plain columns stop evaluating once their k head values
            // are banked (their non-null counts are never read);
            // IGNORE NULLS columns keep counting non-nulls to the end
            if (ignArr(j) || heads(j).length < ksArr(j)) {
              val v = valProjs(j)(row)
              val isNull = v.isNullAt(0)
              if (!isNull) nn(j) += 1L
              // plain: first k rows' values; ignore-nulls: first k
              // non-null values
              if (heads(j).length < ksArr(j) && (!ignArr(j) || !isNull)) {
                heads(j) += v.copy()
              }
            }
            j += 1
          }
          count += 1L
        }
        Iterator((pid, (count, nn, heads.map(_.toArray))))
      }, preservesPartitioning = true).collect().sortBy(_._1).map(_._2)

    val nParts = stats.length
    val totalRows = stats.map(_._1).sum
    // prefix row count / per-col prefix non-null count before each pid
    val prefixRows = new Array[Long](nParts)
    val prefixNn = Array.ofDim[Long](nParts, nCols)
    var acc = 0L
    val accNn = new Array[Long](nCols)
    var p = 0
    while (p < nParts) {
      prefixRows(p) = acc
      var j = 0
      while (j < nCols) { prefixNn(p)(j) = accNn(j); accNn(j) += stats(p)._2(j); j += 1 }
      acc += stats(p)._1
      p += 1
    }
    val totalNn: Array[Long] = accNn
    // the global k-th (non-null) value per column, if it exists
    val nthVals: Array[UnsafeRow] = Array.tabulate(nCols) { j =>
      val have = if (ignArr(j)) totalNn(j) else totalRows
      if (have < ksArr(j)) null
      else {
        // telescope the heads: element k of the in-order concatenation
        var need = ksArr(j)
        var q = 0
        var found: UnsafeRow = null
        while (found == null && q < nParts) {
          val h = stats(q)._3(j)
          if (need <= h.length) found = h(need - 1) else need -= h.length
          q += 1
        }
        require(found != null,
          s"nth_value bookkeeping: k=${ksArr(j)} not found with have=$have")
        found
      }
    }

    val out = output
    val numOutputRows = longMetric("numOutputRows")
    // pass 2: stream; visibility = frame length (rows or non-nulls,
    // to the row / tie-group end / global end) reaching k
    rdd.mapPartitionsWithIndex({ (pid, it) =>
      val proj = UnsafeProjection.create(out, out)
      val valProjs = inputsArr.map(e =>
        UnsafeProjection.create(Seq(e), childOutput))
      val aggRow = new GenericInternalRow(nCols)
      val joined = new JoinedRow
      val constVal: Array[Any] = Array.tabulate(nCols) { j =>
        if (nthVals(j) == null || nthVals(j).isNullAt(0)) null
        else nthVals(j).get(0, dataTypes(j))
      }
      var pos = prefixRows(pid)
      val nnRun = prefixNn(pid).clone()
      def emit(row: InternalRow): InternalRow = {
        numOutputRows += 1
        proj(joined(row, aggRow))
      }
      // advance the running counters over one row; return nothing —
      // callers read pos/nnRun
      def advance(row: InternalRow): Unit = {
        pos += 1L
        var j = 0
        while (j < nCols) {
          if (ignArr(j) && !valProjs(j)(row).isNullAt(0)) nnRun(j) += 1L
          j += 1
        }
      }
      def valueAt(j: Int): Any = {
        val reach = kindArr(j) match {
          case 2 => if (ignArr(j)) totalNn(j) else totalRows
          case _ => if (ignArr(j)) nnRun(j) else pos
        }
        if (reach >= ksArr(j)) constVal(j) else null
      }
      if (!anyRange) {
        it.map { row =>
          advance(row)
          var j = 0
          while (j < nCols) { aggRow.update(j, valueAt(j)); j += 1 }
          emit(row)
        }
      } else {
        // RANGE frames end at the tie group's last row: buffer one
        // group (ties never straddle the range exchange), evaluate at
        // group end; ROWS / whole-frame columns keep per-row values,
        // captured while buffering
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        val ord = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        new Iterator[InternalRow] {
          private var groupRows: Array[InternalRow] = Array.empty
          private var rowVals: Array[Array[Any]] = Array.empty
          private var groupVals: Array[Any] = Array.empty
          private var idx = 0
          private var pendingRow: InternalRow = null
          private var pendingKey: UnsafeRow = null
          private def perRow(row: InternalRow): Array[Any] = {
            advance(row)
            val vs = new Array[Any](nCols)
            var j = 0
            while (j < nCols) {
              if (kindArr(j) != 1) vs(j) = valueAt(j)
              j += 1
            }
            vs
          }
          private def loadNextGroup(): Unit = {
            val rows = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
            val vals = scala.collection.mutable.ArrayBuffer.empty[Array[Any]]
            var key: UnsafeRow = null
            if (pendingRow != null) {
              rows += pendingRow; vals += perRow(pendingRow); key = pendingKey
              pendingRow = null; pendingKey = null
            } else {
              val r = it.next()
              key = keyProj(r).copy()
              val c = r.copy()
              rows += c; vals += perRow(c)
            }
            var open = true
            while (open && it.hasNext) {
              val r = it.next()
              val k = keyProj(r)
              if (ord.compare(key, k) == 0) {
                val c = r.copy()
                rows += c; vals += perRow(c)
              } else {
                pendingRow = r.copy(); pendingKey = k.copy(); open = false
              }
            }
            // group consumed → pos/nnRun hold the group-end state
            groupVals = new Array[Any](nCols)
            var j = 0
            while (j < nCols) {
              if (kindArr(j) == 1) groupVals(j) = valueAt(j)
              j += 1
            }
            groupRows = rows.toArray
            rowVals = vals.toArray
            idx = 0
          }
          override def hasNext: Boolean =
            idx < groupRows.length || pendingRow != null || it.hasNext
          override def next(): InternalRow = {
            if (idx >= groupRows.length) loadNextGroup()
            val row = groupRows(idx)
            var j = 0
            while (j < nCols) {
              aggRow.update(j,
                if (kindArr(j) == 1) groupVals(j) else rowVals(idx)(j))
              j += 1
            }
            idx += 1
            emit(row)
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalNthValueExec =
    copy(child = newChild)
}

object GlobalNthValue {
  /** Idempotent, race-safe strategy registration — same idiom as the
    * sibling operators. */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    GlobalNthValue.synchronized {
      if (!spark.experimental.extraStrategies.contains(GlobalNthValueStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GlobalNthValueStrategy
      }
    }
}
