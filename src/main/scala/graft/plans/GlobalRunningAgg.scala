package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, MutableProjection, RowOrdering, SortOrder, SpecificInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Distributed EXACT global RUNNING AGGREGATE (late r12) — the third
  * and last global-window family after [[GlobalRank]] (position
  * arithmetic) and [[GlobalShift]] (bounded-offset lookup):
  * `sum/min/max/count/avg(e) OVER (ORDER BY ... [ROWS|RANGE] UNBOUNDED
  * PRECEDING .. CURRENT ROW)` — the classic cumulative total — without
  * the single-partition WindowExec funnel.
  *
  * A running aggregate's value at any row is the aggregate of a PREFIX
  * of the global order, and prefixes decompose by partition exactly
  * like rank offsets do: with the data range-partitioned (the physical
  * node declares `OrderedDistribution(order)`, same as its siblings),
  *
  *  1. pass 1 computes each partition's FULL aggregation buffer (the
  *     standard Catalyst `DeclarativeAggregate` update projection over
  *     the partition) — one small buffer per partition to the driver;
  *  2. the driver prefix-merges them with the function's OWN
  *     `mergeExpressions`: partition k's seed buffer = merge of
  *     partials 0..k-1 — `numPartitions` buffers, independent of data
  *     volume, the aggregate-state analogue of GlobalRank's offsets;
  *  3. pass 2 re-reads the same shuffle output, seeds the running
  *     buffer from the prefix, updates per row, and emits
  *     `evaluateExpression` — a streaming scan, no buffering at all
  *     for ROWS frames.
  *
  * RANGE frames (the SQL default for an aggregate over ORDER BY) end
  * at the current row's TIE GROUP, not the current row: all peers
  * share the group-end value. Tie groups never straddle the range
  * exchange (the [[GlobalRankNode]] containment argument), so pass 2
  * buffers ONE tie group at a time — memory bounds at the largest
  * group, against the built-in's whole-input single partition.
  *
  * Correct for any aggregate whose value is order-insensitive within
  * the frame (sum/min/max/count/avg, the variance/stddev moments, and
  * the bit/bool reducers — the rewrite rule's allowlist), and ALSO for
  * first_value/last_value (Spark's First/Last, IGNORE NULLS included):
  * those are order-sensitive, but pass 1 updates each partition's
  * buffer in its sort order and the driver prefix-merges in partition
  * order — which IS global order under the range exchange — so First's
  * keep-left / Last's keep-right merges are exact here. Other
  * order-sensitive aggregates (collect_list) and DISTINCT / FILTER
  * forms are not routed here. The functions run their own Catalyst
  * update/merge/evaluate expressions, so type behavior (decimal
  * widening, ANSI overflow, null-skipping) is identical to the
  * built-in by construction. One floating-point caveat: the prefix
  * seed merges per-partition partials, so a REAL-valued double
  * aggregate (a non-integer double sum, any variance) can differ from
  * the single-task built-in in final ulps — the same reassociation
  * every Spark partial aggregation performs; integer-valued, decimal,
  * min/max, count, bit and bool results are bit-identical.
  *
  * Parallel-seq layout for the same reason as [[GlobalShiftNode]]:
  * QueryPlan only collects top-level Expression fields into
  * `references`, and hiding `funcs` in carrier objects would let
  * ColumnPruning strip the aggregated columns from the child.
  */
case class GlobalRunningAggNode(order: Seq[SortOrder],
                                attrs: Seq[AttributeReference],
                                funcs: Seq[DeclarativeAggregate],
                                rowsFrames: Seq[Boolean],
                                child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ attrs
  override def producedAttributes: AttributeSet = AttributeSet(attrs)
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRunningAggNode =
    copy(child = newChild)
}

object GlobalRunningAggStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRunningAggNode(order, attrs, funcs, rowsFrames, child) =>
      GlobalRunningAggExec(order, attrs, funcs, rowsFrames,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GlobalRunningAggExec(order: Seq[SortOrder],
                                attrs: Seq[AttributeReference],
                                funcs: Seq[DeclarativeAggregate],
                                rowsFrames: Seq[Boolean],
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
    val nFuncs = funcs.length
    val funcsArr = funcs.toArray
    val rowsArr = rowsFrames.toArray
    val anyRange = rowsArr.contains(false)
    val keyExprs = order.map(_.child)
    val keyTypes = keyExprs.map(_.dataType)
    val dataTypes = funcsArr.map(_.dataType)

    def newBuffers(): Array[SpecificInternalRow] =
      funcsArr.map(AggPlumbing.newBuffer)
    def updateProjs(): Array[MutableProjection] =
      funcsArr.map(AggPlumbing.updateProj(_, childOutput))
    def toUnsafe(f: DeclarativeAggregate): UnsafeProjection =
      AggPlumbing.toUnsafe(f)

    // pass 1: one full-partition buffer per function — collected, then
    // prefix-merged on the driver with each function's own merge
    // expressions (numPartitions small buffers, never data)
    val partials: Array[Array[UnsafeRow]] =
      rdd.mapPartitionsWithIndex({ (pid, it) =>
        val buffers = newBuffers()
        val upds = updateProjs()
        val joins = Array.fill(nFuncs)(new JoinedRow)
        var j = 0
        while (j < nFuncs) { upds(j).target(buffers(j)); j += 1 }
        it.foreach { row =>
          var i = 0
          while (i < nFuncs) {
            upds(i)(joins(i)(buffers(i), row))
            i += 1
          }
        }
        Iterator((pid, funcsArr.zip(buffers).map { case (f, b) =>
          toUnsafe(f)(b).copy()
        }))
      }, preservesPartitioning = true).collect().sortBy(_._1).map(_._2)

    val nParts = partials.length
    // prefixes(pid)(j): function j's buffer over everything BEFORE pid
    val prefixes: Array[Array[UnsafeRow]] = {
      val accs = newBuffers()
      val merges = funcsArr.map(AggPlumbing.mergeProj)
      val joins = Array.fill(nFuncs)(new JoinedRow)
      var j = 0
      while (j < nFuncs) { merges(j).target(accs(j)); j += 1 }
      Array.tabulate(nParts) { pid =>
        val snapshot = funcsArr.zip(accs).map { case (f, b) =>
          toUnsafe(f)(b).copy()
        }
        var i = 0
        while (i < nFuncs) {
          merges(i)(joins(i)(accs(i), partials(pid)(i)))
          i += 1
        }
        snapshot
      }
    }

    val out = output
    val numOutputRows = longMetric("numOutputRows")
    // pass 2: seed from the prefix, stream updates, emit evaluate
    rdd.mapPartitionsWithIndex({ (pid, it) =>
      val proj = UnsafeProjection.create(out, out)
      val buffers = newBuffers()
      val upds = updateProjs()
      val joins = Array.fill(nFuncs)(new JoinedRow)
      val evalRows = funcsArr.map(f =>
        new SpecificInternalRow(Seq(f.dataType)))
      val evals = funcsArr.zipWithIndex.map { case (f, j) =>
        val p = AggPlumbing.evalProj(f)
        p.target(evalRows(j))
        p
      }
      // seed: merge this partition's prefix into the fresh init buffer
      locally {
        val merges = funcsArr.map(AggPlumbing.mergeProj)
        val join = new JoinedRow
        var j = 0
        while (j < nFuncs) {
          merges(j).target(buffers(j))(join(buffers(j), prefixes(pid)(j)))
          upds(j).target(buffers(j))
          j += 1
        }
      }
      val aggRow = new GenericInternalRow(nFuncs)
      val joined = new JoinedRow
      def updateWith(row: InternalRow): Unit = {
        var i = 0
        while (i < nFuncs) { upds(i)(joins(i)(buffers(i), row)); i += 1 }
      }
      def valueOf(j: Int): Any = {
        evals(j)(buffers(j))
        if (evalRows(j).isNullAt(0)) null else evalRows(j).get(0, dataTypes(j))
      }
      def emit(row: InternalRow): InternalRow = {
        numOutputRows += 1
        proj(joined(row, aggRow))
      }
      if (!anyRange) {
        // ROWS frames: pure streaming — update, evaluate, emit
        it.map { row =>
          updateWith(row)
          var j = 0
          while (j < nFuncs) { aggRow.update(j, valueOf(j)); j += 1 }
          emit(row)
        }
      } else {
        // RANGE frames end at the current TIE GROUP's last row: buffer
        // one group (ties never straddle the range exchange), updating
        // as rows arrive; ROWS-frame columns still take per-row values,
        // captured during buffering
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        val ord = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        new Iterator[InternalRow] {
          private var groupRows: Array[InternalRow] = Array.empty
          private var rowsVals: Array[Array[Any]] = Array.empty
          private var rangeVals: Array[Any] = Array.empty
          private var idx = 0
          private var pendingRow: InternalRow = null
          private var pendingKey: UnsafeRow = null
          private def perRow(row: InternalRow): Array[Any] = {
            updateWith(row)
            val vs = new Array[Any](nFuncs)
            var j = 0
            while (j < nFuncs) {
              if (rowsArr(j)) vs(j) = valueOf(j)
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
            // group consumed → the buffers now hold the group-end state
            rangeVals = new Array[Any](nFuncs)
            var j = 0
            while (j < nFuncs) {
              if (!rowsArr(j)) rangeVals(j) = valueOf(j)
              j += 1
            }
            groupRows = rows.toArray
            rowsVals = vals.toArray
            idx = 0
          }
          override def hasNext: Boolean =
            idx < groupRows.length || pendingRow != null || it.hasNext
          override def next(): InternalRow = {
            if (idx >= groupRows.length) loadNextGroup()
            val row = groupRows(idx)
            var j = 0
            while (j < nFuncs) {
              aggRow.update(j,
                if (rowsArr(j)) rowsVals(idx)(j) else rangeVals(j))
              j += 1
            }
            idx += 1
            emit(row)
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRunningAggExec =
    copy(child = newChild)
}

object GlobalRunningAgg {
  /** Idempotent, race-safe strategy registration — same idiom as the
    * sibling operators. */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    GlobalRunningAgg.synchronized {
      if (!spark.experimental.extraStrategies.contains(GlobalRunningAggStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GlobalRunningAggStrategy
      }
    }
}
