package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, SpecificInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** SKEW-AWARE distributed PARTITIONED running aggregate (r13, the
  * second member of the skew tier after [[PartitionedRank]]):
  * `agg(e) OVER (PARTITION BY k ORDER BY v [ROWS|RANGE] UNBOUNDED
  * PRECEDING .. CURRENT ROW)` — the per-user cumulative total, THE
  * most common skewed window at scale — without requiring all rows of
  * one key in one task.
  *
  * Same composite range sub-split as [[PartitionedRank]]
  * (`OrderedDistribution(k ++ v)`: a hot key spreads over a contiguous
  * partition run), with the [[GlobalRunningAgg]] prefix argument
  * applied PER KEY:
  *
  *  1. pass 1 aggregates each partition's LAST key run into the
  *     functions' own `DeclarativeAggregate` buffers — one buffer set
  *     plus two narrow key rows per partition to the driver;
  *  2. the driver stitches left-to-right: a partition whose first key
  *     continues its left neighbour's last key is seeded with the
  *     key's accumulated prefix buffer (merged with the functions' own
  *     `mergeExpressions`, in partition order — which IS global order,
  *     so First/Last keep-left/keep-right merges stay exact, the same
  *     ordered-allowlist argument as the global family); every other
  *     key starts from `initialValues`;
  *  3. pass 2 streams: reset at key change, seed the partition's first
  *     key from the stitched prefix, update per row, emit
  *     `evaluateExpression`. RANGE frames end at the current `(k, v)`
  *     tie group, which never straddles the composite exchange — one
  *     buffered group, as in the global operator.
  *
  * Type behavior (decimal widening, ANSI overflow, null skipping)
  * matches the built-in by construction — the operator only runs the
  * functions' own Catalyst expressions. The floating caveat is the
  * global family's: a REAL-valued double aggregate can differ in final
  * ulps from the single-task built-in on the straddling key (prefix
  * reassociation — the same reassociation Spark's partial aggregation
  * performs everywhere); integer, decimal, min/max, count, bit/bool
  * and First/Last results are bit-identical.
  *
  * Like its sibling, routed ONLY behind
  * `spark.graft.rewrite.partitionedRankWindows` or
  * [[graft.rules.RewriteGlobalRankWindows.forceSkew]]: the skew route
  * is a choice, not a default (flat histograms prefer the built-in's
  * hash exchange). Both skew operators declare the same composite
  * distribution, so a window mixing ranks and running aggregates
  * stacks them on ONE exchange.
  */
case class PartitionedRunningAggNode(partKeys: Seq[Expression],
                                     order: Seq[SortOrder],
                                     attrs: Seq[AttributeReference],
                                     funcs: Seq[DeclarativeAggregate],
                                     rowsFrames: Seq[Boolean],
                                     child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ attrs
  override def producedAttributes: AttributeSet = AttributeSet(attrs)
  override protected def withNewChildInternal(newChild: LogicalPlan): PartitionedRunningAggNode =
    copy(child = newChild)
}

object PartitionedRunningAggStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case PartitionedRunningAggNode(partKeys, order, attrs, funcs, rows, child) =>
      PartitionedRunningAggExec(partKeys, order, attrs, funcs, rows,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

case class PartitionedRunningAggExec(partKeys: Seq[Expression],
                                     order: Seq[SortOrder],
                                     attrs: Seq[AttributeReference],
                                     funcs: Seq[DeclarativeAggregate],
                                     rowsFrames: Seq[Boolean],
                                     child: SparkPlan) extends UnaryExecNode {
  import PartitionedRunningAgg.RunEdge

  override def output: Seq[Attribute] = child.output ++ attrs
  override def producedAttributes: AttributeSet = AttributeSet(attrs)

  private def compositeOrder: Seq[SortOrder] =
    partKeys.map(SortOrder(_, Ascending)) ++ order

  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(compositeOrder) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(compositeOrder)
  override def outputOrdering: Seq[SortOrder] = compositeOrder
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
    val partExprs = partKeys
    val partTypes = partExprs.map(_.dataType)
    val ordExprs = order.map(_.child)
    val ordTypes = ordExprs.map(_.dataType)
    val dataTypes = funcsArr.map(_.dataType)

    def newBuffers(): Array[SpecificInternalRow] =
      funcsArr.map(AggPlumbing.newBuffer)

    // pass 1: the LAST key run's buffers (+ first/last key, single flag)
    val edges: Array[RunEdge] =
      rdd.mapPartitionsWithIndex({ (pid, it) =>
        val keyProj = UnsafeProjection.create(partExprs, childOutput)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(partTypes)
        val upds = funcsArr.map(AggPlumbing.updateProj(_, childOutput))
        val inits = funcsArr.map(AggPlumbing.initProj)
        val joins = Array.fill(nFuncs)(new JoinedRow)
        val buffers = newBuffers()
        var j = 0
        while (j < nFuncs) { upds(j).target(buffers(j)); inits(j).target(buffers(j)); j += 1 }
        var firstKey: UnsafeRow = null
        var curKey: UnsafeRow = null
        var single = true
        it.foreach { row =>
          val k = keyProj(row)
          if (curKey == null) {
            firstKey = k.copy(); curKey = firstKey
          } else if (keyOrd.compare(curKey, k) != 0) {
            curKey = k.copy(); single = false
            var i = 0
            while (i < nFuncs) { inits(i)(InternalRow.empty); i += 1 }
          }
          var i = 0
          while (i < nFuncs) { upds(i)(joins(i)(buffers(i), row)); i += 1 }
        }
        val toUnsafes = funcsArr.map(AggPlumbing.toUnsafe)
        Iterator((pid, RunEdge(firstKey,
          if (curKey == null) null
          else if (curKey eq firstKey) firstKey else curKey,
          if (curKey == null) null
          else funcsArr.indices.map(j => toUnsafes(j)(buffers(j)).copy()).toArray,
          single)))
      }, preservesPartitioning = true).collect().sortBy(_._1).map(_._2)

    // driver stitching: prefix buffer set for each partition's FIRST
    // key (null = fresh start); merges run in partition order = global
    // order, so order-sensitive First/Last stay exact
    val nParts = edges.length
    val keyOrdDriver = RowOrdering.createNaturalAscendingOrdering(partTypes)
    val prefixes = new Array[Array[UnsafeRow]](nParts)
    locally {
      val accs = newBuffers()
      val inits = funcsArr.zipWithIndex.map { case (f, j) =>
        val p = AggPlumbing.initProj(f); p.target(accs(j)); p
      }
      val merges = funcsArr.zipWithIndex.map { case (f, j) =>
        val p = AggPlumbing.mergeProj(f); p.target(accs(j)); p
      }
      val joins = Array.fill(nFuncs)(new JoinedRow)
      val toUnsafes = funcsArr.map(AggPlumbing.toUnsafe)
      def snapshot(): Array[UnsafeRow] =
        funcsArr.indices.map(j => toUnsafes(j)(accs(j)).copy()).toArray
      def resetAccs(): Unit = {
        var j = 0
        while (j < nFuncs) { inits(j)(InternalRow.empty); j += 1 }
      }
      def mergeIn(bufs: Array[UnsafeRow]): Unit = {
        var j = 0
        while (j < nFuncs) { merges(j)(joins(j)(accs(j), bufs(j))); j += 1 }
      }
      var curKey: UnsafeRow = null
      var pid = 0
      while (pid < nParts) {
        val e = edges(pid)
        if (e.firstKey != null) {
          val continues = curKey != null &&
            keyOrdDriver.compare(curKey, e.firstKey) == 0
          prefixes(pid) = if (continues) snapshot() else null
          if (e.single && continues) mergeIn(e.lastRunBufs)
          else {
            curKey = e.lastKey
            resetAccs()
            mergeIn(e.lastRunBufs)
          }
        }
        pid += 1
      }
    }

    val out = output
    val numOutputRows = longMetric("numOutputRows")
    // prefixes ride a broadcast: one executor-side deserialization
    // instead of per-task closure payload (r13 self-review, same as
    // GlobalRangeMovingAgg's boundary buffers)
    val bcPrefixes = sparkContext.broadcast(prefixes)
    // pass 2: reset at key change, seed the first key from the prefix
    rdd.mapPartitionsWithIndex({ (pid, it) =>
      val keyProj = UnsafeProjection.create(partExprs, childOutput)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(partTypes)
      val proj = UnsafeProjection.create(out, out)
      val buffers = newBuffers()
      val inits = funcsArr.zipWithIndex.map { case (f, j) =>
        val p = AggPlumbing.initProj(f); p.target(buffers(j)); p
      }
      val upds = funcsArr.zipWithIndex.map { case (f, j) =>
        val p = AggPlumbing.updateProj(f, childOutput); p.target(buffers(j)); p
      }
      val merges = funcsArr.zipWithIndex.map { case (f, j) =>
        val p = AggPlumbing.mergeProj(f); p.target(buffers(j)); p
      }
      val joins = Array.fill(nFuncs)(new JoinedRow)
      val mergeJoins = Array.fill(nFuncs)(new JoinedRow)
      val evalRows = funcsArr.map(f => new SpecificInternalRow(Seq(f.dataType)))
      val evals = funcsArr.zipWithIndex.map { case (f, j) =>
        val p = AggPlumbing.evalProj(f); p.target(evalRows(j)); p
      }
      val aggRow = new GenericInternalRow(nFuncs)
      val joined = new JoinedRow
      val prefix = bcPrefixes.value(pid)
      var curKey: UnsafeRow = null
      var onFirstKey = false
      def startKey(k: UnsafeRow): Unit = {
        onFirstKey = curKey == null
        curKey = k.copy()
        var j = 0
        while (j < nFuncs) {
          inits(j)(InternalRow.empty)
          if (onFirstKey && prefix != null)
            merges(j)(mergeJoins(j)(buffers(j), prefix(j)))
          j += 1
        }
      }
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
        // ROWS frames: pure streaming
        it.map { row =>
          val k = keyProj(row)
          if (curKey == null || keyOrd.compare(curKey, k) != 0) startKey(k)
          updateWith(row)
          var j = 0
          while (j < nFuncs) { aggRow.update(j, valueOf(j)); j += 1 }
          emit(row)
        }
      } else {
        // RANGE frames end at the (k, v) TIE GROUP's last row: buffer
        // one group (composite tie containment), per-row values for any
        // ROWS-frame columns captured during buffering
        val compExprs = (partExprs ++ ordExprs)
        val compTypes = partTypes ++ ordTypes
        val compProj = UnsafeProjection.create(compExprs, childOutput)
        val compOrd = RowOrdering.createNaturalAscendingOrdering(compTypes)
        new Iterator[InternalRow] {
          private var groupRows: Array[InternalRow] = Array.empty
          private var rowsVals: Array[Array[Any]] = Array.empty
          private var rangeVals: Array[Any] = Array.empty
          private var idx = 0
          private var pendingRow: InternalRow = null
          private var pendingComp: UnsafeRow = null
          private def perRow(row: InternalRow): Array[Any] = {
            val k = keyProj(row)
            if (curKey == null || keyOrd.compare(curKey, k) != 0) startKey(k)
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
            var comp: UnsafeRow = null
            if (pendingRow != null) {
              rows += pendingRow; vals += perRow(pendingRow); comp = pendingComp
              pendingRow = null; pendingComp = null
            } else {
              val r = it.next()
              comp = compProj(r).copy()
              val c = r.copy()
              rows += c; vals += perRow(c)
            }
            var open = true
            while (open && it.hasNext) {
              val r = it.next()
              val k = compProj(r)
              if (compOrd.compare(comp, k) == 0) {
                val c = r.copy()
                rows += c; vals += perRow(c)
              } else {
                pendingRow = r.copy(); pendingComp = k.copy(); open = false
              }
            }
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

  override protected def withNewChildInternal(newChild: SparkPlan): PartitionedRunningAggExec =
    copy(child = newChild)
}

object PartitionedRunningAgg {

  /** Pass-1 edge payload: first/last key of the partition, the LAST
    * key run's aggregate buffers, single-key flag. Top-level so
    * task-result serialization doesn't drag the plan via `$outer`. */
  private[plans] case class RunEdge(firstKey: UnsafeRow,
                                    lastKey: UnsafeRow,
                                    lastRunBufs: Array[UnsafeRow],
                                    single: Boolean)

  /** Idempotent, race-safe strategy registration — same idiom as the
    * sibling operators. */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    PartitionedRunningAgg.synchronized {
      if (!spark.experimental.extraStrategies.contains(PartitionedRunningAggStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ PartitionedRunningAggStrategy
      }
    }
}
