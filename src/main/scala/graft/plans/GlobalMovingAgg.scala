package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, SortOrder, SpecificInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Distributed EXACT global MOVING-FRAME AGGREGATE (late r12) — the
  * bounded-frame sibling of [[GlobalRunningAgg]]: `agg(e) OVER (ORDER
  * BY ... ROWS BETWEEN lo AND hi)` with literal row offsets — the
  * classic moving average / rolling min-max — without the
  * single-partition WindowExec funnel.
  *
  * A bounded ROWS frame reaches at most `|lo|` rows behind and `|hi|`
  * rows ahead of the current row, so the only rows a partition can
  * ever need from outside itself are the `maxBack` rows immediately
  * before it and the `maxFwd` rows immediately after it in global
  * order — the same boundary-state argument as [[GlobalShift]]'s
  * offset lookups, carried on rows instead of evaluated values:
  *
  *  1. pass 1 collects, per partition, its row count plus its LAST
  *     `maxBack` and FIRST `maxFwd` rows, projected down to the
  *     attributes the aggregates actually reference — at most
  *     `numPartitions * (maxBack + maxFwd)` narrow rows on the driver,
  *     bounded by the requested frame extents, never by data volume;
  *  2. the driver concatenates them in partition order into each
  *     partition's "previous tail" / "next head" (a tail shorter than
  *     `maxBack` telescopes through to the tail before it, exactly as
  *     in GlobalShift);
  *  3. pass 2 re-reads the same shuffle output streaming: a position
  *     ring of `maxBack + maxFwd + 1` projected rows covers every
  *     frame, a read-ahead of at most `maxFwd` original-row copies
  *     aligns output with lookahead, and each output value re-runs the
  *     function's own Catalyst `initialValues`/`updateExpressions`/
  *     `evaluateExpression` over its ≤ `hi - lo + 1` frame rows — the
  *     exact per-row rebuffering WindowExec's sliding frame performs
  *     for non-invertible aggregates, minus the funnel.
  *
  * Frames are per-function: one node carries any mix of trailing
  * (`-6..0`), centered (`-1..1`), pure-past (`-5..-2`) and pure-future
  * (`1..3`) literal ROWS frames over one shared range exchange. An
  * empty effective frame (clipping past either global end) evaluates
  * the initial buffer — null sum, zero count — matching the built-in.
  * UNBOUNDED PRECEDING frames route to [[GlobalRunningAgg]] instead
  * (no boundary rows needed there); RANGE moving frames are
  * value-bounded, not row-bounded, and stay on WindowExec.
  *
  * Memory: pass 2 holds `maxBack + maxFwd + 1` projected rows plus
  * `maxFwd + 1` original rows — bounded by the frame, never the data.
  * The built-in buffers the entire input in its single partition.
  * Extents are capped by the rewrite rule (`spark.graft.rewrite.
  * maxShiftOffset`) because boundary state scales linearly with them.
  *
  * Tie caveat (stronger than the built-in, same as [[GlobalShift]]):
  * ROWS frames under a non-total order are tie-order-dependent, and
  * the two passes re-read the shuffle independently — under a total
  * order both passes see the identical sequence and every value is
  * exact.
  *
  * Parallel-seq layout for the same reason as the siblings: QueryPlan
  * only collects top-level Expression fields into `references`, and
  * hiding `funcs` in carrier objects would let ColumnPruning strip the
  * aggregated columns from the child.
  */
case class GlobalMovingAggNode(order: Seq[SortOrder],
                               attrs: Seq[AttributeReference],
                               funcs: Seq[DeclarativeAggregate],
                               lowers: Seq[Int],
                               uppers: Seq[Int],
                               child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ attrs
  override def producedAttributes: AttributeSet = AttributeSet(attrs)
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalMovingAggNode =
    copy(child = newChild)
}

object GlobalMovingAggStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalMovingAggNode(order, attrs, funcs, lowers, uppers, child) =>
      GlobalMovingAggExec(order, attrs, funcs, lowers, uppers,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GlobalMovingAggExec(order: Seq[SortOrder],
                               attrs: Seq[AttributeReference],
                               funcs: Seq[DeclarativeAggregate],
                               lowers: Seq[Int],
                               uppers: Seq[Int],
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
    val lowersArr = lowers.toArray
    val uppersArr = uppers.toArray
    val dataTypes = funcsArr.map(_.dataType)
    val maxBack = lowersArr.collect { case lo if lo < 0 => -lo }
      .maxOption.getOrElse(0)
    val maxFwd = uppersArr.collect { case hi if hi > 0 => hi }
      .maxOption.getOrElse(0)
    // frame rows travel projected down to what the aggregates read —
    // boundary state is (maxBack + maxFwd) * numPartitions NARROW rows
    val neededSet = AttributeSet(funcsArr.toSeq.flatMap(_.references))
    val neededAttrs: Seq[Attribute] = childOutput.filter(neededSet.contains)

    // pass 1: per partition (count, last-maxBack projected rows,
    // first-maxFwd projected rows)
    val boundary: Array[(Long, Array[UnsafeRow], Array[UnsafeRow])] =
      rdd.mapPartitionsWithIndex({ (pid, it) =>
        val needProj = UnsafeProjection.create(neededAttrs, childOutput)
        val head = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
        val tail = new java.util.ArrayDeque[UnsafeRow]()
        var count = 0L
        it.foreach { row =>
          if (maxFwd > 0 && count < maxFwd) head += needProj(row).copy()
          if (maxBack > 0) {
            if (tail.size == maxBack) tail.pollFirst()
            tail.addLast(needProj(row).copy())
          }
          count += 1L
        }
        Iterator((pid, (count, head.toArray,
          tail.toArray(new Array[UnsafeRow](tail.size)))))
      }, preservesPartitioning = true).collect().sortBy(_._1).map(_._2)

    val nParts = boundary.length
    val counts = boundary.map(_._1)
    // prevTail(pid): the maxBack projected rows immediately BEFORE
    // partition pid in global order (shorter near the global start) —
    // short partition tails telescope through the concatenation
    val prevTail: Array[Array[UnsafeRow]] = {
      val acc = new java.util.ArrayDeque[UnsafeRow]()
      Array.tabulate(nParts) { pid =>
        val snapshot = acc.toArray(new Array[UnsafeRow](acc.size))
        boundary(pid)._3.foreach { v =>
          if (maxBack > 0) {
            if (acc.size == maxBack) acc.pollFirst()
            acc.addLast(v)
          }
        }
        snapshot
      }
    }
    // nextHead(pid): the maxFwd projected rows immediately AFTER it
    val nextHead: Array[Array[UnsafeRow]] = {
      val out = new Array[Array[UnsafeRow]](nParts)
      val acc = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
      var pid = nParts - 1
      while (pid >= 0) {
        out(pid) = acc.take(maxFwd).toArray
        if (maxFwd > 0) acc.prependAll(boundary(pid)._2.take(maxFwd))
        if (acc.length > maxFwd) acc.takeInPlace(maxFwd)
        pid -= 1
      }
      out
    }

    val out = output
    val numOutputRows = longMetric("numOutputRows")
    // pass 2: position ring of projected rows + bounded original-row
    // read-ahead; each output value rebuffers its ≤ (hi-lo+1) frame rows
    rdd.mapPartitionsWithIndex({ (pid, it) =>
      val outProj = UnsafeProjection.create(out, out)
      val needProj = UnsafeProjection.create(neededAttrs, childOutput)
      val buffers = funcsArr.map { f =>
        new SpecificInternalRow(f.aggBufferAttributes.map(_.dataType))
      }
      val inits = funcsArr.zipWithIndex.map { case (f, j) =>
        val p = AggPlumbing.initProj(f)
        p.target(buffers(j)); p
      }
      val upds = funcsArr.zipWithIndex.map { case (f, j) =>
        val p = AggPlumbing.updateProj(f, neededAttrs)
        p.target(buffers(j)); p
      }
      val evalRows = funcsArr.map(f => new SpecificInternalRow(Seq(f.dataType)))
      val evals = funcsArr.zipWithIndex.map { case (f, j) =>
        val p = AggPlumbing.evalProj(f)
        p.target(evalRows(j)); p
      }
      val joins = Array.fill(nFuncs)(new JoinedRow)
      val aggRow = new GenericInternalRow(nFuncs)
      val joined = new JoinedRow

      val pt = prevTail(pid)
      val nh = nextHead(pid)
      val partCount = counts(pid)
      val totalFeed = partCount + nh.length
      val cap = maxBack + maxFwd + 1
      val ring = new Array[UnsafeRow](cap)
      def slot(p: Long): Int = (((p % cap) + cap) % cap).toInt
      // preload the previous tail at negative positions
      var i = 0
      while (i < pt.length) { ring(slot(i.toLong - pt.length)) = pt(i); i += 1 }
      var fedPos = 0L

      def valueOf(j: Int): Any = {
        evals(j)(buffers(j))
        if (evalRows(j).isNullAt(0)) null else evalRows(j).get(0, dataTypes(j))
      }
      def computeAggs(emitIdx: Long): Unit = {
        var j = 0
        while (j < nFuncs) {
          inits(j)(InternalRow.empty) // reset to the empty-frame state
          var p = math.max(emitIdx + lowersArr(j), -pt.length.toLong)
          val hiP = math.min(emitIdx + uppersArr(j), totalFeed - 1L)
          while (p <= hiP) {
            upds(j)(joins(j)(buffers(j), ring(slot(p))))
            p += 1L
          }
          aggRow.update(j, valueOf(j))
          j += 1
        }
      }
      def emit(row: InternalRow): InternalRow = {
        numOutputRows += 1
        outProj(joined(row, aggRow))
      }

      if (maxFwd == 0) {
        // trailing-only fast path: no look-ahead, the current row
        // streams through uncopied — only the projected ring buffers
        var emitIdx = 0L
        it.map { row =>
          ring(slot(fedPos)) = needProj(row).copy()
          fedPos += 1L
          computeAggs(emitIdx)
          emitIdx += 1L
          emit(row)
        }
      } else new Iterator[InternalRow] {
        private val rowCap = maxFwd + 1
        private val rowRing = new Array[InternalRow](rowCap)
        private var emitIdx = 0L
        private def feedOne(): Unit = {
          if (fedPos < partCount) {
            // hasNext drives the codegen'd BufferedRowIterator's
            // processNext — next() alone is not a legal first call
            if (!it.hasNext) throw new IllegalStateException(
              s"partition shrank between passes: row $fedPos of $partCount")
            val r = it.next()
            rowRing((fedPos % rowCap).toInt) = r.copy()
            ring(slot(fedPos)) = needProj(r).copy()
          } else {
            ring(slot(fedPos)) = nh((fedPos - partCount).toInt)
          }
          fedPos += 1L
        }
        private def ensureFed(): Unit =
          while (fedPos <= emitIdx + maxFwd && fedPos < totalFeed) feedOne()
        override def hasNext: Boolean = emitIdx < partCount
        override def next(): InternalRow = {
          ensureFed()
          val row = rowRing((emitIdx % rowCap).toInt)
          computeAggs(emitIdx)
          emitIdx += 1L
          emit(row)
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalMovingAggExec =
    copy(child = newChild)
}

object GlobalMovingAgg {
  /** Idempotent, race-safe strategy registration — same idiom as the
    * sibling operators. */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    GlobalMovingAgg.synchronized {
      if (!spark.experimental.extraStrategies.contains(GlobalMovingAggStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GlobalMovingAggStrategy
      }
    }
}
