package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, GenericInternalRow, JoinedRow, MutableProjection, SpecificInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.DeclarativeAggregate
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Distributed WHOLE-FRAME global aggregate (r12) — the fifth and
  * simplest global-window family after [[GlobalRank]], [[GlobalShift]],
  * [[GlobalRunningAgg]] and [[GlobalMovingAgg]]: `agg(e) OVER ()` or
  * `agg(e) OVER (... ROWS|RANGE BETWEEN UNBOUNDED PRECEDING AND
  * UNBOUNDED FOLLOWING)` — the ratio-to-total / share-of-whole shape —
  * with ZERO shuffle.
  *
  * The whole-frame value is one constant: the aggregate of the entire
  * input, attached to every row. WindowExec computes it by moving ALL
  * data to one partition, sorting it (even though no order matters),
  * and buffering the whole input in that single task — the worst plan
  * shape in the engine for what is semantically a scalar. Here:
  *
  *  1. pass 1 computes each partition's FULL aggregation buffer with
  *     the function's own Catalyst `DeclarativeAggregate` update
  *     projection — one small buffer per partition to the driver,
  *     exactly a map-side partial aggregate;
  *  2. the driver merges the partials with the function's own
  *     `mergeExpressions` into ONE final buffer per function — the
  *     reduce side, on `numPartitions` buffers instead of the data;
  *  3. pass 2 re-maps the same child RDD, evaluates the final buffers
  *     once per partition, and streams every row out joined with the
  *     constant values — no sort, no exchange, no buffering.
  *
  * The node requires NO distribution and NO ordering: it preserves the
  * child's partitioning and sort order untouched, so it stacks under
  * or over the ordered siblings on their one range exchange when a
  * window node mixes families (cumulative + total for a running
  * share), and costs nothing extra when it stands alone.
  *
  * Restricted to ORDER-INSENSITIVE aggregates (the rewrite rule's
  * shared allowlist: sum/min/max/count/avg, the moments, bit/bool
  * reducers): without an ordering requirement the driver merge order
  * is partition order, not data order, so first_value/last_value
  * whole-frame windows (which DO depend on the order even over the
  * full frame) stay on WindowExec. The functions run their own
  * update/merge/evaluate expressions, so type behavior (decimal
  * widening, ANSI overflow, null-skipping) is identical to the
  * built-in by construction; the floating-point reassociation caveat
  * is the same as every Spark partial aggregation.
  *
  * Cost note for 100 TB: the two passes read the child twice. When the
  * child is shuffle output (stacked with an ordered sibling, or any
  * upstream exchange) pass 2 re-reads shuffle files, not the source;
  * on a bare scan it is a second parallel scan — 2x parallel I/O
  * against the built-in's one task sorting and buffering the entire
  * input, which is not a contest at scale.
  *
  * Parallel-seq layout for the same reason as the siblings: QueryPlan
  * only collects top-level Expression fields into `references`, and
  * hiding `funcs` in carrier objects would let ColumnPruning strip the
  * aggregated columns from the child.
  */
case class GlobalFrameAggNode(attrs: Seq[AttributeReference],
                              funcs: Seq[DeclarativeAggregate],
                              child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ attrs
  override def producedAttributes: AttributeSet = AttributeSet(attrs)
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalFrameAggNode =
    copy(child = newChild)
}

object GlobalFrameAggStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalFrameAggNode(attrs, funcs, child) =>
      GlobalFrameAggExec(attrs, funcs, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GlobalFrameAggExec(attrs: Seq[AttributeReference],
                              funcs: Seq[DeclarativeAggregate],
                              child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ attrs
  override def producedAttributes: AttributeSet = AttributeSet(attrs)

  // requires nothing, changes nothing: the constant attaches to rows
  // wherever they already live, in whatever order they already are
  override def outputOrdering: Seq[org.apache.spark.sql.catalyst.expressions.SortOrder] =
    child.outputOrdering
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
    val dataTypes = funcsArr.map(_.dataType)

    def newBuffers(): Array[SpecificInternalRow] = funcsArr.map { f =>
      val b = new SpecificInternalRow(f.aggBufferAttributes.map(_.dataType))
      val init = MutableProjection.create(f.initialValues, Nil)
      init.target(b)(InternalRow.empty)
      b
    }
    def toUnsafe(f: DeclarativeAggregate): UnsafeProjection =
      UnsafeProjection.create(f.aggBufferAttributes, f.aggBufferAttributes)

    // pass 1: one full-partition buffer per function (map-side partial)
    val partials: Array[Array[UnsafeRow]] =
      rdd.mapPartitions({ it =>
        val buffers = newBuffers()
        val upds = funcsArr.zipWithIndex.map { case (f, j) =>
          val p = MutableProjection.create(f.updateExpressions,
            f.aggBufferAttributes ++ childOutput)
          p.target(buffers(j)); p
        }
        val joins = Array.fill(nFuncs)(new JoinedRow)
        it.foreach { row =>
          var i = 0
          while (i < nFuncs) { upds(i)(joins(i)(buffers(i), row)); i += 1 }
        }
        Iterator(funcsArr.zip(buffers).map { case (f, b) => toUnsafe(f)(b).copy() })
      }, preservesPartitioning = true).collect()

    // driver: merge every partial into ONE final buffer per function
    // (allowlisted functions are order-insensitive, so partition order
    // is as good as any)
    val finals: Array[UnsafeRow] = {
      val accs = newBuffers()
      val merges = funcsArr.zipWithIndex.map { case (f, j) =>
        val p = MutableProjection.create(f.mergeExpressions,
          f.aggBufferAttributes ++ f.inputAggBufferAttributes)
        p.target(accs(j)); p
      }
      val joins = Array.fill(nFuncs)(new JoinedRow)
      partials.foreach { bufs =>
        var i = 0
        while (i < nFuncs) { merges(i)(joins(i)(accs(i), bufs(i))); i += 1 }
      }
      funcsArr.zip(accs).map { case (f, b) => toUnsafe(f)(b).copy() }
    }

    val out = output
    val numOutputRows = longMetric("numOutputRows")
    // pass 2: evaluate once per partition, stream rows joined with the
    // constant aggregate values
    rdd.mapPartitions({ it =>
      val proj = UnsafeProjection.create(out, out)
      val aggRow = new GenericInternalRow(nFuncs)
      var j = 0
      while (j < nFuncs) {
        val f = funcsArr(j)
        val evalRow = new SpecificInternalRow(Seq(f.dataType))
        val eval = MutableProjection.create(Seq(f.evaluateExpression),
          f.aggBufferAttributes)
        eval.target(evalRow)(finals(j))
        aggRow.update(j,
          if (evalRow.isNullAt(0)) null else evalRow.get(0, dataTypes(j)))
        j += 1
      }
      val joined = new JoinedRow
      it.map { row =>
        numOutputRows += 1
        proj(joined(row, aggRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalFrameAggExec =
    copy(child = newChild)
}

object GlobalFrameAgg {
  /** Idempotent, race-safe strategy registration — same idiom as the
    * sibling operators. */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    GlobalFrameAgg.synchronized {
      if (!spark.experimental.extraStrategies.contains(GlobalFrameAggStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GlobalFrameAggStrategy
      }
    }
}
