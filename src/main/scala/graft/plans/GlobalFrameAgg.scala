package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, BindReferences, GenericInternalRow, JoinedRow, SpecificInternalRow, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateFunction, DeclarativeAggregate, ImperativeAggregate, TypedImperativeAggregate}
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
  *  1. pass 1 computes each partition's FULL aggregation buffer — one
  *     small buffer per partition to the driver, exactly a map-side
  *     partial aggregate;
  *  2. the driver merges the partials into ONE final value per
  *     function — the reduce side, on `numPartitions` buffers instead
  *     of the data;
  *  3. pass 2 re-maps the same child RDD and streams every row out
  *     joined with the constant values — no sort, no exchange, no
  *     buffering.
  *
  * The node requires NO distribution and NO ordering: it preserves the
  * child's partitioning and sort order untouched, so it stacks under
  * or over the ordered siblings on their one range exchange when a
  * window node mixes families (cumulative + total for a running
  * share), and costs nothing extra when it stands alone.
  *
  * Two function kinds run here, each through its own Catalyst
  * machinery so type behavior matches the built-in by construction:
  *
  *  - ORDER-INSENSITIVE [[DeclarativeAggregate]]s (the rewrite rule's
  *    shared allowlist: sum/min/max/count/avg, the moments, bit/bool
  *    reducers) via initial/update/merge/evaluate projections;
  *  - BOUNDED-SKETCH [[TypedImperativeAggregate]]s (late r12:
  *    approx_count_distinct's HLL++, approx_percentile's GK summary —
  *    the rewrite rule's sketch allowlist) via initialize/update/
  *    serialize/merge/eval. The buffers are sketch-sized by
  *    construction — this is exactly the WindowWhitelist's documented
  *    "at 100 TB the same statistic runs via approx_percentile"
  *    alternative, executed. HLL++ registers are maxima, so its result
  *    is bit-identical to the single-task built-in under ANY
  *    partitioning; a GK summary's merge is order-sensitive within its
  *    rank-error bound, so approx_percentile is deterministic for a
  *    fixed partitioning and within the bound across partitionings —
  *    the same property Spark's own partial-aggregate approx_percentile
  *    has.
  *
  * first_value/last_value stay out of BOTH kinds here: whole-frame
  * first/last depend on the global order, which this family never
  * establishes.
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
                              funcs: Seq[AggregateFunction],
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
                              funcs: Seq[AggregateFunction],
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

    // per-function partial machinery, declarative or imperative
    // (fixed-width like HLL++, or typed/serialized like the GK
    // percentile summary): both produce one UnsafeRow buffer per
    // partition
    def boundImperative(f: ImperativeAggregate): ImperativeAggregate =
      BindReferences.bindReference(
        f.withNewMutableAggBufferOffset(0).withNewInputAggBufferOffset(0),
        childOutput).asInstanceOf[ImperativeAggregate]

    // pass 1: one full-partition buffer per function (map-side partial)
    val partials: Array[Array[UnsafeRow]] =
      rdd.mapPartitions({ it =>
        val decl = funcsArr.map {
          case d: DeclarativeAggregate => d
          case _ => null
        }
        val imp = funcsArr.map {
          case t: ImperativeAggregate => boundImperative(t)
          case _ => null
        }
        val buffers: Array[SpecificInternalRow] = funcsArr.zipWithIndex.map {
          case (f, j) =>
            if (decl(j) != null) AggPlumbing.newBuffer(decl(j))
            else {
              val b = new SpecificInternalRow(f.aggBufferAttributes.map(_.dataType))
              imp(j).initialize(b)
              b
            }
        }
        val upds = funcsArr.zipWithIndex.map { case (f, j) =>
          if (decl(j) == null) null
          else {
            val p = AggPlumbing.updateProj(decl(j), childOutput)
            p.target(buffers(j)); p
          }
        }
        val joins = Array.fill(nFuncs)(new JoinedRow)
        it.foreach { row =>
          var i = 0
          while (i < nFuncs) {
            if (upds(i) != null) upds(i)(joins(i)(buffers(i), row))
            else imp(i).update(buffers(i), row)
            i += 1
          }
        }
        Iterator(funcsArr.zipWithIndex.map { case (f, j) =>
          imp(j) match {
            case t: TypedImperativeAggregate[_] =>
              t.serializeAggregateBufferInPlace(buffers(j))
            case _ => ()
          }
          UnsafeProjection.create(f.aggBufferAttributes.map(_.dataType).toArray)
            .apply(buffers(j)).copy()
        })
      }, preservesPartitioning = true).collect()

    // driver: merge every partial into ONE final VALUE per function
    // (the allowlisted functions are order-insensitive — or, for the
    // GK sketch, order-robust within its rank-error bound — so
    // partition order is as good as any), shipped to pass 2 as
    // 1-field UnsafeRows
    val finals: Array[UnsafeRow] = Array.tabulate(nFuncs) { j =>
      val value: Any = funcsArr(j) match {
        case d: DeclarativeAggregate =>
          val acc = AggPlumbing.newBuffer(d)
          val merge = AggPlumbing.mergeProj(d)
          merge.target(acc)
          val join = new JoinedRow
          partials.foreach { bufs => merge(join(acc, bufs(j))) }
          val evalRow = new SpecificInternalRow(Seq(d.dataType))
          AggPlumbing.evalProj(d).target(evalRow)(acc)
          if (evalRow.isNullAt(0)) null else evalRow.get(0, d.dataType)
        case t: ImperativeAggregate =>
          val f = boundImperative(t)
          val acc = new SpecificInternalRow(f.aggBufferAttributes.map(_.dataType))
          f.initialize(acc)
          partials.foreach { bufs => f.merge(acc, bufs(j)) }
          f.eval(acc)
      }
      val proj = UnsafeProjection.create(Array(dataTypes(j)))
      proj(new GenericInternalRow(Array(value))).copy()
    }

    val out = output
    val numOutputRows = longMetric("numOutputRows")
    // pass 2: stream rows joined with the constant aggregate values
    rdd.mapPartitions({ it =>
      val proj = UnsafeProjection.create(out, out)
      val aggRow = new GenericInternalRow(nFuncs)
      var j = 0
      while (j < nFuncs) {
        aggRow.update(j,
          if (finals(j).isNullAt(0)) null else finals(j).get(0, dataTypes(j)))
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
