package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, Descending, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Distributed EXACT global rank (r12, VERDICT r11 task 1) — the
  * executable form of the `WindowWhitelist` ENTITY-class entries' scale
  * argument: a global `row_number()` without the single-partition
  * funnel an unpartitioned `WindowExec` forces.
  *
  * The built-in formulation (`row_number().over(Window.orderBy(...))`)
  * funnels EVERY row through one partition for one giant sort — the
  * exact shape the unpartitioned-window audit exists to catch; at
  * 100 TB that partition is the job. This operator is the classic
  * two-pass exact-rank instead, with Catalyst still owning the
  * exchange planning:
  *
  *  1. the physical node declares `OrderedDistribution(order)`, so
  *     EnsureRequirements inserts a RANGE-partitioning exchange
  *     (`repartitionByRange` on the order keys — sampled bounds, all
  *     partitions working) plus per-partition sorts: globally sorted
  *     data, never globally funneled;
  *  2. a lightweight count job reads the sorted shuffle output once to
  *     collect per-partition row COUNTS (partition k's rank offset =
  *     rows in partitions 0..k-1 — a `numPartitions`-sized array on
  *     the driver, independent of data volume);
  *  3. the output pass re-reads the same shuffle files (Spark reuses
  *     map output across jobs) and emits each row with
  *     `offset(partition) + local position + 1`.
  *
  * Rank semantics are `row_number` under `order` (ties broken by
  * physical position): pass a TOTAL order — e.g. a unique key as the
  * last sort column — for deterministic output, the same caveat as
  * `ntile`/`row_number` themselves. Any sortable column type works
  * (decimals, strings, structs): the sort is SortExec's, and the rank
  * pass never inspects the order values.
  *
  * Scale notes: the count job re-runs the per-partition sort (counts
  * ride the sorted plan; a production build would read the exchange's
  * MapOutputStatistics instead of scheduling a job, but those report
  * bytes, not rows). Both passes are embarrassingly parallel; the only
  * driver-side state is the offsets array. Skew on the order keys is
  * the range exchange's sampling problem, identical to a global
  * `ORDER BY`.
  *
  * Reference point: the reference engine numbers its crawl-edge
  * uploads by accumulation order (`web_spider_oo.py:125-128`, the
  * prefix-accumulated upload rank restated by `q_edges_actual`); this
  * is the declarative, partition-parallel form of the same global
  * numbering, generalized to any sort order.
  */
case class GlobalRankNode(order: Seq[SortOrder], rankAttr: AttributeReference,
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  /** `rankAttr` is GENERATED here, not read from the child — without
    * this CheckAnalysis counts it as a missing input attribute. */
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRankNode =
    copy(child = newChild)
}

object GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRankNode(order, rankAttr, child) =>
      GlobalRankExec(order, rankAttr, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GlobalRankExec(order: Seq[SortOrder], rankAttr: AttributeReference,
                          child: SparkPlan) extends UnaryExecNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr

  /** Range exchange + per-partition sort, inserted by
    * EnsureRequirements — partitions tile the global order. */
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  /** Appending a column moves no rows: pass the child's (range)
    * partitioning through so a downstream same-key sort or range
    * operation reuses it instead of re-exchanging. */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override lazy val metrics =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    // pass 1: per-partition counts (the only driver-side state — one
    // Long per partition). Emitted keyed by partition id and re-sorted:
    // collect() already concatenates in partition order, but the rank
    // math must not depend on that detail.
    val counts = rdd
      .mapPartitionsWithIndex((pid, it) => Iterator((pid, it.size.toLong)),
        preservesPartitioning = true)
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val out = output
    val numOutputRows = longMetric("numOutputRows")
    // pass 2: same shuffle output, local position + broadcast offset
    rdd.mapPartitionsWithIndex({ (pid, it) =>
      val proj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)
      var rank = offsets(pid)
      it.map { row =>
        rank += 1L
        rankRow.update(0, rank)
        numOutputRows += 1
        proj(joined(row, rankRow))
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRankExec =
    copy(child = newChild)
}

object GlobalRank {
  /** One sort key: column name + direction (SQL default null ordering —
    * nulls first ascending, nulls last descending, matching
    * `Window.orderBy`). */
  case class Key(col: String, desc: Boolean = false)

  /** Append a global 1-based `row_number` column named `rankName`,
    * ordered by `keys` — distributed: range-partitioned, no
    * single-partition WindowExec anywhere in the plan. Pass a total
    * order (unique last key) for deterministic ranks. */
  def globalRowNumber(df: DataFrame, rankName: String,
                      keys: Seq[Key]): DataFrame = {
    require(keys.nonEmpty, "globalRowNumber needs at least one sort key")
    val spark = df.sparkSession
    // atomic check-then-append, same idiom as TopKPerKey: concurrent
    // first uses must not double-register or drop a racing strategy
    GlobalRank.synchronized {
      if (!spark.experimental.extraStrategies.contains(GlobalRankStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GlobalRankStrategy
      }
    }
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
    // a duplicate output name would resolve ambiguously downstream —
    // refuse now rather than at the caller's next select
    require(!analyzed.output.exists(_.name == rankName),
      s"rank column '$rankName' already exists in the input")
    val rankAttr = AttributeReference(rankName, LongType, nullable = false)()
    GraftSqlBridge.ofRows(spark, GlobalRankNode(order, rankAttr, analyzed))
  }
}
