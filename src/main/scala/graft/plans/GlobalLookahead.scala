package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Distributed global `lead(e, k) IGNORE NULLS` (late r13) — the LAST
  * documented non-rewrite of the offset family, retired by the zipped
  * lead/lag machinery [[GlobalRangeMovingAgg]] introduced.
  *
  * The r12 refusal was row-bounded thinking: the k-th NON-NULL value
  * ahead of a row can be arbitrarily many ROWS ahead (a null run has
  * no bound), so [[GlobalShift]]'s fixed-capacity position ring cannot
  * hold the gap. But the VALUE state is bounded by construction — a
  * row needs exactly the next k non-null values, never the rows
  * between — so the same two-iterator trick applies:
  *
  *  1. pass 1 collects, per partition, its FIRST k non-null values of
  *     the shifted column — at most k narrow values per partition to
  *     the driver, which telescopes them into each partition's
  *     "non-null lookahead tail" (a partition with zero non-nulls
  *     reaches through, exactly like GlobalShift's boundary chains);
  *  2. pass 2 zips the sorted stream with ITSELF: the LEAD iterator
  *     runs ahead pushing (position, value) pairs for non-null values
  *     into a deque, the LAG iterator emits each row with the deque's
  *     k-th entry STRICTLY AHEAD of the row's position (entries at or
  *     behind it retire as the lag advances); when the partition is
  *     exhausted, the driver tail finishes the job. Deque memory is
  *     O(k) VALUES — never the null-run gap, which is the point;
  *  3. a row with fewer than k non-null values ahead evaluates the
  *     built-in's own default expression against the current row.
  *
  * ONE COLUMN per node, on purpose: the deque bound holds because the
  * lead stops the moment THIS column has k values ahead. Two columns
  * sharing one lead iterator desynchronize — the starved column drives
  * the lead arbitrarily far while the other column's values in the gap
  * either overflow a bounded deque or are lost past a capped one — so
  * a window with several `lead IGNORE NULLS` expressions stacks one
  * node per expression (all on the shared range exchange; each adds
  * its own zipped re-read, the price of the bounded state).
  *
  * Tie caveat — the family's usual one, stated sharply because pass 2
  * reads the shuffle twice IN THE SAME TASK: under a non-total order
  * the two reads may interleave equal-key rows differently (shuffle
  * fetch order feeds a non-stable sort), and the positional alignment
  * between lead and lag then refers to two different linearizations.
  * `lead IGNORE NULLS` is tie-order-dependent for the built-in too;
  * pass a TOTAL order (unique last key) for deterministic — and
  * exactly built-in-equal — results, the same contract as
  * row_number/lead/lag everywhere else in the family.
  */
case class GlobalLookaheadNode(order: Seq[SortOrder],
                               attr: AttributeReference,
                               input: Expression,
                               offset: Int,
                               default: Expression,
                               child: LogicalPlan) extends UnaryNode {
  require(offset >= 1, s"lookahead offset must be >= 1, got $offset")
  override def output: Seq[Attribute] = child.output :+ attr
  override def producedAttributes: AttributeSet = AttributeSet(Seq(attr))
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalLookaheadNode =
    copy(child = newChild)
}

object GlobalLookaheadStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalLookaheadNode(order, attr, input, offset, default, child) =>
      GlobalLookaheadExec(order, attr, input, offset, default,
        planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GlobalLookaheadExec(order: Seq[SortOrder],
                               attr: AttributeReference,
                               input: Expression,
                               offset: Int,
                               default: Expression,
                               child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ attr
  override def producedAttributes: AttributeSet = AttributeSet(Seq(attr))

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
    val inputExpr = input
    val defaultExpr = default
    val k = offset
    val dt = input.dataType
    // the LEAD side (and pass 1) read the BASE plan below any stacked
    // lookahead siblings: a stacked node's input expression only
    // references base columns (one Window's expressions never read
    // each other), the siblings append columns without moving rows, and
    // zipping against the base keeps an N-column stack LINEAR in base
    // reads — zipping each node against its direct child would double
    // per level (2^N) (r13 self-review)
    val base = GlobalLookahead.baseBelow(child)
    val baseRdd = if (base eq child) rdd else base.execute()
    val baseOutput = base.output

    // pass 1: the first k NON-NULL values per partition (narrow
    // single-column UnsafeRow copies)
    val heads: Array[Array[UnsafeRow]] =
      baseRdd.mapPartitionsWithIndex({ (pid, it) =>
        val proj = UnsafeProjection.create(Seq(inputExpr), baseOutput)
        val acc = scala.collection.mutable.ArrayBuffer.empty[UnsafeRow]
        while (acc.length < k && it.hasNext) {
          val r = proj(it.next())
          if (!r.isNullAt(0)) acc += r.copy()
        }
        Iterator((pid, acc.toArray))
      }, preservesPartitioning = true).collect().sortBy(_._1).map(_._2)

    // driver: telescope — partition pid's lookahead tail = the first k
    // non-nulls of everything AFTER it (short partitions reach through)
    val nParts = heads.length
    val tails: Array[Array[UnsafeRow]] = {
      val out = new Array[Array[UnsafeRow]](nParts)
      var acc = List.empty[UnsafeRow]
      var pid = nParts - 1
      while (pid >= 0) {
        out(pid) = acc.take(k).toArray
        acc = heads(pid).toList ++ acc
        if (acc.length > k) acc = acc.take(k)
        pid -= 1
      }
      out
    }
    val bcTails = sparkContext.broadcast(tails)

    val out = output
    val numOutputRows = longMetric("numOutputRows")
    // pass 2: zip the (lag) stream with the BASE stream — lead pushes
    // (pos, value) for non-nulls, lag emits its k-th strictly-ahead
    // entry
    rdd.zipPartitions(baseRdd, preservesPartitioning = true) { (lagIt, leadIt) =>
      val pid = org.apache.spark.TaskContext.getPartitionId()
      val leadProj = UnsafeProjection.create(Seq(inputExpr), baseOutput)
      val defaultProj = UnsafeProjection.create(Seq(defaultExpr), childOutput)
      val outProj = UnsafeProjection.create(out, out)
      val joined = new JoinedRow
      val valRow = new GenericInternalRow(1)
      val tail = bcTails.value(pid)

      // deque of (lead position, value); boundary tail entries ride
      // position Long.MaxValue (after every local row)
      final class Entry(val pos: Long, val value: UnsafeRow)
      val deque = new java.util.ArrayDeque[Entry]()
      var tailIdx = 0
      var leadPos = -1L
      var leadDone = false
      def advanceLead(lagPos: Long): Unit = {
        while (!leadDone && deque.size < k) {
          if (leadIt.hasNext) {
            val row = leadIt.next()
            leadPos += 1L
            if (leadPos > lagPos) { // values at or before lag never lead
              val r = leadProj(row)
              if (!r.isNullAt(0)) deque.addLast(new Entry(leadPos, r.copy()))
            }
          } else leadDone = true
        }
        if (leadDone) {
          while (deque.size < k && tailIdx < tail.length) {
            deque.addLast(new Entry(Long.MaxValue, tail(tailIdx)))
            tailIdx += 1
          }
        }
      }

      var lagPos = -1L
      lagIt.map { row =>
        lagPos += 1L
        // retire entries no longer strictly ahead of this row
        while (!deque.isEmpty && deque.peekFirst().pos <= lagPos)
          deque.pollFirst()
        advanceLead(lagPos)
        if (deque.size >= k) {
          // the k-th strictly-ahead non-null value
          val it2 = deque.iterator()
          var i = 1
          var e = it2.next()
          while (i < k) { e = it2.next(); i += 1 }
          valRow.update(0, e.value.get(0, dt))
        } else {
          val d = defaultProj(row)
          valRow.update(0, if (d.isNullAt(0)) null else d.get(0, dt))
        }
        numOutputRows += 1
        outProj(joined(row, valRow))
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalLookaheadExec =
    copy(child = newChild)
}

object GlobalLookahead {

  /** The first non-lookahead plan below a stack of
    * [[GlobalLookaheadExec]] nodes: the shared LEAD-side source. Safe
    * because stacked lookaheads append columns without moving rows and
    * their input expressions only reference the base's columns. */
  private[plans] def baseBelow(p: SparkPlan): SparkPlan = p match {
    case g: GlobalLookaheadExec => baseBelow(g.child)
    case other => other
  }

  /** Idempotent, race-safe strategy registration — same idiom as the
    * sibling operators. */
  def ensureStrategy(spark: org.apache.spark.sql.SparkSession): Unit =
    GlobalLookahead.synchronized {
      if (!spark.experimental.extraStrategies.contains(GlobalLookaheadStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ GlobalLookaheadStrategy
      }
    }
}
