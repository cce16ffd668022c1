package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom whole-operator extension #3: broadcast AS-OF join by hashed
  * binary search — the (c) tier (LogicalPlan + Strategy + SparkPlan)
  * beside [[RangeJoinNode]] and [[graft.plans.TopKPerKeyNode]].
  *
  * Semantics (identical to [[graft.operators.AsOfJoin.asOf]]'s composed
  * union+window form, equivalence spec-pinned): for each left row, the
  * single right row with `rightKey == leftKey` and `rightTime <=
  * leftTime`, latest `rightTime` winning and ties resolving to the
  * greatest `rightTie` — LEFT OUTER, so unmatched left rows null-pad
  * the right side. NULL left keys/times never match (three-valued
  * logic); NULL right keys/times are dropped on build.
  *
  * Physical shape: the right side is dimension-sized by contract
  * (reference tables, quote snapshots); it collects once into a
  * hash-map of per-key arrays sorted by (time, tie), broadcasts, and
  * every probe row does ONE hash lookup + binary search for the last
  * entry with time <= t — O(|L|·log k) with NO shuffle of the probe
  * side at all. The union+window composed form shuffles |L|+|R| once
  * and stays the right plan when BOTH sides are corpus-sized; this
  * operator removes even that shuffle when the right side broadcasts —
  * the same trade [[BroadcastRangeJoinExec]] makes for interval stabs.
  */
case class AsofJoinNode(leftKey: Attribute, leftTime: Attribute,
                        rightKey: Attribute, rightTime: Attribute,
                        rightTie: Attribute,
                        left: LogicalPlan, right: LogicalPlan)
    extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoinNode(lk, lt, rk, rt, tie, l, r) =>
      BroadcastAsofJoinExec(lk, lt, rk, rt, tie, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class BroadcastAsofJoinExec(leftKey: Attribute, leftTime: Attribute,
                                 rightKey: Attribute, rightTime: Attribute,
                                 rightTie: Attribute,
                                 left: SparkPlan, right: SparkPlan)
    extends BinaryExecNode {
  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def doExecute(): RDD[InternalRow] = {
    val tOrd = TopKHeap.orderingFor(rightTime.dataType)
    val tieOrd = TopKHeap.orderingFor(rightTie.dataType)
    val boundK = BindReferences.bindReference(rightKey: Expression, right.output)
    val boundT = BindReferences.bindReference(rightTime: Expression, right.output)
    val boundTie = BindReferences.bindReference(rightTie: Expression, right.output)
    // dimension-sized by contract: collect, bucket per key, sort by (time, tie)
    val collected = right.executeCollect()
    val byKey = new java.util.HashMap[Any, scala.collection.mutable.ArrayBuffer[(Any, Any, InternalRow)]]()
    collected.foreach { r =>
      val k = boundK.eval(r); val t = boundT.eval(r)
      if (k != null && t != null) {
        var buf = byKey.get(k)
        if (buf == null) {
          buf = scala.collection.mutable.ArrayBuffer.empty[(Any, Any, InternalRow)]
          byKey.put(k, buf)
        }
        buf += ((t, boundTie.eval(r), r.copy()))
      }
    }
    val sortedByKey = new java.util.HashMap[Any, (Array[Any], Array[InternalRow])]()
    byKey.forEach { (k, buf) =>
      val s = buf.sortWith { case ((t1, e1, _), (t2, e2, _)) =>
        if (tOrd.equiv(t1, t2)) tieOrd.lt(e1, e2) else tOrd.lt(t1, t2)
      }
      sortedByKey.put(k, (s.map(_._1).toArray, s.map(_._3).toArray))
    }
    val bc = sparkContext.broadcast(sortedByKey)
    val (lk, lt, leftOut, outAttrs) = (leftKey, leftTime, left.output, output)
    val rightArity = right.output.size
    left.execute().mapPartitions { iter =>
      val map = bc.value
      val boundLk = BindReferences.bindReference(lk: Expression, leftOut)
      val boundLt = BindReferences.bindReference(lt: Expression, leftOut)
      val pOrd = TopKHeap.orderingFor(lt.dataType)
      val joined = new JoinedRow
      val nullRight = new GenericInternalRow(rightArity)
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      iter.map { lrow =>
        val k = boundLk.eval(lrow)
        val t = boundLt.eval(lrow)
        val entry = if (k == null || t == null) null else map.get(k)
        if (entry == null) proj(joined(lrow, nullRight))
        else {
          val (times, rows) = entry
          // last index with time <= t; (time, tie)-sorted arrays make it
          // automatically the max-tie row of that time
          var a = 0; var b = times.length - 1; var idx = -1
          while (a <= b) {
            val mid = (a + b) >>> 1
            if (pOrd.lteq(times(mid), t)) { idx = mid; a = mid + 1 }
            else b = mid - 1
          }
          if (idx < 0) proj(joined(lrow, nullRight))
          else proj(joined(lrow, rows(idx)))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastAsofJoinExec =
    copy(left = newLeft, right = newRight)
}

object AsofJoinNative {
  /** Left-outer as-of join with a broadcast-sized right side: every left
    * row picks the latest right row (per key) at or before its time;
    * ties on time resolve to the greatest `rightTie`. Left/right time
    * columns must share one orderable type. */
  def asofJoin(left: DataFrame, right: DataFrame,
               leftKey: String, rightKey: String,
               leftTime: String, rightTime: String,
               rightTie: String): DataFrame = {
    val spark = left.sparkSession
    // atomic check-then-append (the RangeJoin/TopKPerKey discipline)
    AsofJoinNative.synchronized {
      if (!spark.experimental.extraStrategies.contains(AsofJoinStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ AsofJoinStrategy
      }
    }
    val l = left.queryExecution.analyzed
    val r = right.queryExecution.analyzed
    def attr(plan: LogicalPlan, n: String): Attribute =
      plan.output.filter(_.name == n) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(s"no column $n")
        case many => throw new IllegalArgumentException(
          s"ambiguous column $n: ${many.size} matches — disambiguate first")
      }
    require(attr(l, leftTime).dataType == attr(r, rightTime).dataType,
      "left and right time columns must share one data type")
    GraftSqlBridge.ofRows(spark,
      AsofJoinNode(attr(l, leftKey), attr(l, leftTime),
        attr(r, rightKey), attr(r, rightTime), attr(r, rightTie), l, r))
  }
}
