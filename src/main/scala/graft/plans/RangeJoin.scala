package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Custom whole-operator extension #2: broadcast POINT-IN-INTERVAL join
  * by binary search — the (c) tier (LogicalPlan + Strategy + SparkPlan)
  * applied to the join Spark plans worst.
  *
  * For `points JOIN intervals ON p BETWEEN lo AND hi` with no equality
  * conjunct, Catalyst's only option is BroadcastNestedLoopJoin: every
  * point row probes EVERY interval row — O(n·m) compares. This operator
  * broadcasts the interval side SORTED by `lo` with a running
  * prefix-max of `hi`, and each point row binary-searches the last
  * interval with lo ≤ p, then scans left only while the prefix-max
  * proves a match can still exist — O(n·(log m + k)) for k matches,
  * the classic augmented-sorted-array interval stab.
  *
  * The interval side is dimension-sized by contract (IP-range tables,
  * validity windows, rate brackets — the production uses of a stab
  * join); the point side streams unshuffled. Rows with NULL point, lo
  * or hi are dropped (same as the BETWEEN predicate's three-valued
  * logic in an inner join).
  *
  * Degenerate worst case: nested intervals all containing p cost O(m)
  * per probe (the prefix-max cannot prune) — the same rows BNLJ
  * touches, never more compares.
  *
  * Registered through `spark.experimental.extraStrategies` (lazily, by
  * [[RangeJoin.pointInInterval]]) like [[TopKPerKey]].
  */
case class RangeJoinNode(point: Attribute, lo: Attribute, hi: Attribute,
                         left: LogicalPlan, right: LogicalPlan)
    extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): RangeJoinNode =
    copy(left = newLeft, right = newRight)
}

object RangeJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case RangeJoinNode(p, lo, hi, l, r) =>
      BroadcastRangeJoinExec(p, lo, hi, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class BroadcastRangeJoinExec(point: Attribute, lo: Attribute,
                                  hi: Attribute, left: SparkPlan,
                                  right: SparkPlan) extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def doExecute(): RDD[InternalRow] = {
    val ord = TopKHeap.orderingFor(point.dataType)
    val boundLo = BindReferences.bindReference(lo: Expression, right.output)
    val boundHi = BindReferences.bindReference(hi: Expression, right.output)
    // dimension-sized by contract: collect, sort by lo, prefix-max of hi
    val collected = right.executeCollect()
    val triples = collected.flatMap { r =>
      val lv = boundLo.eval(r); val hv = boundHi.eval(r)
      if (lv == null || hv == null) None else Some((lv, hv, r.copy()))
    }.sortBy(_._1)(ord)
    val loVals = triples.map(_._1)
    val hiVals = triples.map(_._2)
    val rows = triples.map(_._3)
    val maxHi = new Array[Any](triples.length)
    var i = 0
    while (i < triples.length) {
      maxHi(i) = if (i == 0) hiVals(0)
      else if (ord.gteq(hiVals(i), maxHi(i - 1))) hiVals(i)
      else maxHi(i - 1)
      i += 1
    }
    val bc = sparkContext.broadcast((loVals, hiVals, maxHi, rows))
    val (pointAttr, leftOut, outAttrs) = (point, left.output, output)
    left.execute().mapPartitions { iter =>
      val (los, his, mhs, rrows) = bc.value
      val boundP = BindReferences.bindReference(pointAttr: Expression, leftOut)
      val pOrd = TopKHeap.orderingFor(pointAttr.dataType)
      val joined = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      iter.flatMap { lrow =>
        val pv = boundP.eval(lrow)
        if (pv == null || los.isEmpty) Iterator.empty
        else {
          // last index with lo <= pv
          var a = 0; var b = los.length - 1; var idx = -1
          while (a <= b) {
            val mid = (a + b) >>> 1
            if (pOrd.lteq(los(mid), pv)) { idx = mid; a = mid + 1 }
            else b = mid - 1
          }
          if (idx < 0) Iterator.empty
          else {
            val lcopy = lrow.copy()
            new Iterator[InternalRow] {
              private var j = idx
              private var ready = advance()
              private def advance(): Boolean = {
                while (j >= 0 && pOrd.gteq(mhs(j), pv)) {
                  if (pOrd.gteq(his(j), pv)) return true
                  j -= 1
                }
                false
              }
              override def hasNext: Boolean = ready
              override def next(): InternalRow = {
                val out = proj(joined(lcopy, rrows(j)))
                j -= 1; ready = advance()
                out
              }
            }
          }
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): BroadcastRangeJoinExec =
    copy(left = newLeft, right = newRight)
}

object RangeJoin {
  /** Inner point-in-interval join: each `points` row matches every
    * `intervals` row with loCol ≤ pointCol ≤ hiCol. The interval side
    * must be broadcast-sized; point/lo/hi must share a supported
    * orderable type (numeric, string, date, timestamp). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      pointCol: String, loCol: String,
                      hiCol: String): DataFrame = {
    val spark = points.sparkSession
    // check-then-append must be atomic: two first-uses racing here could
    // double-register or momentarily drop another thread's strategy
    RangeJoin.synchronized {
      if (!spark.experimental.extraStrategies.contains(RangeJoinStrategy)) {
        spark.experimental.extraStrategies =
          spark.experimental.extraStrategies :+ RangeJoinStrategy
      }
    }
    val l = points.queryExecution.analyzed
    val r = intervals.queryExecution.analyzed
    def attr(plan: LogicalPlan, n: String): Attribute =
      plan.output.filter(_.name == n) match {
        case Seq(a) => a
        case Seq() => throw new IllegalArgumentException(s"no column $n")
        case many => throw new IllegalArgumentException(
          s"ambiguous column $n: ${many.size} matches — disambiguate first")
      }
    require(attr(l, pointCol).dataType == attr(r, loCol).dataType &&
      attr(r, loCol).dataType == attr(r, hiCol).dataType,
      "point, lo and hi must share one data type")
    GraftSqlBridge.ofRows(spark,
      RangeJoinNode(attr(l, pointCol), attr(r, loCol), attr(r, hiCol), l, r))
  }
}
