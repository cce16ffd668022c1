package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, AttributeSet, Descending, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{Distribution, OrderedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

/** Distributed EXACT global rank (r12, VERDICT r11 task 1) — the
  * executable form of the `WindowWhitelist` ENTITY-class entries' scale
  * argument: the global rank-window family without the single-partition
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
  *     collect per-partition row COUNTS (and, when a dense_rank column
  *     is requested, per-partition tie-GROUP counts) — partition k's
  *     offsets are the sums over partitions 0..k-1, a
  *     `numPartitions`-sized array on the driver, independent of data
  *     volume;
  *  3. the output pass re-reads the same shuffle files (Spark reuses
  *     map output across jobs) and emits each row's requested rank
  *     columns from `offset(partition) + local position / local group`.
  *
  * Tie semantics are sound WITHOUT any cross-partition negotiation
  * because range partitioning maps a given order-key VALUE to exactly
  * one partition (the exchange's partitioner binary-searches the
  * sampled bounds per key): a tie group can never straddle a partition
  * boundary, so a group's first row — the row whose global position IS
  * the group's `rank` — is always local, and per-partition group counts
  * telescope into exact global `dense_rank` offsets the same way row
  * counts telescope into `row_number` offsets.
  *
  * Supported rank columns ([[GlobalRank.RankMode]]), any subset in ONE
  * pass over one shuffle:
  *  - `RowNumber` — global 1-based position (ties broken by physical
  *    position; pass a TOTAL order for determinism, the same caveat as
  *    the built-in);
  *  - `Rank` / `DenseRank` — SQL-standard tie-aware forms (equal order
  *    keys share a value; gaps / no gaps);
  *  - `PercentRank` — `(rank - 1) / (n - 1)` as DOUBLE (0.0 for n <= 1),
  *    the built-in's definition — `n` is the pass-1 total, free;
  *  - `CumeDist` — `|rows <= current| / n` as DOUBLE. The numerator is
  *    the position of the row's tie-group END, which pass 2 cannot know
  *    before consuming the group — so requesting CumeDist buffers ONE
  *    tie group of rows at a time (copies). Memory is bounded by the
  *    largest tie group, a strict improvement on the built-in
  *    WindowExec, which buffers the ENTIRE input in its single
  *    partition; the non-CumeDist modes keep the zero-buffer streaming
  *    path;
  *  - `NTile(k)` — SQL-standard bucket fill (first `n mod k` buckets
  *    take one extra row), pure integer arithmetic on (position, n).
  *
  * Scale notes: the count pass (r13) reads the UNSORTED exchange
  * output below the EnsureRequirements SortExec — row counts are
  * sort-invariant — and skips the last partition unless a mode needs
  * the global total, so pass 1 streams shuffle files without sorting;
  * the per-partition sort runs once, in pass 2 (the sorted scan
  * remains only for dense_rank's tie-group counts). One counting job
  * is the floor — this is RDD.zipWithIndex's own structure, and
  * MapOutputStatistics reports bytes, not rows — unless the engine
  * owned the exchange itself, which would forfeit EnsureRequirements
  * and AQE. Both passes are embarrassingly parallel; the only
  * driver-side state is two Longs per partition. Tie detection costs
  * one key projection per row and one small-row copy per GROUP (not
  * per row), and is skipped entirely when only RowNumber/NTile columns
  * are requested. Skew on the order keys is the range exchange's
  * sampling problem, identical to a global `ORDER BY`.
  *
  * Reference point: the reference engine numbers its crawl-edge
  * uploads by accumulation order (`web_spider_oo.py:125-128`, the
  * prefix-accumulated upload rank restated by `q_edges_actual`); this
  * is the declarative, partition-parallel form of the same global
  * numbering, generalized to any sort order and the full rank family.
  */
case class GlobalRankNode(order: Seq[SortOrder], ranks: Seq[GlobalRank.RankCol],
                          child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output ++ ranks.map(_.attr)
  /** rank attrs are GENERATED here, not read from the child — without
    * this CheckAnalysis counts them as missing input attributes. */
  override def producedAttributes: AttributeSet =
    AttributeSet(ranks.map(_.attr))
  override protected def withNewChildInternal(newChild: LogicalPlan): GlobalRankNode =
    copy(child = newChild)
}

object GlobalRankStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case GlobalRankNode(order, ranks, child) =>
      GlobalRankExec(order, ranks, planLater(child)) :: Nil
    case _ => Nil
  }
}

case class GlobalRankExec(order: Seq[SortOrder], ranks: Seq[GlobalRank.RankCol],
                          child: SparkPlan) extends UnaryExecNode {
  import GlobalRank.RankMode

  override def output: Seq[Attribute] = child.output ++ ranks.map(_.attr)

  /** Range exchange + per-partition sort, inserted by
    * EnsureRequirements — partitions tile the global order. */
  override def requiredChildDistribution: Seq[Distribution] =
    OrderedDistribution(order) :: Nil
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(order)
  override def outputOrdering: Seq[SortOrder] = order
  /** Appending columns moves no rows: pass the child's (range)
    * partitioning through so a downstream same-key sort or range
    * operation reuses it instead of re-exchanging. */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override lazy val metrics =
    Map("numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"))

  override protected def doExecute(): RDD[InternalRow] = {
    val rdd = child.execute()
    val modes = ranks.map(_.mode).toArray
    val needGroups = modes.contains(RankMode.DenseRank)
    val needCume = modes.contains(RankMode.CumeDist)
    val needTies = needGroups || needCume || modes.contains(RankMode.Rank) ||
      modes.contains(RankMode.PercentRank)
    val keyExprs = order.map(_.child)
    val keyTypes = keyExprs.map(_.dataType)
    val childOutput = child.output
    // pass 1: per-partition (row count, tie-group count) — the only
    // driver-side state, two Longs per partition. This is
    // RDD.zipWithIndex's own structure: partition k's offset needs the
    // counts of 0..k-1, which no public shuffle statistic exposes
    // per-partition in rows (MapOutputStatistics is bytes), so one
    // counting pass over the shuffle output is the floor WITHOUT
    // forfeiting the EnsureRequirements-planned exchange. What the r13
    // pass removed (VERDICT r12 task 5) is the count job's RE-SORT and
    // its last task:
    //  - group counting (dense_rank only) genuinely needs the sorted
    //    stream and keeps the sorted scan;
    //  - plain row counts are sort-INVARIANT, so they read the
    //    exchange output BELOW the EnsureRequirements SortExec
    //    ([[GlobalRank.preSortSource]]) — the count job streams
    //    shuffle files without sorting anything;
    //  - and, like zipWithIndex, the LAST partition is not counted at
    //    all unless a mode needs the global total (percent_rank /
    //    cume_dist / ntile).
    val needTotal = modes.exists {
      case RankMode.PercentRank | RankMode.CumeDist | RankMode.NTile(_) => true
      case _ => false
    }
    val stats: Array[(Long, Long)] = if (needGroups) {
      // sorted scan (emitted keyed by partition id and re-sorted:
      // collect() already concatenates in partition order, but the
      // rank math must not depend on that detail)
      rdd.mapPartitionsWithIndex({ (pid, it) =>
        val keyProj = UnsafeProjection.create(keyExprs, childOutput)
        // tie = compare(prevKey, key) == 0; equality is
        // direction-invariant, so the natural ascending ordering serves
        // any sort direction
        val ord = RowOrdering.createNaturalAscendingOrdering(keyTypes)
        var rows = 0L
        var groups = 0L
        var prev: UnsafeRow = null
        it.foreach { row =>
          rows += 1L
          val k = keyProj(row)
          if (prev == null || ord.compare(prev, k) != 0) {
            groups += 1L
            prev = k.copy()
          }
        }
        Iterator((pid, (rows, groups)))
      }, preservesPartitioning = true).collect().sortBy(_._1).map(_._2)
    } else {
      // reuse the already-built RDD when there is no SortExec to skip —
      // SparkPlan.execute() is not memoized, and re-executing a stacked
      // graft child would re-run its own pass-1 driver jobs (r13
      // self-review)
      val countRdd = GlobalRank.preSortSource(child) match {
        case same if same eq child => rdd
        case preSort => preSort.execute()
      }
      val n = countRdd.getNumPartitions
      val parts = if (needTotal || n == 0) 0 until n else 0 until (n - 1)
      val counts = new Array[Long](n) // uncounted tail stays 0 (unused)
      val counted = sparkContext.runJob(countRdd,
        (it: Iterator[InternalRow]) => {
          var c = 0L
          while (it.hasNext) { it.next(); c += 1L }
          c
        }, parts)
      parts.zip(counted).foreach { case (p, c) => counts(p) = c }
      counts.map((_, 0L))
    }
    val rowOffsets = stats.map(_._1).scanLeft(0L)(_ + _)
    val groupOffsets = stats.map(_._2).scanLeft(0L)(_ + _)
    // structural invariant (ADVICE r13/r14): the fast count path skips
    // the last partition when neither needTotal nor needGroups, leaving
    // rowOffsets.last silently stale. A bare -1L sentinel would flow
    // into percent_rank/ntile arithmetic as an absurd-but-silent value,
    // so the total-consuming modes assert the precondition up front —
    // a future mode that reads `total` without extending needTotal now
    // fails at plan time, not with negative denominators
    require(!modes.exists {
        case RankMode.PercentRank | RankMode.CumeDist | RankMode.NTile(_) => true
        case _ => false
      } || needTotal || needGroups,
      "GlobalRankExec: a total-consuming rank mode is present but the " +
        "count pass was planned without needTotal/needGroups")
    val total = if (needTotal || needGroups) rowOffsets.last else -1L
    val out = output
    val nRanks = modes.length
    val numOutputRows = longMetric("numOutputRows")
    // pass 2: same shuffle output, local position / group + broadcast
    // offsets → every requested rank column in one scan
    rdd.mapPartitionsWithIndex({ (pid, it) =>
      val proj = UnsafeProjection.create(out, out)
      val keyProj = if (needTies) UnsafeProjection.create(keyExprs, childOutput) else null
      val ord = if (needTies) RowOrdering.createNaturalAscendingOrdering(keyTypes) else null
      val joined = new JoinedRow
      val rankRow = new GenericInternalRow(nRanks)
      def emit(row: InternalRow, pos: Long, curRank: Long, dense: Long,
               groupEnd: Long): InternalRow = {
        var i = 0
        while (i < nRanks) {
          modes(i) match {
            case RankMode.RowNumber => rankRow.update(i, pos)
            case RankMode.Rank => rankRow.update(i, curRank)
            case RankMode.DenseRank => rankRow.update(i, dense)
            case RankMode.PercentRank => rankRow.update(i,
              if (total <= 1L) 0.0 else (curRank - 1L).toDouble / (total - 1L).toDouble)
            case RankMode.CumeDist => rankRow.update(i,
              groupEnd.toDouble / total.toDouble)
            case RankMode.NTile(k) => rankRow.update(i, GlobalRank.ntileOf(pos, total, k))
          }
          i += 1
        }
        numOutputRows += 1
        proj(joined(row, rankRow))
      }
      if (!needCume) {
        // streaming path: zero row buffering, one key copy per group
        var pos = rowOffsets(pid)
        var curRank = 0L
        var dense = groupOffsets(pid)
        var prevKey: UnsafeRow = null
        it.map { row =>
          pos += 1L
          if (needTies) {
            val k = keyProj(row)
            if (prevKey == null || ord.compare(prevKey, k) != 0) {
              curRank = pos
              dense += 1L
              prevKey = k.copy() // one copy per GROUP, not per row
            }
          }
          emit(row, pos, curRank, dense, 0L)
        }
      } else {
        // cume_dist path: the numerator is the group END position, so
        // buffer ONE tie group of row copies at a time — memory bounds
        // at the largest tie group (the built-in buffers the whole
        // input in its single partition)
        new Iterator[InternalRow] {
          private var groupRows: Array[InternalRow] = Array.empty
          private var idx = 0
          private var pos = rowOffsets(pid)
          private var curRank = 0L
          private var dense = groupOffsets(pid)
          private var groupEnd = 0L
          // first row of the NEXT group, already pulled while scanning
          // for the current group's end
          private var pendingRow: InternalRow = null
          private var pendingKey: UnsafeRow = null
          private def loadNextGroup(): Unit = {
            val buf = scala.collection.mutable.ArrayBuffer.empty[InternalRow]
            var key: UnsafeRow = null
            if (pendingRow != null) {
              buf += pendingRow; key = pendingKey
              pendingRow = null; pendingKey = null
            } else {
              val r = it.next()
              key = keyProj(r).copy(); buf += r.copy()
            }
            var open = true
            while (open && it.hasNext) {
              val r = it.next()
              val k = keyProj(r)
              if (ord.compare(key, k) == 0) buf += r.copy()
              else { pendingRow = r.copy(); pendingKey = k.copy(); open = false }
            }
            curRank = pos + 1L
            dense += 1L
            groupEnd = pos + buf.length
            groupRows = buf.toArray
            idx = 0
          }
          override def hasNext: Boolean =
            idx < groupRows.length || pendingRow != null || it.hasNext
          override def next(): InternalRow = {
            if (idx >= groupRows.length) loadNextGroup()
            val row = groupRows(idx)
            idx += 1
            pos += 1L
            emit(row, pos, curRank, dense, groupEnd)
          }
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): GlobalRankExec =
    copy(child = newChild)
}

object GlobalRank {

  /** The plan whose rows the row-COUNT pass should read: the child of
    * the EnsureRequirements-inserted per-partition SortExec (possibly
    * inside its WholeStageCodegen pipeline) when one is directly on
    * top — per-partition row counts are sort-invariant, and skipping
    * the sort makes the count job a pure stream over shuffle files.
    * Any other child shape (e.g. a stacked Global* operator that
    * already satisfies the ordering) is returned as-is. Intra-partition
    * sorts never move rows across partitions (SortExec with
    * global=false preserves partitioning), so the counts are exactly
    * pass 2's. */
  private[plans] def preSortSource(child: SparkPlan): SparkPlan = child match {
    case s: org.apache.spark.sql.execution.SortExec if !s.global => s.child
    case w: org.apache.spark.sql.execution.WholeStageCodegenExec =>
      w.child match {
        case s: org.apache.spark.sql.execution.SortExec if !s.global => s.child
        case _ => child
      }
    case _ => child
  }

  /** One sort key: column name + direction (SQL default null ordering —
    * nulls first ascending, nulls last descending, matching
    * `Window.orderBy`). */
  case class Key(col: String, desc: Boolean = false)

  /** Which rank statistic a [[RankCol]] computes; `dataType` is the
    * emitted column type (LONG for the integral forms — this operator
    * exists for row counts past 2^31 — DOUBLE for percent_rank). */
  sealed trait RankMode extends Serializable { def dataType: DataType = LongType }
  object RankMode {
    case object RowNumber extends RankMode
    case object Rank extends RankMode
    case object DenseRank extends RankMode
    case object PercentRank extends RankMode { override def dataType: DataType = DoubleType }
    case object CumeDist extends RankMode { override def dataType: DataType = DoubleType }
    final case class NTile(buckets: Int) extends RankMode {
      require(buckets >= 1, s"ntile buckets must be >= 1, got $buckets")
    }
  }

  /** One output rank column: the generated attribute + its statistic. */
  case class RankCol(attr: AttributeReference, mode: RankMode)

  /** SQL-standard ntile bucket of global position `pos` (1-based) among
    * `n` rows in `k` buckets: first `n mod k` buckets take
    * `n div k + 1` rows. The ELSE branch divides by `n div k` — only
    * reachable when pos exceeds rem*(q+1), impossible for n < k, so the
    * divisor is >= 1 there. */
  def ntileOf(pos: Long, n: Long, k: Int): Long = {
    val q = n / k
    val rem = n % k
    if (pos <= rem * (q + 1L)) (pos - 1L) / (q + 1L) + 1L
    else rem + (pos - 1L - rem * (q + 1L)) / q + 1L
  }

  /** Idempotent, race-safe strategy registration — same idiom as
    * TopKPerKey: concurrent first uses must not double-register or drop
    * a racing strategy. */
  def ensureStrategy(spark: SparkSession): Unit = GlobalRank.synchronized {
    if (!spark.experimental.extraStrategies.contains(GlobalRankStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ GlobalRankStrategy
    }
  }

  /** Append a global 1-based `row_number` column named `rankName`,
    * ordered by `keys` — distributed: range-partitioned, no
    * single-partition WindowExec anywhere in the plan. Pass a total
    * order (unique last key) for deterministic ranks. */
  def globalRowNumber(df: DataFrame, rankName: String,
                      keys: Seq[Key]): DataFrame =
    globalRanks(df, Seq(rankName -> RankMode.RowNumber), keys)

  /** Append any subset of the global rank family in ONE two-pass
    * operator over one range shuffle: `cols` names each output column
    * and its statistic, all computed under the same `keys` order. */
  def globalRanks(df: DataFrame, cols: Seq[(String, RankMode)],
                  keys: Seq[Key]): DataFrame = {
    require(keys.nonEmpty, "globalRanks needs at least one sort key")
    require(cols.nonEmpty, "globalRanks needs at least one rank column")
    val spark = df.sparkSession
    ensureStrategy(spark)
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
    val dup = cols.groupBy(_._1).collect { case (n, cs) if cs.size > 1 => n }
    require(dup.isEmpty, s"duplicate rank column name(s): ${dup.mkString(", ")}")
    cols.foreach { case (n, _) =>
      require(!analyzed.output.exists(_.name == n),
        s"rank column '$n' already exists in the input")
    }
    val ranks = cols.map { case (n, m) =>
      RankCol(AttributeReference(n, m.dataType, nullable = false)(), m)
    }
    GraftSqlBridge.ofRows(spark, GlobalRankNode(order, ranks, analyzed))
  }
}
