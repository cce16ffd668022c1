package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{MetadataColumn, SupportsMetadataColumns, SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2: a deterministic synthetic page-graph table —
  * the source-extension tier of the engine (reference §2.1's HTTP
  * source re-imagined as a batch connector; the politeness/retry
  * parameters of `web_spider_oo.py:228-249` are connector config, not
  * dataflow). Each page's html carries two outlinks `(2i+1) % rows` and
  * `(3i+2) % rows`, so downstream link extraction is exercised on a
  * source the engine fully controls.
  *
  * Demonstrates the three scan contracts that matter at 100 TB:
  *  - partition planning: the id range splits into `parts` independent
  *    splits, so the scan parallelizes with no driver materialization;
  *  - filter pushdown ([[SupportsPushDownFilters]]): page_id range
  *    predicates clamp the generated range itself — filtered rows are
  *    never produced, not produced-then-dropped;
  *  - column pruning ([[SupportsPushDownRequiredColumns]]): unrequested
  *    columns (e.g. the wide html payload) are never built;
  *  - limit / top-N pushdown ([[SupportsPushDownLimit]] /
  *    [[SupportsPushDownTopN]], r7): `LIMIT n` clamps the generated
  *    range itself, and `ORDER BY page_id LIMIT n` is answered by the
  *    ordered range prefix with Spark's sort+limit removed entirely —
  *    at 100 TB the difference between "peek at a table" costing one
  *    partition and costing a full scan.
  *
  * Usage: `spark.read.format("graft-pages").option("rows", n)
  * .option("parts", p).load()`.
  */
class PagesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pages"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagesTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    // properties keep the caller's key case — normalize before lookup
    val opts = new CaseInsensitiveStringMap(properties)
    new PagesTable(
      Option(opts.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(opts.get("parts")).map(_.toInt).getOrElse(4),
      Option(opts.get("batchRows")).map(_.toLong).getOrElse(0L))
  }
}

object PagesTable {
  val schema: StructType = StructType(Seq(
    StructField("page_id", LongType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("html", StringType, nullable = false)))
  /** Connector METADATA columns ([[SupportsMetadataColumns]], r9) — the
    * DSv2 twin of the file source's `_metadata` (and of Iceberg's
    * `_file`/`_pos`): hidden columns a query can project by name that
    * describe WHERE a row came from, not what it contains.
    *  - `_split_id`: index of the planned input partition that
    *    generated the row;
    *  - `_pos_in_split`: 0-based ordinal of the row within that split.
    * They ride the normal pruning path: unselected, they are never
    * generated; selected, `pruneColumns` receives them appended to the
    * read schema and the reader emits them per-row. */
  val splitIdCol = "_split_id"
  val posInSplitCol = "_pos_in_split"
  val metadataSchema: StructType = StructType(Seq(
    StructField(splitIdCol, IntegerType, nullable = false),
    StructField(posInSplitCol, LongType, nullable = false)))
  def url(i: Long): String = s"https://site.example/p/$i"
  def html(i: Long, rows: Long): String = {
    val a = (2 * i + 1) % rows
    val b = (3 * i + 2) % rows
    s"""<html><body><a href="/p/$a">x</a> <a href="/p/$b">y</a></body></html>"""
  }
  /** Proportional [lo, hi) split shared by the batch and streaming scans. */
  def split(lo: Long, hi: Long, parts: Int,
            rows: Long): Array[InputPartition] = {
    val n = math.max(1, parts)
    val span = math.max(0L, hi - lo)
    (0 until n).map { p =>
      PagesPartition(lo + span * p / n, lo + span * (p + 1) / n,
        rows, p): InputPartition
    }.toArray
  }
}

class PagesTable(rows: Long, parts: Int, batchRows: Long) extends Table
    with SupportsRead with SupportsMetadataColumns {
  override def name(): String = s"graft_pages($rows)"
  override def schema(): StructType = PagesTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def metadataColumns(): Array[MetadataColumn] =
    PagesTable.metadataSchema.fields.map { f =>
      new MetadataColumn {
        override def name(): String = f.name
        override def dataType(): org.apache.spark.sql.types.DataType =
          f.dataType
        override def isNullable: Boolean = false
        override def comment(): String =
          if (f.name == PagesTable.splitIdCol)
            "index of the input split that generated the row"
          else "0-based row ordinal within its split"
      }
    }
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagesScanBuilder(rows, parts, batchRows)
}

class PagesScanBuilder(rows: Long, parts: Int, batchRows: Long)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns
    with SupportsPushDownAggregates
    with SupportsPushDownLimit with SupportsPushDownTopN
    with SupportsPushDownOffset {
  import org.apache.spark.sql.connector.expressions.{Expression => V2Expr, NamedReference, SortDirection, SortOrder => V2SortOrder}
  import org.apache.spark.sql.connector.expressions.aggregate._

  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required: StructType = PagesTable.schema
  private var agg: Option[Aggregation] = None
  private var limited = false

  /** LIMIT pushdown: the generator is an ordered id range, so "any
    * `limit` rows" is the prefix — clamp the range and no row beyond it
    * is ever GENERATED (a file source can at best stop reading early;
    * here the work itself disappears). Guarded against the aggregate
    * path: a completely-pushed aggregate must see the full range. */
  override def pushLimit(limit: Int): Boolean =
    agg.isEmpty && {
      hi = math.min(hi, lo + math.max(0, limit)); limited = true; true
    }
  override def isPartiallyPushed(): Boolean = false

  /** OFFSET pushdown: skip the first `offset` ids of the (already
    * filter-clamped) range — Spark pushes the offset BEFORE the limit
    * for `LIMIT n OFFSET m`, so the composition lands on
    * [lo+m, lo+m+n). Declined on the aggregate path like the limit. */
  override def pushOffset(offset: Int): Boolean =
    agg.isEmpty && {
      lo = math.min(hi, lo + math.max(0, offset)); limited = true; true
    }

  /** ORDER BY page_id ASC LIMIT n pushdown: the prefix of the clamped
    * range IS the top-N, already in order (partitions are contiguous
    * ascending ranges). Any other sort key/direction is declined and
    * Spark keeps its own sort. */
  override def pushTopN(orders: Array[V2SortOrder], limit: Int): Boolean = {
    val pageIdAsc = orders.length == 1 &&
      isPageId(orders.head.expression) &&
      orders.head.direction == SortDirection.ASCENDING
    agg.isEmpty && pageIdAsc && {
      hi = math.min(hi, lo + math.max(0, limit)); limited = true; true
    }
  }

  private def isPageId(e: V2Expr): Boolean = e match {
    case f: NamedReference => f.fieldNames.sameElements(Array("page_id"))
    case _ => false
  }
  private def supportedAgg(f: AggregateFunc): Boolean = f match {
    case _: CountStar => true
    case c: Count => !c.isDistinct && isPageId(c.column)
    case m: Min => isPageId(m.column)
    case m: Max => isPageId(m.column)
    case _ => false
  }

  /** COUNT(*)/COUNT/MIN/MAX over page_id are closed-form on the clamped
    * [lo, hi) range — COMPLETE pushdown: the scan returns one row of
    * final values and Spark plans no aggregation at all above it. */
  override def supportCompletePushDown(aggregation: Aggregation): Boolean =
    aggregation.groupByExpressions.isEmpty &&
      aggregation.aggregateExpressions.forall(supportedAgg)

  override def pushAggregation(aggregation: Aggregation): Boolean =
    supportCompletePushDown(aggregation) && { agg = Some(aggregation); true }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (handled, residual) = filters.partition {
      case EqualTo("page_id", _: Number) => true
      case LessThan("page_id", _: Number) => true
      case LessThanOrEqual("page_id", _: Number) => true
      case GreaterThan("page_id", _: Number) => true
      case GreaterThanOrEqual("page_id", _: Number) => true
      case _ => false
    }
    handled.foreach {
      case EqualTo("page_id", v: Number) =>
        lo = math.max(lo, v.longValue); hi = math.min(hi, v.longValue + 1)
      case LessThan("page_id", v: Number) => hi = math.min(hi, v.longValue)
      case LessThanOrEqual("page_id", v: Number) =>
        hi = math.min(hi, v.longValue + 1)
      case GreaterThan("page_id", v: Number) =>
        lo = math.max(lo, v.longValue + 1)
      case GreaterThanOrEqual("page_id", v: Number) =>
        lo = math.max(lo, v.longValue)
      case _ =>
    }
    pushed = handled
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = agg match {
    case Some(a) => new PagesAggScan(lo, hi, a)
    case None    => new PagesScan(lo, hi, parts, rows, required, batchRows,
      limited)
  }
}

/** Scan for a completely-pushed aggregation: emits ONE row of final
  * values computed in closed form from the clamped id range — no page
  * row is ever generated. */
class PagesAggScan(lo: Long, hi: Long,
    agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
    extends Scan with Batch {
  import org.apache.spark.sql.connector.expressions.aggregate._

  private val span = math.max(0L, hi - lo)
  override def readSchema(): StructType = StructType(
    agg.aggregateExpressions.zipWithIndex.map { case (f, i) =>
      StructField(s"agg_$i", LongType, nullable = !f.isInstanceOf[CountStar])
    })
  override def toBatch: Batch = this
  override def description(): String =
    s"PagesAggScan[lo=$lo, hi=$hi, " +
      s"aggs=${agg.aggregateExpressions.map(_.toString).mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] =
    Array(PagesPartition(0, 1, 0, 0))
  override def createReaderFactory(): PartitionReaderFactory = {
    val values: Array[Any] = agg.aggregateExpressions.map {
      case _: CountStar => span: Any
      case _: Count     => span: Any
      case _: Min       => if (span > 0) (lo: Any) else null
      case _: Max       => if (span > 0) (hi - 1: Any) else null
      case other => throw new IllegalStateException(s"unsupported $other")
    }
    new SingleRowReaderFactory(values)
  }
}

class SingleRowReaderFactory(values: Array[Any])
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private var emitted = false
      override def next(): Boolean = { val r = !emitted; emitted = true; r }
      override def get(): InternalRow = InternalRow.fromSeq(values.toSeq)
      override def close(): Unit = ()
    }
}

class PagesScan(lo: Long, hi: Long, parts: Int, rows: Long,
                required: StructType, batchRows: Long,
                limited: Boolean = false) extends Scan with Batch
    with SupportsRuntimeFiltering
    with org.apache.spark.sql.connector.read.SupportsReportStatistics
    with org.apache.spark.sql.connector.read.SupportsReportOrdering {
  import org.apache.spark.sql.connector.expressions.{Expressions, NamedReference, SortDirection, NullOrdering}

  /** Every partition emits ids ascending (range partitions count up;
    * runtime-filtered id lists are sorted before splitting), so the
    * scan truthfully reports a per-partition `page_id ASC` ordering —
    * Spark then elides per-partition sorts on it instead of re-sorting
    * data that is ordered by construction. */
  override def outputOrdering()
      : Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    if (required.fieldNames.contains("page_id"))
      Array(Expressions.sort(Expressions.column("page_id"),
        SortDirection.ASCENDING, NullOrdering.NULLS_FIRST))
    else Array.empty

  /** Post-pushdown statistics: the optimizer sees the CLAMPED range, so
    * a pushed `page_id` predicate shrinks the reported size and a join
    * against the filtered scan can qualify for broadcast on stats the
    * source computed in closed form (no files to measure). String
    * widths are SAMPLED from the actual generator (dataType.defaultSize
    * pegs every string at 20 B, which undersells the html payload and
    * could green-light broadcasting a too-large side). */
  override def estimateStatistics()
      : org.apache.spark.sql.connector.read.Statistics =
    new org.apache.spark.sql.connector.read.Statistics {
      private val n = math.max(0L, hi - lo)
      private val sampleIds: Seq[Long] =
        Seq(lo, lo + n / 3, lo + 2 * n / 3, hi - 1).distinct
      private def avgLen(gen: Long => String): Long =
        sampleIds.map(i => gen(i).length.toLong).sum / sampleIds.length
      // n == 0 guard: html(i, rows) takes `% rows`, so sampling an empty
      // table (rows=0) would divide by zero during PLANNING
      private val width = if (n == 0) 0L else required.fields.map { f =>
        f.name match {
          case "url"  => avgLen(PagesTable.url)
          case "html" => avgLen(PagesTable.html(_, rows))
          case _      => f.dataType.defaultSize.toLong
        }
      }.sum
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(n * math.max(1L, width))
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.of(n)
    }

  // runtime (post-planning) page_id pruning fed by joins at execution
  // time — the DSv2 form of dynamic partition pruning: a broadcast dim's
  // key set arrives as an In filter and clamps what this scan generates
  private var keep: Option[Array[Long]] = None
  private var rlo = lo
  private var rhi = hi

  override def filterAttributes(): Array[NamedReference] =
    Array(Expressions.column("page_id"))
  override def filter(filters: Array[Filter]): Unit = filters.foreach {
    case org.apache.spark.sql.sources.In("page_id", vs) =>
      val ids = vs.collect { case n: Number => n.longValue() }
        .filter(v => v >= rlo && v < rhi).sorted
      keep = Some(ids)
      if (ids.nonEmpty) { rlo = ids.head; rhi = ids.last + 1 }
      else { rhi = rlo }
    case _ =>
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new PagesMicroBatchStream(lo, hi, rows, parts, required,
      if (batchRows > 0) batchRows else hi - lo)
  // surfaced in explain() — makes the pushed range visible in the plan
  override def description(): String =
    s"PagesScan[lo=$lo, hi=$hi, cols=${required.fieldNames.mkString(",")}" +
      (if (limited) ", limitPushed=true" else "") + "]"
  override def planInputPartitions(): Array[InputPartition] = keep match {
    case Some(ids) =>
      // enumerate exactly the runtime-filtered ids, split proportionally
      val n = math.max(1, math.min(parts, ids.length))
      (0 until n).map { p =>
        PagesIdListPartition(
          ids.slice(ids.length * p / n, ids.length * (p + 1) / n), rows, p)
          : InputPartition
      }.toArray
    case None => PagesTable.split(rlo, rhi, parts, rows)
  }
  override def createReaderFactory(): PartitionReaderFactory =
    // batch reads are vectorized; the streaming path (below) stays
    // row-based — micro-batch planning asks the factory per scan
    new PagesReaderFactory(required, rows, columnar = true)

  /** DSv2 custom metrics (r7): the scan reports how many pages it
    * actually GENERATED into the SQL UI — post-pushdown observability
    * (a clamped/limit-pushed/runtime-filtered scan shows the shrunken
    * count, making "did the pushdown work" a dashboard read instead of
    * a plan autopsy). Readers report per-task values; this SUM metric
    * aggregates them. */
  override def supportedCustomMetrics()
      : Array[org.apache.spark.sql.connector.metric.CustomMetric] =
    Array(new PagesGeneratedMetric)
}

class PagesGeneratedMetric
    extends org.apache.spark.sql.connector.metric.CustomSumMetric {
  override def name(): String = "pagesGenerated"
  override def description(): String = "pages generated by the scan"
}

case class PagesGeneratedTaskMetric(v: Long)
    extends org.apache.spark.sql.connector.metric.CustomTaskMetric {
  override def name(): String = "pagesGenerated"
  override def value(): Long = v
}

case class PagesIdListPartition(ids: Array[Long], rows: Long,
                                splitId: Int)
  extends InputPartition

// splitId has NO default (r10): `_split_id` provenance must be threaded
// from every construction site — a missed site is a compile error, not a
// silent -1 in the metadata column.
case class PagesPartition(start: Long, end: Long, rows: Long,
                          splitId: Int)
  extends InputPartition

/** Offset = exclusive upper bound of page ids emitted so far. */
case class PagesOffset(v: Long)
    extends org.apache.spark.sql.connector.read.streaming.Offset {
  override def json(): String = v.toString
}

/** Micro-batch form of the connector: at most `batchRows` pages per
  * trigger until the table is exhausted — the crawl-as-stream shape
  * (reference §2.10's per-depth frontier, re-expressed as a bounded
  * streaming source). Implements [[SupportsTriggerAvailableNow]] (the
  * admission-control API every rate-limited production source uses —
  * the same contract as `maxFilesPerTrigger`): `latestOffset(start, _)`
  * bounds each batch from the engine-supplied start, so it is stateless
  * and idempotent, while `reportLatestOffset` exposes the true end so
  * run-to-completion triggers know when to stop. Offsets are plain id
  * bounds; restarts resume from the checkpointed offset exactly-once. */
class PagesMicroBatchStream(lo: Long, hi: Long, rows: Long, parts: Int,
                            required: StructType, batchRows: Long)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming.SupportsTriggerAvailableNow {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit}

  override def initialOffset(): Offset = PagesOffset(lo)
  override def getDefaultReadLimit: ReadLimit = ReadLimit.allAvailable()
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-control variant latestOffset(start, limit) is used")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    PagesOffset(math.min(hi,
      start.asInstanceOf[PagesOffset].v + math.max(1L, batchRows)))
  override def reportLatestOffset(): Offset = PagesOffset(hi)
  override def prepareForTriggerAvailableNow(): Unit = ()
  override def deserializeOffset(json: String): Offset =
    PagesOffset(json.toLong)
  override def planInputPartitions(start: Offset,
                                   end: Offset): Array[InputPartition] =
    PagesTable.split(start.asInstanceOf[PagesOffset].v,
      end.asInstanceOf[PagesOffset].v, parts, rows)
  override def createReaderFactory(): PartitionReaderFactory =
    new PagesReaderFactory(required, rows)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

/** JVM-local counter of rows actually generated — lets specs prove that
  * runtime filtering reached the readers (rows are never produced, not
  * produced-then-dropped). local-mode introspection only. */
object PagesSourceMetrics {
  val rowsProduced = new java.util.concurrent.atomic.AtomicLong
}

class PagesReaderFactory(required: StructType, rows: Long,
                         columnar: Boolean = false)
    extends PartitionReaderFactory {
  import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
  import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}

  /** Vectorized BATCH read path (r7): rows are generated straight into
    * column vectors in 4096-row batches, so the scan feeds whole-stage
    * codegen through ColumnarToRow exactly like the Parquet vectorized
    * reader — the custom-connector form of the "keep the hot path
    * columnar" rule. The streaming scan keeps the row reader (micro-
    * batches are admission-sized anyway). */
  override def supportColumnarReads(partition: InputPartition): Boolean =
    columnar

  override def createColumnarReader(
      partition: InputPartition): PartitionReader[ColumnarBatch] = {
    val (ids: Iterator[Long], splitId: Int) = partition match {
      case p: PagesPartition => (Iterator.range(p.start, p.end), p.splitId)
      case p: PagesIdListPartition => (p.ids.iterator, p.splitId)
    }
    new PartitionReader[ColumnarBatch] {
      private val capacity = 4096
      private var generated = 0L
      private val vectors =
        OnHeapColumnVector.allocateColumns(capacity, required)
      private val batch =
        new ColumnarBatch(vectors.map(v => v: ColumnVector))
      override def currentMetricsValues()
          : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
        Array(PagesGeneratedTaskMetric(generated))
      override def next(): Boolean = {
        if (!ids.hasNext) return false
        vectors.foreach(_.reset())
        var n = 0
        while (n < capacity && ids.hasNext) {
          val i = ids.next()
          required.fieldNames.zipWithIndex.foreach { case (f, c) =>
            f match {
              case "page_id" => vectors(c).putLong(n, i)
              case "url" =>
                val b = PagesTable.url(i)
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8)
                vectors(c).putByteArray(n, b)
              case "html" =>
                val b = PagesTable.html(i, rows)
                  .getBytes(java.nio.charset.StandardCharsets.UTF_8)
                vectors(c).putByteArray(n, b)
              case PagesTable.splitIdCol => vectors(c).putInt(n, splitId)
              case PagesTable.posInSplitCol =>
                // rows emitted by earlier batches + offset in this one
                vectors(c).putLong(n, generated + n)
              case other => throw new IllegalArgumentException(
                s"unknown column $other")
            }
          }
          n += 1
        }
        PagesSourceMetrics.rowsProduced.addAndGet(n)
        generated += n
        batch.setNumRows(n)
        true
      }
      override def get(): ColumnarBatch = batch
      override def close(): Unit = batch.close()
    }
  }

  private def mkRow(i: Long, splitId: Int, pos: Long): InternalRow = {
    PagesSourceMetrics.rowsProduced.incrementAndGet()
    val vals: Seq[Any] = required.fieldNames.toSeq.map {
      case "page_id" => i
      case "url"     => UTF8String.fromString(PagesTable.url(i))
      case "html"    => UTF8String.fromString(PagesTable.html(i, rows))
      case PagesTable.splitIdCol => splitId
      case PagesTable.posInSplitCol => pos
      case other => throw new IllegalArgumentException(
        s"unknown column $other")
    }
    InternalRow.fromSeq(vals)
  }

  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case p: PagesPartition =>
        new PartitionReader[InternalRow] {
          private var i = p.start - 1
          override def next(): Boolean = { i += 1; i < p.end }
          override def get(): InternalRow = mkRow(i, p.splitId, i - p.start)
          override def close(): Unit = ()
          override def currentMetricsValues()
              : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
            Array(PagesGeneratedTaskMetric(math.max(0L, i - p.start)))
        }
      case p: PagesIdListPartition =>
        new PartitionReader[InternalRow] {
          private var idx = -1
          override def next(): Boolean = { idx += 1; idx < p.ids.length }
          override def get(): InternalRow = mkRow(p.ids(idx), p.splitId, idx)
          override def close(): Unit = ()
          override def currentMetricsValues()
              : Array[org.apache.spark.sql.connector.metric.CustomTaskMetric] =
            Array(PagesGeneratedTaskMetric(math.max(0, idx)))
        }
    }
}
