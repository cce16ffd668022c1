package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
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
  *    columns (e.g. the wide html payload) are never built.
  *
  * Usage: `spark.read.format("graft-pages").option("rows", n)
  * .option("parts", p).load()`.
  */
class PagesSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-pages"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    PagesTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new PagesTable(
      Option(properties.get("rows")).map(_.toLong).getOrElse(1000L),
      Option(properties.get("parts")).map(_.toInt).getOrElse(4))
}

object PagesTable {
  val schema: StructType = StructType(Seq(
    StructField("page_id", LongType, nullable = false),
    StructField("url", StringType, nullable = false),
    StructField("html", StringType, nullable = false)))
  def url(i: Long): String = s"https://site.example/p/$i"
  def html(i: Long, rows: Long): String = {
    val a = (2 * i + 1) % rows
    val b = (3 * i + 2) % rows
    s"""<html><body><a href="/p/$a">x</a> <a href="/p/$b">y</a></body></html>"""
  }
}

class PagesTable(rows: Long, parts: Int) extends Table with SupportsRead {
  override def name(): String = s"graft_pages($rows)"
  override def schema(): StructType = PagesTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new PagesScanBuilder(rows, parts)
}

class PagesScanBuilder(rows: Long, parts: Int) extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {
  private var lo = 0L
  private var hi = rows
  private var pushed = Array.empty[Filter]
  private var required: StructType = PagesTable.schema

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
  override def build(): Scan = new PagesScan(lo, hi, parts, rows, required)
}

class PagesScan(lo: Long, hi: Long, parts: Int, rows: Long,
                required: StructType) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  // surfaced in explain() — makes the pushed range visible in the plan
  override def description(): String =
    s"PagesScan[lo=$lo, hi=$hi, cols=${required.fieldNames.mkString(",")}]"
  override def planInputPartitions(): Array[InputPartition] = {
    val n = math.max(1, parts)
    val span = math.max(0L, hi - lo)
    (0 until n).map { p =>
      PagesPartition(lo + span * p / n, lo + span * (p + 1) / n,
        rows): InputPartition
    }.toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new PagesReaderFactory(required, rows)
}

case class PagesPartition(start: Long, end: Long, rows: Long)
  extends InputPartition

class PagesReaderFactory(required: StructType, rows: Long)
    extends PartitionReaderFactory {
  override def createReader(
      partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[PagesPartition]
    new PartitionReader[InternalRow] {
      private var i = p.start - 1
      override def next(): Boolean = { i += 1; i < p.end }
      override def get(): InternalRow = {
        val vals: Seq[Any] = required.fieldNames.toSeq.map {
          case "page_id" => i
          case "url"     => UTF8String.fromString(PagesTable.url(i))
          case "html"    => UTF8String.fromString(PagesTable.html(i, rows))
          case other => throw new IllegalArgumentException(
            s"unknown column $other")
        }
        InternalRow.fromSeq(vals)
      }
      override def close(): Unit = ()
    }
  }
}
