package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{LongType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 source that REPORTS ITS PARTITIONING
  * (`SupportsReportPartitioning` + `HasPartitionKey`) — the
  * storage-partitioned-join (SPJ) contract modern lakehouse tables
  * (Iceberg/Delta) implement.
  *
  * Each input partition carries exactly one key group and exposes that
  * key via [[HasPartitionKey]]; the scan declares
  * `KeyGroupedPartitioning(identity(k), groups)`. When BOTH join sides
  * report compatible key-grouped partitioning (and
  * `spark.sql.sources.v2.bucketing.enabled` is on), Catalyst plans the
  * join with ZERO Exchange — co-location comes from STORAGE, not a
  * shuffle. This is the source-level counterpart of
  * [[graft.core.Bucketing]]'s warehouse bucketing: at 100 TB the join's
  * shuffle is paid never, not once — the table layout IS the
  * distribution (KeyedSourceSpec pins the shuffle-free plan).
  *
  * Data is a deterministic formula (row i of group g: k = g,
  * v = (g·mult + 7·i) mod 1000), so a DuckDB oracle reconstructs the
  * same table from `generate_series` — the source's values sit under
  * the same bit-exact gate as every parquet-backed query.
  *
  * Options: groups (key groups = partitions), rowsPerGroup, mult.
  */
class KeyedSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-keyed"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KeyedTable.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new KeyedTable(
      Option(opts.get("groups")).map(_.toInt).getOrElse(8),
      Option(opts.get("rowsPerGroup")).map(_.toLong).getOrElse(100L),
      Option(opts.get("mult")).map(_.toLong).getOrElse(31L))
  }
}

object KeyedTable {
  val schema: StructType = StructType(Seq(
    StructField("k", LongType, nullable = false),
    StructField("v", LongType, nullable = false)))
  def value(g: Long, i: Long, mult: Long): Long = (g * mult + 7L * i) % 1000L
}

class KeyedTable(groups: Int, rowsPerGroup: Long, mult: Long) extends Table
    with SupportsRead {
  override def name(): String = s"graft_keyed($groups x $rowsPerGroup)"
  override def schema(): StructType = KeyedTable.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new KeyedScan(groups, rowsPerGroup, mult)
    }
}

/** One partition per key group; the partition key IS the group key. */
case class KeyedPartition(g: Long, rowsPerGroup: Long, mult: Long)
    extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(g)
}

class KeyedScan(groups: Int, rowsPerGroup: Long, mult: Long)
    extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = KeyedTable.schema
  override def toBatch: Batch = this

  /** The SPJ declaration: rows are clustered by identity(k) into
    * `groups` partitions — EnsureRequirements can satisfy a join's
    * ClusteredDistribution(k) directly from this, no Exchange. */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(Array(Expressions.identity("k")), groups)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until groups)
      .map(g => KeyedPartition(g.toLong, rowsPerGroup, mult): InputPartition)
      .toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
        val kp = p.asInstanceOf[KeyedPartition]
        new PartitionReader[InternalRow] {
          private var i = -1L
          override def next(): Boolean = { i += 1; i < kp.rowsPerGroup }
          override def get(): InternalRow =
            InternalRow(kp.g, KeyedTable.value(kp.g, i, kp.mult))
          override def close(): Unit = ()
        }
      }
    }
}
