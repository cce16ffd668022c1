package graft.sources

import java.util
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** Custom DataSource V2 WRITE path (`graft-memsink`): the staged-commit
  * contract every exactly-once batch sink implements. Each task buffers
  * its rows and surfaces them only in its [[WriterCommitMessage]]; the
  * driver-side [[BatchWrite.commit]] publishes ALL tasks' rows
  * atomically — a half-failed job publishes nothing (abort discards),
  * and a speculated/retried task can commit at most once because only
  * the messages the driver received participate. This is the JDBC/file
  * committer shape (reference K1's append sink) reduced to an in-memory
  * store so the semantics are spec-assertable without external state.
  *
  * Usage: `df.write.format("graft-memsink").option("key", k).save()`;
  * read back via [[MemSinkStore.get]].
  */
class MemSink extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-memsink"
  // write-only source: schema comes from the DataFrame being written
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    new StructType()
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new MemSinkTable(schema, Option(opts.get("key")).getOrElse("default"))
  }
}

object MemSinkStore {
  private val store = new ConcurrentHashMap[String, Seq[Seq[Any]]]()
  // java.lang.Long, NOT scala Long: compute's remapping function sees
  // null for an absent key, and a primitive-typed map would silently
  // unbox that null to 0 — making epoch 0 look already-committed
  private val epochs = new ConcurrentHashMap[String, java.lang.Long]()
  def get(key: String): Option[Seq[Seq[Any]]] = Option(store.get(key))
  def clear(key: String): Unit = { store.remove(key); epochs.remove(key) }
  /** Last epoch committed to `key` by the streaming write path (-1 if
    * none) — the restart/replay ledger a real sink keeps in the target
    * system (e.g. a `(sink_key, epoch)` row in the JDBC database). */
  def lastEpoch(key: String): Long =
    Option(epochs.get(key)).map(_.longValue).getOrElse(-1L)
  /** Append semantics (SaveMode.Append / AppendData): merge with prior
    * contents atomically; `truncate` first for overwrite semantics. */
  private[sources] def publish(key: String, rows: Seq[Seq[Any]],
                               truncate: Boolean): Unit =
    store.compute(key, (_, prior) =>
      if (truncate || prior == null) rows else prior ++ rows)
  /** Exactly-once epoch commit: publish `rows` unless this epoch (or a
    * later one) already landed for `key` — a replayed micro-batch after
    * a restart commits as a no-op, which is the whole idempotence
    * contract of [[MemSinkStreamingWrite]]. Returns whether the epoch
    * was fresh. */
  private[sources] def publishEpoch(key: String, epochId: Long,
                                    rows: Seq[Seq[Any]],
                                    truncate: Boolean): Boolean = {
    var fresh = false
    epochs.compute(key, (_, prior) =>
      if (prior != null && prior.longValue >= epochId) prior
      else {
        fresh = true; publish(key, rows, truncate)
        java.lang.Long.valueOf(epochId)
      })
    fresh
  }
}

class MemSinkTable(schema: StructType, key: String) extends Table
    with SupportsWrite {
  override def name(): String = s"graft_memsink($key)"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_WRITE,
      TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new WriteBuilder with SupportsTruncate {
      private var doTruncate = false
      override def truncate(): WriteBuilder = { doTruncate = true; this }
      override def build(): Write = {
        // nested values returned by InternalRow.get alias engine-reused
        // buffers and are not Serializable — refuse loudly rather than
        // corrupt silently
        info.schema().fields.foreach { f =>
          import org.apache.spark.sql.types.{ArrayType, MapType, StructType => ST}
          val nested = f.dataType match {
            case _: ArrayType | _: MapType | _: ST => true
            case _ => false
          }
          require(!nested,
            s"graft-memsink supports atomic column types only; " +
              s"'${f.name}' is ${f.dataType.simpleString}")
        }
        val t = doTruncate
        new Write {
          override def toBatch: BatchWrite =
            new MemSinkBatchWrite(key, info.schema(), t)
          override def toStreaming:
              org.apache.spark.sql.connector.write.streaming.StreamingWrite =
            new MemSinkStreamingWrite(key, info.schema(), t)
        }
      }
    }
}

/** Rows captured by one task, surfaced only at task commit. */
case class MemSinkCommit(rows: Seq[Seq[Any]]) extends WriterCommitMessage

class MemSinkBatchWrite(key: String, schema: StructType,
                        truncate: Boolean) extends BatchWrite {
  override def createBatchWriterFactory(
      info: PhysicalWriteInfo): DataWriterFactory =
    new MemSinkWriterFactory(schema)
  // driver-side atomic publish: either every task's rows land, or none
  override def commit(messages: Array[WriterCommitMessage]): Unit =
    MemSinkStore.publish(key,
      messages.toSeq.flatMap(_.asInstanceOf[MemSinkCommit].rows), truncate)
  override def abort(messages: Array[WriterCommitMessage]): Unit = ()
}

/** DSv2 STREAMING write (§2.11 meets K1): the per-epoch staged-commit
  * contract behind every exactly-once streaming sink. Tasks buffer and
  * surface rows only in their commit message (same discipline as the
  * batch path); the driver's `commit(epochId, …)` publishes atomically
  * AND idempotently — after a failure/restart Spark REPLAYS the last
  * un-committed micro-batch, and the sink must treat an already-landed
  * epoch as a no-op (here: the [[MemSinkStore.lastEpoch]] ledger; in the
  * JDBC form, an epoch column checked in the same transaction as the
  * data insert). Complete output mode arrives with `truncate` set, so
  * each epoch atomically replaces the previous result; append mode
  * accumulates.
  *
  * At 100 TB this is the shape that matters: commit coordination is
  * per-epoch metadata (bytes), data volume rides the tasks, and replay
  * safety needs no sink-side dedup scan — one ledger lookup. */
class MemSinkStreamingWrite(key: String, schema: StructType,
                            truncate: Boolean)
    extends org.apache.spark.sql.connector.write.streaming.StreamingWrite {
  override def createStreamingWriterFactory(info: PhysicalWriteInfo):
      org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory =
    new MemSinkStreamingWriterFactory(schema)
  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit =
    MemSinkStore.publishEpoch(key, epochId,
      messages.toSeq.flatMap(_.asInstanceOf[MemSinkCommit].rows), truncate)
  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = ()
}

class MemSinkStreamingWriterFactory(schema: StructType)
    extends org.apache.spark.sql.connector.write.streaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new MemSinkWriterFactory(schema).createWriter(partitionId, taskId)
}

class MemSinkWriterFactory(schema: StructType) extends DataWriterFactory {
  override def createWriter(partitionId: Int,
                            taskId: Long): DataWriter[InternalRow] =
    new DataWriter[InternalRow] {
      private val buf = ArrayBuffer.empty[Seq[Any]]
      override def write(record: InternalRow): Unit =
        buf += schema.fields.indices.map { i =>
          val v = record.get(i, schema.fields(i).dataType)
          v match {
            case u: org.apache.spark.unsafe.types.UTF8String => u.toString
            case other => other
          }
        }
      override def commit(): WriterCommitMessage = MemSinkCommit(buf.toSeq)
      override def abort(): Unit = buf.clear()
      override def close(): Unit = ()
    }
}
