package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Exact top-k-by-frequency aggregate as a `TypedImperativeAggregate` —
  * the binary-state custom-UDAF surface (complements the typed
  * `Aggregator` form in [[graft.ext.MinHashAgg]]).
  *
  * Buffer = exact (value -> count) map; partial maps combine map-side
  * before the shuffle, so shuffle volume is distinct values per
  * partition, not rows — the same partial/final shape as built-in
  * HashAggregate. Finalization sorts by (count desc, value) into a
  * deterministic `"v1:c1,v2:c2,..."` string, which makes the whole
  * aggregate DuckDB-oracle-checkable (counts + row_number + string_agg).
  *
  * Exactness requires bounded key cardinality (event types, status
  * codes, languages); for unbounded domains at 100 TB swap the buffer
  * for a mergeable sketch (count-min / Misra-Gries) behind the same
  * interface — the eval/serialize plumbing is unchanged.
  */
case class TopKByCount(child: Expression, k: Int,
                       mutableAggBufferOffset: Int = 0,
                       inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(k > 0, "top_k_by_count requires k > 0")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long],
                      input: org.apache.spark.sql.catalyst.InternalRow): mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String is a view over a reused row buffer — materialize to an
      // immutable JVM String before storing (same pitfall as TopKPerKey)
      val key = v.asInstanceOf[UTF8String].toString
      buf.update(key, buf.getOrElse(key, 0L) + 1L)
    }
    buf
  }

  override def merge(buf: mutable.HashMap[String, Long],
                     other: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    other.foreach { case (key, n) =>
      buf.update(key, buf.getOrElse(key, 0L) + n)
    }
    buf
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any = {
    val top = buf.toSeq.sortBy { case (key, n) => (-n, key) }.take(k)
    UTF8String.fromString(top.map { case (key, n) => s"$key:$n" }.mkString(","))
  }

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    buf.foreach { case (key, n) =>
      // length-prefixed bytes, not writeUTF: writeUTF throws on keys
      // longer than 65535 UTF-8 bytes (e.g. a document-text column)
      val kb = key.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(kb.length); out.write(kb); out.writeLong(n)
    }
    out.flush(); bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val kb = new Array[Byte](in.readInt()); in.readFully(kb)
      val key = new String(kb, java.nio.charset.StandardCharsets.UTF_8)
      buf.update(key, in.readLong()); i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByCount =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByCount =
    copy(inputAggBufferOffset = newOffset)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"top_k_by_count requires a STRING child, got ${child.dataType}")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(child = newChildren.head)
  override def prettyName: String = "top_k_by_count"
}

object TopKByCount {
  /** Column API: `TopKByCount($"event_type", 3)`. */
  def apply(col: Column, k: Int): Column =
    GraftSqlBridge.column(
      TopKByCount(GraftSqlBridge.expression(col), k).toAggregateExpression())
}
