package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator` (UDTF surface, SURVEY.md §2.9): HTML ->
  * one output row per `<a href="...">` value, the reference's link-mining
  * step (`web_spider_oo.py:251-263`, BeautifulSoup `find_all('a')`).
  *
  * Functionally equivalent to `explode(regexp_extract_all(html, ...))`
  * (LinkOps.extractHrefs — kept as the composed-builtin form), but as a
  * whole-operator `Generate` node: one regex pass emits rows directly,
  * with no intermediate ArrayData materialization per document. At 100 TB
  * the array form allocates (and copies into UnsafeArrayData) every
  * page's full outlink list before exploding it; the generator streams
  * matches straight out, which matters on link-farm pages with 10^4+
  * anchors. Null/empty HTML yields no rows (the reference skips pages it
  * cannot parse).
  *
  * Evaluated via `CodegenFallback` inside `GenerateExec` — generators
  * sit outside whole-stage codegen in Spark; the surrounding pipeline
  * still fuses.
  */
case class ExtractHrefs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    new StructType().add("href", StringType, nullable = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType) {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    } else {
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"extract_hrefs requires a STRING argument, got ${child.dataType}")
    }
  }

  // same lenient pattern as LinkOps.extractHrefs — the two forms are
  // property-tested equivalent in LinkOpsSpec. Group 1 carries the value
  // with its quotes (if quoted); strip one symmetric pair here.
  @transient private lazy val pattern =
    java.util.regex.Pattern.compile(graft.core.LinkOps.hrefPattern)

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val h = child.eval(input)
    if (h == null) Nil
    else new Iterator[InternalRow] {
      private val m = pattern.matcher(h.asInstanceOf[UTF8String].toString)
      private var ready = m.find()
      override def hasNext: Boolean = ready
      override def next(): InternalRow = {
        val raw = m.group(1)
        val v =
          if (raw.nonEmpty && (raw.head == '"' || raw.head == '\''))
            raw.substring(1, raw.length - 1)
          else raw
        val row = InternalRow(UTF8String.fromString(v))
        ready = m.find()
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ExtractHrefs {
  /** Column API: `df.select(ExtractHrefs($"html"))` — the analyzer's
    * ExtractGenerator rule rewrites the projection into a `Generate`. */
  def apply(html: Column): Column =
    GraftSqlBridge.column(ExtractHrefs(GraftSqlBridge.expression(html)))
}
