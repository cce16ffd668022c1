package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, Predicate, UnaryExpression}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd multi-substring containment: true iff `child` contains ANY of
  * `words` (case-sensitive, like Python's `sub in link`).
  *
  * Re-expresses the reference's 28-word blacklist predicate
  * (`web_spider_oo.py:195-225`, applied `:292-297`:
  * `not any(sub in (link or '') for sub in self.filter_word_list)`) as a
  * single Catalyst expression so the whole filter stays inside
  * whole-stage codegen instead of a 28-deep `Or(Contains(...))` tree.
  * Semantically identical to `words.map(col.contains).reduce(_ || _)`
  * (property-tested in ContainsAnySpec).
  *
  * At 100 TB scale this is the hot path of frontier cleaning: one pass,
  * no UDF serialization, null-safe (null input -> null, filtered out by
  * the surrounding `filter`, matching the reference's `link or ''` guard
  * combined with its F1 null filter).
  */
case class ContainsAny(child: Expression, words: Seq[String])
    extends UnaryExpression with Predicate {

  // empty words would emit `ev.value = ();` in doGenCode (invalid Java,
  // codegen-compile fallback); reject at construction instead
  require(words.nonEmpty, "contains_any requires at least one word argument")

  @transient private lazy val utf8Words: Seq[UTF8String] =
    words.map(UTF8String.fromString)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    utf8Words.exists(s.contains)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refs = words.map { w =>
      ctx.addReferenceObj("word", UTF8String.fromString(w),
        "org.apache.spark.unsafe.types.UTF8String")
    }
    nullSafeCodeGen(ctx, ev, c => {
      val checks = refs.map(r => s"$c.contains($r)").mkString(" || ")
      s"${ev.value} = ($checks);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ContainsAny {
  /** Column API: `ContainsAny($"link", words)`. */
  def apply(col: Column, words: Seq[String]): Column =
    GraftSqlBridge.column(ContainsAny(GraftSqlBridge.expression(col), words))
}
