package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization as a native expression — NFC/NFD/NFKC/NFKD via
  * the JDK [[java.text.Normalizer]], plus STRIP (NFD + drop combining
  * marks, the accent-folding LLM-text-cleanup step: é/e, ñ/n collapse
  * to one key for dedup and matching).
  *
  * Why an Expression and not a UDF: same text bytes must produce the
  * same normalized bytes on every executor with zero SerDe — the
  * generated code calls one static helper on the already-decoded
  * string, stays inside whole-stage codegen, and the expression is
  * foldable for literal inputs so Catalyst constant-folds it.
  *
  * Canonical-equivalence contract: NFC(NFD(s)) == NFC(s) (idempotent on
  * normalized input) — spec-pinned with combining-mark fixtures.
  */
case class NormalizeStr(child: Expression, mode: String)
    extends UnaryExpression {
  NormalizeStr.form(mode) // validate eagerly: bad mode fails at plan time

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def foldable: Boolean = child.foldable

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_str requires STRING, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    UTF8String.fromString(
      NormalizeStr.normalize(input.asInstanceOf[UTF8String].toString, mode))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val m = ctx.addReferenceObj("mode", mode, "java.lang.String")
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"graft.functions.NormalizeStr.normalize($c.toString(), $m))")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NormalizeStr {
  private[functions] def form(mode: String): Option[Normalizer.Form] =
    mode match {
      case "NFC" => Some(Normalizer.Form.NFC)
      case "NFD" => Some(Normalizer.Form.NFD)
      case "NFKC" => Some(Normalizer.Form.NFKC)
      case "NFKD" => Some(Normalizer.Form.NFKD)
      case "STRIP" => None // NFD + drop combining marks
      case other => throw new IllegalArgumentException(
        s"normalize_str mode must be NFC/NFD/NFKC/NFKD/STRIP, got $other")
    }

  /** Static normalization kernel shared by interpreted and generated
    * code paths. */
  def normalize(s: String, mode: String): String = form(mode) match {
    case Some(f) => Normalizer.normalize(s, f)
    case None => Normalizer.normalize(s, Normalizer.Form.NFD)
      .replaceAll("\\p{Mn}+", "")
  }

  def apply(c: Column, mode: String): Column =
    GraftSqlBridge.column(NormalizeStr(GraftSqlBridge.expression(c), mode))
}
