package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, LongType, StructType}

/** Custom `Generator`: upper-triangle pairwise products of an
  * ARRAY<BIGINT> — one row (di, dj, p = v[di]·v[dj]) per i ≤ j — the
  * per-row kernel of the exact Gram-matrix aggregation
  * (`q_gram_matrix`'s XᵀX).
  *
  * Equivalent to `explode(flatten(transform(sequence, i ->
  * transform(sequence(i, ...), j -> struct(i, j, v[i]*v[j])))))`, but
  * the higher-order form evaluates interpreted AND materializes a
  * d(d+1)/2-element array of structs per input row before exploding it
  * (for d = 64: 2 080 `GenericInternalRow`s plus two levels of
  * `GenericArrayData` per row, per corpus row). This generator streams
  * the rows out of a mutable buffer — zero intermediate collection;
  * the (di, dj) GROUP BY above it map-side-combines, so the shuffle
  * stays d²-bounded exactly as before.
  *
  * Null array or any null element ⇒ no rows (a partial Gram row would
  * silently bias the matrix; PropertiesSpec pins the equivalence with
  * the composed form).
  */
case class PairProducts(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = new StructType()
    .add("di", IntegerType, nullable = false)
    .add("dj", IntegerType, nullable = false)
    .add("p", LongType, nullable = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pair_products requires ARRAY<BIGINT>, got $other")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val a = child.eval(input)
    if (a == null) return Nil
    val arr = a.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val v = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return Nil
      v(i) = arr.getLong(i)
      i += 1
    }
    new Iterator[InternalRow] {
      private var di = 0
      private var dj = 0
      override def hasNext: Boolean = di < n
      override def next(): InternalRow = {
        // fresh row per element: operators above the Generate may
        // buffer references (sort/agg), so a reused buffer would
        // silently alias every emitted row
        val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(3)
        row.update(0, di)
        row.update(1, dj)
        row.update(2, v(di) * v(dj))
        dj += 1
        if (dj == n) { di += 1; dj = di }
        row
      }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PairProducts {
  def apply(c: Column): Column =
    GraftSqlBridge.column(PairProducts(GraftSqlBridge.expression(c)))
}
