package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Native codegen'd kernels for the ANN hot path (the [[CosineSim]]
  * treatment applied to centroid routing and ADC scanning).
  *
  * The composed forms in `ext/IvfAnn` / `ext/PqAnn` (kept as
  * `*Composed` for the equivalence property tests) build the same math
  * from `zip_with`+`aggregate`+`array_sort` — higher-order functions
  * that are interpreted (no `doGenCode`) and allocate an intermediate
  * array per element pair per row. On the corpus side of an ANN query
  * those expressions ARE the inner loop; measured on the ivf-pq bench
  * query the composed forms dominate runtime. Each kernel here is one
  * allocation-light pass in whole-stage codegen, accumulating in the
  * SAME IEEE operation order as its composed twin, so results are
  * bit-identical (spec-pinned) and every oracle/recall contract is
  * unchanged.
  *
  * Model constants (centroids / codebooks) ride along as reference
  * objects — k×dim doubles on the generated class, the broadcast-a-
  * small-model idiom, never per-row literals.
  *
  * Null contract (all three): null input array → null; any null
  * element → null; a length mismatch with the model's dim → null.
  */
private object AnnExprs {
  /** Load an ARRAY<FLOAT|DOUBLE> into a double[], or null if any
    * element is null (interpreted path). */
  def toDoubles(arr: ArrayData, isFloat: Boolean): Array[Double] = {
    val n = arr.numElements()
    val out = new Array[Double](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) return null
      out(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      i += 1
    }
    out
  }

  def floatElem(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def checkArray(dt: DataType, what: String): TypeCheckResult = dt match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$what requires ARRAY<FLOAT|DOUBLE>, got $other")
  }

  /** The shared copy-elements preamble for generated code: reads the
    * input ArrayData once into a local double[], nulling out on a null
    * element or a dim mismatch. */
  def loadVec(ctx: CodegenContext, ev: ExprCode, src: String, dim: Int,
              get: String, vec: String): String = {
    val i = ctx.freshName("i")
    s"""
       |double[] $vec = null;
       |if ($src.numElements() != $dim) { ${ev.isNull} = true; }
       |else {
       |  $vec = new double[$dim];
       |  for (int $i = 0; $i < $dim; $i++) {
       |    if ($src.isNullAt($i)) { ${ev.isNull} = true; break; }
       |    $vec[$i] = (double) $src.$get($i);
       |  }
       |}
     """.stripMargin
  }
}

/** `nprobe` nearest centroids of an embedding, closest first, by the
  * IVF routing score |c|² − 2·x·c (per-centroid dot in array order,
  * matching the composed `array_sort(distStructs)` form bit-for-bit;
  * ties at equal score break to the LOWER centroid index, exactly the
  * (d, j) struct sort order). Output ARRAY<INT> of length `nprobe`. */
case class NearestCentroids(child: Expression,
                            centroids: Array[Array[Double]], nprobe: Int)
    extends UnaryExpression {
  require(nprobe >= 1 && nprobe <= centroids.length,
    s"nprobe must be in [1, ${centroids.length}]")

  // |c|² per centroid, computed EXACTLY like the composed literal
  // (`centroid.map(x => x*x).sum` — left-fold in index order)
  private lazy val norms: Array[Double] = centroids.map(_.map(x => x * x).sum)
  private def dim: Int = centroids(0).length

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    AnnExprs.checkArray(child.dataType, "nearest_centroids")

  override def nullSafeEval(input: Any): Any = {
    val x = AnnExprs.toDoubles(input.asInstanceOf[ArrayData],
      AnnExprs.floatElem(child))
    if (x == null || x.length != dim) return null
    val k = centroids.length
    val scores = new Array[Double](k)
    var j = 0
    while (j < k) {
      val c = centroids(j)
      var dot = 0.0
      var i = 0
      while (i < dim) { dot += x(i) * c(i); i += 1 }
      scores(j) = norms(j) - 2.0 * dot
      j += 1
    }
    val out = new Array[Int](nprobe)
    val taken = new Array[Boolean](k)
    var p = 0
    while (p < nprobe) {
      var best = -1
      var j2 = 0
      while (j2 < k) {
        if (!taken(j2) && (best < 0 || scores(j2) < scores(best))) best = j2
        j2 += 1
      }
      taken(best) = true
      out(p) = best
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cents = ctx.addReferenceObj("centroids", centroids, "double[][]")
    val nrms = ctx.addReferenceObj("norms", norms, "double[]")
    val get = if (AnnExprs.floatElem(child)) "getFloat" else "getDouble"
    val (k, d, np) = (centroids.length, dim, nprobe)
    nullSafeCodeGen(ctx, ev, src => {
      val vec = ctx.freshName("vec")
      val scores = ctx.freshName("scores")
      val taken = ctx.freshName("taken")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val p = ctx.freshName("p")
      val best = ctx.freshName("best")
      val dot = ctx.freshName("dot")
      val cw = ctx.freshName("cw")
      s"""
         |${AnnExprs.loadVec(ctx, ev, src, d, get, vec)}
         |if (!${ev.isNull}) {
         |  double[] $scores = new double[$k];
         |  for (int $j = 0; $j < $k; $j++) {
         |    double $dot = 0.0;
         |    double[] $cw = $cents[$j];
         |    for (int $i = 0; $i < $d; $i++) $dot += $vec[$i] * $cw[$i];
         |    $scores[$j] = $nrms[$j] - 2.0 * $dot;
         |  }
         |  boolean[] $taken = new boolean[$k];
         |  int[] $out = new int[$np];
         |  for (int $p = 0; $p < $np; $p++) {
         |    int $best = -1;
         |    for (int $j = 0; $j < $k; $j++) {
         |      if (!$taken[$j] && ($best < 0 || $scores[$j] < $scores[$best])) $best = $j;
         |    }
         |    $taken[$best] = true;
         |    $out[$p] = $best;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NearestCentroids {
  def apply(emb: Column, centroids: Array[Array[Double]],
            nprobe: Int): Column =
    GraftSqlBridge.column(NearestCentroids(
      GraftSqlBridge.expression(emb), centroids, nprobe))
}

/** PQ encode: per subspace j, the index of the nearest codeword by
  * |c|² − 2·sub_j·c (ties → lower index, the composed `array_min` on
  * (d, i) structs). Output ARRAY<INT> of length m. */
case class PqEncodeExpr(child: Expression,
                        codebooks: Array[Array[Array[Double]]])
    extends UnaryExpression {

  private def m: Int = codebooks.length
  private def kk: Int = codebooks(0).length
  private def ds: Int = codebooks(0)(0).length
  // |c|² per (subspace, codeword), same fold as the composed literal
  private lazy val norms: Array[Array[Double]] =
    codebooks.map(_.map(_.map(x => x * x).sum))

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult =
    AnnExprs.checkArray(child.dataType, "pq_encode")

  override def nullSafeEval(input: Any): Any = {
    val x = AnnExprs.toDoubles(input.asInstanceOf[ArrayData],
      AnnExprs.floatElem(child))
    if (x == null || x.length != m * ds) return null
    val out = new Array[Int](m)
    var j = 0
    while (j < m) {
      var bestI = 0
      var bestD = Double.NaN
      var i = 0
      while (i < kk) {
        val c = codebooks(j)(i)
        var dot = 0.0
        var t = 0
        while (t < ds) { dot += x(j * ds + t) * c(t); t += 1 }
        val d = norms(j)(i) - 2.0 * dot
        if (i == 0 || d < bestD) { bestD = d; bestI = i }
        i += 1
      }
      out(j) = bestI
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbs = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val nrms = ctx.addReferenceObj("norms", norms, "double[][]")
    val get = if (AnnExprs.floatElem(child)) "getFloat" else "getDouble"
    val (mL, kL, dsL) = (m, kk, ds)
    nullSafeCodeGen(ctx, ev, src => {
      val vec = ctx.freshName("vec")
      val out = ctx.freshName("out")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val dot = ctx.freshName("dot")
      val d = ctx.freshName("d")
      val bestI = ctx.freshName("bestI")
      val bestD = ctx.freshName("bestD")
      val cw = ctx.freshName("cw")
      s"""
         |${AnnExprs.loadVec(ctx, ev, src, mL * dsL, get, vec)}
         |if (!${ev.isNull}) {
         |  int[] $out = new int[$mL];
         |  for (int $j = 0; $j < $mL; $j++) {
         |    int $bestI = 0;
         |    double $bestD = 0.0;
         |    for (int $i = 0; $i < $kL; $i++) {
         |      double[] $cw = $cbs[$j][$i];
         |      double $dot = 0.0;
         |      for (int $t = 0; $t < $dsL; $t++) $dot += $vec[$j * $dsL + $t] * $cw[$t];
         |      double $d = $nrms[$j][$i] - 2.0 * $dot;
         |      if ($i == 0 || $d < $bestD) { $bestD = $d; $bestI = $i; }
         |    }
         |    $out[$j] = $bestI;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncodeExpr {
  def apply(emb: Column, codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(PqEncodeExpr(
      GraftSqlBridge.expression(emb), codebooks))
}

/** ADC approximate inner product: Σ_j q_sub_j · codebook_j[code_j],
  * subspaces then elements in ascending order — the composed
  * `Seq.reduce(_ + _)` over per-subspace `dot` folds, bit-for-bit. */
case class AdcScoreExpr(left: Expression, right: Expression,
                        codebooks: Array[Array[Array[Double]]])
    extends BinaryExpression {

  private def m: Int = codebooks.length
  private def ds: Int = codebooks(0)(0).length

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = {
    val l = AnnExprs.checkArray(left.dataType, "adc_score query side")
    if (l != TypeCheckResult.TypeCheckSuccess) return l
    right.dataType match {
      case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"adc_score codes must be ARRAY<INT>, got $other")
    }
  }

  override def nullSafeEval(q: Any, cd: Any): Any = {
    val x = AnnExprs.toDoubles(q.asInstanceOf[ArrayData],
      AnnExprs.floatElem(left))
    val codes = cd.asInstanceOf[ArrayData]
    if (x == null || x.length != m * ds || codes.numElements() != m)
      return null
    var total = 0.0
    var j = 0
    while (j < m) {
      if (codes.isNullAt(j)) return null
      val c = codebooks(j)(codes.getInt(j))
      var dot = 0.0
      var t = 0
      while (t < ds) { dot += x(j * ds + t) * c(t); t += 1 }
      total += dot
      j += 1
    }
    total
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cbs = ctx.addReferenceObj("codebooks", codebooks, "double[][][]")
    val get = if (AnnExprs.floatElem(left)) "getFloat" else "getDouble"
    val (mL, dsL) = (m, ds)
    nullSafeCodeGen(ctx, ev, (q, cd) => {
      val vec = ctx.freshName("vec")
      val total = ctx.freshName("total")
      val j = ctx.freshName("j")
      val t = ctx.freshName("t")
      val dot = ctx.freshName("dot")
      val cw = ctx.freshName("cw")
      s"""
         |${AnnExprs.loadVec(ctx, ev, q, mL * dsL, get, vec)}
         |if (!${ev.isNull} && $cd.numElements() != $mL) ${ev.isNull} = true;
         |if (!${ev.isNull}) {
         |  double $total = 0.0;
         |  for (int $j = 0; $j < $mL; $j++) {
         |    if ($cd.isNullAt($j)) { ${ev.isNull} = true; break; }
         |    double[] $cw = $cbs[$j][$cd.getInt($j)];
         |    double $dot = 0.0;
         |    for (int $t = 0; $t < $dsL; $t++) $dot += $vec[$j * $dsL + $t] * $cw[$t];
         |    $total += $dot;
         |  }
         |  if (!${ev.isNull}) ${ev.value} = $total;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object AdcScoreExpr {
  def apply(qEmb: Column, codes: Column,
            codebooks: Array[Array[Array[Double]]]): Column =
    GraftSqlBridge.column(AdcScoreExpr(GraftSqlBridge.expression(qEmb),
      GraftSqlBridge.expression(codes), codebooks))
}
