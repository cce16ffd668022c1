package graft.catalog

import java.util

import org.apache.spark.sql.connector.catalog.{Identifier, FunctionCatalog, SupportsNamespaces, NamespaceChange}
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DSv2 FUNCTION CATALOG (r7) — the connector-tier SQL function story,
  * one level above session `injectFunction`: functions live in a
  * catalog namespace (`graft.fns.mix64(...)`), the catalog is activated
  * by a plain runtime conf
  * (`spark.sql.catalog.graft = graft.catalog.GraftFunctionCatalog` —
  * catalogs instantiate lazily on first reference, no session rebuild),
  * and each function binds per call site with its input types checked
  * by the analyzer. The bound functions expose the MAGIC-METHOD form
  * (`def invoke(x: Long): Long`): Spark codegens a direct method call —
  * no row boxing, no UDF closure — which is the whole point of the v2
  * function API at scale.
  *
  * Two house functions ship:
  *  - `mix64(key)`: the repo's quadratic ring mixer (squared term
  *    masked to 15 bits so the product stays in signed 64-bit at any
  *    key magnitude — the r7 overflow rule);
  *  - `trunc_div(a, b)`: the `(a - a % b) / b` truncate-toward-zero
  *    division idiom that keeps oracle arithmetic engine- and
  *    version-invariant (SURVEY §7.4).
  */
class GraftFunctionCatalog extends FunctionCatalog with SupportsNamespaces {

  private var catalogName = "graft"
  override def initialize(name: String,
                          options: CaseInsensitiveStringMap): Unit =
    catalogName = name
  override def name(): String = catalogName

  private val ns = Array("fns")
  private val fns: Map[String, UnboundFunction] = Map(
    "mix64" -> Mix64,
    "trunc_div" -> TruncDiv)

  override def listFunctions(namespace: Array[String]): Array[Identifier] = {
    require(namespace.isEmpty || namespace.sameElements(ns),
      s"unknown namespace ${namespace.mkString(".")}")
    fns.keys.map(Identifier.of(ns, _)).toArray
  }
  override def loadFunction(ident: Identifier): UnboundFunction = {
    if (!ident.namespace.sameElements(ns))
      throw new NoSuchElementException(s"namespace ${ident.namespace.mkString(".")}")
    fns.getOrElse(ident.name.toLowerCase(java.util.Locale.ROOT),
      throw new NoSuchElementException(s"function ${ident.name}"))
  }
  override def functionExists(ident: Identifier): Boolean =
    ident.namespace.sameElements(ns) &&
      fns.contains(ident.name.toLowerCase(java.util.Locale.ROOT))

  // minimal namespace surface so `SHOW NAMESPACES IN graft` resolves
  override def listNamespaces(): Array[Array[String]] = Array(ns)
  override def listNamespaces(namespace: Array[String]): Array[Array[String]] =
    if (namespace.isEmpty) Array(ns) else Array.empty
  override def namespaceExists(namespace: Array[String]): Boolean =
    namespace.sameElements(ns)
  override def loadNamespaceMetadata(
      namespace: Array[String]): util.Map[String, String] = {
    if (!namespaceExists(namespace))
      throw new NoSuchElementException(namespace.mkString("."))
    util.Collections.emptyMap()
  }
  override def createNamespace(namespace: Array[String],
                               metadata: util.Map[String, String]): Unit =
    throw new UnsupportedOperationException("read-only function catalog")
  override def alterNamespace(namespace: Array[String],
                              changes: NamespaceChange*): Unit =
    throw new UnsupportedOperationException("read-only function catalog")
  override def dropNamespace(namespace: Array[String],
                             cascade: Boolean): Boolean =
    throw new UnsupportedOperationException("read-only function catalog")
}

object GraftFunctionCatalog {
  private[catalog] def integral(t: DataType): Boolean =
    t == ByteType || t == ShortType || t == IntegerType || t == LongType
}

/** `graft.fns.mix64(BIGINT) -> BIGINT` — deterministic quadratic ring
  * mixer on [0, 2³²). */
object Mix64 extends UnboundFunction {
  override def name(): String = "mix64"
  override def description(): String =
    "mix64(key BIGINT) -> BIGINT: quadratic ring mixer on [0, 2^32)"
  override def bind(inputType: StructType): BoundFunction = {
    // accept any integral input — the analyzer inserts the implicit
    // cast to the bound function's declared LongType inputTypes
    require(inputType.fields.length == 1 &&
      GraftFunctionCatalog.integral(inputType.fields(0).dataType),
      s"mix64 takes one integral argument, got $inputType")
    Mix64Bound
  }
}

object Mix64Bound extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(LongType)
  override def resultType(): DataType = LongType
  override def name(): String = "mix64"
  override def canonicalName(): String = "graft.fns.mix64"
  override def isResultNullable: Boolean = false
  /** Magic-method form: codegen calls this directly, no row boxing. */
  def invoke(x: Long): Long =
    ((x % 32768L) * (x % 32768L) * 2654435761L + x * 40503L) % 4294967296L
  // interpreted fallback (also exercised by the analyzer's constant
  // folding of literal arguments)
  override def produceResult(
      input: org.apache.spark.sql.catalyst.InternalRow): java.lang.Long =
    invoke(input.getLong(0))
}

/** `graft.fns.trunc_div(BIGINT, BIGINT) -> BIGINT` — explicit
  * truncate-toward-zero division, the repo's version-invariant
  * arithmetic idiom. */
object TruncDiv extends UnboundFunction {
  override def name(): String = "trunc_div"
  override def description(): String =
    "trunc_div(a BIGINT, b BIGINT) -> BIGINT: (a - a % b) / b"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2 &&
      inputType.fields.forall(f =>
        GraftFunctionCatalog.integral(f.dataType)),
      s"trunc_div takes two integral arguments, got $inputType")
    TruncDivBound
  }
}

object TruncDivBound extends ScalarFunction[java.lang.Long] {
  override def inputTypes(): Array[DataType] = Array(LongType, LongType)
  override def resultType(): DataType = LongType
  override def name(): String = "trunc_div"
  override def canonicalName(): String = "graft.fns.trunc_div"
  def invoke(a: Long, b: Long): Long = (a - a % b) / b
  override def produceResult(
      input: org.apache.spark.sql.catalyst.InternalRow): java.lang.Long =
    invoke(input.getLong(0), input.getLong(1))
}
