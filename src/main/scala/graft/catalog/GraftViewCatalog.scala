package graft.catalog

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{NoSuchViewException, UnresolvedIdentifier, UnresolvedRelation, UnresolvedSubqueryColumnAliases, UnresolvedView, ViewAlreadyExistsException}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.AliasIdentifier
import org.apache.spark.sql.connector.catalog.{CatalogPlugin, Identifier, View, ViewCatalog, ViewChange, ViewInfo}
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.{Row, SparkSessionExtensions}

/** DSv2 VIEW CATALOG (r12, VERDICT r11 task 2 — the last DSv2 catalog
  * corner): `CREATE / ALTER / DROP / SHOW` views resolved through a v2
  * catalog, plus SELECT-from-view substitution.
  *
  * Spark 4.1 ships the `ViewCatalog` CONNECTOR API (View / ViewInfo /
  * ViewChange) but none of the engine wiring: the analyzer's
  * `ResolveSessionCatalog` unconditionally throws
  * `missingCatalogViewsAbilityError` for a v2-catalog `CreateView`, and
  * no strategy plans the view commands. This file supplies that wiring
  * with public extension points only — the (c) tier of the extension
  * preference order, like [[graft.plans.TopKPerKey]] for operators:
  *
  *  - [[GraftViewCatalogSupport]] implements the connector interface
  *    over a JVM-wide store (the manifest stand-in, like
  *    [[RowTableStore]]);
  *  - [[GraftViewRules]] is an analyzer rule injected into the HINT
  *    resolution batch — the batch that runs BEFORE Resolution, so view
  *    statements are rewritten to runnable commands before
  *    `ResolveSessionCatalog` can reject them, and view references are
  *    substituted (SQL text re-parsed, column aliases applied) before
  *    table resolution would fail on them;
  *  - [[GraftViews.sessionWithViews]] derives a session that carries
  *    the rule: `SparkSessionExtensions` is shared mutable state
  *    between a session and its `newSession()` descendants, so
  *    injecting once and deriving gives a view-capable session from
  *    ANY running session — no restart, the same lazy-activation shape
  *    as `spark.sql.catalog.*`.
  *
  * Semantics: views store their SQL TEXT plus the captured schema
  * (BINDING — the reference shape for saved queries); bodies are
  * re-parsed at reference time, so view-on-view works (fixed-point
  * substitution). Unqualified table names inside a body bind to the
  * catalog + namespace captured at CREATE time (the stored
  * `currentCatalog`/`currentNamespace`), NOT to whatever namespace the
  * referencing query happens to sit in — the Iceberg/Unity view-spec
  * rule; the substitution qualifies them before resolution, including
  * inside subquery expressions. For the same reason a body that
  * references a TEMP view is refused at create time (a binding view
  * outlives the session scope a temp view lives in — Spark's own
  * persisted-view rule). Not supported, by design: WITH-clause bodies
  * (CTE substitution runs in an earlier, already-finished batch),
  * self-referencing views (would never reach a fixed point), and
  * `ALTER VIEW RENAME` SQL (renameView is catalog-API surface,
  * spec-covered). At 100 TB a view is pure catalog metadata — one
  * manifest entry, zero data movement; every query through it plans
  * exactly as its body would.
  *
  * Reference analogue: the reference publishes crawl output into named
  * Postgres schemas/tables (`spider_indexing_dataclass.py:17-20` —
  * `raw.indexing`, `raw.unique_links`) for downstream SQL consumers; a
  * catalog view is that consumption contract as engine surface — a
  * named, schema-stable saved query over those tables.
  */
object ViewStore {
  final case class StoredView(sql: String, currentCatalog: String,
                              currentNamespace: Array[String],
                              schema: StructType,
                              queryColumnNames: Array[String],
                              columnAliases: Array[String],
                              columnComments: Array[String],
                              props: Map[String, String])

  // every operation serializes on one monitor (the r11 partition-registry
  // lesson applied up front): rename is a check-then-act over TWO keys,
  // so lock-free create/drop could race its existence checks, and a
  // lock-free reader could observe the mid-rename instant where the view
  // exists under neither name
  private val views = new java.util.HashMap[String, StoredView]()

  def key(ident: Identifier): String =
    (ident.namespace :+ ident.name).mkString(".")
  def create(k: String, v: StoredView): Boolean = views.synchronized {
    views.putIfAbsent(k, v) == null
  }
  def put(k: String, v: StoredView): Unit =
    views.synchronized { views.put(k, v); () }
  def get(k: String): Option[StoredView] =
    views.synchronized { Option(views.get(k)) }
  def drop(k: String): Boolean =
    views.synchronized { views.remove(k) != null }
  /** Atomic read-modify-write: None if the view is absent (f not
    * called); otherwise the updated value is stored and returned. */
  def update(k: String)(f: StoredView => StoredView): Option[StoredView] =
    views.synchronized {
      Option(views.get(k)).map { cur =>
        val next = f(cur); views.put(k, next); next
      }
    }
  /** Atomic put-if-present: false (no change) when absent. */
  def replace(k: String, v: StoredView): Boolean = views.synchronized {
    if (!views.containsKey(k)) false else { views.put(k, v); true }
  }
  /** "ok" | "no_such" | "exists" — one atomic step over both keys. */
  def rename(from: String, to: String): String = views.synchronized {
    if (!views.containsKey(from)) "no_such"
    else if (views.containsKey(to)) "exists"
    else { views.put(to, views.remove(from)); "ok" }
  }
  def list(namespace: Array[String]): Array[Identifier] = {
    val prefix = if (namespace.isEmpty) "" else namespace.mkString(".") + "."
    val keys = views.synchronized { views.keySet.asScala.toArray }
    keys.sorted.collect {
      case k if k.startsWith(prefix) && !k.stripPrefix(prefix).contains(".") =>
        Identifier.of(namespace, k.stripPrefix(prefix))
    }
  }
}

/** The connector-side half: [[ViewCatalog]] over [[ViewStore]], mixed
  * into [[GraftTableCatalog]] so one catalog serves tables AND views
  * (the Iceberg/Unity shape). */
trait GraftViewCatalogSupport extends ViewCatalog { self: CatalogPlugin =>

  private def toStored(info: ViewInfo): ViewStore.StoredView =
    ViewStore.StoredView(info.sql, info.currentCatalog,
      info.currentNamespace, info.schema, info.queryColumnNames,
      info.columnAliases, info.columnComments,
      info.properties.asScala.toMap)

  override def listViews(namespace: String*): Array[Identifier] =
    ViewStore.list(namespace.toArray)

  override def loadView(ident: Identifier): View =
    ViewStore.get(ViewStore.key(ident))
      .map(new GraftView(ident, _))
      .getOrElse(throw new NoSuchViewException(ident))

  override def createView(info: ViewInfo): View = {
    if (!ViewStore.create(ViewStore.key(info.ident), toStored(info)))
      throw new ViewAlreadyExistsException(info.ident)
    new GraftView(info.ident, toStored(info))
  }

  override def replaceView(info: ViewInfo, orCreate: Boolean): View = {
    val k = ViewStore.key(info.ident)
    val stored = toStored(info)
    if (orCreate) ViewStore.put(k, stored)
    else if (!ViewStore.replace(k, stored))
      throw new NoSuchViewException(info.ident)
    new GraftView(info.ident, stored)
  }

  override def alterView(ident: Identifier, changes: ViewChange*): View = {
    val next = ViewStore.update(ViewStore.key(ident)) { cur =>
      cur.copy(props = changes.foldLeft(cur.props) {
        case (p, s: ViewChange.SetProperty) => p + (s.property -> s.value)
        case (p, r: ViewChange.RemoveProperty) => p - r.property
        case (_, other) =>
          throw new IllegalArgumentException(s"unsupported view change $other")
      })
    }.getOrElse(throw new NoSuchViewException(ident))
    new GraftView(ident, next)
  }

  override def dropView(ident: Identifier): Boolean =
    ViewStore.drop(ViewStore.key(ident))

  override def renameView(from: Identifier, to: Identifier): Unit =
    ViewStore.rename(ViewStore.key(from), ViewStore.key(to)) match {
      case "no_such" => throw new NoSuchViewException(from)
      case "exists" => throw new ViewAlreadyExistsException(to)
      case _ => ()
    }
}

class GraftView(ident: Identifier, v: ViewStore.StoredView) extends View {
  override def name(): String = (ident.namespace :+ ident.name).mkString(".")
  override def query(): String = v.sql
  override def currentCatalog(): String = v.currentCatalog
  override def currentNamespace(): Array[String] = v.currentNamespace
  override def schema(): StructType = v.schema
  override def queryColumnNames(): Array[String] = v.queryColumnNames
  override def columnAliases(): Array[String] = v.columnAliases
  override def columnComments(): Array[String] = v.columnComments
  override def properties(): util.Map[String, String] = v.props.asJava
}

/** Session-side wiring: rule injection + derived sessions. */
object GraftViews {
  // one injection per extensions instance: the builder list grows on
  // every inject call, and query functions run hundreds of times
  private val injected =
    util.Collections.newSetFromMap(
      new util.WeakHashMap[SparkSessionExtensions, java.lang.Boolean]())
  private val derived =
    new util.WeakHashMap[SparkSession, SparkSession]()

  /** A session whose analyzer carries [[GraftViewRules]]. The
    * extensions object is SHARED between a session and its
    * `newSession()` descendants and is consulted when a session state
    * is BUILT — so injecting into the live session's extensions and
    * deriving a sibling gives a view-capable analyzer without
    * restarting anything. Derived sessions are cached per parent;
    * session-local confs that affect planning are carried over. */
  def sessionWithViews(spark: SparkSession): SparkSession =
    derived.synchronized {
      val s2 = Option(derived.get(spark)).getOrElse {
        val ext = org.apache.spark.sql.GraftSqlBridge.extensions(spark)
        injected.synchronized {
          if (!injected.contains(ext)) {
            ext.injectHintResolutionRule(s => new GraftViewRules(s))
            injected.add(ext)
          }
        }
        val fresh = spark.newSession()
        Seq("spark.sql.shuffle.partitions", "spark.sql.session.timeZone",
          "spark.sql.legacy.parquet.nanosAsLong",
          "spark.sql.optimizer.canChangeCachedPlanOutputPartitioning")
          .foreach(k => spark.conf.getOption(k)
            .foreach(v => fresh.conf.set(k, v)))
        derived.put(spark, fresh)
        fresh
      }
      // mirror v2 catalog REGISTRATIONS on every call (not just at
      // derivation — the derived session is cached, so a catalog the
      // parent registers later must still show up): newSession()
      // isolates session confs, and a view-capable session that can't
      // see the parent's catalogs couldn't resolve the views it was
      // derived to read
      spark.conf.getAll.foreach { case (k, v) =>
        if (k.startsWith("spark.sql.catalog.")) s2.conf.set(k, v)
      }
      s2
    }
}

/** Analyzer rule (HINT batch — runs before Resolution, see the file
  * Scaladoc for why that matters): rewrites view statements against a
  * v2 [[ViewCatalog]] into runnable commands, and substitutes view
  * references with their re-parsed bodies. */
class GraftViewRules(session: SparkSession) extends Rule[LogicalPlan] {

  private def classic = session
    .asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** The head name part names a REGISTERED v2 catalog with view
    * ability. Conf-gated before loading so ordinary table/temp-view
    * heads never trigger plugin loading. */
  private def viewCatalog(name: String): Option[ViewCatalog] =
    if (session.conf.getOption(s"spark.sql.catalog.$name").isEmpty) None
    else try classic.sessionState.catalogManager.catalog(name) match {
      case v: ViewCatalog => Some(v)
      case _ => None
    } catch { case _: Exception => None }

  private def identOf(parts: Seq[String]): Identifier =
    Identifier.of(parts.init.toArray, parts.last)

  /** BINDING-view name resolution: qualify the body's unqualified (and
    * catalog-less) table references with the catalog + namespace
    * captured at CREATE time, so they resolve the same way from ANY
    * referencing namespace — including inside subquery expressions
    * (`transformUpWithSubqueries`). Names under the global-temp
    * database are left alone (they are session-scoped by definition;
    * create-time refuses them, but a connector-API-created view could
    * still carry one and should fail as what it is). */
  private def bindNames(v: View, body: LogicalPlan): LogicalPlan = {
    val globalTempDb =
      classic.sessionState.catalog.globalTempDatabase
    def isCatalogName(n: String): Boolean =
      n == "spark_catalog" ||
        session.conf.getOption(s"spark.sql.catalog.$n").isDefined
    // the resolve* variant: transformUpWithSubqueries asserts it is NOT
    // inside an analyzer rule — this runs inside one
    body.resolveOperatorsUpWithSubqueriesAndPruning(_ => true) {
      case r: UnresolvedRelation if r.multipartIdentifier.length == 1 =>
        r.copy(multipartIdentifier =
          (v.currentCatalog +: v.currentNamespace.toSeq) ++
            r.multipartIdentifier)
      case r: UnresolvedRelation
          if !isCatalogName(r.multipartIdentifier.head) &&
            r.multipartIdentifier.head != globalTempDb =>
        r.copy(multipartIdentifier =
          v.currentCatalog +: r.multipartIdentifier)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.resolveOperatorsUp {
      // SELECT ... FROM cat.ns.v — substitute the stored SQL (column
      // aliases applied like `FROM (body) t(a, b)`); runs to fixed
      // point, so view-on-view resolves on the next pass
      case u: UnresolvedRelation if u.multipartIdentifier.length >= 2 &&
          viewCatalog(u.multipartIdentifier.head)
            .exists(_.viewExists(identOf(u.multipartIdentifier.tail))) =>
        val parts = u.multipartIdentifier
        val v = viewCatalog(parts.head).get.loadView(identOf(parts.tail))
        val parsed = bindNames(v,
          classic.sessionState.sqlParser.parsePlan(v.query))
        val body =
          if (v.columnAliases != null && v.columnAliases.nonEmpty)
            UnresolvedSubqueryColumnAliases(v.columnAliases.toSeq, parsed)
          else parsed
        SubqueryAlias(AliasIdentifier(parts.last, parts.init.toSeq), body)

      case c: CreateView => c.child match {
        case UnresolvedIdentifier(parts, _)
            if viewCatalog(parts.head).isDefined =>
          CreateGraftViewCommand(parts.head, parts.tail,
            c.userSpecifiedColumns, c.properties,
            c.originalText.getOrElse(throw new IllegalArgumentException(
              "CREATE VIEW without SQL text")),
            c.allowExisting, c.replace)
        case _ => c
      }

      case a: AlterViewAs => a.child match {
        case uv: UnresolvedView
            if viewCatalog(uv.multipartIdentifier.head).isDefined =>
          AlterGraftViewAsCommand(uv.multipartIdentifier.head,
            uv.multipartIdentifier.tail, a.originalText)
        case _ => a
      }

      case s: SetViewProperties => s.child match {
        case uv: UnresolvedView
            if viewCatalog(uv.multipartIdentifier.head).isDefined =>
          AlterGraftViewPropsCommand(uv.multipartIdentifier.head,
            uv.multipartIdentifier.tail, s.properties.toSeq, Nil)
        case _ => s
      }

      case s: UnsetViewProperties => s.child match {
        case uv: UnresolvedView
            if viewCatalog(uv.multipartIdentifier.head).isDefined =>
          AlterGraftViewPropsCommand(uv.multipartIdentifier.head,
            uv.multipartIdentifier.tail, Nil, s.propertyKeys)
        case _ => s
      }

      case d: DropView => d.child match {
        case UnresolvedIdentifier(parts, _)
            if viewCatalog(parts.head).isDefined =>
          DropGraftViewCommand(parts.head, parts.tail, d.ifExists)
        case _ => d
      }

      case sv: ShowViews => sv.namespace match {
        case n: org.apache.spark.sql.catalyst.analysis.UnresolvedNamespace
            if n.multipartIdentifier.nonEmpty &&
              viewCatalog(n.multipartIdentifier.head).isDefined =>
          ShowGraftViewsCommand(n.multipartIdentifier.head,
            n.multipartIdentifier.tail, sv.pattern, sv.output)
        case _ => sv
      }
    }
}

private[catalog] object GraftViewCommands {
  def catalogFor(session: SparkSession, name: String): ViewCatalog =
    session.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalogManager.catalog(name).asInstanceOf[ViewCatalog]

  def identOf(parts: Seq[String]): Identifier =
    Identifier.of(parts.init.toArray, parts.last)

  /** Analyze the view SQL NOW (create/replace time) to capture the
    * BINDING schema and query column names the connector stores. */
  def infoFor(session: SparkSession, catalogName: String,
              parts: Seq[String], sql: String,
              userCols: Seq[(String, Option[String])],
              props: Map[String, String]): ViewInfo = {
    val classic = session
      .asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    val parsed = classic.sessionState.sqlParser.parsePlan(sql)
    // a BINDING view outlives the session scope a temp view lives in,
    // and its unqualified names re-bind to the captured namespace at
    // reference time — so a temp-view reference would analyze here and
    // then dangle forever. Refuse now, like Spark's own persisted views
    // (subqueries included).
    val sc = classic.sessionState.catalog
    parsed.collectWithSubqueries {
      case r: org.apache.spark.sql.catalyst.analysis.UnresolvedRelation =>
        r.multipartIdentifier
    }.foreach { name =>
      val isTemp = name match {
        case Seq(n) => sc.getRawTempView(n).isDefined
        case Seq(db, n) if db == sc.globalTempDatabase =>
          sc.getRawGlobalTempView(n).isDefined
        case _ => false
      }
      if (isTemp) throw new IllegalArgumentException(
        s"cannot create catalog view ${parts.mkString(".")}: body " +
          s"references temporary view ${name.mkString(".")} — a stored " +
          "view must reference only catalog tables/views")
    }
    val analyzed = classic.sessionState.executePlan(parsed).analyzed
    require(userCols.isEmpty || userCols.length == analyzed.output.length,
      s"view column list has ${userCols.length} names for " +
        s"${analyzed.output.length} query columns")
    val cm = classic.sessionState.catalogManager
    new ViewInfo(identOf(parts), sql, cm.currentCatalog.name(),
      cm.currentNamespace, analyzed.schema,
      analyzed.output.map(_.name).toArray,
      userCols.map(_._1).toArray,
      userCols.map(_._2.orNull).toArray,
      props.asJava)
  }
}

case class CreateGraftViewCommand(catalogName: String, parts: Seq[String],
    userCols: Seq[(String, Option[String])], props: Map[String, String],
    sql: String, allowExisting: Boolean, replace: Boolean)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import GraftViewCommands._
    val cat = catalogFor(session, catalogName)
    if (allowExisting && cat.viewExists(identOf(parts))) Nil
    else {
      val info = infoFor(session, catalogName, parts, sql, userCols, props)
      if (replace) cat.replaceView(info, true) else cat.createView(info)
      Nil
    }
  }
}

case class AlterGraftViewAsCommand(catalogName: String, parts: Seq[String],
                                   sql: String) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import GraftViewCommands._
    val cat = catalogFor(session, catalogName)
    val ident = identOf(parts)
    val prior = cat.loadView(ident) // NoSuchViewException if absent
    val info = infoFor(session, catalogName, parts, sql, Nil,
      prior.properties().asScala.toMap) // ALTER AS keeps properties
    cat.replaceView(info, false)
    Nil
  }
}

case class AlterGraftViewPropsCommand(catalogName: String,
    parts: Seq[String], set: Seq[(String, String)],
    unset: Seq[String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import GraftViewCommands._
    val changes: Seq[ViewChange] =
      set.map { case (k, v) => ViewChange.setProperty(k, v) } ++
        unset.map(ViewChange.removeProperty)
    catalogFor(session, catalogName).alterView(identOf(parts), changes: _*)
    Nil
  }
}

case class DropGraftViewCommand(catalogName: String, parts: Seq[String],
                                ifExists: Boolean) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import GraftViewCommands._
    if (!catalogFor(session, catalogName).dropView(identOf(parts)) &&
        !ifExists)
      throw new NoSuchViewException(identOf(parts))
    Nil
  }
}

case class ShowGraftViewsCommand(catalogName: String, namespace: Seq[String],
    pattern: Option[String],
    override val output: Seq[org.apache.spark.sql.catalyst.expressions.Attribute])
    extends LeafRunnableCommand {
  /** SHOW VIEWS LIKE glob: '*' any, '|' alternatives — the session
    * catalog's pattern dialect. Everything BUT '*' matches literally
    * (quoted), so a pattern with regex metachars ('(', '+', …) is a
    * non-matching literal, not a PatternSyntaxException. */
  private def matches(name: String): Boolean = pattern.forall(p =>
    p.split("\\|").exists(alt =>
      name.matches(alt.trim.split("\\*", -1)
        .map(java.util.regex.Pattern.quote).mkString(".*"))))
  override def run(spark: SparkSession): Seq[Row] = {
    val session = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    import GraftViewCommands._
    catalogFor(session, catalogName).listViews(namespace: _*)
      .toSeq.filter(i => matches(i.name))
      .map(i => Row(i.namespace.mkString("."), i.name, false))
  }
}
