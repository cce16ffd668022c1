package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The crawl's control-flow operator: bounded BFS with memoization
  * (SURVEY.md §2.10; reference `web_spider_oo.py:91-138`).
  *
  * Spark mapping: a driver-side loop over DataFrames. Each depth does one
  * distributed join + anti-join; `localCheckpoint(eager = true)` truncates
  * lineage so a depth-k plan stays O(1) instead of O(k) (SURVEY.md §7.4
  * risk 2). Frontier/visited stay distributed the whole way — nothing is
  * collected to the driver, so the same loop runs on a 1000-executor
  * cluster with a 100 TB edge table unchanged.
  */
object CrawlGraph {

  /** Min-depth BFS over an edge table.
    *
    * @param edges    DataFrame with columns (parent, child)
    * @param roots    depth-0 seed URLs
    * @param maxDepth inclusive bound = the reference's `pen_depth`
    *                 (`web_spider_oo.py:93`)
    * @return DataFrame (depth INT, url STRING): every node reachable in
    *         <= maxDepth hops, labeled with its minimum depth — the
    *         visited-set semantics of `unique_links_set`
    *         (`web_spider_oo.py:87,98-101`).
    */
  /** Lineage cut that upgrades to reliable checkpointing when a
    * checkpoint dir is configured: `localCheckpoint` stores blocks only
    * on executors (lost executor = lost data, no recompute path) — fine
    * locally, not for long cluster jobs. Callers opt into durability
    * with `sc.setCheckpointDir(...)`. */
  private def cut(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined) df.checkpoint()
    else df.localCheckpoint()

  /** @param bloomPruneVisited when true, the per-depth F4 anti-join runs
    *   through [[graft.operators.BloomOps.bloomPrunedAntiJoin]]: a bloom
    *   filter on the visited urls is broadcast and only maybe-visited
    *   children pay the anti-join shuffle. Result-identical (spec);
    *   worthwhile once |visited| is large and most children are new. */
  def bfs(spark: SparkSession, edges: DataFrame, roots: Seq[String],
          maxDepth: Int, checkpointInterval: Int = 3,
          bloomPruneVisited: Boolean = false): DataFrame = {
    import spark.implicits._
    val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
    // every mid-loop lineage cut is tracked so its truncated-lineage
    // blocks can be freed once the result is pinned (r10): localCheckpoint
    // blocks bypass the CacheManager and would otherwise outlive the call
    val cuts = scala.collection.mutable.ListBuffer.empty[DataFrame]
    def cutT(df: DataFrame): DataFrame = { val c = cut(df); cuts += c; c }
    // distinct seeds: the union-without-distinct below relies on the
    // frontier (incl. depth 0) being duplicate-free
    var visited = cutT(roots.distinct.toDF("url").withColumn("depth", lit(0))
      .select($"depth", $"url"))
    var frontier = visited
    var depth = 0
    while (depth < maxDepth && !frontier.isEmpty) {
      // children of the frontier (A2 union-distinct, web_spider_oo.py:121).
      // No forced broadcast: the frontier can grow toward the full node
      // set — Catalyst/AQE broadcasts when it is actually small.
      val children = edges
        .join(frontier.select($"url".as("parent")), "parent")
        .select(col("child").as("url")).distinct()
      // F4 visited anti-join (web_spider_oo.py:98-101); frontier is distinct
      // and disjoint from visited, so the union below needs no distinct.
      val unvisited =
        if (bloomPruneVisited)
          graft.operators.BloomOps.bloomPrunedAntiJoin(
            children, visited.select("url"), "url", "url")
        else children.join(visited.select("url"), Seq("url"), "left_anti")
      val next = unvisited.select(lit(depth + 1).as("depth"), $"url")
      depth += 1
      // persist every depth (reused twice); hard-truncate lineage only
      // every checkpointInterval depths — checkpoints cost a full
      // materialization, unbounded lineage costs plan blow-up (§7.4 r2).
      frontier = if (depth % checkpointInterval == 0) cutT(next)
                 else { val p = next.persist(); persisted += p; p }
      visited = if (depth % checkpointInterval == 0)
        cutT(visited.union(frontier))
      else { val p = visited.union(frontier).persist(); persisted += p; p }
    }
    // DETACHED pin for the result (CacheManager-tracked, reclaimable by
    // clearCache, immune to the input unpersists below — Pins.pinDetached
    // scaladoc), keeping the reliable-checkpoint upgrade for cluster
    // durability; then release every intermediate — persisted AND cut
    val result =
      if (spark.sparkContext.getCheckpointDir.isDefined) cut(visited)
      else Pins.pinDetached(visited)
    persisted.foreach(_.unpersist(blocking = false))
    cuts.foreach(org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint)
    result
  }

  /** J1 edge generation with the INTENDED per-parent semantics: each parent
    * paired with its OWN children at a given depth — not the reference's
    * prefix-accumulated bug (`web_spider_oo.py:125-127` builds edges from
    * `child_level_links`, i.e. all children so far at the depth; docstring
    * `:314` states the per-parent intent; SURVEY.md §2.10 fidelity note).
    */
  def edgesWithDepth(edges: DataFrame, depth: Int): DataFrame =
    edges.select(
      lit(depth).as("pen_depth"),
      col("parent").as("parent_link"),
      col("child").as("child_link"))

  /** A4 surrogate-key assignment, deterministic form: the reference's
    * `enumerate(set)` (`web_spider_oo.py:321-326`) is nondeterministic;
    * we pin ids with a total order (FIXTURES.md A3).
    *
    * Scale note: a global `Window.orderBy` funnels through ONE partition —
    * fine for dimension-sized link tables (what the reference stores), but
    * for billion-row key assignment use [[surrogateKeysScalable]].
    */
  def surrogateKeys(links: DataFrame, linkCol: String): DataFrame =
    links.select(col(linkCol).as("link_name")).distinct()
      .select(
        (row_number().over(Window.orderBy("link_name")) - 1)
          .cast("long").as("link_id"),
        col("link_name"))

  /** Scalable surrogate keys: sort-partition then per-partition offsets via
    * `zipWithIndex`-style two-pass — no single-partition funnel, still
    * deterministic (ids dense, ordered by link_name). */
  def surrogateKeysScalable(spark: SparkSession, links: DataFrame,
                            linkCol: String): DataFrame = {
    import spark.implicits._
    val distinctSorted = links.select(col(linkCol).as("link_name"))
      .distinct().repartitionByRange(col("link_name"))
      .sortWithinPartitions("link_name")
    val rdd = distinctSorted.as[String].rdd.zipWithIndex()
    rdd.map { case (name, id) => (id, name) }.toDF("link_id", "link_name")
  }

  /** Full crawl pipeline over a pre-fetched `pages(url, status, html)`
    * table (the analytics-side model of the HTTP source, SURVEY.md §2.1 S1):
    * per-depth fetch-filter (status==200, `web_spider_oo.py:104-105`),
    * link extraction (S3), cleaning (F1-F3 + per-page distinct A1),
    * edge emission (J1, intended semantics), and visited accumulation (A3).
    *
    * @return (edges(pen_depth, parent_link, child_link),
    *          unique_links(link_id, link_name))
    */
  /** S4 admission + S3→F1-F3→A1 mining shared by [[crawl]] and
    * [[crawlActualEdges]]: the admitted (mined) pages as a parent-url
    * relation, and the per-page cleaned child edges.
    * Only text pages are link-mined — pdf pages are saved but not mined
    * (web_spider_oo.py:108-109 `continue`s after the pdf sink). */
  private def minedRelations(spark: SparkSession, pages: DataFrame,
      rootSite: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val ok = pages.filter($"status" === 200)
      .filter(LinkOps.route($"url") === "text_sink")
    // url -> its cleaned child urls (S3 -> F1-F3 -> A1)
    val childEdges = ok
      .select($"url".as("parent"),
        explode(LinkOps.extractHrefs($"html")).as("link"))
      .filter(LinkOps.keepLink($"link"))
      .select($"parent", LinkOps.normalize(rootSite, $"link").as("child"))
      .distinct()
    (ok.select($"url".as("parent")).distinct(), childEdges)
  }

  def crawl(spark: SparkSession, pages: DataFrame, rootSite: String,
            penDepth: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    // one source of truth for F5 routing and F3 normalization: LinkOps
    val childEdges = minedRelations(spark, pages, rootSite)._2.persist()

    // Bounded-depth loop built fully lazily: an empty frontier makes the
    // remaining iterations cheap no-op joins, so no per-depth isEmpty
    // action is needed — the whole crawl materializes in ONE final job,
    // with per-depth frontiers persisted for reuse across the edge and
    // visited branches.
    val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var visited = { val p = Pins.pin(Seq(rootSite).toDF("url"))
      persisted += p; p }
    var frontier = visited
    var edgesAcc: DataFrame = null
    for (depth <- 0 until penDepth) {
      val mined = childEdges
        .join(frontier.select($"url".as("parent")), "parent")
      val newEdges = CrawlGraph.edgesWithDepth(mined, depth)
      edgesAcc = if (edgesAcc == null) newEdges else edgesAcc.union(newEdges)
      val children = mined.select($"child".as("url")).distinct()
      // frontier is distinct+disjoint from visited -> union needs no distinct
      frontier = { val p = children.join(visited, Seq("url"), "left_anti").persist()
        persisted += p; p }
      visited = { val p = visited.union(frontier).persist(); persisted += p; p }
    }
    // results get a DETACHED pin (CacheManager-tracked, reclaimable by
    // clearCache, immune to the unpersists below) rather than a
    // localCheckpoint whose blocks only GC can reclaim (r10)
    val edges = Option(edgesAcc).map(Pins.pinDetached).getOrElse(
      spark.emptyDataFrame
        .withColumn("pen_depth", lit(0))
        .withColumn("parent_link", lit(""))
        .withColumn("child_link", lit("")))
    // pin the (small) visited set, then derive unique_links lazily:
    // callers that only read edges never pay for the surrogate-key window
    val visitedCk = Pins.pinDetached(visited)
    persisted.foreach(_.unpersist(blocking = false))
    childEdges.unpersist(blocking = false)
    (edges, surrogateKeys(visitedCk, "url"))
  }

  /** The reference's ACTUAL `raw.indexing` edge semantics, reproduced
    * faithfully beside [[edgesWithDepth]]'s intended form — the J2
    * treatment applied to the §2.10 divergence (`web_spider_oo.py:
    * 125-128`): within a depth the spider processes parents one at a
    * time, `child_level_links` accumulates across them, and EACH
    * parent's upload pairs it with the PREFIX-ACCUMULATED set of every
    * child seen so far at that depth — so later parents are credited
    * with earlier parents' children (the docstring at `:314` states the
    * per-parent intent; the code ships the accumulation).
    *
    * Deterministic pin: the reference iterates a Python set
    * (nondeterministic order); this twin processes parents in
    * lexicographic URL order, the same total-order pin as
    * [[surrogateKeys]]. A parent that was admitted (status 200, text
    * route) but mined ZERO children still uploads the accumulated set —
    * hence the separate admitted-parents relation.
    *
    * Relational form, per depth: rank the admitted frontier parents
    * (`rk`), compute each child's FIRST producing rank
    * (`fr = min rk`), and emit (parent, child) where `fr <= rk` — a
    * frontier-sized inequality join. The per-depth output is inherently
    * ~|parents|x|children| because that is what the reference writes;
    * this twin exists to make the divergence executable and testable,
    * not as the production operator ([[crawl]] is).
    */
  /** Lexicographic processing rank for the [[crawlActualEdges]] pin,
    * in the [[surrogateKeysScalable]] zipWithIndex form: range-partition
    * by parent, sort within partitions, then per-partition offsets — a
    * deterministic dense 1-based rank with NO single-partition
    * `Window.orderBy` funnel (the r5 scale flag). Plan-pinned in
    * CrawlGraphSpec: no WindowExec, no single-partition Exchange. */
  private[graft] def processingRank(spark: SparkSession,
      procParents: DataFrame): DataFrame = {
    import spark.implicits._
    val sorted = procParents.select($"parent")
      .repartitionByRange($"parent").sortWithinPartitions("parent")
    sorted.as[String].rdd.zipWithIndex()
      .map { case (p, i) => (p, i + 1L) }.toDF("parent", "rk")
  }

  def crawlActualEdges(spark: SparkSession, pages: DataFrame,
      rootSite: String, penDepth: Int): DataFrame = {
    import spark.implicits._
    val (okParentsRaw, childEdgesRaw) = minedRelations(spark, pages, rootSite)
    val childEdges = childEdgesRaw.persist()
    // r9 fixed-cost trim (r7 task 7): okParents feeds every depth's
    // frontier admission AND the rank action — unpersisted, its whole
    // page-fixture lineage re-evaluated on each of the ~3 uses per
    // depth. It is an admitted-URL dimension (parent strings only), so
    // persist it once like childEdges.
    val okParents = okParentsRaw.persist()
    val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var visited = { val p = Pins.pin(Seq(rootSite).toDF("url"))
      persisted += p; p }
    var frontier = visited
    var edgesAcc: DataFrame = null
    for (depth <- 0 until penDepth) {
      val procParents = frontier.select($"url".as("parent"))
        .join(okParents, "parent")
      // ranked is consumed twice (first-rank aggregate + prefix join)
      // and its zipWithIndex lineage would re-sort per consumer: persist
      val ranked = { val p = processingRank(spark, procParents).persist()
        persisted += p; p }
      val mined = childEdges.join(procParents, "parent")
      val firstRank = mined.join(ranked, "parent")
        .groupBy("child").agg(min($"rk").as("fr"))
      val newEdges = ranked.join(firstRank, $"fr" <= $"rk")
        .select(lit(depth).as("pen_depth"), $"parent".as("parent_link"),
          $"child".as("child_link"))
      edgesAcc = if (edgesAcc == null) newEdges else edgesAcc.union(newEdges)
      val children = mined.select($"child".as("url")).distinct()
      frontier = { val p = children.join(visited, Seq("url"), "left_anti")
        .persist(); persisted += p; p }
      visited = { val p = visited.union(frontier).persist(); persisted += p; p }
    }
    // result detached-pinned (CacheManager-tracked, reclaimable) — r10
    val edges = Option(edgesAcc).map(Pins.pinDetached).getOrElse(
      spark.emptyDataFrame
        .withColumn("pen_depth", lit(0))
        .withColumn("parent_link", lit(""))
        .withColumn("child_link", lit("")))
    persisted.foreach(_.unpersist(blocking = false))
    childEdges.unpersist(blocking = false)
    okParents.unpersist(blocking = false)
    edges
  }
}
