package graft.ext

import org.apache.spark.sql.{DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components by iterative min-label propagation —
  * the clustering step of a near-dup dedup pipeline (exact-key -> LSH
  * candidates -> Jaccard verify -> COMPONENTS -> keep one canonical doc
  * per component).
  *
  * Each node starts labeled with itself; every round each node takes the
  * minimum label among itself and its neighbors; fixpoint when no label
  * changes. Rounds = graph diameter (near-dup graphs are shallow — dup
  * clusters are cliques or short chains, so 2-4 rounds in practice).
  * Each round is one join + one aggregation, both on the node key; the
  * driver-side loop uses the same bounded-lineage discipline as
  * [[graft.core.CrawlGraph]] (persist + periodic localCheckpoint,
  * convergence checked with a cheap count).
  *
  * At 100 TB: state is (node, label) pairs — tiny next to the documents;
  * the edge list is the LSH candidate set, already pruned. For graphs
  * with huge diameter, switch to the large-star/small-star variant
  * (same join primitives, O(log n) rounds).
  */
object GraphOps {

  /** Materialize a solver RESULT through the CacheManager (r10).
    * Results used to ship as an eager `localCheckpoint()`, whose blocks
    * bypass the CacheManager — `spark.catalog.clearCache()` could never
    * reclaim them and they lingered until GC (the r9 verdict nit). The
    * DETACHED pin ([[graft.core.Pins.pinDetached]]) materializes the
    * result while the loop state and persisted inputs are still warm,
    * as a cache entry no later input-unpersist can invalidate; the
    * solvers then free their loop checkpoints and inputs as before.
    * Loop-INTERNAL state keeps the localCheckpoint+free discipline —
    * persist truncates nothing, and the per-round self-referencing
    * plans need lineage truncation to keep Catalyst analysis O(1) in
    * rounds. */
  private def pinResult(df: DataFrame): DataFrame =
    graft.core.Pins.pinDetached(df)

  /** @param edges undirected edge list with columns (a, b)
    * @return (node, component) where component = min node id reachable
    */
  def connectedComponents(spark: SparkSession, edges: DataFrame,
                          maxIters: Int = 20): DataFrame = {
    // symmetric closure, one direction table (src -> dst)
    val bidir = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .distinct().persist()
    // the convergence check sums labels as decimal(38,0); a non-numeric id
    // column would cast to NULL and silently report convergence after one
    // round (split components) — reject it loudly instead
    val idType = bidir.schema("src").dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"connectedComponents requires numeric node ids, got $idType — " +
        "hash non-numeric ids to LONG (e.g. xxhash64) first")
    val nodes = bidir.select(col("src").as("node")).distinct()
    // LAZY initial checkpoint: round 1's convergence aggregation is the
    // first materializing action, so setup schedules zero jobs (r16 —
    // the eager checkpoint plus a standalone initial-sum job were two
    // driver round-trips before any propagation happened)
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint(eager = false)
    var converged = false
    var it = 0
    // labels only ever decrease, so the label sum is strictly monotone:
    // an unchanged sum means a fixpoint — one cheap aggregation instead of
    // a change-detection join per round; carried across rounds so each
    // round runs exactly one convergence job. The INITIAL sum (labels =
    // node ids) equals sum(node) over any round's output — the node set
    // never changes (each round unions the full label table back in) —
    // so round 1 recovers it from its own aggregation instead of paying
    // a setup job (r16).
    var sumPrev: java.math.BigDecimal = null
    while (!converged && it < maxIters) {
      // each node pulls its neighbors' labels, keeps the minimum.
      // (r16 measured and DECLINED: a groupBy-then-join-back shape that
      // avoids re-shuffling the label table cut shuffle records ~20%
      // but added 6-10 stage-jobs per query — an extra broadcast build
      // and join stage every round — and this loop is fixed-cost-bound,
      // not byte-bound; JobStats q_entity_resolution 33→39 jobs,
      // q_dedup_components 33→43. The union rides the one groupBy
      // exchange the round already pays.)
      val neighborLabels = bidir
        .join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("label"))
      val next = labels.select(col("node"), col("label"))
        .union(neighborLabels)
        .groupBy("node").agg(min("label").as("label"))
      // LAZY checkpoint: the convergence aggregation below is the action
      // that materializes it — one job per round instead of two
      val nextP = next.localCheckpoint(eager = false)
      val aggRow = nextP.agg(sum(col("label").cast("decimal(38,0)")),
        sum(col("node").cast("decimal(38,0)"))).first()
      val sumNow = aggRow.getDecimal(0)
      if (sumPrev == null) sumPrev = aggRow.getDecimal(1) // = initial label sum
      GraftSqlBridge.freeLocalCheckpoint(labels)
      // null sums = empty graph = trivially converged
      converged = sumNow == null || sumNow.compareTo(sumPrev) == 0
      labels = nextP
      sumPrev = sumNow
      it += 1
    }
    // wrong (split) components are worse than a loud failure
    require(converged,
      s"connectedComponents did not converge in $maxIters rounds — " +
        "graph diameter exceeds maxIters; raise it")
    val result = pinResult(
      labels.select(col("node"), col("label").as("component")))
    GraftSqlBridge.freeLocalCheckpoint(labels)
    bidir.unpersist(blocking = false)
    result
  }

  /** Connected components by the alternating large-star/small-star
    * algorithm (Kiveris et al., "Connected Components in MapReduce and
    * Beyond", SoCC 2014): each round rewires every node toward the
    * minimum id in its neighborhood, halving effective path lengths —
    * O(log d) rounds on diameter-d graphs vs O(d) for plain min-label
    * propagation ([[connectedComponents]]). Use this form when the dup
    * graph can contain long chains (e.g. near-dup chains across a 100 TB
    * corpus); the per-round cost is the same two shuffles (groupBy +
    * join) on the edge key.
    *
    * Convergence: each node's known minimum is non-increasing, so the
    * per-node-min sum is strictly monotone; an unchanged sum is a
    * fixpoint (same guard as [[connectedComponents]]).
    *
    * @param edges undirected edge list with columns (a, b), numeric ids
    * @return (node, component), component = min reachable node id
    */
  def connectedComponentsStar(spark: SparkSession, edges: DataFrame,
                              maxIters: Int = 30): DataFrame = {
    val idType = edges.schema("a").dataType
    require(idType.isInstanceOf[org.apache.spark.sql.types.NumericType],
      s"connectedComponentsStar requires numeric node ids, got $idType — " +
        "hash non-numeric ids to LONG (e.g. xxhash64) first")
    val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
    // materialize the caller's edge expression ONCE — both the node set
    // and the canonical edge set derive from it, and recomputing an
    // expensive upstream (e.g. an LSH candidate join) twice doubles the
    // setup cost
    val src = edges.select(col("a"), col("b")).persist()
    persisted += src
    // every endpoint must appear in the output even if its edges are
    // dropped as self-loops below. Consumed exactly once (the final
    // left-outer join) and derives from the persisted `src`, so it is
    // NOT persisted itself (r16 — a single-consumer persist only paid a
    // cache write).
    val allNodes = src.select(col("a").as("node"))
      .union(src.select(col("b").as("node"))).distinct()
    // canonical undirected edge set, self-loops removed. LAZY
    // checkpoint: round 0's convergence aggregation is the first
    // materializing action (r16 — the eager setup checkpoint was a
    // separate driver round-trip over the same stages).
    var e = src
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .filter(col("u") =!= col("v")).distinct().localCheckpoint(eager = false)

    // Every round NEEDS minN = per-center min over the symmetric view
    // for the large-star rewiring, and (|minN|, Σ least(u, min Γ(u)))
    // over minN IS the convergence metric (per-node min label — monotone
    // non-increasing while the node set holds; the count detects node-set
    // shrinkage, see the soundness note at the aggregation). The old code
    // computed that sum in a standalone labelSum pass — one extra union +
    // groupBy + agg over the edge set per round, plus one at setup; fused
    // here, the round's own groupBy serves both the rewiring and the
    // convergence check (r10 trim: 2-3 fewer shuffle stages per round,
    // same rounds, same exit state).
    var prevSum: java.math.BigDecimal = null // none yet — round 0 runs
    var prevCnt: Long = -1L
    // freed/unpersisted one round LATE: round k's lazy checkpoint (and
    // the large/small/minN pins inside its plan) materialize during
    // round k+1's convergence aggregation, so round k's scaffolding must
    // survive until that job has landed
    var lastE: DataFrame = null
    var lastPins: Seq[DataFrame] = Nil
    var converged = false
    var it = 0
    while (!converged) {
      val sym = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      // minN is consumed by the convergence aggregation NOW and by the
      // large-star join in the NEXT materializing job — persist for the
      // round
      val minN = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
        .persist()
      // convergence metric = (node count, label-min sum) over minN. The
      // node set of `e` is NON-INCREASING across rounds (round k+1's edges
      // derive from round k's by joins — no new ids appear; fully-resolved
      // interior nodes drop out), so count-equal implies node-set-equal.
      // Both checks below are gated on that: with a STABLE node set the
      // per-node min label is monotone non-increasing, hence the sum is
      // too, and sum-equal implies per-node-equal (fixpoint). A bare sum
      // comparison would be unsound for ids of mixed sign (xxhash64-hashed
      // ids are negative half the time — the documented usage): dropping a
      // negative-label node INCREASES the sum without any violation.
      val aggRow = minN.agg(sum(col("m").cast("decimal(38,0)")), count(lit(1)))
        .first()
      val sumNow = aggRow.getDecimal(0)
      val cntNow = aggRow.getLong(1)
      // that aggregation materialized e (and the previous round's
      // checkpoint chain feeding it) — the previous scaffolding is free
      if (lastE != null) GraftSqlBridge.freeLocalCheckpoint(lastE)
      lastPins.foreach(_.unpersist(blocking = false))
      require(prevSum == null || sumNow == null || cntNow != prevCnt ||
        sumNow.compareTo(prevSum) <= 0,
        "label-min sum increased over a stable node set — algorithm invariant violated")
      if (sumNow == null || (prevSum != null && cntNow == prevCnt &&
          sumNow.compareTo(prevSum) == 0)) {
        // null = empty graph; equal (count, sum) = fixpoint reached by LAST round
        converged = true
        minN.unpersist(blocking = false)
        lastPins = Nil
      } else {
        require(it < maxIters,
          s"connectedComponentsStar did not converge in $maxIters rounds")
        // large-star: for each center u (over the symmetric view),
        // attach every strictly-larger neighbor to m = min(Γ(u) ∪ {u});
        // large is consumed by BOTH minS and the small-star join — pin
        // it for the round. NOT deduplicated: the join against the
        // unique-per-u minN emits one row per symmetric edge (duplicate
        // (v, m) pairs only where two centers agree), minS's min is
        // duplicate-insensitive, and `next` dedups at the end of the
        // round — a distinct here was one whole extra shuffle per round
        // for edge-set hygiene nothing downstream needed (r10 trim)
        val large = sym.filter(col("v") > col("u"))
          .join(minN, "u")
          .select(col("v").as("a"), col("m").as("b"))
          .filter(col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("u"),
            greatest(col("a"), col("b")).as("v"))
          .persist()
        // small-star: orient each edge toward its larger endpoint u;
        // attach u and all its smaller neighbors to their minimum
        val minS = large.groupBy(col("v").as("c")).agg(min("u").as("m"))
        val small = large
          .join(minS, large("v") === minS("c"))
          .select(col("u"), col("v"), col("m"))
          .persist()
        val next = small.select(col("u").as("x"), col("m"))
          .union(small.select(col("v").as("x"), col("m")))
          .filter(col("x") =!= col("m"))
          .select(col("m").as("u"), col("x").as("v")) // m < x always
          .distinct()
        // truncate lineage EVERY round: `e` is referenced ~6x per round,
        // so an unbroken plan grows ~8x per round and Catalyst planning
        // time — not execution — dominates by round 3. LAZY checkpoint:
        // the NEXT round's convergence aggregation is the materializing
        // action (one materializing job per round).
        lastE = e
        lastPins = Seq(minN, large, small)
        e = next.localCheckpoint(eager = false)
        prevSum = sumNow
        prevCnt = cntNow
        it += 1
      }
    }
    // at the fixpoint every non-minimum node has a direct edge to its
    // component minimum; isolated nodes label themselves
    val labels = e.select(col("v").as("node"), col("u").as("component"))
      .groupBy("node").agg(min("component").as("component"))
    val result = pinResult(allNodes
      .join(labels, Seq("node"), "left_outer")
      .select(col("node"),
        coalesce(col("component"), col("node")).as("component")))
    GraftSqlBridge.freeLocalCheckpoint(e)
    persisted.foreach(_.unpersist(blocking = false))
    result
  }

  /** PageRank over a directed edge list, integer-scaled so every engine
    * (and every partitioning) produces the bit-identical result: ranks
    * are BIGINTs in units of 1e-9 (r0 = 10^9), each edge contributes
    * `r div outdeg`, and the update is
    * `r' = 0.15e9 + (85 * sum(contribs)) div 100`. All arithmetic is
    * integer — no float summation order, no decimal→double rounding —
    * which is what makes the fixed-iteration result oracle-checkable;
    * the ≤1e-9-per-op quantization is far below PageRank's own
    * convergence tolerance. Dangling nodes simply leak their mass
    * (standard simplification); every node in `nodes` gets a rank.
    *
    * Per iteration: one equi-join edges⋈ranks (ranks are tiny next to
    * edges — broadcastable at any corpus scale) and one aggregation on
    * dst. Lineage is truncated every round like the components loops.
    *
    * @param edges directed (src, dst), numeric ids, no self-loops
    * @param nodes one column `node` — the full vertex set (rank output
    *              covers exactly these)
    * @return (node, rank_scaled BIGINT) — rank = rank_scaled / 1e9
    */
  def pageRank(spark: SparkSession, edges: DataFrame, nodes: DataFrame,
               iterations: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    val outdeg = e.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
      .persist()
    val n = nodes.select(col("node")).persist()
    // LAZY checkpoint chain (r16): a fixed-round loop with no
    // convergence check needs NO per-round action — every round's
    // checkpoint truncates the Catalyst plan immediately (analysis
    // stays O(1) in rounds) and the final pin is the ONE job that
    // executes the whole chain, stage by stage. Peak block storage is
    // O(iterations × |ranks|) during that job (each round's checkpoint
    // persists as it materializes, all freed right after the pin) —
    // the rank table is node-sized model state and every registered
    // query runs a small constant round count, so the storage trade
    // buys `iterations` fewer driver round-trips.
    val chain = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var ranks = n.select(col("node"), lit(1000000000L).as("r"))
      .localCheckpoint(eager = false)
    chain += ranks
    for (_ <- 0 until iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy("node").agg(sum("c").as("c"))
      // the 85·sum multiply runs in decimal(38,0): a supernode absorbing
      // mass from ~1e8+ nodes pushes 85·sum past LONG range, which under
      // ANSI mode throws mid-iteration (and wraps silently with ANSI off)
      val next = n.join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          expr("CAST(150000000 + (85 * CAST(coalesce(c, 0L) AS DECIMAL(38,0)))" +
            " div 100 AS LONG)").as("r"))
      val nextP = next.localCheckpoint(eager = false)
      chain += nextP
      ranks = nextP
    }
    val result = pinResult(
      ranks.select(col("node"), col("r").as("rank_scaled")))
    chain.foreach(GraftSqlBridge.freeLocalCheckpoint)
    Seq(e, outdeg, n).foreach(_.unpersist(blocking = false))
    result
  }

  /** Personalized (topic-sensitive) PageRank: teleport mass returns to
    * a SEED set instead of spreading uniformly — rank relative to a
    * topic/entry page, the prioritizer of a focused crawl (which
    * frontier URLs matter from HERE) and the graph-proximity feature
    * ER/recommendation stacks use. Same integer-scaled fixed-round
    * discipline as [[pageRank]] (BIGINT units of 1e-9, decimal-safe
    * 85% damping) so a fixed-round run is hash-checkable; each seed
    * receives the full 0.15 restart mass (total teleport scales with
    * &#124;seeds&#124; — a positive scalar, rankings unaffected; the
    * oracle unrolls identically). Non-seed nodes start AND restart at
    * 0, so mass reaches them only through links.
    */
  def pageRankPersonalized(spark: SparkSession, edges: DataFrame,
                           nodes: DataFrame, seeds: DataFrame,
                           iterations: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    val outdeg = e.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
      .persist()
    val n = nodes.select(col("node"))
      .join(seeds.select(col("node"), lit(1L).as("is_seed")),
        Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
      .persist()
    // LAZY checkpoint chain — see [[pageRank]] (r16): one materializing
    // job for the whole fixed-round loop, blocks freed after the pin
    val chain = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var ranks = n.select(col("node"),
        (col("is_seed") * 1000000000L).as("r"))
      .localCheckpoint(eager = false)
    chain += ranks
    for (_ <- 0 until iterations) {
      val contribs = e
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .join(outdeg, "src")
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy("node").agg(sum("c").as("c"))
      val next = n.join(contribs, Seq("node"), "left_outer")
        .select(col("node"),
          expr("CAST(is_seed * 150000000 + (85 * CAST(coalesce(c, 0L) AS DECIMAL(38,0)))" +
            " div 100 AS LONG)").as("r"))
      val nextP = next.localCheckpoint(eager = false)
      chain += nextP
      ranks = nextP
    }
    val result = pinResult(
      ranks.select(col("node"), col("r").as("rank_scaled")))
    chain.foreach(GraftSqlBridge.freeLocalCheckpoint)
    Seq(e, outdeg, n).foreach(_.unpersist(blocking = false))
    result
  }

  /** Single-source shortest paths by distributed Bellman-Ford
    * relaxation: dist starts at 0 for the source; each round every edge
    * proposes `dist(src) + w` to its dst and each node keeps the
    * minimum. Integer weights ⇒ exact. Converges in ≤ |V|-1 rounds
    * (longest shortest path in hops); convergence is detected by the
    * same monotone-sum trick as [[connectedComponents]] — distances
    * only ever decrease, so an unchanged sum is a fixpoint, one cheap
    * aggregation per round.
    *
    * Per round: one join edges⋈dists + one min-aggregation, both on
    * node keys — exactly the shuffles a groupBy on the key costs, so it
    * scales wherever the edge list itself is tractable.
    *
    * @param edges directed (src, dst, w) with non-negative integer w
    * @param source source node id
    * @return (node, dist) for every node reachable from the source
    */
  def shortestPaths(spark: SparkSession, edges: DataFrame, source: Long,
                    maxIters: Int = 50): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w")).persist()
    // LAZY initial checkpoint (r16): the one-row seed is a literal; the
    // first round's convergence aggregation materializes it, so setup
    // schedules zero jobs
    var dists = e.sparkSession.range(1).select(
      lit(source).as("node"), lit(0L).as("dist"))
      .localCheckpoint(eager = false)
    // convergence needs BOTH count and sum: newly-reached nodes grow the
    // sum while relaxations shrink it, so sum alone could coincide across
    // a real change. The node set is monotone non-shrinking (union keeps
    // every prior node) and per-node dist is monotone non-increasing, so
    // count-equal ∧ sum-equal ⇔ fixpoint. One aggregation yields both.
    def state(d: DataFrame): (Long, java.math.BigDecimal) = {
      val row = d.agg(count(lit(1)),
        sum(col("dist").cast("decimal(38,0)"))).first()
      (row.getLong(0), row.getDecimal(1))
    }
    // the seed's state is known in closed form — (1 row, dist 0) — so
    // the old setup aggregation job is a constant here (r16)
    var prev: (Long, java.math.BigDecimal) = (1L, java.math.BigDecimal.ZERO)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val relaxed = e
        .join(dists.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
      val next = dists.union(relaxed)
        .groupBy("node").agg(min("dist").as("dist"))
      val nextP = next.localCheckpoint(eager = false)
      val now = state(nextP)
      GraftSqlBridge.freeLocalCheckpoint(dists)
      converged = now._1 == prev._1 && now._2 != null &&
        now._2.compareTo(prev._2) == 0
      dists = nextP
      prev = now
      it += 1
    }
    require(converged,
      s"shortestPaths did not converge in $maxIters rounds")
    val result = pinResult(dists.select(col("node"), col("dist")))
    GraftSqlBridge.freeLocalCheckpoint(dists)
    e.unpersist(blocking = false)
    result
  }

  /** Earliest-arrival TEMPORAL reachability: an edge (src, dst, t) can
    * only be traversed at its timestamp t, and only STRICTLY after the
    * walker arrived at src — the time-respecting path semantics of
    * information-flow / contagion / session-navigation analysis (a
    * static BFS overcounts: reachability through a node requires the
    * outgoing edge to fire AFTER the incoming one). Same relaxation
    * machinery as [[shortestPaths]]: arrival times only decrease, the
    * node set only grows, so count+sum equality is a fixpoint proof;
    * per round one edges⋈arrivals join (with the t > arrival gate) and
    * one min-aggregation, both node-keyed.
    *
    * @param edges (src, dst, t) with long timestamps
    * @return (node, arrival) — earliest time each node is reachable;
    *         the source carries `startAt`
    */
  def earliestArrival(spark: SparkSession, edges: DataFrame, source: Long,
                      startAt: Long = Long.MinValue,
                      maxIters: Int = 50): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("t")).persist()
    // LAZY seed + closed-form initial state — see [[shortestPaths]] (r16)
    var arr = e.sparkSession.range(1).select(
      lit(source).as("node"), lit(startAt).as("arrival"))
      .localCheckpoint(eager = false)
    def state(d: DataFrame): (Long, java.math.BigDecimal) = {
      val row = d.agg(count(lit(1)),
        sum(col("arrival").cast("decimal(38,0)"))).first()
      (row.getLong(0), row.getDecimal(1))
    }
    var prev: (Long, java.math.BigDecimal) =
      (1L, java.math.BigDecimal.valueOf(startAt))
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val relaxed = e
        .join(arr.withColumnRenamed("node", "src"), "src")
        .where(col("t") > col("arrival"))
        .select(col("dst").as("node"), col("t").as("arrival"))
      val next = arr.union(relaxed)
        .groupBy("node").agg(min("arrival").as("arrival"))
      val nextP = next.localCheckpoint(eager = false)
      val now = state(nextP)
      GraftSqlBridge.freeLocalCheckpoint(arr)
      converged = now._1 == prev._1 && now._2 != null &&
        now._2.compareTo(prev._2) == 0
      arr = nextP
      prev = now
      it += 1
    }
    require(converged,
      s"earliestArrival did not converge in $maxIters rounds")
    val result = pinResult(arr.select(col("node"), col("arrival")))
    GraftSqlBridge.freeLocalCheckpoint(arr)
    e.unpersist(blocking = false)
    result
  }

  /** k-core peeling: iteratively delete nodes of degree < k (with their
    * edges) until every survivor has degree ≥ k inside the surviving
    * subgraph. The k-core is the standard "dense enough to matter"
    * filter over a crawl/link graph — spam chains and isolated tails
    * peel away, hubs survive.
    *
    * Runs a FIXED number of peel rounds so the result is
    * hash-checkable and the DuckDB oracle can unroll the same rounds
    * (the [[pageRank]] discipline); when a round deletes nothing the
    * remaining rounds are no-ops, so `rounds` ≥ the peel depth gives
    * the true k-core. Each round is one map-side-combined degree
    * aggregation plus two hash joins on the node key — shuffle volume
    * is the (shrinking) edge list, never the node set squared. Lineage
    * is truncated per round (eager localCheckpoint, previous blocks
    * freed) so storage stays O(1) in rounds.
    *
    * @param edges undirected edge list with columns (a, b); self-loops
    *              are dropped, duplicates collapse
    * @return surviving (node, deg) — degree within the k-core subgraph
    */
  def kCore(spark: SparkSession, edges: DataFrame, k: Int,
            rounds: Int): DataFrame = {
    var e = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .where(col("src") =!= col("dst")).distinct()
      .localCheckpoint()
    for (_ <- 1 to rounds) {
      val keep = e.groupBy("src").agg(count(lit(1)).as("deg"))
        .where(col("deg") >= k).select("src")
      // symmetrized list ⇒ filtering src-side then dst-side induces the
      // subgraph on the surviving nodes
      val next = e.join(keep, "src")
        .join(keep.withColumnRenamed("src", "dst"), "dst")
        .select("src", "dst")
        .localCheckpoint()
      GraftSqlBridge.freeLocalCheckpoint(e)
      e = next
    }
    val result = pinResult(
      e.groupBy("src").agg(count(lit(1)).cast("long").as("deg"))
        .withColumnRenamed("src", "node"))
    GraftSqlBridge.freeLocalCheckpoint(e)
    result
  }

  /** Synchronous label propagation (community detection): every node
    * starts as its own label; each round, every node adopts the most
    * frequent label among its neighbors, ties broken by the SMALLEST
    * label — fully deterministic, so a fixed round count is
    * hash-checkable (asynchronous LPA is run-order-dependent and could
    * never sit under a bit-exact oracle).
    *
    * Scale shape, per round: one equi-join of the edge list with the
    * |nodes|-row label table (labels are the small side at crawl-graph
    * densities — broadcastable when |nodes| ≪ |edges|), one
    * map-side-combined (node, label) count, one per-node argmax window
    * (partition-parallel). Nothing is quadratic; lineage is truncated
    * per round like [[kCore]] so storage stays O(1) in rounds.
    *
    * @param edges undirected edge list (a, b); self-loops dropped
    * @return (node, label) after `rounds` synchronous updates
    */
  def labelPropagation(spark: SparkSession, edges: DataFrame,
                       rounds: Int): DataFrame = {
    // LAZY checkpoint chain — see [[pageRank]] (r16): fixed rounds, no
    // convergence check, so the final pin is the single materializing
    // job; `e`'s checkpoint blocks land on its first read inside that
    // job and every later round reads them back
    val e = edges.select(col("a").as("src"), col("b").as("dst"))
      .union(edges.select(col("b").as("src"), col("a").as("dst")))
      .where(col("src") =!= col("dst")).distinct()
      .localCheckpoint(eager = false)
    val chain = scala.collection.mutable.ListBuffer.empty[DataFrame]
    var labels = e.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("label"))
      .localCheckpoint(eager = false)
    chain += labels
    for (_ <- 1 to rounds) {
      val counted = e
        .join(labels.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val next = counted.withColumn("rk",
          row_number().over(org.apache.spark.sql.expressions.Window
            .partitionBy(col("node"))
            .orderBy(col("cnt").desc, col("label"))))
        .where(col("rk") === 1).select(col("node"), col("label"))
        .localCheckpoint(eager = false)
      chain += next
      labels = next
    }
    val result = pinResult(labels.select(col("node"), col("label")))
    chain.foreach(GraftSqlBridge.freeLocalCheckpoint)
    GraftSqlBridge.freeLocalCheckpoint(e)
    result
  }

  /** HITS hubs & authorities (Kleinberg, JACM'99) — which pages in the
    * crawl graph are good link DIRECTORIES (hubs) vs good link TARGETS
    * (authorities); the companion centrality to [[pageRank]] over the
    * reference's edge output (`web_spider_oo.py:123-128`).
    *
    * Fixed-round UNNORMALIZED power iteration in exact integer
    * arithmetic: h₀ = 1; each round a(v) = Σ_{u→v} h(u) then
    * h(u) = Σ_{u→v} a(v). The usual per-round L2 normalization is a
    * positive scalar — it never changes the RANKING, only the scale —
    * so skipping it keeps every value an exact integer and makes a
    * fixed-round run hash-checkable across engines (the [[pageRank]]
    * discipline). Sums accumulate in DECIMAL(38,0): r rounds bound
    * values by deg^(2r), which overflows LONG on high-degree graphs.
    *
    * Per round: two edge⋈score joins + two node-keyed map-side-combined
    * aggregations — the same shuffle budget as two groupBys on the node
    * key; per-round localCheckpoint keeps lineage O(1) in rounds.
    *
    * @param edges directed edge list (src, dst)
    * @return (node, auth, hub) as DECIMAL(38,0) after `rounds` rounds
    */
  def hits(spark: SparkSession, edges: DataFrame, nodes: DataFrame,
           rounds: Int): DataFrame = {
    val e = edges.select(col("src"), col("dst")).persist()
    val n = nodes.select(col("node")).persist()
    val one = lit(1).cast(org.apache.spark.sql.types.DecimalType(38, 0))
    val zero = lit(0).cast(org.apache.spark.sql.types.DecimalType(38, 0))
    // the initial score tables are constant projections of the persisted
    // node set — LAZY checkpoints, materialized by round 1's single job
    var hub = n.select(col("node"), one.as("h")).localCheckpoint(eager = false)
    var auth = n.select(col("node"), zero.as("a")).localCheckpoint(eager = false)
    for (_ <- 1 to rounds) {
      // a(k) rides a LAZY checkpoint inside h(k)'s eager one: one
      // materializing action per round instead of two (r16) — h(k)
      // depends on a(k), so the single job computes both, and the
      // PREVIOUS round's blocks are freed only after it lands (a(k)'s
      // plan reads hub(k-1))
      val aNext = n.join(
          e.join(hub.withColumnRenamed("node", "src"), "src")
            .groupBy(col("dst").as("node")).agg(sum("h").as("s")),
          Seq("node"), "left_outer")
        .select(col("node"),
          coalesce(col("s"), zero).cast(
            org.apache.spark.sql.types.DecimalType(38, 0)).as("a"))
        .localCheckpoint(eager = false)
      val hNext = n.join(
          e.join(aNext.withColumnRenamed("node", "dst"), "dst")
            .groupBy(col("src").as("node")).agg(sum("a").as("s")),
          Seq("node"), "left_outer")
        .select(col("node"),
          coalesce(col("s"), zero).cast(
            org.apache.spark.sql.types.DecimalType(38, 0)).as("h"))
        .localCheckpoint()
      GraftSqlBridge.freeLocalCheckpoint(auth)
      GraftSqlBridge.freeLocalCheckpoint(hub)
      auth = aNext
      hub = hNext
    }
    val result = pinResult(auth.join(hub, "node")
      .select(col("node"), col("a").as("auth"), col("h").as("hub")))
    GraftSqlBridge.freeLocalCheckpoint(auth)
    GraftSqlBridge.freeLocalCheckpoint(hub)
    Seq(e, n).foreach(_.unpersist(blocking = false))
    result
  }

  /** Bounded co-purchase customer graph — the shared derivation behind
    * `q_assortativity`, `q_conductance`, and `q_modularity` (hoisted in
    * r7 so the scale fix lands once instead of three pasted copies):
    * customers are linked when they bought the same part, with per-part
    * fan-out capped to the `cap` smallest custkeys (≤ C(cap,2) edges per
    * part, so the self-join can never explode on a popular part).
    *
    * Scale shape: shrink BEFORE any join — distinct (order, part) pairs
    * first — then join the order→customer key map WITHOUT a broadcast
    * hint. Orders is a FACT table: at bench scale AQE broadcasts the
    * narrow projection on its own, but a compulsory `broadcast()` would
    * OOM the driver at 100 TB where orders is billions of rows (keys-only
    * narrowness does not bound cardinality). The capped self-join keys on
    * pk, and the result is the distinct undirected edge list (a < b).
    *
    * @param lineitem the lineitem fact table (l_orderkey, l_partkey, …)
    * @param orders   the orders fact table (o_orderkey, o_custkey, …)
    * @return distinct edges (a, b) with a < b, both custkeys
    */
  def coPurchaseEdges(lineitem: DataFrame, orders: DataFrame,
                      cap: Int = 4): DataFrame = {
    val li0 = lineitem
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
    val ords = orders
      .select(col("o_orderkey").as("ok"), col("o_custkey").as("ck"))
    // r15: ONE exchange carries the corpus instead of three. The old
    // shape shuffled the (ok, pk) projection for a pre-join distinct,
    // shuffled the joined (pk, ck) pairs again for a second distinct,
    // and then repartitioned by pk for the cap — but (ok, pk)
    // duplicates are rare (an order repeating a part), the join is a
    // broadcast at bench scale and key-partitioned either way at real
    // scale, and HashPartitioning(pk) already satisfies the (pk, ck)
    // dedup's ClusteredDistribution (a subset of the grouping keys), so
    // BOTH distincts fold into aggregates above the single by-pk
    // exchange, exchange-free.
    val li = li0.join(ords, "ok").select(col("pk"), col("ck"))
    // the cap + capped self-join are the CPU-dense stages, and at
    // bench scale AQE size-coalesces their input to a handful of
    // partitions (bytes-small, compute-heavy — the shape size-based
    // coalescing misjudges). Pin the width to the session's core count;
    // the explicit hash-by-pk repartition doubles as the cap operator's
    // AND the fused dedup's required distribution, so the whole
    // dedup+cap pipeline runs above one exchange. (The cap's partial
    // heap pass is a post-shuffle no-op in this shape — the explicit
    // repartition already satisfies the final heap's distribution —
    // kept because the operator plans it unconditionally.)
    //
    // r14 (VERDICT r13 task 5): the per-pk cap runs through the
    // bounded-heap TopKPerKey instead of a row_number window — no full
    // per-partition sort of the (pk, ck) corpus, O(n log cap) heaps.
    // The `cap` SMALLEST custkeys are the top-cap by NEGATED key
    // (custkeys are non-null and unique per pk after the fused
    // dropDuplicates, so the heap's arbitrary-tie caveat never
    // applies).
    val width = lineitem.sparkSession.sparkContext.defaultParallelism
    val capped = graft.plans.TopKPerKey.topKPerKey(
        li.repartition(width, col("pk"))
          .dropDuplicates("pk", "ck")
          .withColumn("nck", -col("ck")),
        Seq("pk"), "nck", cap)
      .drop("nck")
    capped.as("x").join(capped.as("y"),
        col("x.pk") === col("y.pk") && col("x.ck") < col("y.ck"))
      .select(col("x.ck").as("a"), col("y.ck").as("b"))
      .distinct()
  }
}
