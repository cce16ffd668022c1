package graft.ext

import org.apache.spark.sql.{DataFrame, SparkSession}
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

  /** @param edges undirected edge list with columns (a, b)
    * @return (node, component) where component = min node id reachable
    */
  def connectedComponents(spark: SparkSession, edges: DataFrame,
                          maxIters: Int = 20): DataFrame = {
    val persisted = scala.collection.mutable.ListBuffer.empty[DataFrame]
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
    var labels = nodes.select(col("node"), col("node").as("label"))
      .localCheckpoint()
    var converged = false
    var it = 0
    // labels only ever decrease, so the label sum is strictly monotone:
    // an unchanged sum means a fixpoint — one cheap aggregation instead of
    // a change-detection join per round; carried across rounds so each
    // round runs exactly one convergence job
    var sumPrev = labels.agg(sum(col("label").cast("decimal(38,0)")))
      .first().getDecimal(0)
    while (!converged && it < maxIters) {
      // each node pulls its neighbors' labels, keeps the minimum
      val neighborLabels = bidir
        .join(labels.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"), col("label"))
      val next = labels.select(col("node"), col("label"))
        .union(neighborLabels)
        .groupBy("node").agg(min("label").as("label"))
      val nextP = if ((it + 1) % 3 == 0) next.localCheckpoint()
                  else { val p = next.persist(); persisted += p; p }
      val sumNow = nextP.agg(sum(col("label").cast("decimal(38,0)")))
        .first().getDecimal(0)
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
    val result = labels.select(col("node"), col("label").as("component"))
      .localCheckpoint()
    persisted.foreach(_.unpersist(blocking = false))
    bidir.unpersist(blocking = false)
    result
  }
}
