package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Sixty-seventh wave — SCC by pointer doubling, triplet mining, market
  * concentration.
  *
  *  - `q_scc_functional`: strongly connected components of a functional
  *    graph (out-degree 1: f(i) = (i² + 7) mod 1000 — 14 cycles of
  *    varied length with long tails). The classic pointer-jumping
  *    recipe: K = ⌈log₂ n⌉ doubling rounds carry (f^{2^k}(i),
  *    min-label-on-path); after K rounds the path covers ≥ n steps, so
  *    every cycle node's min IS its component representative, and the
  *    image of f^{2^K} is exactly the set of cycle nodes. O(log n)
  *    hash joins total — never O(n) sequential steps — with per-round
  *    lineage truncation (the GraphOps discipline). The oracle unrolls
  *    the same 10 rounds as generated CTE levels and matches the
  *    simulated ground truth (14 cycles).
  *  - `q_triplet_mining`: hardest-positive / hardest-negative mining
  *    over the labeled embedding corpus — per anchor, the SAME-label
  *    vector with minimum inner product and the DIFFERENT-label vector
  *    with maximum inner product, and the triplet margin. Exact
  *    integer-lattice dot products (×10⁶ floor as q_gram_matrix);
  *    argmin/argmax ride min/max(struct(dot, id)) with deterministic
  *    tie-breaks. The exact brute-force form is bounded (100 anchors ×
  *    ≤1000 corpus); the production path routes candidates through the
  *    ANN shortlist ([[graft.ext.PqAnn]]) exactly as q_knn_cosine's
  *    scale note documents.
  *  - `q_hhi`: Herfindahl-Hirschman market-concentration index per
  *    region — nation revenue shares in exact basis points, HHI =
  *    Σ share². Dimension-sized end to end (25 nations / 5 regions);
  *    the fact scan aggregates once on the join keys.
  */
object R67Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_scc_functional ----------

  private val SccN = 1000
  private val SccRounds = 10 // 2^10 = 1024 >= n: every path reaches its cycle

  private val sccOracle: String = {
    val base =
      s"""WITH d0 AS (
         |  SELECT CAST(t.i AS BIGINT) AS id, CAST((t.i * t.i + 7) % $SccN AS BIGINT) AS p,
         |    CAST(least(t.i, (t.i * t.i + 7) % $SccN) AS BIGINT) AS m
         |  FROM range(0, $SccN) t(i))""".stripMargin
    val rounds = (1 to SccRounds).map { k =>
      s""",
         |d$k AS (
         |  SELECT a.id, b.p AS p, least(a.m, b.m) AS m
         |  FROM d${k - 1} a JOIN d${k - 1} b ON a.p = b.id)""".stripMargin
    }.mkString
    base + rounds +
      s"""
         |, cyc AS (SELECT DISTINCT p AS cnode FROM d$SccRounds),
         |reps AS (SELECT d.m AS rep FROM cyc JOIN d$SccRounds d ON d.id = cyc.cnode)
         |SELECT rep, CAST(count(*) AS BIGINT) AS cycle_len FROM reps
         |GROUP BY rep ORDER BY rep""".stripMargin
  }

  val qSccFunctional = QueryDef("q_scc_functional",
    (s, dir) => {
      var d = s.range(0, SccN).select(col("id"),
        ((col("id") * col("id") + 7) % SccN).as("p"),
        least(col("id"), (col("id") * col("id") + 7) % SccN).as("m"))
      for (_ <- 1 to SccRounds) {
        val b = d.select(col("id").as("bid"), col("p").as("bp"),
          col("m").as("bm"))
        val next = d.join(b, col("p") === col("bid"))
          .select(col("id"), col("bp").as("p"),
            least(col("m"), col("bm")).as("m"))
          .localCheckpoint() // truncate the O(log n)-round lineage
        org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(d)
        d = next
      }
      // pin the fixpoint (consumed by cyc AND the reps join) through
      // the CacheManager, then free the last round's checkpoint blocks
      val dP = Queries.pin(d.select(col("id"), col("p"), col("m")))
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(d)
      val cyc = dP.select(col("p").as("cnode")).distinct()
      val reps = cyc.join(dP, cyc("cnode") === dP("id"))
        .select(col("m").as("rep"))
      reps.groupBy("rep").agg(count(lit(1)).cast("long").as("cycle_len"))
        .orderBy("rep")
    },
    Some(sccOracle))

  // ---------- q_triplet_mining ----------

  val qTripletMining = QueryDef("q_triplet_mining",
    (s, dir) => {
      val pts = t(s, dir, "embeddings").where(col("vec_id") < 1000)
        .select(col("vec_id"), col("label"), expr(
          "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
          .as("v"))
      val anchors = pts.where(col("vec_id") < 100)
        .select(col("vec_id").as("a"), col("label").as("la"),
          col("v").as("va"))
      val corpus = pts.select(col("vec_id").as("b"), col("label").as("lb"),
        col("v").as("vb"))
      // bounded anchors broadcast against the corpus: the exact
      // brute-force baseline (production mines through the ANN shortlist)
      val dots = corpus.crossJoin(broadcast(anchors))
        .where(col("a") =!= col("b"))
        .select(col("a"), col("b"), col("la"), col("lb"),
          expr("aggregate(zip_with(va, vb, (x, y) -> x * y), 0L," +
            " (acc, x) -> acc + x)").as("dot"))
      val pos = dots.where(col("la") === col("lb"))
        .groupBy("a")
        .agg(min(struct(col("dot"), col("b"))).as("ps"))
        .select(col("a"), col("ps.b").as("pos_id"),
          col("ps.dot").as("pos_dot"))
      val neg = dots.where(col("la") =!= col("lb"))
        .groupBy("a")
        .agg(max(struct(col("dot"), (-col("b")).as("nb"))).as("ns"))
        .select(col("a"), (-col("ns.nb")).as("neg_id"),
          col("ns.dot").as("neg_dot"))
      pos.join(neg, "a")
        .select(col("a").as("vec_id"), col("pos_id"), col("pos_dot"),
          col("neg_id"), col("neg_dot"),
          (col("pos_dot") - col("neg_dot")).as("margin"))
        .orderBy("vec_id")
    },
    Some(
      """WITH pts AS (
        |  SELECT vec_id, label, CAST(i - 1 AS BIGINT) AS d,
        |    CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000) AS BIGINT) AS v
        |  FROM embeddings, range(1, 65) t(i) WHERE vec_id < 1000),
        |dots AS (
        |  SELECT a.vec_id AS a, b.vec_id AS b, a.label AS la, b.label AS lb,
        |    CAST(sum(a.v * b.v) AS BIGINT) AS dot
        |  FROM (SELECT * FROM pts WHERE vec_id < 100) a
        |  JOIN pts b ON a.d = b.d AND a.vec_id <> b.vec_id
        |  GROUP BY a.vec_id, b.vec_id, a.label, b.label),
        |pos AS (
        |  SELECT a, CAST(min(dot) AS BIGINT) AS pos_dot,
        |    CAST(min(CASE WHEN dot = md THEN b END) AS BIGINT) AS pos_id
        |  FROM (SELECT a, b, dot, min(dot) OVER (PARTITION BY a) AS md
        |        FROM dots WHERE la = lb) x
        |  GROUP BY a),
        |neg AS (
        |  SELECT a, CAST(max(dot) AS BIGINT) AS neg_dot,
        |    CAST(min(CASE WHEN dot = md THEN b END) AS BIGINT) AS neg_id
        |  FROM (SELECT a, b, dot, max(dot) OVER (PARTITION BY a) AS md
        |        FROM dots WHERE la <> lb) x
        |  GROUP BY a)
        |SELECT p.a AS vec_id, p.pos_id, p.pos_dot, n.neg_id, n.neg_dot,
        |  CAST(p.pos_dot - n.neg_dot AS BIGINT) AS margin
        |FROM pos p JOIN neg n ON p.a = n.a
        |ORDER BY vec_id""".stripMargin))

  // ---------- q_hhi ----------

  val qHhi = QueryDef("q_hhi",
    (s, dir) => {
      val spend = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_regionkey").cast("long").as("region"),
          col("n_name").as("nation"))
        .agg(sum(expr("CAST(round(o_totalprice * 100.0) AS BIGINT)"))
          .cast("long").as("cents"))
      val tot = spend.groupBy("region")
        .agg(sum(col("cents")).cast("long").as("t"))
      spend.join(broadcast(tot), "region")
        .select(col("region"), col("nation"),
          ((col("cents") * 10000L - (col("cents") * 10000L % col("t"))) /
            col("t")).cast("long").as("share_bp"))
        .groupBy("region")
        .agg(count(lit(1)).cast("long").as("n_nations"),
          sum(col("share_bp") * col("share_bp")).cast("long").as("hhi"))
        .orderBy("region")
    },
    Some(
      """WITH spend AS (
        |  SELECT CAST(n.n_regionkey AS BIGINT) AS region, n.n_name AS nation,
        |    CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |    JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY n.n_regionkey, n.n_name),
        |tot AS (SELECT region, CAST(sum(cents) AS BIGINT) AS t FROM spend GROUP BY region),
        |shares AS (
        |  SELECT s.region, s.nation,
        |    CAST((s.cents * 10000 - (s.cents * 10000 % tot.t)) / tot.t AS BIGINT) AS share_bp
        |  FROM spend s JOIN tot ON s.region = tot.region)
        |SELECT region, CAST(count(*) AS BIGINT) AS n_nations,
        |  CAST(sum(share_bp * share_bp) AS BIGINT) AS hhi
        |FROM shares GROUP BY region ORDER BY region""".stripMargin))

  val all: Seq[QueryDef] = Seq(qSccFunctional, qTripletMining, qHhi)
}
