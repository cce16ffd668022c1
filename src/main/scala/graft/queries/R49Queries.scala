package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Forty-ninth wave — temporal reachability and TextRank.
  *
  *  - `q_temporal_reach`: earliest-arrival TIME-RESPECTING
  *    reachability ([[graft.ext.GraphOps.earliestArrival]]) over the
  *    q_sssp DAG construction with event timestamps as edge times —
  *    which pages/users information can actually REACH when every hop
  *    must fire after the previous one (a static BFS overcounts).
  *    The oracle walks the same recursive relation; the forward-only
  *    DAG bounds its enumeration exactly as in q_sssp.
  *  - `q_textrank`: TextRank keyword extraction (Mihalcea/Tarau '04) —
  *    integer-scaled PageRank over the word co-occurrence graph
  *    (adjacent-bigram edges, both directions). Reuses
  *    [[graft.ext.GraphOps.pageRank]]'s hash-checkable fixed-round
  *    arithmetic; the oracle unrolls the identical rounds keyed by the
  *    words themselves (node ids are an implementation detail the
  *    rank does not depend on).
  *
  * Scale design: temporal relaxation is the shortestPaths shuffle
  * budget (node-keyed join + min-agg per round, fixpoint-proved by one
  * aggregation); the co-occurrence graph is vocabulary²-bounded with a
  * count≥5 support gate, and the word→id mapping is a one-time
  * vocabulary-sized window.
  */
object R49Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_temporal_reach ----------

  val qTemporalReach = QueryDef("q_temporal_reach",
    (s, dir) => {
      val ev = Tables.events(s, dir)
      val e = ev.select((col("event_id") % 25).as("src"),
          ((col("event_id") % 25) + lit(4) + (col("user_id") % 5)).as("dst"),
          unix_micros(col("ts")).as("t"))
        .where(col("dst") <= 24)
        .groupBy("src", "dst").agg(min("t").as("t"))
      graft.ext.GraphOps.earliestArrival(s, e, source = 0L)
        .orderBy("node")
    },
    Some(
      """WITH RECURSIVE e AS (
        |  SELECT src, dst, min(t) AS t FROM (
        |    SELECT event_id % 25 AS src,
        |           event_id % 25 + 4 + user_id % 5 AS dst,
        |           epoch_us(ts) AS t
        |    FROM events) WHERE dst <= 24 GROUP BY src, dst),
        |walk(node, arrival) AS (
        |  SELECT CAST(0 AS BIGINT) AS node,
        |         CAST(-9223372036854775808 AS BIGINT) AS arrival
        |  UNION
        |  SELECT e.dst, e.t FROM walk w
        |  JOIN e ON e.src = w.node AND e.t > w.arrival)
        |SELECT node, min(arrival) AS arrival
        |FROM walk GROUP BY node ORDER BY node""".stripMargin))

  // ---------- q_textrank ----------

  private val TrDocs = 200
  private val TrMinCount = 5

  val qTextrank = QueryDef("q_textrank",
    (s, dir) => {
      val tok = t(s, dir, "documents").where(col("doc_id") < TrDocs)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .where(length(col("word")) > 0)
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val big = tok.withColumn("w2", lead("word", 1).over(w))
        .where(col("w2").isNotNull && col("word") =!= col("w2"))
        .select(col("word").as("w1"), col("w2"))
        .groupBy("w1", "w2").agg(count(lit(1)).as("c"))
        .where(col("c") >= TrMinCount)
        .select("w1", "w2")
      // pin the (tiny, support-gated) undirected bigram edge set once:
      // und feeds the vocabulary AND both endpoint joins, and vocab is
      // consumed three times — without the pin the full
      // tokenize+window+count pipeline re-evaluates per branch
      // (the q_edges_actual r9 lesson)
      val und = Queries.pin(
        big.union(big.select(col("w2").as("w1"), col("w1").as("w2")))
          .distinct())
      val vocab = Queries.pin(und.select(col("w1").as("word")).distinct()
        .withColumn("id",
          row_number().over(Window.partitionBy(lit(1)).orderBy("word"))
            .cast("long")))
      val e = und
        .join(vocab.select(col("word").as("w1"), col("id").as("src")), "w1")
        .join(vocab.select(col("word").as("w2"), col("id").as("dst")), "w2")
        .select("src", "dst")
      val nodes = vocab.select(col("id").as("node"))
      graft.ext.GraphOps.pageRank(s, e, nodes, iterations = 2)
        .join(vocab, col("node") === col("id"))
        .select(col("word"), col("rank_scaled"))
        .orderBy(col("rank_scaled").desc, col("word"))
        .limit(20)
    },
    Some(
      s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS arr
         |              FROM documents WHERE doc_id < $TrDocs),
         |idx AS (SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i
         |        FROM docs),
         |tok AS (SELECT doc_id, i AS pos, arr[i] AS word FROM idx
         |        WHERE len(arr[i]) > 0),
         |big0 AS (SELECT word AS w1,
         |           lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
         |         FROM tok),
         |bigc AS (SELECT w1, w2 FROM big0
         |         WHERE w2 IS NOT NULL AND w1 <> w2
         |         GROUP BY w1, w2 HAVING count(*) >= $TrMinCount),
         |e AS (SELECT w1 AS src, w2 AS dst FROM bigc
         |      UNION SELECT w2, w1 FROM bigc),
         |n AS (SELECT DISTINCT src AS node FROM e),
         |d AS (SELECT src, count(*) AS deg FROM e GROUP BY 1),
         |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS r FROM n),
         |c1 AS (SELECT e.dst AS node, sum(r.r // d.deg) AS c
         |       FROM e JOIN r0 r ON r.node = e.src JOIN d ON d.src = e.src GROUP BY 1),
         |r1 AS (SELECT n.node, CAST(150000000 + (85 * coalesce(c.c, 0)) // 100 AS BIGINT) AS r
         |       FROM n LEFT JOIN c1 c ON c.node = n.node),
         |c2 AS (SELECT e.dst AS node, sum(r.r // d.deg) AS c
         |       FROM e JOIN r1 r ON r.node = e.src JOIN d ON d.src = e.src GROUP BY 1),
         |r2 AS (SELECT n.node, CAST(150000000 + (85 * coalesce(c.c, 0)) // 100 AS BIGINT) AS r
         |       FROM n LEFT JOIN c2 c ON c.node = n.node)
         |SELECT node AS word, r AS rank_scaled FROM r2
         |ORDER BY rank_scaled DESC, word LIMIT 20""".stripMargin))

  val all: Seq[QueryDef] = Seq(qTemporalReach, qTextrank)
}
