package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Eighty-eighth wave — phrase search, critical-path scheduling, and
  * quantile treatment effects.
  *
  *  - `q_phrase_search`: positional-inverted-index phrase matching —
  *    the IR primitive behind every "exact phrase" query: tokens carry
  *    positions, and a 3-token phrase is two self-joins on (doc,
  *    pos+1)/(doc, pos+2) over the PHRASE TOKENS' postings only (the
  *    index prunes before any join). The ORACLE takes a genuinely
  *    independent route — substring containment count on the
  *    space-padded text — so the hash match proves the index plumbing
  *    against a direct scan, not against itself. The phrase tokens are
  *    mined deterministically (most frequent document-initial trigram).
  *  - `q_critical_path`: longest-path (critical-path) analysis of a
  *    deterministic task DAG (tasks 0..99, edges t → t+7 and t → t+13,
  *    duration t mod 10 + 1) — the PERT/CPM scheduling core. Spark
  *    relaxes level by level in a bounded driver loop (⌈100/7⌉ rounds,
  *    frontier-sized states); the oracle walks every (node, dist) pair
  *    in a recursive CTE with UNION dedup (distance values are
  *    bounded, so the pair space stays polynomial). Emits each task's
  *    earliest finish and the global critical path length.
  *  - `q_qte`: quantile treatment effects — the per-decile difference
  *    between the A and B per-user value distributions via EXACT
  *    discrete order statistics (ceil(q·n)-th value, integer ranks, no
  *    interpolation). Where q_cuped moves the mean and q_wasserstein
  *    integrates the gap, QTE shows WHERE in the distribution the
  *    treatment acts. Per-arm rank windows (bounded by arm size).
  */
object R88Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_phrase_search ----------

  val qPhraseSearch = QueryDef("q_phrase_search",
    (s, dir) => {
      // referenced by the miner and all three postings branches —
      // pinned so the explode runs once instead of four times
      val toks = Queries.pin(t(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          col("col").as("tok")))
      // deterministic phrase: the most frequent document-INITIAL trigram
      val w3 = Window.partitionBy("doc_id").orderBy("pos")
      val tri = toks.where(col("pos") <= 2) // miner needs the head only
        .withColumn("t2", lead(col("tok"), 1).over(w3))
        .withColumn("t3", lead(col("tok"), 2).over(w3))
        .where(col("pos") === 0 && col("t3").isNotNull)
        .groupBy(col("tok").as("p1"), col("t2").as("p2"), col("t3").as("p3"))
        .agg(count(lit(1)).cast("long").as("f"))
      // 1 row referenced by four joins — pinned once or the
      // full-corpus trigram mine re-runs per reference
      val phrase = Queries.pin(
        tri.orderBy(col("f").desc, col("p1"), col("p2"), col("p3"))
          .limit(1))
      // postings of the three phrase tokens only, then adjacency joins
      val a = toks.join(broadcast(phrase), col("tok") === col("p1"))
        .select(col("doc_id"), col("pos"))
      val b = toks.join(broadcast(phrase), col("tok") === col("p2"))
        .select(col("doc_id").as("db"), col("pos").as("pb"))
      val c = toks.join(broadcast(phrase), col("tok") === col("p3"))
        .select(col("doc_id").as("dc"), col("pos").as("pc"))
      val hits = a
        .join(b, col("db") === col("doc_id") && col("pb") === col("pos") + 1)
        .join(c, col("dc") === col("doc_id") && col("pc") === col("pos") + 2)
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_occur"),
          min(col("pos")).cast("long").as("first_pos"))
      // independent cross-check rides along: a direct substring scan of
      // the space-padded text must agree with the index on PRESENCE
      val scan = t(s, dir, "documents").crossJoin(broadcast(phrase))
        .select(col("doc_id"), when(expr(
          "contains(' ' || text || ' ', ' ' || p1 || ' ' || p2 || ' ' || p3 || ' ')"),
          1L).otherwise(0L).as("scan_hit"))
      hits.join(scan, "doc_id")
        .select(col("doc_id"), col("n_occur"), col("first_pos"), col("scan_hit"))
        .orderBy("doc_id")
    },
    Some(
      """WITH toks AS (
        |  SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos, tok FROM (
        |    SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
        |      unnest(string_split(text, ' ')) AS tok
        |    FROM documents)),
        |led AS (
        |  SELECT doc_id, pos, tok,
        |    lead(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
        |    lead(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t3
        |  FROM toks),
        |phrase AS (
        |  SELECT tok AS p1, t2 AS p2, t3 AS p3
        |  FROM led WHERE pos = 0 AND t3 IS NOT NULL
        |  GROUP BY 1, 2, 3
        |  ORDER BY count(*) DESC, p1, p2, p3 LIMIT 1),
        |hits AS (
        |  SELECT l.doc_id, CAST(count(*) AS BIGINT) AS n_occur,
        |    CAST(min(l.pos) AS BIGINT) AS first_pos
        |  FROM led l JOIN phrase p
        |    ON l.tok = p.p1 AND l.t2 = p.p2 AND l.t3 = p.p3
        |  GROUP BY l.doc_id),
        |-- independent presence check: direct substring scan of the
        |-- space-padded text rides along in the hashed result
        |scan AS (
        |  SELECT d.doc_id,
        |    CAST(CASE WHEN contains(' ' || d.text || ' ',
        |      ' ' || p.p1 || ' ' || p.p2 || ' ' || p.p3 || ' ')
        |      THEN 1 ELSE 0 END AS BIGINT) AS scan_hit
        |  FROM documents d CROSS JOIN phrase p)
        |SELECT h.doc_id, h.n_occur, h.first_pos, s.scan_hit
        |FROM hits h JOIN scan s ON s.doc_id = h.doc_id
        |ORDER BY h.doc_id""".stripMargin))

  // ---------- q_critical_path ----------

  private val nTasks = 100L

  val qCriticalPath = QueryDef("q_critical_path",
    (s, dir) => {
      // task table derives from part keys for stable provenance
      val tasks = t(s, dir, "part").where(col("p_partkey") < nTasks)
        .select(col("p_partkey").as("task"),
          (col("p_partkey") % 10 + 1).cast("long").as("dur"))
      // relax level by level: dist(t) = earliest finish of t
      var dist = tasks.select(col("task"), col("dur").as("dist"))
      val rounds = (nTasks / 7 + 1).toInt
      for (_ <- 1 to rounds) {
        val viaEdges = dist.select(col("task").as("src"), col("dist"))
          .withColumn("step", explode(array(lit(7L), lit(13L))))
          .select((col("src") + col("step")).as("task"),
            col("dist").as("base"))
          .join(tasks, "task")
          .select(col("task"), (col("base") + col("dur")).as("dist"))
        val next = dist.unionAll(viaEdges)
          .groupBy("task").agg(max(col("dist")).as("dist"))
          // the state is 100 rows; truncate lineage each round or the
          // self-referencing union doubles the plan tree per iteration
          // (2^15 nodes by round 15 — measured hang in analysis).
          // persist would NOT truncate, so the loop keeps the
          // localCheckpoint shape and frees each round's predecessor;
          // only the final state is pinned (reclaimable) below
          .localCheckpoint()
        org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(dist)
        dist = next
      }
      val distP = Queries.pin(dist.select(col("task"), col("dist")))
      org.apache.spark.sql.GraftSqlBridge.freeLocalCheckpoint(dist)
      val cp = distP.agg(max(col("dist")).as("critical_path"))
      distP.crossJoin(broadcast(cp))
        .select(col("task"), col("dist").cast("long").as("finish"),
          col("critical_path").cast("long").as("critical_path"))
        .orderBy("task")
    },
    Some(
      s"""WITH RECURSIVE tasks AS (
         |  SELECT p_partkey AS task, CAST(p_partkey % 10 + 1 AS BIGINT) AS dur
         |  FROM part WHERE p_partkey < $nTasks),
         |walk AS (
         |  SELECT task, dur AS dist FROM tasks
         |  UNION
         |  SELECT t.task, w.dist + t.dur
         |  FROM walk w JOIN tasks t
         |    ON t.task = w.task + 7 OR t.task = w.task + 13),
         |finishes AS (
         |  SELECT task, CAST(max(dist) AS BIGINT) AS finish FROM walk GROUP BY task),
         |cp AS (SELECT CAST(max(finish) AS BIGINT) AS critical_path FROM finishes)
         |SELECT task, finish, critical_path
         |FROM finishes CROSS JOIN cp
         |ORDER BY task""".stripMargin))

  // ---------- q_qte ----------

  val qQte = QueryDef("q_qte",
    (s, dir) => {
      val per = Tables.events(s, dir).groupBy("user_id")
        .agg(sum(expr("CAST(round(value * 100.0) AS BIGINT)")).cast("long")
          .as("v"))
        .withColumn("arm", when(col("user_id") % 2 === 0, "a").otherwise("b"))
      val w = Window.partitionBy("arm").orderBy("v", "user_id")
      val ranked = per
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("arm")).cast("long"))
      val deciles = ranked
        .withColumn("q", explode(sequence(lit(1), lit(9))))
        .withColumn("q", col("q").cast("long"))
        // k = ⌈q·n/10⌉ via integer ceil
        .where(col("rk") ===
          expr("CAST((q * n + 9 - (q * n + 9) % 10) / 10 AS BIGINT)"))
        .select(col("arm"), col("q"), col("v"))
      val qa = deciles.where(col("arm") === "a")
        .select(col("q"), col("v").as("v_a"))
      val qb = deciles.where(col("arm") === "b")
        .select(col("q"), col("v").as("v_b"))
      qa.join(qb, "q")
        .select(col("q"), col("v_a"), col("v_b"),
          (col("v_b") - col("v_a")).as("qte_c"))
        .orderBy("q")
    },
    Some(
      """WITH per AS (
        |  SELECT user_id,
        |    CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS v,
        |    CASE WHEN user_id % 2 = 0 THEN 'a' ELSE 'b' END AS arm
        |  FROM events GROUP BY user_id),
        |ranked AS (
        |  SELECT arm, v,
        |    row_number() OVER (PARTITION BY arm ORDER BY v, user_id) AS rk,
        |    count(*) OVER (PARTITION BY arm) AS n
        |  FROM per),
        |deciles AS (
        |  SELECT arm, qs.q, v
        |  FROM ranked CROSS JOIN (SELECT unnest(generate_series(1, 9)) AS q) qs
        |  WHERE rk = CAST((qs.q * n + 9 - (qs.q * n + 9) % 10) / 10 AS BIGINT))
        |SELECT a.q, a.v AS v_a, b.v AS v_b, CAST(b.v - a.v AS BIGINT) AS qte_c
        |FROM deciles a JOIN deciles b ON a.q = b.q
        |WHERE a.arm = 'a' AND b.arm = 'b'
        |ORDER BY a.q""".stripMargin))

  val all: Seq[QueryDef] = Seq(qPhraseSearch, qCriticalPath, qQte)
}
