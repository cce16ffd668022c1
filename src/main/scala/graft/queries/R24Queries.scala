package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Twenty-fourth wave — community detection and training-mix
  * construction arithmetic.
  *
  *  - `q_label_prop`: synchronous label-propagation communities over
  *    the link graph ([[graft.ext.GraphOps.labelPropagation]]) — the
  *    cheap community detector (no modularity optimization, one join +
  *    one argmax per round) used to group crawl hosts / near-dup
  *    neighborhoods before per-community sampling;
  *  - `q_quantile_norm`: per-source quantile normalization of a quality
  *    score — maps every doc onto its WITHIN-SOURCE percentile so a
  *    "keep top 20% of each source" rule compares calibrated ranks, not
  *    raw scores whose scales differ per source (the cross-source
  *    calibration step of a data-mix pipeline);
  *  - `q_sample_alloc`: largest-remainder (Hamilton) allocation of a
  *    fixed sample budget across language strata — the exact-integer
  *    "how many docs per stratum" step that proportional sampling
  *    needs (floors alone under-spend the budget; ad-hoc rounding
  *    over-spends it).
  */
object R24Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_label_prop ----------

  private val lpRounds = 3
  private val lpMod = 300

  /** LPA communities on the derived link graph (same modular-arithmetic
    * fixture family as q_kcore). Fixed synchronous rounds + smallest-
    * label tie-break make the result bit-exact in both engines; the
    * oracle unrolls the same rounds as CTEs. Output is per-node so the
    * hash covers every assignment, not just community sizes. */
  val qLabelProp = QueryDef("q_label_prop",
    (s, dir) => {
      val e = t(s, dir, "events")
        .where(col("event_id") % 13 === 0)
        .select((col("user_id") % lpMod).as("a"),
          (col("event_id") % lpMod).as("b"))
      graft.ext.GraphOps.labelPropagation(s, e, rounds = lpRounds)
        .orderBy("node")
    },
    Some {
      val sb = new StringBuilder
      sb.append(
        s"""WITH e AS (
           |  SELECT DISTINCT src, dst FROM (
           |    SELECT user_id % $lpMod AS src, event_id % $lpMod AS dst
           |    FROM events WHERE event_id % 13 = 0
           |    UNION ALL
           |    SELECT event_id % $lpMod, user_id % $lpMod
           |    FROM events WHERE event_id % 13 = 0)
           |  WHERE src <> dst
           |), l0 AS (
           |  SELECT DISTINCT src AS node, src AS label FROM e
           |)""".stripMargin)
      for (r <- 1 to lpRounds) {
        sb.append(
          s""", l$r AS (
             |  SELECT node, label FROM (
             |    SELECT e.src AS node, l.label,
             |      row_number() OVER (PARTITION BY e.src
             |        ORDER BY count(*) DESC, l.label) AS rk
             |    FROM e JOIN l${r - 1} l ON e.dst = l.node
             |    GROUP BY e.src, l.label)
             |  WHERE rk = 1
             |)""".stripMargin)
      }
      sb.append(
        s"""
           |SELECT node, label FROM l$lpRounds ORDER BY node""".stripMargin)
      sb.toString
    })

  // ---------- q_quantile_norm ----------

  /** Within-source percentile of n_chars: rank every doc inside its
    * source (deterministic (score, doc_id) order), emit
    * pct = (rk-1)/(n-1) and the integer-exact top-20% flag
    * (5·rk > 4·n — no double at the threshold). The percentile double
    * is PER-ROW (one IEEE division on identical integers in both
    * engines — deterministic); nothing sums doubles. One window per
    * source partition: partition-parallel at 100 TB, no global sort. */
  val qQuantileNorm = QueryDef("q_quantile_norm",
    (s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("n_chars"), col("doc_id"))
      t(s, dir, "documents")
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("rk", row_number().over(w).cast("long"))
        .withColumn("n", count(lit(1))
          .over(Window.partitionBy(col("source"))))
        .withColumn("pct", when(col("n") === 1, lit(0.0))
          .otherwise((col("rk") - 1).cast("double") /
            (col("n") - 1).cast("double")))
        .withColumn("top20", col("rk") * 5 > col("n") * 4)
        .select(col("doc_id"), col("source"), col("rk"), col("pct"),
          col("top20"))
        .orderBy(col("doc_id"))
    },
    Some(
      """SELECT doc_id, source, rk,
        |  CASE WHEN n = 1 THEN 0.0
        |       ELSE CAST(rk - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE)
        |  END AS pct,
        |  rk * 5 > n * 4 AS top20
        |FROM (
        |  SELECT doc_id, source,
        |    row_number() OVER (PARTITION BY source
        |                       ORDER BY n_chars, doc_id) AS rk,
        |    count(*) OVER (PARTITION BY source) AS n
        |  FROM documents)
        |ORDER BY doc_id""".stripMargin))

  // ---------- q_sample_alloc ----------

  private val saBudget = 100

  /** Hamilton / largest-remainder apportionment of a 100-doc sample
    * budget across language strata: base_i = floor(B·n_i / N) (exact
    * integer division via the sign-normalized-remainder identity — no
    * doubles), then the leftover B - Σ base seats go to the largest
    * remainders B·n_i mod N (ties → lang asc). Allocations sum to B
    * EXACTLY — floors alone under-spend, naive rounding over-spends.
    * The whole computation runs on the |strata|-row aggregate; the
    * corpus is touched once for the counts. */
  val qSampleAlloc = QueryDef("q_sample_alloc",
    // r16: route the global window(s) through the distributed rewrite
    (s, dir) => RewriteGlobalRankWindows.force {
      val strata = t(s, dir, "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
      val tot = Window.partitionBy(lit(1))
      val p = col("n_docs") * saBudget
      val total = sum(col("n_docs")).over(tot)
      strata
        .withColumn("base",
          ((p - ((p % total) + total) % total) / total).cast("long"))
        .withColumn("rem", p % total)
        .withColumn("deficit", lit(saBudget) - sum(col("base")).over(tot))
        .withColumn("rk", row_number().over(
          Window.partitionBy(lit(1)).orderBy(col("rem").desc, col("lang"))))
        .withColumn("alloc",
          col("base") + when(col("rk") <= col("deficit"), 1L).otherwise(0L))
        .select(col("lang"), col("n_docs"), col("alloc"))
        .orderBy(col("lang"))
    },
    Some(
      s"""WITH strata AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
         |  FROM documents GROUP BY lang
         |), calc AS (
         |  SELECT lang, n_docs,
         |    (n_docs * $saBudget
         |      - ((n_docs * $saBudget % sum(n_docs) OVER ())
         |         + sum(n_docs) OVER ()) % sum(n_docs) OVER ())
         |      / sum(n_docs) OVER () AS base,
         |    n_docs * $saBudget % sum(n_docs) OVER () AS rem
         |  FROM strata
         |), ranked AS (
         |  SELECT lang, n_docs, base, rem,
         |    $saBudget - sum(base) OVER () AS deficit,
         |    row_number() OVER (ORDER BY rem DESC, lang) AS rk
         |  FROM calc
         |)
         |SELECT lang, n_docs,
         |  CAST(base + CASE WHEN rk <= deficit THEN 1 ELSE 0 END AS BIGINT)
         |    AS alloc
         |FROM ranked ORDER BY lang""".stripMargin))

  val all: Seq[QueryDef] = Seq(qLabelProp, qQuantileNorm, qSampleAlloc)
}
