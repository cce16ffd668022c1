package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.DedupOps
import graft.queries.Queries.QueryDef

/** Thirty-sixth wave — asymmetric near-dup and dedup quality
  * measurement.
  *
  *  - `q_containment`: directional shingle containment |A∩B|/|A| — the
  *    asymmetric signal Jaccard dilutes when sizes differ (a tweet
  *    quoted inside an article is 95% CONTAINED while the pair's
  *    Jaccard is tiny); inclusion flags are integer-exact at the 90%
  *    threshold.
  *  - `q_dedup_eval`: precision/recall of the LSH candidate generator
  *    against exact-Jaccard ground truth on the same corpus slice —
  *    the measurement loop a production dedup pipeline runs when
  *    tuning bands/rows trade-offs. Every count and both metrics (in
  *    basis points) are exact integers; the ≥0.3 truth threshold is
  *    evaluated as 10·inter ≥ 3·(na+nb−inter), never a double
  *    boundary.
  */
object R36Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_containment ----------

  /** Directional containment over the bounded shingle slice: for every
    * intersecting pair, c_ab = inter/|A| ("how much of A sits inside
    * B") and c_ba — per-row single divisions; near-inclusion flagged
    * when 10·inter ≥ 9·|side| (integer-exact). Same shuffle shape as
    * the Jaccard query: shingle equi-join, pair-keyed combine. */
  val qContainment = QueryDef("q_containment",
    (s, dir) => {
      val sh = ExtQueries.shingled(s, dir, 120)
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = sh.select(col("doc_id").as("a"), col("shingle"))
      val b = sh.select(col("doc_id").as("b"), col("shingle"))
      a.join(b, "shingle").where(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
        .select(col("a"), col("b"), col("inter"), col("na"), col("nb"),
          (col("inter").cast("double") / col("na").cast("double"))
            .as("c_ab"),
          (col("inter").cast("double") / col("nb").cast("double"))
            .as("c_ba"),
          (col("inter") * 10 >= col("na") * 9).as("a_in_b"),
          (col("inter") * 10 >= col("nb") * 9).as("b_in_a"))
        .orderBy("a", "b")
    },
    Some(
      s"""WITH ${ExtQueries.triSql(120)},
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |          FROM tri GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS a, b.doc_id AS b,
         |            CAST(count(*) AS BIGINT) AS inter
         |          FROM tri a JOIN tri b
         |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2)
         |SELECT i.a, i.b, i.inter, sa.n AS na, sb.n AS nb,
         |  CAST(i.inter AS DOUBLE) / CAST(sa.n AS DOUBLE) AS c_ab,
         |  CAST(i.inter AS DOUBLE) / CAST(sb.n AS DOUBLE) AS c_ba,
         |  i.inter * 10 >= sa.n * 9 AS a_in_b,
         |  i.inter * 10 >= sb.n * 9 AS b_in_a
         |FROM inter i JOIN sizes sa ON sa.doc_id = i.a
         |             JOIN sizes sb ON sb.doc_id = i.b
         |ORDER BY i.a, i.b""".stripMargin))

  // ---------- q_dedup_eval ----------

  /** LSH recall/precision audit at threshold 0.3 over docs < 200:
    * ground truth from the exact all-pairs intersection (affordable on
    * the audit SLICE — that is the point of an audit set), candidates
    * from the production band join. FN > 0 is expected — banding
    * trades recall for the ~2^b bucket shrink — and the measured
    * numbers are what band/row tuning optimizes. */
  val qDedupEval = QueryDef("q_dedup_eval",
    (s, dir) => {
      // persisted: the shingle slice feeds BOTH the exact-truth branch
      // and the MinHash/LSH candidate branch of the one-pass metric
      // join (audit-slice-sized; Bench clearCache reclaims it)
      val sh = ExtQueries.shingled(s, dir, 200).persist()
      val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
      val a = sh.select(col("doc_id").as("a"), col("shingle"))
      val b = sh.select(col("doc_id").as("b"), col("shingle"))
      val truth = a.join(b, "shingle").where(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("inter"))
        .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
        .where(col("inter") * 10 >= (col("na") + col("nb") - col("inter")) * 3)
        .select("a", "b")
      val sig = DedupOps.minhashSignatures(sh, "doc_id",
        ExtQueries.numSeeds)
      val cand = DedupOps.lshCandidatePairs(
        DedupOps.lshBands(sig, "doc_id", rowsPerBand = 4), "doc_id")
        .select("a", "b")
      // ONE action: a full-outer pair join classifies tp/fp/fn in a
      // single pass (three separate counts re-ran the whole shingle +
      // LSH pipeline per metric — 3× the work for 3 numbers); basis
      // points stay exact floor divisions, now computed in-plan.
      truth.withColumn("t", lit(1))
        .join(cand.withColumn("c", lit(1)), Seq("a", "b"), "full_outer")
        .agg(
          sum(when(col("t").isNotNull && col("c").isNotNull, 1L)
            .otherwise(0L)).as("tp"),
          sum(when(col("t").isNull, 1L).otherwise(0L)).as("fp"),
          sum(when(col("c").isNull, 1L).otherwise(0L)).as("fn"))
        .selectExpr("tp", "fp", "fn",
          "CASE WHEN tp + fp = 0 THEN CAST(0 AS BIGINT) ELSE (tp * 10000) div (tp + fp) END AS precision_bp",
          "CASE WHEN tp + fn = 0 THEN CAST(0 AS BIGINT) ELSE (tp * 10000) div (tp + fn) END AS recall_bp")
    },
    Some(
      s"""WITH ${ExtQueries.lshBandsSql(200)},
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n
         |          FROM tri GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS a, b.doc_id AS b,
         |            CAST(count(*) AS BIGINT) AS inter
         |          FROM tri a JOIN tri b
         |            ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |          GROUP BY 1, 2),
         |truth AS (
         |  SELECT i.a, i.b FROM inter i
         |  JOIN sizes sa ON sa.doc_id = i.a
         |  JOIN sizes sb ON sb.doc_id = i.b
         |  WHERE i.inter * 10 >= (sa.n + sb.n - i.inter) * 3
         |), m AS (
         |  SELECT
         |    (SELECT count(*) FROM truth t
         |     WHERE EXISTS (SELECT 1 FROM cand c
         |                   WHERE c.a = t.a AND c.b = t.b)) AS tp,
         |    (SELECT count(*) FROM cand c
         |     WHERE NOT EXISTS (SELECT 1 FROM truth t
         |                       WHERE t.a = c.a AND t.b = c.b)) AS fp,
         |    (SELECT count(*) FROM truth t
         |     WHERE NOT EXISTS (SELECT 1 FROM cand c
         |                       WHERE c.a = t.a AND c.b = t.b)) AS fn
         |)
         |SELECT CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp,
         |  CAST(fn AS BIGINT) AS fn,
         |  CAST(CASE WHEN tp + fp = 0 THEN 0
         |       ELSE (tp * 10000 - ((tp * 10000 % (tp + fp)) + tp + fp)
         |             % (tp + fp)) / (tp + fp) END AS BIGINT)
         |    AS precision_bp,
         |  CAST(CASE WHEN tp + fn = 0 THEN 0
         |       ELSE (tp * 10000 - ((tp * 10000 % (tp + fn)) + tp + fn)
         |             % (tp + fn)) / (tp + fn) END AS BIGINT)
         |    AS recall_bp
         |FROM m""".stripMargin))

  val all: Seq[QueryDef] = Seq(qContainment, qDedupEval)
}
