package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.DedupOps
import graft.queries.Queries.QueryDef

/** Ninety-third wave — difference-in-differences, blocking-quality
  * evaluation, and capture–recapture estimation.
  *
  *  - `q_did`: the difference-in-differences estimator (the
  *    parallel-trends workhorse of quasi-experiments): treatment =
  *    odd users, the period split at the event-time midpoint, and
  *    DiD = (Ȳ_t,post − Ȳ_t,pre) − (Ȳ_c,post − Ȳ_c,pre) over per-user
  *    purchase counts — four exact integer cell sums, one shared IEEE
  *    tree for the estimate, all four cell means emitted for the
  *    parallel-trends eyeball. Complements q_cuped (variance
  *    reduction) and q_qte (distributional effects).
  *  - `q_blocking_eval`: the standard entity-resolution blocking
  *    audit (reduction ratio + pairs completeness): ground truth =
  *    exact trigram-Jaccard ≥ 0.8 pairs, candidates = the
  *    minhash-LSH bucket pairs the dedup pipeline actually generates
  *    (DedupOps, 12 seeds × 3 bands — the SAME machinery q_lsh_pairs
  *    ships), RR = 1 − |cand|/|all pairs| and PC = |truth ∩ cand| /
  *    |truth| in exact basis points. Grades the blocking scheme
  *    BEFORE anyone trusts its 100 TB cost model.
  *  - `q_capture_recapture`: Lincoln–Petersen population estimation —
  *    "mark" the customers holding an order in one key sample,
  *    "recapture" in a second, N̂ = n₁·n₂/m — against the true
  *    distinct-customer count with the signed error in basis points.
  *    The estimator ecologists gave to stream sizing: how big is the
  *    population when you can only afford two samples.
  */
object R93Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val usPerDay = 86400000000L

  // ---------- q_did ----------

  val qDid = QueryDef("q_did",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      val mid = ev.agg(expr(
        "CAST(((min(us) + max(us)) - ((min(us) + max(us)) % 2)) / 2 AS BIGINT) AS m"))
      val cells = ev.crossJoin(broadcast(mid))
        .select(
          when(col("user_id") % 2 === 1, 1L).otherwise(0L).as("treat"),
          when(col("us") >= col("m"), 1L).otherwise(0L).as("post"),
          col("user_id"),
          when(col("event_type") === "purchase", 1L).otherwise(0L).as("y"))
        .groupBy("treat", "post", "user_id")
        .agg(sum(col("y")).cast("long").as("yu"))
        .groupBy("treat", "post")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("yu")).cast("long").as("sy"))
      val wide = cells.groupBy(lit(1).as("one"))
        .agg(
          max(when(col("treat") === 1 && col("post") === 1, col("sy"))).as("s11"),
          max(when(col("treat") === 1 && col("post") === 1, col("n"))).as("n11"),
          max(when(col("treat") === 1 && col("post") === 0, col("sy"))).as("s10"),
          max(when(col("treat") === 1 && col("post") === 0, col("n"))).as("n10"),
          max(when(col("treat") === 0 && col("post") === 1, col("sy"))).as("s01"),
          max(when(col("treat") === 0 && col("post") === 1, col("n"))).as("n01"),
          max(when(col("treat") === 0 && col("post") === 0, col("sy"))).as("s00"),
          max(when(col("treat") === 0 && col("post") === 0, col("n"))).as("n00"))
      wide.select(
        round(expr("CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)"), 6).as("m_t_post"),
        round(expr("CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE)"), 6).as("m_t_pre"),
        round(expr("CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)"), 6).as("m_c_post"),
        round(expr("CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE)"), 6).as("m_c_pre"),
        round(expr(
          "(CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE))" +
            " - (CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE))"), 6)
          .as("did"))
    },
    Some(
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |mid AS (
        |  SELECT CAST(((min(us) + max(us)) - ((min(us) + max(us)) % 2)) / 2 AS BIGINT)
        |    AS m FROM ev),
        |per AS (
        |  SELECT CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END AS treat,
        |    CASE WHEN us >= m THEN 1 ELSE 0 END AS post, user_id,
        |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS yu
        |  FROM ev CROSS JOIN mid GROUP BY 1, 2, 3),
        |cells AS (
        |  SELECT treat, post, CAST(count(*) AS BIGINT) AS n,
        |    CAST(sum(yu) AS BIGINT) AS sy
        |  FROM per GROUP BY 1, 2),
        |wide AS (
        |  SELECT
        |    max(CASE WHEN treat = 1 AND post = 1 THEN sy END) AS s11,
        |    max(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n11,
        |    max(CASE WHEN treat = 1 AND post = 0 THEN sy END) AS s10,
        |    max(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n10,
        |    max(CASE WHEN treat = 0 AND post = 1 THEN sy END) AS s01,
        |    max(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n01,
        |    max(CASE WHEN treat = 0 AND post = 0 THEN sy END) AS s00,
        |    max(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n00
        |  FROM cells)
        |SELECT
        |  round(CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE), 6) AS m_t_post,
        |  round(CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE), 6) AS m_t_pre,
        |  round(CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE), 6) AS m_c_post,
        |  round(CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE), 6) AS m_c_pre,
        |  round((CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE)
        |      - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE))
        |    - (CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE)
        |      - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE)), 6) AS did
        |FROM wide""".stripMargin))

  // ---------- q_blocking_eval ----------

  private val maxDoc = 200

  val qBlockingEval = QueryDef("q_blocking_eval",
    (s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < maxDoc)
      val shingles = docs
        .select(col("doc_id"),
          explode(graft.ext.TextOps.wordNgrams(col("text"), 3)).as("shingle"))
        .distinct()
      // ground truth: exact trigram-Jaccard ≥ 0.8 pairs (brute force is
      // affordable at the eval slice; PC then measures how many the
      // banded buckets actually recover — 12 seeds × 3 bands catches a
      // 0.8-similar pair with prob 1−(1−s⁴)³ ≈ 0.86, so PC is a REAL
      // measurement, not a tautology)
      val sizes = shingles.groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("sz"))
      val inter = shingles.as("x").join(shingles.as("y"),
          col("x.shingle") === col("y.shingle") &&
            col("x.doc_id") < col("y.doc_id"))
        .groupBy(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .agg(count(lit(1)).cast("long").as("i"))
      val truth = inter
        .join(sizes.select(col("doc_id").as("a"), col("sz").as("sa")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("sz").as("sb")), "b")
        .where(col("i") * 5L >= (col("sa") + col("sb") - col("i")) * 4L)
        .select(col("a"), col("b"))
      val sigs = DedupOps.minhashSignatures(shingles, "doc_id", 12)
      val bands = DedupOps.lshBands(sigs, "doc_id", 4)
      val cands = bands.as("x").join(bands.as("y"),
          col("x.band") === col("y.band") && col("x.band_sig") === col("y.band_sig") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .distinct()
      val nDocs = docs.agg(count(lit(1)).cast("long").as("nd"))
      val nTruth = truth.agg(count(lit(1)).cast("long").as("n_truth"))
      val nCand = cands.agg(count(lit(1)).cast("long").as("n_cand"))
      val hit = truth.join(cands, Seq("a", "b"), "left_semi")
        .agg(count(lit(1)).cast("long").as("n_hit"))
      nDocs.crossJoin(broadcast(nTruth)).crossJoin(broadcast(nCand))
        .crossJoin(broadcast(hit))
        .withColumn("all_pairs",
          ((col("nd") * (col("nd") - 1L)) - (col("nd") * (col("nd") - 1L)) % 2L) / 2L)
        .select(col("nd"), col("n_truth"), col("n_cand"), col("n_hit"),
          ((lit(10000L) * (col("all_pairs") - col("n_cand")) -
            (lit(10000L) * (col("all_pairs") - col("n_cand"))) % col("all_pairs"))
            / col("all_pairs")).cast("long").as("rr_bp"),
          when(col("n_truth") > 0,
            ((col("n_hit") * 10000L - (col("n_hit") * 10000L) % col("n_truth"))
              / col("n_truth")).cast("long")).otherwise(10000L).as("pc_bp"))
    },
    Some {
      val lsh = ExtQueries.lshBandsSql(maxDoc)
      s"""WITH $lsh,
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS sz FROM tri GROUP BY 1),
         |inter AS (
         |  SELECT x.doc_id AS a, y.doc_id AS b, CAST(count(*) AS BIGINT) AS i
         |  FROM tri x JOIN tri y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
         |  GROUP BY 1, 2),
         |truth AS (
         |  SELECT a, b FROM inter
         |  JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
         |  WHERE i * 5 >= (sa.sz + sb.sz - i) * 4),
         |nd AS (SELECT CAST(count(*) AS BIGINT) AS nd FROM documents
         |  WHERE doc_id < $maxDoc),
         |nt AS (SELECT CAST(count(*) AS BIGINT) AS n_truth FROM truth),
         |nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cand FROM cand),
         |nh AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_hit FROM truth t
         |  WHERE EXISTS (SELECT 1 FROM cand c WHERE c.a = t.a AND c.b = t.b)),
         |ap AS (
         |  SELECT nd, CAST(((nd * (nd - 1)) - (nd * (nd - 1)) % 2) / 2 AS BIGINT)
         |    AS all_pairs FROM nd)
         |SELECT ap.nd, n_truth, n_cand, n_hit,
         |  CAST((10000 * (all_pairs - n_cand) - (10000 * (all_pairs - n_cand))
         |    % all_pairs) / all_pairs AS BIGINT) AS rr_bp,
         |  CAST(CASE WHEN n_truth > 0
         |    THEN (n_hit * 10000 - (n_hit * 10000) % n_truth) / n_truth
         |    ELSE 10000 END AS BIGINT) AS pc_bp
         |FROM ap CROSS JOIN nt CROSS JOIN nc CROSS JOIN nh""".stripMargin
    })

  // ---------- q_capture_recapture ----------

  val qCaptureRecapture = QueryDef("q_capture_recapture",
    (s, dir) => {
      // two pseudo-independent order-key samples; customers hold ~10
      // orders each, so capture is genuinely PARTIAL (time windows
      // captured every user — measured — and degenerated to a census)
      val marked = t(s, dir, "orders")
        .groupBy(col("o_custkey").as("k"))
        .agg(max(when(col("o_orderkey") % 7 === 0, 1L).otherwise(0L)).as("c1"),
          max(when(col("o_orderkey") % 5 === 3, 1L).otherwise(0L)).as("c2"))
      marked.agg(
          sum(col("c1")).cast("long").as("n1"),
          sum(col("c2")).cast("long").as("n2"),
          sum(col("c1") * col("c2")).cast("long").as("m"),
          count(lit(1)).cast("long").as("n_true"))
        .withColumn("n_hat",
          ((col("n1") * col("n2") - (col("n1") * col("n2")) % col("m")) / col("m"))
            .cast("long"))
        .withColumn("d", abs(col("n_hat") - col("n_true")))
        .select(col("n1"), col("n2"), col("m"), col("n_true"), col("n_hat"),
          (when(col("n_hat") >= col("n_true"), 1L).otherwise(-1L) *
            ((col("d") * 10000L - (col("d") * 10000L) % col("n_true")) /
              col("n_true")).cast("long")).cast("long").as("err_bp"))
    },
    Some(
      """WITH marked AS (
        |  SELECT o_custkey AS k,
        |    max(CASE WHEN o_orderkey % 7 = 0 THEN 1 ELSE 0 END) AS c1,
        |    max(CASE WHEN o_orderkey % 5 = 3 THEN 1 ELSE 0 END) AS c2
        |  FROM orders GROUP BY 1),
        |agg AS (
        |  SELECT CAST(sum(c1) AS BIGINT) AS n1, CAST(sum(c2) AS BIGINT) AS n2,
        |    CAST(sum(c1 * c2) AS BIGINT) AS m, CAST(count(*) AS BIGINT) AS n_true
        |  FROM marked),
        |est AS (
        |  SELECT *, CAST((n1 * n2 - (n1 * n2) % m) / m AS BIGINT) AS n_hat
        |  FROM agg)
        |SELECT n1, n2, m, n_true, n_hat,
        |  CAST((CASE WHEN n_hat >= n_true THEN 1 ELSE -1 END)
        |    * (abs(n_hat - n_true) * 10000 - (abs(n_hat - n_true) * 10000) % n_true)
        |    / n_true AS BIGINT) AS err_bp
        |FROM est""".stripMargin))

  val all: Seq[QueryDef] = Seq(qDid, qBlockingEval, qCaptureRecapture)
}
