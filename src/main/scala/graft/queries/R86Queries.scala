package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Eighty-sixth wave — generation-eval metrics: ROUGE, BLEU, pass@k.
  *
  *  - `q_rouge`: ROUGE-1/ROUGE-2 recall (Lin 2004) between candidate/
  *    reference document pairs (doc d vs doc d+250): CLIPPED multiset
  *    n-gram overlap Σ_g min(c_cand, c_ref) over the reference mass,
  *    in exact basis points. Bigrams come from a per-doc lead() window
  *    (one doc-partitioned sort, shared verbatim with the oracle);
  *    the clipped join is gram-keyed — never all-pairs.
  *  - `q_bleu`: smoothed BLEU-2 (Papineni et al. 2002; add-one
  *    smoothing) for the same pairs: candidate-denominated modified
  *    precisions p₁, p₂, the brevity penalty exp(1 − r/c) when the
  *    candidate is shorter, and BP·exp((ln p₁ + ln p₂)/2) — integer
  *    clip counts throughout, ONE shared IEEE expression tree for the
  *    final score (q_cuped discipline).
  *  - `q_pass_at_k`: the unbiased pass@k estimator (Chen et al. 2021):
  *    with n = 10 deterministic-hash sample outcomes per task,
  *    pass@k = 1 − C(n−c, k)/C(n, k) — evaluated in closed form as
  *    Π_{i<k}(n−c−i)/(n−i) with the c > n−k boundary handled exactly
  *    (estimator = 1). The per-task correct counts, pass@1 (= c/10),
  *    and pass@5 are all derived from one 10-way explode with
  *    map-side combine.
  */
object R86Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val pairGap = 250L

  /** Per-doc unigram+bigram counts — Spark side. `kind` 1 = unigram,
    * 2 = bigram (lead window, shared shape with the oracle). */
  private def grams(s: SparkSession, dir: String): DataFrame = {
    val toks = t(s, dir, "documents")
      .select(col("doc_id"), posexplode(split(col("text"), " ")))
      .select(col("doc_id"), col("pos").cast("long").as("pos"),
        col("col").as("tok"))
    val w = Window.partitionBy("doc_id").orderBy("pos")
    val uni = toks.select(col("doc_id"), lit(1L).as("kind"), col("tok").as("g"))
    val bi = toks.withColumn("nxt", lead(col("tok"), 1).over(w))
      .where(col("nxt").isNotNull)
      .select(col("doc_id"), lit(2L).as("kind"),
        concat(col("tok"), lit(" "), col("nxt")).as("g"))
    uni.unionAll(bi).groupBy("doc_id", "kind", "g")
      .agg(count(lit(1)).cast("long").as("c"))
  }

  private val gramsSql =
    """toks AS (
      |  SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos, tok FROM (
      |    SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
      |      unnest(string_split(text, ' ')) AS tok
      |    FROM documents)),
      |led AS (
      |  SELECT doc_id, pos, tok,
      |    lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS nxt
      |  FROM toks),
      |grams AS (
      |  SELECT doc_id, kind, g, CAST(count(*) AS BIGINT) AS c FROM (
      |    SELECT doc_id, CAST(1 AS BIGINT) AS kind, tok AS g FROM led
      |    UNION ALL
      |    SELECT doc_id, CAST(2 AS BIGINT) AS kind, tok || ' ' || nxt AS g
      |    FROM led WHERE nxt IS NOT NULL)
      |  GROUP BY 1, 2, 3)""".stripMargin

  // ---------- q_rouge ----------

  val qRouge = QueryDef("q_rouge",
    (s, dir) => {
      val g = grams(s, dir)
      val cand = g.where(col("doc_id") < pairGap)
        .select(col("doc_id").as("pair"), col("kind"), col("g"),
          col("c").as("cc"))
      val ref = g.where(col("doc_id") >= pairGap && col("doc_id") < 2 * pairGap)
        .select((col("doc_id") - pairGap).as("pair"), col("kind"), col("g"),
          col("c").as("cr"))
      val clip = cand.join(ref, Seq("pair", "kind", "g"))
        .groupBy("pair", "kind")
        .agg(sum(least(col("cc"), col("cr"))).cast("long").as("clip"))
      val refTot = ref.groupBy("pair", "kind")
        .agg(sum(col("cr")).cast("long").as("rt"))
      refTot.join(clip, Seq("pair", "kind"), "left")
        .withColumn("clip", coalesce(col("clip"), lit(0L)))
        .groupBy("pair")
        .agg(
          max(when(col("kind") === 1, ((col("clip") * 10000L -
            (col("clip") * 10000L) % col("rt")) / col("rt")).cast("long")))
            .as("rouge1_bp"),
          max(when(col("kind") === 2, ((col("clip") * 10000L -
            (col("clip") * 10000L) % col("rt")) / col("rt")).cast("long")))
            .as("rouge2_bp"))
        .orderBy("pair")
    },
    Some(
      s"""WITH $gramsSql,
         |cand AS (
         |  SELECT doc_id AS pair, kind, g, c AS cc FROM grams WHERE doc_id < $pairGap),
         |ref AS (
         |  SELECT doc_id - $pairGap AS pair, kind, g, c AS cr FROM grams
         |  WHERE doc_id >= $pairGap AND doc_id < ${2 * pairGap}),
         |clip AS (
         |  SELECT cand.pair, cand.kind, CAST(sum(least(cc, cr)) AS BIGINT) AS clip
         |  FROM cand JOIN ref ON cand.pair = ref.pair AND cand.kind = ref.kind
         |    AND cand.g = ref.g
         |  GROUP BY 1, 2),
         |reftot AS (
         |  SELECT pair, kind, CAST(sum(cr) AS BIGINT) AS rt FROM ref GROUP BY 1, 2)
         |SELECT r.pair,
         |  max(CASE WHEN r.kind = 1 THEN CAST((coalesce(clip, 0) * 10000
         |    - (coalesce(clip, 0) * 10000) % rt) / rt AS BIGINT) END) AS rouge1_bp,
         |  max(CASE WHEN r.kind = 2 THEN CAST((coalesce(clip, 0) * 10000
         |    - (coalesce(clip, 0) * 10000) % rt) / rt AS BIGINT) END) AS rouge2_bp
         |FROM reftot r LEFT JOIN clip c ON c.pair = r.pair AND c.kind = r.kind
         |GROUP BY r.pair ORDER BY r.pair""".stripMargin))

  // ---------- q_bleu ----------

  val qBleu = QueryDef("q_bleu",
    (s, dir) => {
      val g = grams(s, dir)
      val cand = g.where(col("doc_id") < pairGap)
        .select(col("doc_id").as("pair"), col("kind"), col("g"), col("c").as("cc"))
      val ref = g.where(col("doc_id") >= pairGap && col("doc_id") < 2 * pairGap)
        .select((col("doc_id") - pairGap).as("pair"), col("kind"), col("g"),
          col("c").as("cr"))
      val joined = cand.join(ref, Seq("pair", "kind", "g"), "left")
        .groupBy("pair", "kind")
        .agg(sum(least(col("cc"), coalesce(col("cr"), lit(0L)))).cast("long")
          .as("clip"),
          sum(col("cc")).cast("long").as("ct"))
      val lens = joined.groupBy("pair")
        .agg(max(when(col("kind") === 1, col("ct"))).as("clen"))
      val refLens = ref.where(col("kind") === 1).groupBy("pair")
        .agg(sum(col("cr")).cast("long").as("rlen"))
      val ps = joined.groupBy("pair")
        .agg(max(when(col("kind") === 1, col("clip"))).as("clip1"),
          max(when(col("kind") === 1, col("ct"))).as("ct1"),
          max(when(col("kind") === 2, col("clip"))).as("clip2"),
          max(when(col("kind") === 2, col("ct"))).as("ct2"))
      val bleuExpr =
        "CASE WHEN clen >= rlen THEN 1.0 ELSE exp(1.0 - CAST(rlen AS DOUBLE) / CAST(clen AS DOUBLE)) END" +
          " * exp((ln((CAST(clip1 AS DOUBLE) + 1.0) / (CAST(ct1 AS DOUBLE) + 1.0))" +
          " + ln((CAST(clip2 AS DOUBLE) + 1.0) / (CAST(ct2 AS DOUBLE) + 1.0))) / 2.0)"
      ps.join(lens, "pair").join(refLens, "pair")
        .select(col("pair"), col("clip1"), col("ct1"), col("clip2"), col("ct2"),
          col("clen"), col("rlen"),
          round(expr(bleuExpr), 6).as("bleu2"))
        .orderBy("pair")
    },
    Some(
      s"""WITH $gramsSql,
         |cand AS (
         |  SELECT doc_id AS pair, kind, g, c AS cc FROM grams WHERE doc_id < $pairGap),
         |ref AS (
         |  SELECT doc_id - $pairGap AS pair, kind, g, c AS cr FROM grams
         |  WHERE doc_id >= $pairGap AND doc_id < ${2 * pairGap}),
         |joined AS (
         |  SELECT cand.pair, cand.kind,
         |    CAST(sum(least(cc, coalesce(cr, 0))) AS BIGINT) AS clip,
         |    CAST(sum(cc) AS BIGINT) AS ct
         |  FROM cand LEFT JOIN ref ON cand.pair = ref.pair
         |    AND cand.kind = ref.kind AND cand.g = ref.g
         |  GROUP BY 1, 2),
         |ps AS (
         |  SELECT pair,
         |    max(CASE WHEN kind = 1 THEN clip END) AS clip1,
         |    max(CASE WHEN kind = 1 THEN ct END) AS ct1,
         |    max(CASE WHEN kind = 2 THEN clip END) AS clip2,
         |    max(CASE WHEN kind = 2 THEN ct END) AS ct2,
         |    max(CASE WHEN kind = 1 THEN ct END) AS clen
         |  FROM joined GROUP BY pair),
         |reflens AS (
         |  SELECT pair, CAST(sum(cr) AS BIGINT) AS rlen FROM ref
         |  WHERE kind = 1 GROUP BY pair)
         |SELECT p.pair, clip1, ct1, clip2, ct2, clen, rlen,
         |  round((CASE WHEN clen >= rlen THEN 1.0
         |      ELSE exp(1.0 - CAST(rlen AS DOUBLE) / CAST(clen AS DOUBLE)) END)
         |    * exp((ln((CAST(clip1 AS DOUBLE) + 1.0) / (CAST(ct1 AS DOUBLE) + 1.0))
         |    + ln((CAST(clip2 AS DOUBLE) + 1.0) / (CAST(ct2 AS DOUBLE) + 1.0))) / 2.0), 6)
         |    AS bleu2
         |FROM ps p JOIN reflens r ON r.pair = p.pair
         |ORDER BY p.pair""".stripMargin))

  // ---------- q_pass_at_k ----------

  private val nSamples = 10

  /** Deterministic sample outcome for (doc, i) — shared verbatim. */
  private val correctSql =
    "CASE WHEN (doc_id * 7919 + i * 104729 + i * i * 31) % 4 = 0 THEN 1 ELSE 0 END"

  val qPassAtK = QueryDef("q_pass_at_k",
    (s, dir) => {
      val c = t(s, dir, "documents").where(col("doc_id") < 100)
        .select(col("doc_id"))
        .withColumn("i", explode(sequence(lit(0), lit(nSamples - 1))))
        .withColumn("i", col("i").cast("long"))
        .withColumn("ok", expr(correctSql))
        .groupBy("doc_id")
        .agg(sum(col("ok")).cast("long").as("c"))
      val p5 =
        "CASE WHEN c > 5 THEN 1.0 ELSE 1.0 - " +
          "(CAST((10 - c) * (9 - c) * (8 - c) * (7 - c) * (6 - c) AS DOUBLE)" +
          " / CAST(10 * 9 * 8 * 7 * 6 AS DOUBLE)) END"
      c.select(col("doc_id"), col("c"),
          round(expr("CAST(c AS DOUBLE) / 10.0"), 6).as("pass_at_1"),
          round(expr(p5), 6).as("pass_at_5"))
        .orderBy("doc_id")
    },
    Some(
      s"""WITH samples AS (
         |  SELECT doc_id, i, $correctSql AS ok
         |  FROM documents CROSS JOIN
         |    (SELECT unnest(generate_series(0, ${nSamples - 1})) AS i)
         |  WHERE doc_id < 100),
         |counts AS (
         |  SELECT doc_id, CAST(sum(ok) AS BIGINT) AS c FROM samples GROUP BY doc_id)
         |SELECT doc_id, c,
         |  round(CAST(c AS DOUBLE) / 10.0, 6) AS pass_at_1,
         |  round(CASE WHEN c > 5 THEN 1.0 ELSE 1.0 -
         |    (CAST((10 - c) * (9 - c) * (8 - c) * (7 - c) * (6 - c) AS DOUBLE)
         |     / CAST(10 * 9 * 8 * 7 * 6 AS DOUBLE)) END, 6) AS pass_at_5
         |FROM counts ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qRouge, qBleu, qPassAtK)
}
