package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Sixty-fifth wave — training-data curation operators: the selection /
  * mixing / ordering layer a large-scale LLM pipeline runs between
  * dedup and tokenization.
  *
  *  - `q_dpo_pairs`: preference-pair construction (the DPO data shape,
  *    Rafailov et al. 2023) — per (lang, source) group pick the
  *    highest- and lowest-scoring documents as (chosen, rejected),
  *    keep pairs with a minimum score gap. One map-side-combinable
  *    aggregate: `max(struct(score, id))` / `min(struct(score, id))`
  *    carries the argmax WITH its tie-break in a single shuffle —
  *    never a per-group sort.
  *  - `q_temperature_mix`: temperature-scaled language sampling weights
  *    (τ = 0.5, the multilingual-training standard, Arivazhagan et al.
  *    2019): share_l = √n_l / Σ√n. √ is IEEE-exact (unlike pow), so
  *    both engines compute identical doubles; the weights quantize to
  *    DECIMAL(18,9) BEFORE the sum so the denominator is
  *    order-independent. |languages|-sized end to end.
  *  - `q_dsir_weights`: DSIR importance weights (Xie et al. 2023, "Data
  *    Selection for Language Models via Importance Resampling"):
  *    per-doc log importance = Σ_b count_doc(b)·ln(p_target(b)/p_all(b))
  *    over word bigrams with Laplace smoothing (target = English docs).
  *    Bigrams are generated MAP-SIDE from the token array (no token
  *    self-join); the LM tables are vocabulary-sized; each per-bigram
  *    log-ratio quantizes to DECIMAL(18,9) so the per-doc sum is
  *    order-independent (the q_psi discipline).
  *  - `q_curriculum_interleave`: deterministic curriculum schedule —
  *    easy-first within each source (rank by length), round-robin
  *    across sources. The global position is DERIVED, not windowed:
  *    pos = (rk−1)·|sources| + source_index, so no single-partition
  *    global row_number at corpus size (source_index rides a
  *    20-row dimension window; the per-source rank is a partitioned
  *    window — both scale-safe).
  *  - `q_acf`: raw autocorrelation sums of the daily revenue series at
  *    lags 1..7 — exact integer-cent products in wide decimals
  *    (cents² at 100 TB scale overflows BIGINT). The daily series is
  *    DECIMAL(18,0), NOT 19: 19×19 products land exactly on the
  *    width-38 decimal ceiling, where DuckDB's multiply-width and
  *    overflow-promotion rules have shifted across releases (the r6
  *    value-space fragility lesson, SURVEY §7.4) — 18×18 keeps the
  *    products at width ≤37 with version-stable semantics on both
  *    engines. |days|-sized join on a derived date, never a corpus
  *    shuffle.
  *
  * Reference tie-in: the reference's crawler curates its corpus by URL
  * filtering alone (`web_spider_oo.py:195-226`); this wave is the
  * extension layer SURVEY §2 marks as the LLM-pipeline surface.
  */
object R65Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_dpo_pairs ----------

  val qDpoPairs = QueryDef("q_dpo_pairs",
    (s, dir) => {
      val d = t(s, dir, "documents").where(col("doc_id") < 5000)
        .select(col("lang"), col("source"), col("doc_id"),
          col("n_chars").as("score"))
      d.groupBy("lang", "source")
        .agg(count(lit(1)).as("cnt"),
          max(struct(col("score"), col("doc_id"))).as("c"),
          min(struct(col("score"), col("doc_id"))).as("r"))
        .where(col("cnt") >= 2 && col("c.score") - col("r.score") >= 10)
        .select(col("lang"), col("source"),
          col("c.doc_id").as("chosen_id"), col("c.score").as("chosen_score"),
          col("r.doc_id").as("rejected_id"), col("r.score").as("rejected_score"))
        .orderBy("lang", "source")
    },
    Some(
      """WITH d AS (SELECT lang, source, doc_id, n_chars AS score
        |  FROM documents WHERE doc_id < 5000),
        |r AS (SELECT lang, source, doc_id, score,
        |    row_number() OVER (PARTITION BY lang, source ORDER BY score DESC, doc_id DESC) AS rk_hi,
        |    row_number() OVER (PARTITION BY lang, source ORDER BY score ASC, doc_id ASC) AS rk_lo
        |  FROM d)
        |SELECT lang, source,
        |  CAST(max(CASE WHEN rk_hi = 1 THEN doc_id END) AS BIGINT) AS chosen_id,
        |  CAST(max(CASE WHEN rk_hi = 1 THEN score END) AS BIGINT) AS chosen_score,
        |  CAST(max(CASE WHEN rk_lo = 1 THEN doc_id END) AS BIGINT) AS rejected_id,
        |  CAST(max(CASE WHEN rk_lo = 1 THEN score END) AS BIGINT) AS rejected_score
        |FROM r GROUP BY lang, source
        |HAVING count(*) >= 2
        |  AND max(CASE WHEN rk_hi = 1 THEN score END)
        |    - max(CASE WHEN rk_lo = 1 THEN score END) >= 10
        |ORDER BY lang, source""".stripMargin))

  // ---------- q_temperature_mix ----------

  val qTemperatureMix = QueryDef("q_temperature_mix",
    (s, dir) => {
      val c = t(s, dir, "documents").groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n"))
      val q = c.withColumn("w",
        expr("CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(18,9))"))
      val tot = q.agg(sum(col("w")).as("tw"))
      q.crossJoin(broadcast(tot))
        .select(col("lang"), col("n"), col("w").cast("double").as("w"),
          (col("w").cast("double") / col("tw").cast("double")).as("share"))
        .orderBy("lang")
    },
    Some(
      """WITH c AS (SELECT lang, CAST(count(*) AS BIGINT) AS n
        |  FROM documents GROUP BY lang),
        |q AS (SELECT lang, n,
        |    CAST(sqrt(CAST(n AS DOUBLE)) AS DECIMAL(18,9)) AS w FROM c),
        |t AS (SELECT lang, n, w, sum(w) OVER () AS tw FROM q)
        |SELECT lang, n, CAST(w AS DOUBLE) AS w,
        |  CAST(CAST(w AS DOUBLE) / CAST(tw AS DOUBLE) AS DOUBLE) AS share
        |FROM t ORDER BY lang""".stripMargin))

  // ---------- q_dsir_weights ----------

  val qDsirWeights = QueryDef("q_dsir_weights",
    (s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 2000)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
        .where(size(col("ws")) >= 2)
      // bigrams map-side from the token array — a token-position
      // self-join would shuffle the corpus twice for the same rows
      val bg = docs.select(col("doc_id"), col("lang"),
        explode(expr("transform(sequence(0, size(ws) - 2)," +
          " i -> concat(ws[i], ' ', ws[i + 1]))")).as("bigram"))
      val tgt = bg.where(col("lang") === "en")
        .groupBy("bigram").agg(count(lit(1)).as("ct"))
      val src = bg.groupBy("bigram").agg(count(lit(1)).as("cs"))
      val v = src.agg(count(lit(1)).cast("long").as("vocab"),
        sum(col("cs")).cast("long").as("ns"))
      val nt = tgt.agg(coalesce(sum(col("ct")), lit(0L)).cast("long").as("ntot"))
      val ratio = src.join(tgt, Seq("bigram"), "left")
        .crossJoin(broadcast(v)).crossJoin(broadcast(nt))
        .select(col("bigram"), expr(
          "CAST(ln((CAST(coalesce(ct, 0) + 1 AS DOUBLE) / CAST(ntot + vocab AS DOUBLE))" +
          " / (CAST(cs + 1 AS DOUBLE) / CAST(ns + vocab AS DOUBLE))) AS DECIMAL(18,9))")
          .as("lr"))
      val g = bg.groupBy("doc_id", "bigram").agg(count(lit(1)).as("cnt"))
      g.join(ratio, "bigram")
        .groupBy("doc_id")
        .agg(sum(col("cnt").cast(DecimalType(18, 0)) * col("lr")).as("w"))
        .orderBy(col("w").desc, col("doc_id"))
        .select(col("doc_id"), col("w").cast("double").as("weight"))
        .limit(20)
    },
    Some(
      """WITH docs AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ws
        |  FROM documents WHERE doc_id < 2000),
        |idx AS (
        |  SELECT doc_id, lang, ws, unnest(range(1, len(ws))) AS i FROM docs),
        |bg AS (
        |  SELECT doc_id, lang,
        |    ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1] AS bigram
        |  FROM idx),
        |tgt AS (SELECT bigram, count(*) AS ct FROM bg WHERE lang = 'en' GROUP BY bigram),
        |src AS (SELECT bigram, count(*) AS cs FROM bg GROUP BY bigram),
        |v AS (SELECT CAST(count(*) AS BIGINT) AS vocab,
        |             CAST(sum(cs) AS BIGINT) AS ns FROM src),
        |nt AS (SELECT CAST(coalesce(sum(ct), 0) AS BIGINT) AS ntot FROM tgt),
        |ratio AS (
        |  SELECT s.bigram,
        |    CAST(ln((CAST(coalesce(t.ct, 0) + 1 AS DOUBLE) / CAST(nt.ntot + v.vocab AS DOUBLE))
        |          / (CAST(s.cs + 1 AS DOUBLE) / CAST(v.ns + v.vocab AS DOUBLE)))
        |      AS DECIMAL(18,9)) AS lr
        |  FROM src s LEFT JOIN tgt t ON s.bigram = t.bigram
        |    CROSS JOIN v CROSS JOIN nt),
        |docw AS (
        |  SELECT g.doc_id, sum(CAST(cnt AS DECIMAL(18,0)) * r.lr) AS w
        |  FROM (SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY doc_id, bigram) g
        |  JOIN ratio r ON g.bigram = r.bigram
        |  GROUP BY g.doc_id)
        |SELECT doc_id, CAST(w AS DOUBLE) AS weight
        |FROM docw ORDER BY w DESC, doc_id LIMIT 20""".stripMargin))

  // ---------- q_curriculum_interleave ----------

  val qCurriculumInterleave = QueryDef("q_curriculum_interleave",
    // r16: route the global window(s) through the distributed rewrite
    (s, dir) => RewriteGlobalRankWindows.force {
      val d = t(s, dir, "documents").where(col("doc_id") < 3000)
        .select(col("doc_id"), col("source"), col("n_chars"))
      val srcs = d.select("source").distinct()
      // 20-row dimension: the global window is aggregate-sized by design
      val sIdx = srcs.select(col("source"),
        row_number().over(Window.orderBy("source")).cast("long").as("src_idx"))
      val nSrc = srcs.agg(count(lit(1)).cast("long").as("n_src"))
      val r = d.withColumn("rk", row_number().over(
        Window.partitionBy("source").orderBy("n_chars", "doc_id")).cast("long"))
      r.join(broadcast(sIdx), "source").crossJoin(broadcast(nSrc))
        .select(((col("rk") - 1) * col("n_src") + col("src_idx")).as("pos"),
          col("doc_id"), col("source"), col("rk"))
        .orderBy("pos").limit(500)
    },
    Some(
      """WITH d AS (SELECT doc_id, source, n_chars FROM documents WHERE doc_id < 3000),
        |s AS (SELECT source, row_number() OVER (ORDER BY source) AS src_idx FROM
        |      (SELECT DISTINCT source FROM d)),
        |ns AS (SELECT CAST(count(*) AS BIGINT) AS n_src FROM s),
        |r AS (SELECT doc_id, d.source, n_chars,
        |    row_number() OVER (PARTITION BY d.source ORDER BY n_chars, doc_id) AS rk
        |  FROM d)
        |SELECT CAST((r.rk - 1) * ns.n_src + s.src_idx AS BIGINT) AS pos,
        |  r.doc_id, r.source, CAST(r.rk AS BIGINT) AS rk
        |FROM r JOIN s ON r.source = s.source, ns
        |ORDER BY pos LIMIT 500""".stripMargin))

  // ---------- q_acf ----------

  /** Hashed columns are decimal-free end-to-end (the r6/r7 lesson:
    * two decimal-width theories failed at the driver — decimal
    * products/sums in a hashed path drift across DuckDB releases).
    * The per-lag cross-moment Σ c·c2 is restated in BIGINT limbs:
    * c = c_hi·10⁶ + c_lo, so c·c2 = s_hh·10¹² + s_mid·10⁶ + s_ll
    * with s_hh = Σ c_hi·c2_hi, s_mid = Σ (c_hi·c2_lo + c_lo·c2_hi),
    * s_ll = Σ c_lo·c2_lo. At sf0.1 the daily cents max ≈ 2.3·10⁹
    * over 2405 days, so the limb sums cap at ~1.3·10¹⁰ / 1.1·10¹³ /
    * 2.4·10¹⁵ — all far inside BIGINT with headroom past sf10. Limb
    * split uses the version-invariant `(c - c % 10⁶) / 10⁶` trunc-div
    * idiom on both engines; every output column is a BIGINT sum of
    * BIGINT products — pure 64-bit integer arithmetic has no engine
    * version to drift. */
  val qAcf = QueryDef("q_acf",
    (s, dir) => {
      val daily = t(s, dir, "orders")
        .groupBy(col("o_orderdate").cast("date").as("d"))
        .agg(sum(expr("CAST(round(o_totalprice * 100.0) AS BIGINT)")).as("c"))
        .select(col("d"), col("c"),
          expr("CAST((c - c % 1000000) / 1000000 AS BIGINT)").as("c_hi"),
          expr("CAST(c % 1000000 AS BIGINT)").as("c_lo"))
      val lags = s.range(1, 8).select(col("id").as("lag"))
      val b = daily.select(col("d").as("d2"), col("c").as("c2"),
        col("c_hi").as("c2_hi"), col("c_lo").as("c2_lo"))
      daily.crossJoin(broadcast(lags))
        .withColumn("d2", expr("date_add(d, CAST(lag AS INT))"))
        .join(b, "d2")
        .groupBy("lag")
        .agg(count(lit(1)).cast("long").as("n_pairs"),
          sum(col("c_hi") * col("c2_hi")).cast("long").as("s_hh"),
          sum(col("c_hi") * col("c2_lo") + col("c_lo") * col("c2_hi"))
            .cast("long").as("s_mid"),
          sum(col("c_lo") * col("c2_lo")).cast("long").as("s_ll"),
          sum(col("c")).cast("long").as("sx"),
          sum(col("c2")).cast("long").as("sy"))
        .orderBy("lag")
    },
    Some(
      """WITH daily AS (
        |  SELECT CAST(o_orderdate AS DATE) AS d,
        |    CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS c
        |  FROM orders GROUP BY 1),
        |limbs AS (
        |  SELECT d, c,
        |    CAST((c - c % 1000000) / 1000000 AS BIGINT) AS c_hi,
        |    CAST(c % 1000000 AS BIGINT) AS c_lo
        |  FROM daily),
        |lags AS (SELECT CAST(g.g AS BIGINT) AS lag FROM generate_series(1, 7) g(g))
        |SELECT l.lag, CAST(count(*) AS BIGINT) AS n_pairs,
        |  CAST(sum(a.c_hi * b.c_hi) AS BIGINT) AS s_hh,
        |  CAST(sum(a.c_hi * b.c_lo + a.c_lo * b.c_hi) AS BIGINT) AS s_mid,
        |  CAST(sum(a.c_lo * b.c_lo) AS BIGINT) AS s_ll,
        |  CAST(sum(a.c) AS BIGINT) AS sx, CAST(sum(b.c) AS BIGINT) AS sy
        |FROM lags l
        | JOIN limbs a ON true
        | JOIN limbs b ON b.d = a.d + CAST(l.lag AS INTEGER)
        |GROUP BY l.lag ORDER BY l.lag""".stripMargin))

  val all: Seq[QueryDef] = Seq(qDpoPairs, qTemperatureMix, qDsirWeights,
    qCurriculumInterleave, qAcf)
}
