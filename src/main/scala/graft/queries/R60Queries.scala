package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Sixtieth wave — split construction and batch shaping.
  *
  *  - `q_split_threeway`: the canonical train/val/test maker —
  *    per-language md5-rank ordering (reproducible: rerun ⇒ identical
  *    splits) with EXACT 80/10/10 boundaries by integer floor
  *    arithmetic (rank ≤ 8n/10 → train, ≤ 9n/10 → val, else test) so
  *    split sizes are deterministic counts, not expectations — and
  *    stratified by language so no split loses a low-resource stratum.
  *  - `q_length_batching`: length-bucketed inference batching — docs
  *    bucket by power-of-two token count, fixed batch capacity 8 per
  *    bucket (rank div 8), and the report prices the PADDING WASTE
  *    exactly (Σ batch_max−len per batch, integer tokens) — the
  *    serving-side complement of q_pack_sequences' training-side
  *    concatenation.
  *
  * Scale design: split assignment is one per-stratum rank window
  * (stratum-parallel) + map-side CASE; batching windows partition by
  * (bucket), and the waste aggregation is per-batch map-side combined.
  */
object R60Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_split_threeway ----------

  val qSplitThreeway = QueryDef("q_split_threeway",
    (s, dir) => {
      val ranked = t(s, dir, "documents")
        .select(col("doc_id"), col("lang"),
          md5(concat(lit("split:"), col("doc_id").cast("string"))).as("h"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("lang").orderBy(col("h"), col("doc_id")))
          .cast("long"))
        .withColumn("n", count(lit(1)).over(
          Window.partitionBy("lang")).cast("long"))
        .withColumn("split",
          expr("CASE WHEN rk * 10 <= n * 8 THEN 'train'" +
            " WHEN rk * 10 <= n * 9 THEN 'val' ELSE 'test' END"))
      ranked.groupBy("lang", "split")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
        .orderBy("lang", "split")
    },
    Some(
      """WITH ranked AS (SELECT doc_id, lang,
        |    CAST(row_number() OVER (PARTITION BY lang
        |      ORDER BY md5('split:' || CAST(doc_id AS VARCHAR)), doc_id) AS BIGINT) AS rk,
        |    CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS n
        |  FROM documents),
        |labeled AS (SELECT doc_id, lang,
        |    CASE WHEN rk * 10 <= n * 8 THEN 'train'
        |         WHEN rk * 10 <= n * 9 THEN 'val' ELSE 'test' END AS split
        |  FROM ranked)
        |SELECT lang, split, CAST(count(*) AS BIGINT) AS n_docs,
        |  min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM labeled GROUP BY lang, split ORDER BY lang, split""".stripMargin))

  // ---------- q_length_batching ----------

  private val BatchCap = 8

  /** Integer power-of-two bucket (floor log2, capped at 10) as a CASE
    * ladder — an ln(toks)/ln(2) float formulation flips floor at exact
    * powers of two when the engines' libm differ by one ulp. */
  private val bucketCase: String =
    (10 to 1 by -1).map(b => s"WHEN toks >= ${1L << b} THEN $b")
      .mkString("CASE ", " ", " ELSE 0 END")

  val qLengthBatching = QueryDef("q_length_batching",
    (s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 400)
        .select(col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("toks"))
      val bucketed = docs
        .withColumn("bucket", expr(s"CAST($bucketCase AS BIGINT)"))
        .withColumn("rk", row_number().over(
          Window.partitionBy("bucket").orderBy("doc_id")).cast("long"))
        .withColumn("batch", expr(s"(rk - 1) div $BatchCap"))
      bucketed.groupBy("bucket", "batch")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(col("toks")).as("sum_toks"), max(col("toks")).as("max_toks"))
        .selectExpr("bucket", "batch", "n_docs",
          "CAST(sum_toks AS BIGINT) AS sum_toks",
          "CAST(max_toks AS BIGINT) AS max_toks",
          "CAST(n_docs * max_toks - sum_toks AS BIGINT) AS padding_waste")
        .orderBy("bucket", "batch")
    },
    Some(
      s"""WITH docs AS (SELECT doc_id,
         |    CAST(len(string_split(text, ' ')) AS BIGINT) AS toks
         |  FROM documents WHERE doc_id < 400),
         |bucketed AS (SELECT doc_id, toks,
         |    CAST($bucketCase AS BIGINT) AS bucket
         |  FROM docs),
         |ranked AS (SELECT doc_id, toks, bucket,
         |    CAST(row_number() OVER (PARTITION BY bucket ORDER BY doc_id) AS BIGINT) AS rk
         |  FROM bucketed),
         |batched AS (SELECT bucket, toks, (rk - 1) // $BatchCap AS batch
         |            FROM ranked)
         |SELECT bucket, batch, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(sum(toks) AS BIGINT) AS sum_toks,
         |  CAST(max(toks) AS BIGINT) AS max_toks,
         |  CAST(count(*) * max(toks) - sum(toks) AS BIGINT) AS padding_waste
         |FROM batched GROUP BY bucket, batch ORDER BY bucket, batch""".stripMargin))

  val all: Seq[QueryDef] = Seq(qSplitThreeway, qLengthBatching)
}
