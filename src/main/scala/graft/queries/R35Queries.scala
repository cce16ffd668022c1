package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.TextOps
import graft.queries.Queries.QueryDef

/** Thirty-fifth wave — winnowing fingerprints.
  *
  * `q_winnowing`: the MOSS document-fingerprint selection scheme
  * (Schleimer, Wilkerson, Aiken, SIGMOD'03 — "Winnowing: Local
  * Algorithms for Document Fingerprinting"): hash every k-gram, slide
  * a w-position window over the hash sequence, and record each
  * window's MINIMUM hash. The guarantee: any substring match of
  * length ≥ w+k−1 between two documents yields at least one shared
  * fingerprint, while storage keeps only ~2/(w+1) of the grams — the
  * plagiarism/boilerplate detector that catches what doc-level
  * MinHash dilutes, cheaper than indexing every gram.
  */
object R35Queries {

  private val wK = 5  // gram size (tokens)
  private val wW = 4  // winnowing window (positions)

  /** Shared md5 hex-fold (12 digits → BIGINT), verbatim in both
    * engines; CAST pins 64-bit arithmetic (ANSI int multiply). */
  private val hexVal: String = (1 to 12).map(i =>
    s"(CAST(instr('0123456789abcdef', substr(h, $i, 1)) AS BIGINT) - 1)" +
      s" * ${1L << (4 * (12 - i))}").mkString(" + ")

  /** Every full window (ending at pos ≥ w−1) contributes its minimal
    * gram hash; the document's fingerprint set is the DISTINCT hash
    * values so contributed (consecutive windows usually share their
    * minimum — that dedup is winnowing's compression). The min-window
    * is ROWS-framed per doc: partition-parallel, no corpus-wide
    * anything; docs with fewer than w grams have no full window and
    * emit no fingerprints (pinned identically in the oracle).
    * Output: per-doc fingerprint count + exact sum (the hash covers
    * every selected value).
    *
    * Gram assembly is ONE token explode + window `lead`s (codegen'd,
    * sharing the doc-keyed sort the min-window needs anyway) — the
    * array-of-ngrams HOF form ([[TextOps.wordNgrams]]) evaluates
    * interpreted with per-gram array lookups and measured 4× slower
    * on this query's profile. */
  val qWinnowing = QueryDef("q_winnowing",
    (s, dir) => {
      val grams = TextOps.ngramRows(
          Tables.load(s, dir, "documents"), "doc_id", "text", wK)
        .withColumn("h", md5(col("gram")))
        .withColumn("hv", expr(hexVal))
      val w = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(-(wW - 1), 0)
      grams
        .withColumn("wmin", min(col("hv")).over(w))
        .where(col("pos") >= wW - 1)
        .select(col("doc_id"), col("wmin")).distinct()
        .groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_fp"),
          sum(col("wmin")).as("fp_sum"))
        .orderBy("doc_id")
    },
    Some(
      s"""WITH toks AS (
         |  SELECT doc_id, string_split(text, ' ') AS arr FROM documents
         |), idx AS (
         |  SELECT doc_id, arr,
         |    unnest(generate_series(1, len(arr) - ${wK - 1})) AS i
         |  FROM toks WHERE len(arr) >= $wK
         |), grams AS (
         |  SELECT doc_id, i - 1 AS pos,
         |    md5(array_to_string(arr[i:i+${wK - 1}], ' ')) AS h
         |  FROM idx
         |), hv AS (
         |  SELECT doc_id, pos, $hexVal AS hv FROM grams
         |), win AS (
         |  SELECT doc_id, pos,
         |    min(hv) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN ${wW - 1} PRECEDING AND CURRENT ROW) AS wmin
         |  FROM hv
         |), sel AS (
         |  SELECT DISTINCT doc_id, wmin FROM win WHERE pos >= ${wW - 1}
         |)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_fp,
         |  CAST(sum(wmin) AS BIGINT) AS fp_sum
         |FROM sel GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qWinnowing)
}
