package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Forty-seventh wave — serving-side corpus analytics and private
  * release.
  *
  *  - `q_prefix_sharing`: prompt prefix-sharing rate at depths
  *    1/2/4/8 tokens — the statistic that predicts KV-cache hit rates
  *    and prefix-batching wins in inference serving (shared system
  *    prompts / templates show up as low distinct-prefix counts).
  *    Exact integer counts; duplication in basis points by floor
  *    division.
  *  - `q_dp_counts`: the Laplace mechanism over per-language counts —
  *    sensitivity-1 count release at ε = 0.5 (scale b = 1/ε = 2). The
  *    noise draw is DETERMINISTIC (inverse-CDF over an md5 hex-fold
  *    uniform, the q_weighted_sample discipline) so the release is
  *    oracle-checkable; production swaps the draw for a CSPRNG — the
  *    sensitivity analysis, scale arithmetic, and release shape are
  *    the part that carries.
  *
  * Scale design: prefix extraction is map-side (slice of the token
  * split, one explode over 4 literal depths); the per-depth distinct
  * aggregation is the only shuffle. The DP release aggregates to a
  * &#124;languages&#124;-row table before any noise arithmetic.
  */
object R47Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_prefix_sharing ----------

  private val Depths = Seq(1, 2, 4, 8)

  val qPrefixSharing = QueryDef("q_prefix_sharing",
    (s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 400)
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
      val pref = docs.select(col("doc_id"),
          explode(lit(Depths.toArray)).as("depth"),
          col("toks"))
        .select(col("depth"),
          array_join(slice(col("toks"), lit(1), col("depth")), " ")
            .as("prefix"))
      pref.groupBy("depth")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          countDistinct(col("prefix")).cast("long").as("n_distinct"))
        .selectExpr("depth", "n_docs", "n_distinct",
          "((n_docs - n_distinct) * 10000) div n_docs AS dup_bp")
        .orderBy("depth")
    },
    Some(
      s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS toks
         |              FROM documents WHERE doc_id < 400),
         |pref AS (SELECT depth,
         |           array_to_string(list_slice(toks, 1, depth), ' ') AS prefix
         |         FROM docs, unnest([${Depths.mkString(", ")}]) AS t(depth))
         |SELECT depth, CAST(count(*) AS BIGINT) AS n_docs,
         |  CAST(count(DISTINCT prefix) AS BIGINT) AS n_distinct,
         |  ((count(*) - count(DISTINCT prefix)) * 10000) // count(*) AS dup_bp
         |FROM pref GROUP BY depth ORDER BY depth""".stripMargin))

  // ---------- q_dp_counts ----------

  /** md5-hex-fold of column `h` — verbatim on both engines. */
  private val hexVal: String = (1 to 6).map(i =>
    s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1) * " +
      s"${1L << (4 * (6 - i))}").mkString(" + ")

  /** Laplace(b=2) inverse-CDF over u ∈ (0,1) strictly (the +0.5 fold
    * offset keeps u off both endpoints, so the ln never sees 0);
    * round(4) absorbs libm ln divergence. */
  private val laplaceSql: String =
    """round(-2.0 * sign(u - 0.5) * ln(1.0 - 2.0 * abs(u - 0.5)), 4)"""

  val qDpCounts = QueryDef("q_dp_counts",
    (s, dir) => {
      val g = t(s, dir, "documents").groupBy("lang")
        .agg(count(lit(1)).cast("long").as("c"))
      g.withColumn("h", md5(concat(lit("dp:"), col("lang"))))
        .withColumn("u",
          expr(s"(CAST($hexVal AS DOUBLE) + 0.5) / 16777216.0"))
        .withColumn("noise", expr(laplaceSql))
        .selectExpr("lang", "c", "noise",
          "CAST(c AS DOUBLE) + noise AS released")
        .orderBy("lang")
    },
    Some(
      s"""WITH g AS (SELECT lang, CAST(count(*) AS BIGINT) AS c
         |           FROM documents GROUP BY lang),
         |hashed AS (SELECT lang, c, md5('dp:' || lang) AS h FROM g),
         |uv AS (SELECT lang, c,
         |         (CAST($hexVal AS DOUBLE) + 0.5) / 16777216.0 AS u
         |       FROM hashed),
         |nz AS (SELECT lang, c, $laplaceSql AS noise FROM uv)
         |SELECT lang, c, noise, CAST(c AS DOUBLE) + noise AS released
         |FROM nz ORDER BY lang""".stripMargin))

  val all: Seq[QueryDef] = Seq(qPrefixSharing, qDpCounts)
}
