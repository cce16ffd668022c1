package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.functions.NormalizeStr
import graft.queries.Queries.QueryDef

/** Thirtieth wave — Unicode canonicalization and behavioral paths.
  *
  *  - `q_unicode_norm`: Unicode normalization as a native codegen'd
  *    expression ([[graft.functions.NormalizeStr]]) — NFC composition
  *    and accent stripping, the canonicalization every multilingual
  *    dedup/matching pipeline runs BEFORE hashing (the same logical
  *    text can arrive precomposed or decomposed; md5 keys diverge
  *    unless the bytes are canonicalized first). Oracle: DuckDB's
  *    utf8proc `nfc_normalize`/`strip_accents` — two independent
  *    Unicode implementations must agree byte-for-byte.
  *  - `q_path_analysis`: ordered event-type paths per user (the
  *    clickstream "what routes do users take" query) with a
  *    conversion-pattern match — deterministic sequence assembly, then
  *    a |paths|-sized aggregate.
  */
object R30Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_unicode_norm ----------

  /** Every vocabulary word gets a decomposed suffix ("e" + combining
    * acute U+0301): NFC must compose it to a single é (char count
    * drops), STRIP must fold it back to plain "e". Exercises the
    * composition path on real multi-codepoint input rather than
    * already-normalized ASCII. */
  val qUnicodeNorm = QueryDef("q_unicode_norm",
    (s, dir) => {
      val vocab = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")).between(4, 8)).distinct()
      vocab
        .withColumn("raw", concat(col("w"), lit("é")))
        .select(col("w"),
          NormalizeStr(col("raw"), "NFC").as("nfc"),
          length(col("raw")).as("n_raw"),
          length(NormalizeStr(col("raw"), "NFC")).as("n_nfc"),
          NormalizeStr(col("raw"), "STRIP").as("stripped"))
        .orderBy("w")
    },
    Some(
      """WITH vocab AS (
        |  SELECT DISTINCT unnest(string_split(text, ' ')) AS w
        |  FROM documents
        |), v AS (
        |  SELECT w, w || 'e' || chr(769) AS raw FROM vocab
        |  WHERE length(w) BETWEEN 4 AND 8
        |)
        |SELECT w, nfc_normalize(raw) AS nfc,
        |  CAST(length(raw) AS INTEGER) AS n_raw,
        |  CAST(length(nfc_normalize(raw)) AS INTEGER) AS n_nfc,
        |  strip_accents(raw) AS stripped
        |FROM v ORDER BY w""".stripMargin))

  // ---------- q_path_analysis ----------

  /** Behavioral paths: each user's event types in (ts, event_id) order
    * joined into one path string, then path frequencies with a
    * view→…→purchase conversion flag. The sequence assembly is one
    * per-user aggregate (map-side lists, deterministic sort inside the
    * group); everything downstream is |distinct paths|-sized. */
  val qPathAnalysis = QueryDef("q_path_analysis",
    (s, dir) => {
      val paths = Tables.events(s, dir)
        .select(col("user_id"), unix_micros(col("ts")).as("us"),
          col("event_id"), col("event_type"))
        .groupBy("user_id")
        .agg(array_join(expr(
          "transform(array_sort(collect_list(struct(us, event_id, event_type))), x -> x.event_type)"),
          ">").as("path"))
      paths.groupBy("path")
        .agg(count(lit(1)).cast("long").as("n_users"))
        .withColumn("converts", col("path").rlike("view.*purchase"))
        .orderBy(col("n_users").desc, col("path"))
        .limit(25)
    },
    Some(
      """WITH paths AS (
        |  SELECT user_id,
        |    string_agg(event_type, '>' ORDER BY epoch_us(ts), event_id)
        |      AS path
        |  FROM events GROUP BY user_id
        |)
        |SELECT path, CAST(count(*) AS BIGINT) AS n_users,
        |  regexp_matches(path, 'view.*purchase') AS converts
        |FROM paths GROUP BY path
        |ORDER BY n_users DESC, path LIMIT 25""".stripMargin))

  val all: Seq[QueryDef] = Seq(qUnicodeNorm, qPathAnalysis)
}
