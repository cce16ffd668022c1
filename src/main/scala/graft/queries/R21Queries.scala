package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.SketchOps
import graft.queries.Queries.QueryDef

/** Twenty-first wave — the sketch/encoding gaps:
  *
  *  - `q_bitmap_distinct`: EXACT distinct counting via roaring-style
  *    bitmap aggregates — the scale replacement for `COUNT(DISTINCT)`
  *    when approximate (HLL) is not acceptable;
  *  - `q_encoding`: the binary<->text codec surface (base64, hex,
  *    sha-256) the reference leans on implicitly when it keys files by
  *    md5 — round-trip proven, digests oracle-matched;
  *  - `q_cms_topk`: count-min-sketch point-frequency estimates
  *    (rows-only; SketchOpsSpec pins the over-count-bounded contract).
  */
object R21Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_bitmap_distinct ----------

  /** Exact per-group distinct counts WITHOUT `count_distinct`'s Expand:
    * stage 1 groups by (flag, bitmap bucket) and ORs key positions into
    * a fixed 4 KB bitmap per bucket (`bitmap_construct_agg` is
    * map-side-combinable byte-OR — partials merge like any sum); stage 2
    * sums per-bucket popcounts. Buckets partition the key space, so the
    * popcounts add exactly. At 100 TB the shuffle carries
    * |groups|×|buckets| 4 KB bitmaps instead of every distinct
    * (group, key) pair — and unlike HLL (`q_hll_sketch`) the answer is
    * exact. */
  val qBitmapDistinct = QueryDef("q_bitmap_distinct",
    (s, dir) => {
      t(s, dir, "lineitem")
        .select(col("l_returnflag"),
          expr("bitmap_bucket_number(l_partkey)").as("bucket"),
          expr("bitmap_bit_position(l_partkey)").as("pos"))
        .groupBy("l_returnflag", "bucket")
        .agg(expr("bitmap_construct_agg(pos)").as("bm"))
        .groupBy("l_returnflag")
        .agg(sum(expr("bitmap_count(bm)")).cast("long").as("n_parts"))
        .orderBy("l_returnflag")
    },
    Some(
      """SELECT l_returnflag, CAST(count(DISTINCT l_partkey) AS BIGINT)
        |  AS n_parts
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  // ---------- q_encoding ----------

  /** Binary<->text codecs over real document text: base64 round-trip
    * (RFC 4648 — the legacy MIME 76-char/CRLF chunking is pinned OFF so
    * Spark and DuckDB agree byte-for-byte), uppercase hex of the
    * leading UTF-8 bytes, and the sha-256 digest (the modern
    * counterpart of the reference's md5 filename keying,
    * web_spider_oo.py:212). All codegen'd built-ins — one map-side
    * projection, no shuffle. */
  val qEncoding = QueryDef("q_encoding",
    (s, dir) => {
      s.conf.set("spark.sql.chunkBase64String.enabled", "false")
      val txt = col("text").cast("binary")
      t(s, dir, "documents").where(col("doc_id") < 100)
        .select(col("doc_id"),
          base64(txt).as("b64"),
          hex(substring(col("text"), 1, 8).cast("binary")).as("hx"),
          sha2(txt, 256).as("sha"),
          (decode(unbase64(base64(txt)), "UTF-8") === col("text"))
            .as("roundtrip"))
        .orderBy("doc_id")
    },
    Some(
      """SELECT doc_id,
        |  base64(encode(text)) AS b64,
        |  hex(encode(substr(text, 1, 8))) AS hx,
        |  sha256(text) AS sha,
        |  decode(from_base64(base64(encode(text)))) = text AS roundtrip
        |FROM documents WHERE doc_id < 100 ORDER BY doc_id""".stripMargin))

  // ---------- q_cms_topk ----------

  /** Count-min point-frequency estimates for a fixed candidate key set
    * (rows-only: the grid layout is Spark-internal; SketchOpsSpec pins
    * est ≥ exact and est ≤ exact + eps·N — the CMS contract). */
  val qCmsTopk = QueryDef("q_cms_topk",
    (s, dir) => {
      SketchOps.cmsEstimates(t(s, dir, "lineitem"), "l_partkey",
          eps = 0.005, confidence = 0.99, seed = 42,
          candidates = 1L to 25L)
        .orderBy("key")
    },
    None)

  val all: Seq[QueryDef] = Seq(qBitmapDistinct, qEncoding, qCmsTopk)
}
