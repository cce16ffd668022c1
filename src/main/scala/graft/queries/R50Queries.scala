package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.DedupOps
import graft.queries.Queries.QueryDef

/** Fiftieth wave — crawl scheduling and incremental dedup maintenance.
  *
  *  - `q_crawl_schedule`: the frontier scheduler the reference's
  *    fetch loop implies (`web_spider_oo.py` sleeps 40-90 s between
  *    requests): top-3 pages per host by priority, each host's slots
  *    spaced by its own deterministic politeness delay in the
  *    reference's 40-90 s range (md5 hex-fold, the q_host_politeness
  *    discipline) — selection + pacing as ONE declarative query.
  *  - `q_minhash_incremental`: incremental LSH-index maintenance — when
  *    a DELTA of changed docs arrives, only the delta's band signatures
  *    probe the full band index (delta×index, never a full-corpus
  *    recompute); emitted pairs are exactly the full candidate set
  *    restricted to pairs touching the delta, which the oracle computes
  *    independently from the full join. The 100 TB shape: signature
  *    upkeep cost tracks the CHANGE rate, not the corpus size.
  *
  * Scale design: scheduling is one per-host rank window + scalar
  * arithmetic (per-host lists are frontier-sized); the incremental
  * probe joins on (band, band_sig) — bucket keys, bounded fanout —
  * with the delta side filtered before the join (pushed below it).
  */
object R50Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_crawl_schedule ----------

  /** md5-hex-fold of column `h` — verbatim on both engines. */
  private val hexVal: String = (1 to 6).map(i =>
    s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1) * " +
      s"${1L << (4 * (6 - i))}").mkString(" + ")

  val qCrawlSchedule = QueryDef("q_crawl_schedule",
    (s, dir) => {
      val docs = t(s, dir, "documents")
        .select(col("doc_id"), col("source").as("host"), col("n_chars"))
      val w = Window.partitionBy("host")
        .orderBy(col("n_chars").desc, col("doc_id"))
      docs.withColumn("rn", row_number().over(w))
        .where(col("rn") <= 3)
        .withColumn("h", md5(col("host")))
        .withColumn("delay_s", expr(s"CAST(40 + ($hexVal) % 51 AS BIGINT)"))
        .selectExpr("host", "rn", "doc_id", "delay_s",
          "CAST((rn - 1) * delay_s AS BIGINT) AS scheduled_s")
        .orderBy("host", "rn")
    },
    Some(
      s"""WITH ranked AS (SELECT doc_id, source AS host, n_chars,
         |    row_number() OVER (PARTITION BY source
         |      ORDER BY n_chars DESC, doc_id) AS rn
         |  FROM documents QUALIFY rn <= 3),
         |hashed AS (SELECT host, CAST(rn AS INTEGER) AS rn, doc_id,
         |             md5(host) AS h
         |           FROM ranked)
         |SELECT host, rn, doc_id,
         |  CAST(40 + ($hexVal) % 51 AS BIGINT) AS delay_s,
         |  CAST((rn - 1) * (40 + ($hexVal) % 51) AS BIGINT) AS scheduled_s
         |FROM hashed ORDER BY host, rn""".stripMargin))

  // ---------- q_minhash_incremental ----------

  val qMinhashIncremental = QueryDef("q_minhash_incremental",
    (s, dir) => {
      val sh = ExtQueries.shingled(s, dir, 200)
      val sig = DedupOps.minhashSignatures(sh, "doc_id", ExtQueries.numSeeds)
      val bands = DedupOps.lshBands(sig, "doc_id", rowsPerBand = 4)
      // r13 (VERDICT r12 task 2): delta = doc_id % 5 — at the driver's
      // sf0.01 this delta TOUCHES candidate pair (61, 185), so the
      // oracle row actually exercises the delta×index probe (the former
      // % 7 delta hit zero pairs for four straight rounds — both
      // engines agreeing on an empty set proved nothing). DedupSimSpec
      // additionally pins the probe on a crafted colliding delta.
      val delta = bands.where(col("doc_id") % 5 === 0)
        .select(col("doc_id").as("did"), col("band"), col("band_sig"))
      delta.join(bands, Seq("band", "band_sig"))
        .where(col("doc_id") =!= col("did"))
        .select(least(col("did"), col("doc_id")).as("a"),
          greatest(col("did"), col("doc_id")).as("b"))
        .distinct()
        .orderBy("a", "b")
    },
    Some(
      s"""WITH ${ExtQueries.lshBandsSql(200)}
         |SELECT a, b FROM cand
         |WHERE a % 5 = 0 OR b % 5 = 0
         |ORDER BY a, b""".stripMargin))

  val all: Seq[QueryDef] = Seq(qCrawlSchedule, qMinhashIncremental)
}
