package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Ninth wave — multi-aggregate pivot and token entropy.
  *
  *  - `q_pivot_multi`: pivot with TWO aggregates per cell (decimal-exact
  *    revenue + count); Spark names cells `{value}_{alias}`, and the
  *    oracle reproduces those exact labels with CASE aggregates.
  *  - `q_entropy`: per-document Shannon entropy of the unigram
  *    distribution — the remaining text-quality scalar next to the
  *    bigram-LM score; each p·ln(p) term is quantized to DECIMAL(18,9)
  *    before summing so the aggregation is shuffle-order-independent.
  */
object R9Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def d2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  val qPivotMulti = QueryDef("q_pivot_multi",
    (s, dir) => t(s, dir, "orders")
      .groupBy("o_orderstatus")
      .pivot("o_orderpriority", Seq("1-URGENT", "2-HIGH", "3-MEDIUM"))
      .agg(sum(d2(col("o_totalprice"))).cast("double").as("rev"),
        count(lit(1)).cast("long").as("n"))
      .orderBy("o_orderstatus"),
    Some(
      """SELECT o_orderstatus,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "1-URGENT_rev",
        |  CAST(count(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 END) AS BIGINT) AS "1-URGENT_n",
        |  CAST(sum(CASE WHEN o_orderpriority = '2-HIGH' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "2-HIGH_rev",
        |  CAST(count(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 END) AS BIGINT) AS "2-HIGH_n",
        |  CAST(sum(CASE WHEN o_orderpriority = '3-MEDIUM' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS "3-MEDIUM_rev",
        |  CAST(count(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 END) AS BIGINT) AS "3-MEDIUM_n"
        |FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  private val entropySparkSql =
    """WITH tok AS (SELECT doc_id, explode(split(text, ' ')) AS term FROM documents),
      |tc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1, 2),
      |tot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n FROM tc GROUP BY 1),
      |h AS (SELECT tc.doc_id,
      |  CAST((CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(18,9)) AS c
      |  FROM tc JOIN tot ON tc.doc_id = tot.doc_id)
      |SELECT doc_id, CAST(-sum(c) AS DOUBLE) AS entropy,
      |  CAST(count(*) AS BIGINT) AS n_distinct
      |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val qEntropy = QueryDef("q_entropy",
    (s, dir) => {
      t(s, dir, "documents").createOrReplaceTempView("documents")
      s.sql(entropySparkSql)
    },
    Some(
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents),
        |tc AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS cnt FROM tok GROUP BY 1, 2),
        |tot AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n FROM tc GROUP BY 1),
        |h AS (SELECT tc.doc_id,
        |  CAST((CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) * ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(18,9)) AS c
        |  FROM tc JOIN tot ON tc.doc_id = tot.doc_id)
        |SELECT doc_id, CAST(-sum(c) AS DOUBLE) AS entropy,
        |  CAST(count(*) AS BIGINT) AS n_distinct
        |FROM h GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Hidden `_metadata` file column: write a hive-partitioned layout,
    * read it back attributing every row to its physical file, and
    * recover the partition value from `_metadata.file_path` — the
    * lineage/debugging surface (which file did this row come from) that
    * a 100 TB lake job leans on. Oracle = the same counts straight off
    * the source table. */
  val qFileMetadata = QueryDef("q_file_metadata",
    (s, dir) => {
      val out = java.nio.file.Paths.get(sys.props("java.io.tmpdir"),
        "graft_meta_" + math.abs(dir.hashCode)).toString
      t(s, dir, "lineitem")
        .select(col("l_orderkey"), (col("l_orderkey") % 4).as("bucket"))
        .write.mode("overwrite").partitionBy("bucket").parquet(out)
      s.read.parquet(out)
        .select(col("l_orderkey"), col("_metadata.file_path").as("fp"))
        .withColumn("bucket",
          regexp_extract(col("fp"), "bucket=([0-9]+)", 1).cast("long"))
        .groupBy("bucket")
        .agg(count(lit(1)).cast("long").as("n"),
          min("l_orderkey").as("min_key"))
        .orderBy("bucket")
    },
    Some(
      """SELECT l_orderkey % 4 AS bucket, CAST(count(*) AS BIGINT) AS n,
        |       min(l_orderkey) AS min_key
        |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin))

  val all: Seq[QueryDef] = Seq(qPivotMulti, qEntropy, qFileMetadata)
}
