package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Thirty-first wave — cheap whole-table integrity signatures.
  *
  * `q_table_checksum`: ORDER-INDEPENDENT table signatures (row-hash
  * folds combined with bit_xor and sum — both commutative), computed
  * for a table and a deterministically mutated copy. Comparing two
  * pipeline outputs then costs two scans and a 2-row compare instead
  * of a sort-merge diff — the everyday "did the migration change
  * anything" primitive; the mutated copy proves the signature actually
  * moves when rows change. A single corrupted row flips xor_sig with
  * probability 1 - 2⁻⁶⁰.
  */
object R31Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** md5-hex fold shared verbatim by both engines (instr/substr exist
    * in each): first `n` hex digits of column `h` as a BIGINT. The CAST
    * keeps every multiply in 64-bit — int-literal multipliers (2²⁸ and
    * below) would overflow 32-bit under Spark's ANSI arithmetic. */
  private def hexFold(n: Int): String = (1 to n).map(i =>
    s"(CAST(instr('0123456789abcdef', substr(h, $i, 1)) AS BIGINT) - 1) * " +
      s"${1L << (4 * (n - i))}").mkString(" + ")

  val qTableChecksum = QueryDef("q_table_checksum",
    (s, dir) => {
      val d2t = DecimalType(18, 2)
      val v1 = t(s, dir, "customer")
        .select(col("c_custkey").as("key"),
          col("c_acctbal").cast(d2t).as("bal"))
      val v2 = v1.where(col("key") % 97 =!= 0)
        .select(col("key"),
          when(col("key") % 13 === 0, col("bal") + lit(100).cast(d2t))
            .otherwise(col("bal")).as("bal"))
        .unionAll(v1.where(col("key") % 89 === 0)
          .select((col("key") + 1000000).as("key"), col("bal")))
      def sig(df: DataFrame, version: String) = df
        .select(md5(concat_ws("|", col("key"), col("bal"))).as("h"))
        .select(expr(hexFold(15)).as("x"), expr(hexFold(6)).as("s"))
        .agg(count(lit(1)).cast("long").as("n_rows"),
          expr("bit_xor(x)").as("xor_sig"),
          sum(col("s")).as("sum_sig"))
        .select(lit(version).as("version"), col("n_rows"), col("xor_sig"),
          col("sum_sig"))
      sig(v1, "v1").unionAll(sig(v2, "v2")).orderBy("version")
    },
    Some {
      val rowSig =
        s"""SELECT ${hexFold(15)} AS x, ${hexFold(6)} AS s
           |FROM (SELECT md5(CAST(key AS VARCHAR) || '|' ||
           |             CAST(bal AS VARCHAR)) AS h FROM %s)""".stripMargin
      s"""WITH v1 AS (
         |  SELECT c_custkey AS key, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
         |  FROM customer
         |), v2 AS (
         |  SELECT key,
         |    CASE WHEN key % 13 = 0 THEN bal + CAST(100 AS DECIMAL(18,2))
         |         ELSE bal END AS bal
         |  FROM v1 WHERE key % 97 <> 0
         |  UNION ALL
         |  SELECT key + 1000000, bal FROM v1 WHERE key % 89 = 0
         |), s1 AS (${rowSig.format("v1")}),
         |s2 AS (${rowSig.format("v2")})
         |SELECT 'v1' AS version, CAST(count(*) AS BIGINT) AS n_rows,
         |  bit_xor(x) AS xor_sig, CAST(sum(s) AS BIGINT) AS sum_sig FROM s1
         |UNION ALL
         |SELECT 'v2', CAST(count(*) AS BIGINT), bit_xor(x),
         |  CAST(sum(s) AS BIGINT) FROM s2
         |ORDER BY version""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(qTableChecksum)
}
