package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Thirty-eighth wave — co-occurrence mining.
  *
  *  - `q_pmi_collocations`: pointwise mutual information over adjacent
  *    bigrams (the word2vec-phrases / collocation-extraction step that
  *    decides which token pairs merge into phrases before tokenizer
  *    training). PMI = ln(N·c12 / (c1·c2)) over bigram-position counts;
  *    round(4) absorbs libm ln divergence, every count is exact.
  *  - `q_assoc_rules`: market-basket association rules over order
  *    baskets (brand co-occurrence): support in integer basis points
  *    (exact floor division), confidence both directions and lift as
  *    single IEEE divisions on exact integer counts.
  *
  * Scale design: bigram assembly is a per-doc window (partition-
  * parallel, the shared-lead idiom — no O(n·k) array HOFs); pair counts
  * are map-side-combined aggregations bounded by vocabulary² (bigrams)
  * / brands² (baskets), never corpus-sized on the shuffle; the basket
  * self-join keys on the order id so fanout per key is the basket size
  * (TPC-H ≤ 7 items), the standard market-basket shape; the part
  * dimension broadcasts; scalar totals ride 1-row broadcasts.
  */
object R38Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_pmi_collocations ----------

  private val PmiDocs = 400
  private val PmiMinCount = 20

  /** Verbatim-shared PMI fragment over (c12, c1, c2, nb). */
  private val pmiSql: String =
    "round(ln((CAST(c12 AS DOUBLE) * CAST(nb AS DOUBLE)) / (CAST(c1 AS DOUBLE) * CAST(c2 AS DOUBLE))), 4)"

  val qPmiCollocations = QueryDef("q_pmi_collocations",
    (s, dir) => {
      val tokens = t(s, dir, "documents").where(col("doc_id") < PmiDocs)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "word")))
        .where(length(col("word")) > 0)
      val w = Window.partitionBy("doc_id").orderBy("pos")
      val big = tokens.withColumn("w2", lead("word", 1).over(w))
        .where(col("w2").isNotNull)
        .select(col("word").as("w1"), col("w2"))
      val c12 = big.groupBy("w1", "w2")
        .agg(count(lit(1)).cast("long").as("c12"))
      val c1 = big.groupBy("w1").agg(count(lit(1)).cast("long").as("c1"))
      val c2 = big.groupBy("w2").agg(count(lit(1)).cast("long").as("c2"))
      val nb = big.agg(count(lit(1)).cast("long").as("nb"))
      c12.join(broadcast(c1), "w1").join(broadcast(c2), "w2")
        .crossJoin(broadcast(nb))
        .where(col("c12") >= PmiMinCount)
        .withColumn("pmi", expr(pmiSql))
        .select("w1", "w2", "c12", "c1", "c2", "pmi")
        .orderBy(col("pmi").desc, col("w1"), col("w2"))
        .limit(40)
    },
    Some(
      s"""WITH docs AS (SELECT doc_id, string_split(text, ' ') AS arr
         |              FROM documents WHERE doc_id < $PmiDocs),
         |idx AS (SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i
         |        FROM docs),
         |tok AS (SELECT doc_id, i AS pos, arr[i] AS word FROM idx
         |        WHERE len(arr[i]) > 0),
         |big0 AS (SELECT word AS w1,
         |           lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2
         |         FROM tok),
         |big AS (SELECT w1, w2 FROM big0 WHERE w2 IS NOT NULL),
         |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM big GROUP BY 1, 2),
         |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM big GROUP BY 1),
         |c2 AS (SELECT w2, CAST(count(*) AS BIGINT) AS c2 FROM big GROUP BY 1),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM big)
         |SELECT w1, w2, c12, c1, c2, $pmiSql AS pmi
         |FROM c12 JOIN c1 USING (w1) JOIN c2 USING (w2) CROSS JOIN nb
         |WHERE c12 >= $PmiMinCount
         |ORDER BY pmi DESC, w1, w2 LIMIT 40""".stripMargin))

  // ---------- q_assoc_rules ----------

  private val MinPairSupport = 200

  /** Shared rule metrics over (c12, ca, cb, n): support in exact basis
    * points (floor division — `fdiv` is the one engine-spelled token,
    * `div` in Spark / `//` in DuckDB; operands are positive so floor ≡
    * trunc), both confidences and lift as single IEEE divisions of
    * exact integers. */
  private def ruleMetricExprs(fdiv: String): Seq[String] = Seq(
    s"(10000 * c12) $fdiv n AS supp_bp",
    "CAST(c12 AS DOUBLE) / CAST(ca AS DOUBLE) AS conf_ab",
    "CAST(c12 AS DOUBLE) / CAST(cb AS DOUBLE) AS conf_ba",
    "round((CAST(c12 AS DOUBLE) * CAST(n AS DOUBLE)) / (CAST(ca AS DOUBLE) * CAST(cb AS DOUBLE)), 4) AS lift")

  val qAssocRules = QueryDef("q_assoc_rules",
    (s, dir) => {
      val baskets = t(s, dir, "lineitem")
        .join(broadcast(t(s, dir, "part")), col("l_partkey") === col("p_partkey"))
        .select(col("l_orderkey").as("ok"), col("p_brand").as("br"))
        .distinct()
      val n = baskets.agg(countDistinct(col("ok")).cast("long").as("n"))
      val cnt = baskets.groupBy("br").agg(count(lit(1)).cast("long").as("c"))
      val a = baskets.select(col("ok"), col("br").as("brand_a"))
      val b = baskets.select(col("ok"), col("br").as("brand_b"))
      a.join(b, "ok").where(col("brand_a") < col("brand_b"))
        .groupBy("brand_a", "brand_b")
        .agg(count(lit(1)).cast("long").as("c12"))
        .where(col("c12") >= MinPairSupport)
        .join(broadcast(cnt.select(col("br").as("brand_a"), col("c").as("ca"))), "brand_a")
        .join(broadcast(cnt.select(col("br").as("brand_b"), col("c").as("cb"))), "brand_b")
        .crossJoin(broadcast(n))
        .selectExpr(Seq("brand_a", "brand_b", "c12", "ca", "cb") ++
          ruleMetricExprs("div"): _*)
        .orderBy(col("lift").desc, col("brand_a"), col("brand_b"))
        .limit(40)
    },
    Some(
      s"""WITH b AS (SELECT DISTINCT l_orderkey AS ok, p_brand AS br
         |           FROM lineitem JOIN part ON l_partkey = p_partkey),
         |n0 AS (SELECT CAST(count(DISTINCT ok) AS BIGINT) AS n FROM b),
         |cnt AS (SELECT br, CAST(count(*) AS BIGINT) AS c FROM b GROUP BY 1),
         |pairs AS (SELECT a.br AS brand_a, bb.br AS brand_b,
         |            CAST(count(*) AS BIGINT) AS c12
         |          FROM b a JOIN b bb ON a.ok = bb.ok AND a.br < bb.br
         |          GROUP BY 1, 2 HAVING count(*) >= $MinPairSupport),
         |joined AS (SELECT brand_a, brand_b, c12,
         |             x.c AS ca, y.c AS cb, n0.n AS n
         |           FROM pairs
         |           JOIN cnt x ON x.br = brand_a
         |           JOIN cnt y ON y.br = brand_b
         |           CROSS JOIN n0)
         |SELECT brand_a, brand_b, c12, ca, cb,
         |  ${ruleMetricExprs("//").mkString(",\n  ")}
         |FROM joined
         |ORDER BY lift DESC, brand_a, brand_b LIMIT 40""".stripMargin))

  val all: Seq[QueryDef] = Seq(qPmiCollocations, qAssocRules)
}
