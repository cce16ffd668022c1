package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Sixth wave — declarative iteration plus the chunk/pack/score stages of
  * an LLM training-data pipeline:
  *
  *  - `WITH RECURSIVE` (Spark 4's UnionLoop): the reference's BFS crawl
  *    loop (SURVEY.md §2.10) expressed as one declarative statement,
  *    same SQL text on both engines — the driver-side loop in
  *    `CrawlGraph.bfs` is the imperative form of exactly this plan;
  *  - token-window chunking with overlap (context-window preparation:
  *    W=40-token windows at stride 30);
  *  - sequential sequence packing (per-source running token sum →
  *    capacity-512 bins; partitioned by source so the window shuffles
  *    once and scales with sources, the production sharding shape);
  *  - corpus-level line dedup (CCNet shape: first occurrence of every
  *    10-token line survives, docs reassembled with ordered LISTAGG);
  *  - bigram-LM document scoring (corpus LM → per-doc sum of log
  *    probabilities; each ln(p) is quantized to DECIMAL(18,9) so the
  *    sum is order-independent — a raw double sum would be
  *    shuffle-order-dependent and could never hash-match);
  *  - URL canonicalization (fragment strip, utm_* removal, host
  *    lowercasing — the crawler's dedup-key normalization);
  *  - bitwise scalar surface, null-safe (`IS NOT DISTINCT FROM`) join
  *    on aggregated sides, and a correlated LATERAL top-2 subquery.
  */
object R6Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def views(s: SparkSession, dir: String, names: String*): Unit =
    names.foreach(n => t(s, dir, n).createOrReplaceTempView(n))

  private def sqlQuery(name: String, sql: String, tables: String*): QueryDef =
    QueryDef(name,
      (s, dir) => { views(s, dir, tables: _*); s.sql(sql) },
      Some(sql))

  // ---------- declarative iteration ----------

  /** Recursive-CTE BFS over an implicit binary tree on customer keys
    * (parent(c) = (c-1-((c-1)%2))/2 — the numerator is even, so the
    * double division is exact and the BIGINT cast agrees across
    * engines). Spark 4 executes this as UnionLoop: one equi-join +
    * filter per level until the frontier empties — the same per-depth
    * work as `CrawlGraph.bfs`, with no driver-side loop. */
  private val recursiveSql =
    """WITH RECURSIVE reach(node, depth) AS (
      |  SELECT CAST(0 AS BIGINT) AS node, 0 AS depth
      |  UNION ALL
      |  SELECT c.c_custkey, r.depth + 1
      |  FROM reach r JOIN customer c
      |    ON CAST((c.c_custkey - 1 - (c.c_custkey - 1) % 2) / 2 AS BIGINT) = r.node
      |  WHERE c.c_custkey > 0)
      |SELECT depth, CAST(count(*) AS BIGINT) AS n,
      |       CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS bal
      |FROM reach JOIN customer ON c_custkey = node
      |GROUP BY depth ORDER BY depth""".stripMargin

  val qRecursiveCte = sqlQuery("q_recursive_cte", recursiveSql, "customer")

  // ---------- training-data pipeline: chunk / pack / dedup / score ----------

  /** Context-window chunking: split each document into 40-token windows
    * at stride 30 (10-token overlap). explode(sequence) is map-side —
    * no shuffle at all until the final presentation sort. */
  val qChunkOverlap = QueryDef("q_chunk_overlap",
    (s, dir) => t(s, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("arr"))
      .withColumn("i",
        explode(sequence(lit(0), floor((size(col("arr")) - 1) / 30).cast("int"))))
      .select(col("doc_id"), col("i").cast("int").as("chunk_id"),
        array_join(slice(col("arr"), col("i") * 30 + 1, lit(40)), " ")
          .as("chunk_text"),
        size(slice(col("arr"), col("i") * 30 + 1, lit(40))).cast("int")
          .as("n_tokens"))
      .orderBy("doc_id", "chunk_id"),
    Some(
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
        |chunks AS (SELECT doc_id, arr,
        |  unnest(generate_series(0, CAST(floor((len(arr) - 1) / 30) AS INT))) AS i
        |  FROM docs)
        |SELECT doc_id, CAST(i AS INT) AS chunk_id,
        |  array_to_string(list_slice(arr, i * 30 + 1, i * 30 + 40), ' ') AS chunk_text,
        |  CAST(len(list_slice(arr, i * 30 + 1, i * 30 + 40)) AS INT) AS n_tokens
        |FROM chunks ORDER BY doc_id, chunk_id""".stripMargin))

  /** Sequence packing: per-source running token sum assigns each doc to
    * a capacity-512 bin (greedy sequential fill; a doc spanning the
    * boundary stays in the earlier bin). PARTITION BY source keeps the
    * window distributed — one hash shuffle on source, never a global
    * sort. */
  val qPackSequences = QueryDef("q_pack_sequences",
    (s, dir) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)
      t(s, dir, "documents")
        .select(col("source"), col("doc_id"),
          size(split(col("text"), " ")).cast("long").as("tok"))
        .withColumn("cum", sum("tok").over(w).cast("long"))
        .withColumn("bin", floor((col("cum") - col("tok")) / 512).cast("long"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum("tok").cast("long").as("n_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
        .orderBy("source", "bin")
    },
    Some(
      """WITH d AS (SELECT source, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS tok FROM documents),
        |c AS (SELECT source, doc_id, tok,
        |  CAST(sum(tok) OVER (PARTITION BY source ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum FROM d)
        |SELECT source, CAST(floor((cum - tok) / 512) AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY source, bin ORDER BY source, bin""".stripMargin))

  /** Corpus line dedup (CCNet shape): first occurrence of each 10-token
    * line survives; documents reassembled from surviving lines with an
    * ordered LISTAGG. Two shuffles — one on line text for the
    * first-occurrence window, one on doc_id for reassembly — both on
    * keys that scale with the corpus. */
  private val lineDedupSparkSql =
    """WITH docs AS (SELECT doc_id, split(text, ' ') AS arr FROM documents),
      |nums AS (SELECT doc_id, arr,
      |  explode(sequence(0, CAST(floor((size(arr) - 1) / 10) AS INT))) AS i FROM docs),
      |lines AS (SELECT doc_id, i AS line_no,
      |  array_join(slice(arr, i * 10 + 1, 10), ' ') AS line FROM nums),
      |keep AS (SELECT doc_id, line_no, line,
      |  row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
      |  FROM lines)
      |SELECT doc_id,
      |  CAST(count(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS kept_lines,
      |  CAST(count(*) AS BIGINT) AS total_lines,
      |  COALESCE(listagg(CASE WHEN rn = 1 THEN line END, ' ')
      |           WITHIN GROUP (ORDER BY line_no), '') AS clean_text
      |FROM keep GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val qLineDedup = QueryDef("q_line_dedup",
    (s, dir) => { views(s, dir, "documents"); s.sql(lineDedupSparkSql) },
    Some(
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
        |nums AS (SELECT doc_id, arr,
        |  unnest(generate_series(0, CAST(floor((len(arr) - 1) / 10) AS INT))) AS i FROM docs),
        |lines AS (SELECT doc_id, i AS line_no,
        |  array_to_string(list_slice(arr, i * 10 + 1, i * 10 + 10), ' ') AS line FROM nums),
        |keep AS (SELECT doc_id, line_no, line,
        |  row_number() OVER (PARTITION BY line ORDER BY doc_id, line_no) AS rn
        |  FROM lines)
        |SELECT doc_id,
        |  CAST(count(CASE WHEN rn = 1 THEN 1 END) AS BIGINT) AS kept_lines,
        |  CAST(count(*) AS BIGINT) AS total_lines,
        |  COALESCE(string_agg(CASE WHEN rn = 1 THEN line END, ' ' ORDER BY line_no), '') AS clean_text
        |FROM keep GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** Bigram-LM document scoring (perplexity proxy): corpus-wide
    * P(w2|w1) = c12/c1, each document scored by the sum of its bigrams'
    * ln(p). Quantizing every ln(p) to DECIMAL(18,9) makes the
    * aggregation exact and order-independent — the double sum a naive
    * implementation would use depends on shuffle order and cannot
    * hash-match any oracle. */
  private val lmScoreSparkSql =
    """WITH docs AS (SELECT doc_id, split(text, ' ') AS arr FROM documents),
      |tok AS (SELECT doc_id, pos, word FROM docs LATERAL VIEW posexplode(arr) t AS pos, word),
      |big AS (SELECT doc_id, word AS w1,
      |  lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM tok),
      |b AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
      |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM b GROUP BY 1, 2),
      |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM b GROUP BY 1),
      |p AS (SELECT w1, w2, CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS p
      |      FROM c12 JOIN c1 USING (w1)),
      |scored AS (SELECT b.doc_id, CAST(ln(p.p) AS DECIMAL(18,9)) AS lp
      |           FROM b JOIN p ON b.w1 = p.w1 AND b.w2 = p.w2)
      |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
      |  CAST(sum(lp) AS DOUBLE) AS logprob,
      |  CAST(CAST(sum(lp) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS DOUBLE) AS avg_logprob
      |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin

  val qLmDocScore = QueryDef("q_lm_doc_score",
    (s, dir) => { views(s, dir, "documents"); s.sql(lmScoreSparkSql) },
    Some(
      """WITH docs AS (SELECT doc_id, string_split(text, ' ') AS arr FROM documents),
        |idx AS (SELECT doc_id, arr, unnest(generate_series(1, len(arr))) AS i FROM docs),
        |tok AS (SELECT doc_id, i AS pos, arr[i] AS word FROM idx),
        |big AS (SELECT doc_id, word AS w1,
        |  lead(word) OVER (PARTITION BY doc_id ORDER BY pos) AS w2 FROM tok),
        |b AS (SELECT doc_id, w1, w2 FROM big WHERE w2 IS NOT NULL),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12 FROM b GROUP BY 1, 2),
        |c1 AS (SELECT w1, CAST(count(*) AS BIGINT) AS c1 FROM b GROUP BY 1),
        |p AS (SELECT w1, w2, CAST(c12 AS DOUBLE) / CAST(c1 AS DOUBLE) AS p
        |      FROM c12 JOIN c1 USING (w1)),
        |scored AS (SELECT b.doc_id, CAST(ln(p.p) AS DECIMAL(18,9)) AS lp
        |           FROM b JOIN p ON b.w1 = p.w1 AND b.w2 = p.w2)
        |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
        |  CAST(sum(lp) AS DOUBLE) AS logprob,
        |  CAST(CAST(sum(lp) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS DOUBLE) AS avg_logprob
        |FROM scored GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  /** URL canonicalization: strip fragment, remove utm_* tracking params,
    * trim dangling separators, lowercase scheme+host (path case is
    * significant, host case is not) — then count collisions per
    * canonical URL. Pure codegen'd string expressions, no shuffle before
    * the aggregate. */
  val qUrlCanonical = QueryDef("q_url_canonical",
    (s, dir) => {
      val url = concat(
        lit("https://"),
        when(col("doc_id") % 2 === 0, upper(col("source"))).otherwise(col("source")),
        lit(".Example.COM/path/"), (col("doc_id") % 50).cast("string"),
        when(col("doc_id") % 3 === 0,
          concat(lit("?utm_source=feed&utm_campaign=x&id="),
            (col("doc_id") % 5).cast("string"))).otherwise(lit("")),
        when(col("doc_id") % 4 === 0, lit("#frag")).otherwise(lit("")))
      val f3 = regexp_replace(
        regexp_replace(regexp_replace(col("url"), "#.*", ""),
          "utm_[A-Za-z]+=[^&#]*&?", ""),
        "[?&]$", "")
      t(s, dir, "documents")
        .select(col("doc_id"), url.as("url"))
        .withColumn("f3", f3)
        .withColumn("curl", concat(
          lower(regexp_extract(col("f3"), "^(https?://[^/]*)", 1)),
          regexp_extract(col("f3"), "^https?://[^/]*(.*)$", 1)))
        .groupBy("curl")
        .agg(count(lit(1)).cast("long").as("n"), min("doc_id").as("first_doc"))
        .orderBy("curl")
    },
    Some(
      """WITH urls AS (
        |  SELECT doc_id,
        |    'https://' || CASE WHEN doc_id % 2 = 0 THEN upper(source) ELSE source END
        |      || '.Example.COM/path/' || CAST(doc_id % 50 AS VARCHAR)
        |      || CASE WHEN doc_id % 3 = 0 THEN '?utm_source=feed&utm_campaign=x&id=' || CAST(doc_id % 5 AS VARCHAR) ELSE '' END
        |      || CASE WHEN doc_id % 4 = 0 THEN '#frag' ELSE '' END AS url
        |  FROM documents),
        |canon AS (
        |  SELECT doc_id,
        |    concat(
        |      lower(regexp_extract(f3, '^(https?://[^/]*)', 1)),
        |      regexp_extract(f3, '^https?://[^/]*(.*)$', 1)) AS curl
        |  FROM (
        |    SELECT doc_id,
        |      regexp_replace(regexp_replace(regexp_replace(url, '#.*', ''),
        |        'utm_[A-Za-z]+=[^&#]*&?', '', 'g'), '[?&]$', '') AS f3
        |    FROM urls) x)
        |SELECT curl, CAST(count(*) AS BIGINT) AS n, min(doc_id) AS first_doc
        |FROM canon GROUP BY curl ORDER BY curl""".stripMargin))

  // ---------- scalar / join surface ----------

  /** Bitwise scalar family (shift, and/or/xor, complement, popcount). */
  val qBitwise = QueryDef("q_bitwise",
    (s, dir) => {
      views(s, dir, "part")
      s.sql("""SELECT p_partkey,
        |  CAST(shiftleft(p_size, 2) AS INT) AS shl,
        |  CAST(shiftright(p_size, 1) AS INT) AS shr,
        |  CAST(p_size & 7 AS INT) AS b_and, CAST(p_size | 8 AS INT) AS b_or,
        |  CAST(p_size ^ 5 AS INT) AS b_xor, CAST(~p_size AS INT) AS b_not,
        |  CAST(bit_count(p_size) AS INT) AS pop
        |FROM part WHERE p_partkey < 50 ORDER BY p_partkey""".stripMargin)
    },
    Some(
      """SELECT p_partkey,
        |  CAST(p_size << 2 AS INT) AS shl, CAST(p_size >> 1 AS INT) AS shr,
        |  CAST(p_size & 7 AS INT) AS b_and, CAST(p_size | 8 AS INT) AS b_or,
        |  CAST(xor(p_size, 5) AS INT) AS b_xor, CAST(~p_size AS INT) AS b_not,
        |  CAST(bit_count(p_size) AS INT) AS pop
        |FROM part WHERE p_partkey < 50 ORDER BY p_partkey""".stripMargin))

  /** Null-safe join: `IS NOT DISTINCT FROM` over pre-aggregated sides
    * (NULL keys match each other; aggregating first keeps the NULL
    * bucket a single row instead of an N×M blowup — the scale-safe
    * form). Same SQL text on both engines. */
  private val nullSafeSql =
    """WITH a AS (
      |  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderkey % 13 END AS k,
      |         CAST(count(*) AS BIGINT) AS na
      |  FROM orders GROUP BY 1),
      |b AS (
      |  SELECT CASE WHEN o_orderkey % 5 = 0 THEN NULL ELSE o_orderkey % 11 END AS k,
      |         CAST(count(*) AS BIGINT) AS nb
      |  FROM orders GROUP BY 1)
      |SELECT a.k AS key, na, nb, CAST(na * nb AS BIGINT) AS pairs
      |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
      |ORDER BY key NULLS FIRST""".stripMargin

  val qNullSafeJoin = sqlQuery("q_nullsafe_join", nullSafeSql, "orders")

  /** Correlated LATERAL subquery: top-2 orders per customer by price —
    * the per-row-subquery surface; Catalyst rewrites it to a ranked
    * window join, not a per-customer re-execution. Same SQL text on
    * both engines. */
  private val lateralSql =
    """SELECT c_custkey, o_orderkey, o_totalprice
      |FROM customer, LATERAL (SELECT o_orderkey, o_totalprice FROM orders
      |   WHERE o_custkey = c_custkey ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
      |WHERE c_custkey < 40 ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  val qLateralCorr = sqlQuery("q_lateral_corr", lateralSql, "customer", "orders")

  val all: Seq[QueryDef] = Seq(
    qRecursiveCte, qChunkOverlap, qPackSequences, qLineDedup, qLmDocScore,
    qUrlCanonical, qBitwise, qNullSafeJoin, qLateralCorr)
}
