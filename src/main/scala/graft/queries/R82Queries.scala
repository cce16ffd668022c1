package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Eighty-second wave — bill-of-materials rollup, Merkle-style table
  * diff, and span-corruption masking.
  *
  *  - `q_bom_rollup`: multi-level bill-of-materials cost rollup — the
  *    classic parts-explosion query, but with MULTIPLICATIVE path
  *    quantities (total cost of a root = Σ over descendants of
  *    cost(d)·Π qty(path)), which plain reachability (q_recursive_cte)
  *    cannot express. The forest is synthetic-deterministic
  *    (parent(p) = ⌊p/10⌋, qty(p) = p mod 5 + 1 — depth ≤ ⌈log₁₀ P⌉,
  *    so the Spark side UNROLLS the walk into a closed-form column
  *    expression — one scan, one aggregate, no iteration (measured ~10×
  *    over the driver-loop form once each level lands in a named
  *    column — nested CASEs explode the tree 3^depth for codegen); the oracle walks the same edges as a
  *    recursive CTE. All-integer cents.
  *  - `q_merkle_diff`: hash-tree anti-entropy between two table
  *    snapshots (the Dynamo/Cassandra replica-repair pattern): each
  *    side folds to 1024 bucket digests (sized so the ~6% mutation
  *    rate leaves a third of the buckets CLEAN — the gate provably
  *    skips them) (order-independent sum of 32-bit
  *    row mixes), only buckets whose digests disagree are DRILLED into
  *    row-level diffs — the network/IO cost tracks the CHANGED buckets,
  *    not the 100 TB table. The drill-down is gated by a broadcast
  *    semi-join on the differing bucket ids; the emitted per-bucket
  *    changed-key counts are exact.
  *  - `q_span_corrupt`: T5-style span corruption planning (Raffel et
  *    al. 2020): deterministic-hash span starts (≈5%) extended to
  *    3-token spans, merged when overlapping — per document the token
  *    count, span count, masked-token count, and exact mask ratio in
  *    basis points. Pure per-doc windows over the exploded tokens
  *    (map-side after one doc-partitioned sort); the plan a masking job
  *    executes before writing denoiser training pairs.
  */
object R82Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_bom_rollup ----------

  val qBomRollup = QueryDef("q_bom_rollup",
    (s, dir) => {
      val parts = t(s, dir, "part").select(col("p_partkey").as("p"),
        expr("CAST(round(p_retailprice * 100.0) AS BIGINT)").as("c"))
      // The parent function is ARITHMETIC (⌊p/10⌋), so the bounded-depth
      // walk unrolls into a closed-form column expression: 7 CASE levels
      // compute each node's root and path-quantity product MAP-SIDE —
      // one scan, one dimension-sized aggregate, no iteration. (A
      // data-dependent edge TABLE would need the q_crawl_bfs driver
      // loop; the recursive-CTE oracle walks the same edges level by
      // level and proves the unrolled form equivalent.)
      // each level lands in a NAMED column — nesting the when()s instead
      // builds a 3^7-node expression tree that stalls codegen (measured)
      var walked = parts.withColumn("anc", col("p"))
        .withColumn("mult", lit(1L))
      for (i <- 1 to 7) {
        walked = walked
          .withColumn(s"mult$i", when(col("anc") >= 10,
            col("mult") * (col("anc") % 5 + 1)).otherwise(col("mult")))
          .withColumn(s"anc$i", when(col("anc") >= 10,
            ((col("anc") - col("anc") % 10) / 10).cast("long"))
            .otherwise(col("anc")))
          .drop("anc", "mult")
          .withColumnRenamed(s"anc$i", "anc")
          .withColumnRenamed(s"mult$i", "mult")
      }
      walked.select(col("anc").as("root"), (col("c") * col("mult")).as("contrib"))
        .groupBy("root")
        .agg(count(lit(1)).cast("long").as("n_desc"),
          sum(col("contrib")).cast("long").as("total_cost_c"))
        .orderBy("root")
    },
    Some(
      """WITH RECURSIVE parts0 AS (
        |  SELECT p_partkey AS p, CAST(round(p_retailprice * 100.0) AS BIGINT) AS c
        |  FROM part),
        |up AS (
        |  SELECT p AS node, p AS anc, CAST(1 AS BIGINT) AS mult FROM parts0
        |  UNION ALL
        |  SELECT u.node, CAST((u.anc - u.anc % 10) / 10 AS BIGINT),
        |    u.mult * (u.anc % 5 + 1)
        |  FROM up u WHERE u.anc >= 10)
        |SELECT u.anc AS root, CAST(count(*) AS BIGINT) AS n_desc,
        |  CAST(sum(n.c * u.mult) AS BIGINT) AS total_cost_c
        |FROM up u JOIN parts0 n ON n.p = u.node
        |WHERE u.anc < 10
        |GROUP BY u.anc ORDER BY root""".stripMargin))

  // ---------- q_merkle_diff ----------

  private val nBuckets = 1024L

  /** 32-bit order-independent row mix over (k, cents) — verbatim on
    * both sides; bucket digests are plain sums (never overflow:
    * rows·2³² ≪ 2⁶³). Constants sized so k²·c stays far below 2⁶³ at
    * any sf — DuckDB would raise on BIGINT overflow where the JVM
    * silently wraps, and the two must agree. */
  private val rowMixSql =
    "(k * k * 104729 + k * 40503 + cents * 2246822519) % 4294967296"

  val qMerkleDiff = QueryDef("q_merkle_diff",
    (s, dir) => {
      val a = t(s, dir, "orders").select(col("o_orderkey").as("k"),
        expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("cents"))
      val b = a.where(col("k") % 31 =!= 0)
        .select(col("k"), when(col("k") % 29 === 0, col("cents") + 700L)
          .otherwise(col("cents")).as("cents"))
      def digests(df: DataFrame, side: String): DataFrame =
        df.withColumn("bucket", col("k") % nBuckets)
          .withColumn("mix", expr(rowMixSql))
          .groupBy("bucket")
          .agg(count(lit(1)).cast("long").as(s"n_$side"),
            sum(col("mix")).cast("long").as(s"digest_$side"))
      val da = digests(a, "a")
      val db = digests(b, "b")
      val diffB = da.join(db, Seq("bucket"), "full_outer")
        .select(col("bucket"),
          coalesce(col("n_a"), lit(0L)).as("n_a"),
          coalesce(col("n_b"), lit(0L)).as("n_b"),
          coalesce(col("digest_a"), lit(0L)).as("digest_a"),
          coalesce(col("digest_b"), lit(0L)).as("digest_b"))
        .where(col("digest_a") =!= col("digest_b") || col("n_a") =!= col("n_b"))
      // drill-down ONLY into differing buckets (broadcast semi-join gate)
      val gate = diffB.select("bucket")
      val rowsA = a.withColumn("bucket", col("k") % nBuckets)
        .join(broadcast(gate), Seq("bucket"), "left_semi")
      val rowsB = b.withColumn("bucket", col("k") % nBuckets)
        .join(broadcast(gate), Seq("bucket"), "left_semi")
      val changed = rowsA.withColumnRenamed("cents", "ca")
        .join(rowsB.withColumnRenamed("cents", "cb"), Seq("bucket", "k"),
          "full_outer")
        .where(col("ca").isNull || col("cb").isNull || col("ca") =!= col("cb"))
        .groupBy("bucket")
        .agg(count(lit(1)).cast("long").as("n_changed"))
      diffB.join(changed, Seq("bucket"), "left")
        .select(col("bucket"), col("n_a"), col("n_b"),
          col("digest_a"), col("digest_b"),
          coalesce(col("n_changed"), lit(0L)).as("n_changed"))
        .orderBy("bucket")
    },
    Some(
      s"""WITH a AS (
         |  SELECT o_orderkey AS k, CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
         |  FROM orders),
         |b AS (
         |  SELECT k, CASE WHEN k % 29 = 0 THEN cents + 700 ELSE cents END AS cents
         |  FROM a WHERE k % 31 <> 0),
         |da AS (
         |  SELECT k % $nBuckets AS bucket, CAST(count(*) AS BIGINT) AS n_a,
         |    CAST(sum($rowMixSql) AS BIGINT) AS digest_a
         |  FROM a GROUP BY 1),
         |db AS (
         |  SELECT k % $nBuckets AS bucket, CAST(count(*) AS BIGINT) AS n_b,
         |    CAST(sum($rowMixSql) AS BIGINT) AS digest_b
         |  FROM b GROUP BY 1),
         |diffb AS (
         |  SELECT coalesce(da.bucket, db.bucket) AS bucket,
         |    coalesce(n_a, 0) AS n_a, coalesce(n_b, 0) AS n_b,
         |    coalesce(digest_a, 0) AS digest_a, coalesce(digest_b, 0) AS digest_b
         |  FROM da FULL OUTER JOIN db ON da.bucket = db.bucket
         |  WHERE coalesce(digest_a, 0) <> coalesce(digest_b, 0)
         |     OR coalesce(n_a, 0) <> coalesce(n_b, 0)),
         |changed AS (
         |  SELECT x.bucket, CAST(count(*) AS BIGINT) AS n_changed FROM (
         |    SELECT coalesce(ra.k % $nBuckets, rb.k % $nBuckets) AS bucket
         |    FROM (SELECT * FROM a WHERE k % $nBuckets IN (SELECT bucket FROM diffb)) ra
         |    FULL OUTER JOIN
         |      (SELECT * FROM b WHERE k % $nBuckets IN (SELECT bucket FROM diffb)) rb
         |      ON ra.k = rb.k
         |    WHERE ra.cents IS NULL OR rb.cents IS NULL OR ra.cents <> rb.cents) x
         |  GROUP BY 1)
         |SELECT d.bucket, n_a, n_b, digest_a, digest_b,
         |  CAST(coalesce(c.n_changed, 0) AS BIGINT) AS n_changed
         |FROM diffb d LEFT JOIN changed c ON c.bucket = d.bucket
         |ORDER BY d.bucket""".stripMargin))

  // ---------- q_span_corrupt ----------

  /** Span-start hash gate ≈ 5% and span length 3 — shared constants. */
  private val startSql =
    "CASE WHEN (doc_id * 2654435761 + pos * 7919 + pos * pos * 104729) % 97 < 5" +
      " THEN 1 ELSE 0 END"

  val qSpanCorrupt = QueryDef("q_span_corrupt",
    (s, dir) => {
      val toks = t(s, dir, "documents")
        .select(col("doc_id"), posexplode(split(col("text"), " ")))
        .withColumnRenamed("pos", "pos")
        .select(col("doc_id"), col("pos").cast("long").as("pos"))
        .withColumn("start", expr(startSql))
      val wSpan = Window.partitionBy("doc_id").orderBy("pos")
        .rowsBetween(-2, Window.currentRow)
      val wLag = Window.partitionBy("doc_id").orderBy("pos")
      val marked = toks
        .withColumn("masked", max(col("start")).over(wSpan))
        .withColumn("span_open",
          when(col("masked") === 1 &&
            coalesce(lag(col("masked"), 1).over(wLag), lit(0)) === 0, 1L)
            .otherwise(0L))
      marked.groupBy("doc_id")
        .agg(count(lit(1)).cast("long").as("n_tokens"),
          sum(col("span_open")).cast("long").as("n_spans"),
          sum(col("masked")).cast("long").as("n_masked"))
        .withColumn("mask_bp",
          ((col("n_masked") * 10000L - (col("n_masked") * 10000L) % col("n_tokens"))
            / col("n_tokens")).cast("long"))
        .orderBy("doc_id")
    },
    Some(
      s"""WITH toks AS (
         |  SELECT doc_id, CAST(pos - 1 AS BIGINT) AS pos FROM (
         |    SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos
         |    FROM documents)),
         |flags AS (
         |  SELECT doc_id, pos, $startSql AS start FROM toks),
         |marked AS (
         |  SELECT doc_id, pos,
         |    max(start) OVER (PARTITION BY doc_id ORDER BY pos
         |      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS masked
         |  FROM flags),
         |runs AS (
         |  SELECT doc_id, masked,
         |    CASE WHEN masked = 1 AND coalesce(lag(masked) OVER
         |      (PARTITION BY doc_id ORDER BY pos), 0) = 0 THEN 1 ELSE 0 END AS span_open
         |  FROM marked)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
         |  CAST(sum(span_open) AS BIGINT) AS n_spans,
         |  CAST(sum(masked) AS BIGINT) AS n_masked,
         |  CAST((sum(masked) * 10000 - (sum(masked) * 10000) % count(*))
         |    / count(*) AS BIGINT) AS mask_bp
         |FROM runs GROUP BY doc_id ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qBomRollup, qMerkleDiff, qSpanCorrupt)
}
