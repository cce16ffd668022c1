package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Seventy-sixth wave — the skyline operator, clamped running balances,
  * and compaction bin planning.
  *
  *  - `q_skyline`: the 2-D Pareto frontier (Börzsönyi/Kossmann/Stocker,
  *    ICDE 2001) over parts — minimize retail price, maximize size.
  *    Distributed two-phase plan: phase 1 computes a per-partition
  *    local skyline with partition-LOCAL windows (partitioned by
  *    `spark_partition_id()` — no global sort funnel); local skylines
  *    are a superset of the global one, and in 2-D each is bounded by
  *    the size-attribute domain (≤ |distinct sizes| rows per
  *    partition), so the candidate set is tiny at any corpus scale.
  *    Phase 2 removes cross-partition dominance exactly with a
  *    broadcast LEFT ANTI self-join over the candidates. The oracle is
  *    the textbook NOT EXISTS form — O(n²) is fine for DuckDB at
  *    sf0.01, unacceptable at 100 TB, which is the point of the
  *    two-phase plan.
  *  - `q_clamped_runsum`: per-customer credit balance clamped at zero —
  *    deposits (orderkey ≡ 0 mod 3) add the order cents, withdrawals
  *    subtract half — bal_i = max(0, bal_{i-1} + d_i). The recurrence
  *    LOOKS non-associative (the classic excuse for a sequential
  *    per-key scan), but it has a prefix-sum closed form:
  *    bal_i = S_i − min(0, min_{k≤i} S_k), and a clamp fires exactly
  *    when S_i is a new strict running minimum below zero. Both sides
  *    are per-key partitioned windows — a shuffle-and-scan plan that
  *    survives any key cardinality, no mapGroups, no driver loop.
  *    (R6WaveInvariantsSpec replays the naive sequential recurrence in
  *    straight Scala and asserts the closed form matches row-for-row.)
  *  - `q_file_bins`: compaction planning — pack each source's document
  *    run (ordered by doc_id) into ~2 KiB bins (sized so even the sf0.001 fixture exercises
  *    multi-bin runs; production would use 128 MiB) by start-offset
  *    binning: a document lands in bin floor(start/T) where start is
  *    its exclusive cumulative size. First-fit-decreasing would be
  *    inherently sequential; contiguous-run binning is what real
  *    table-compaction (OPTIMIZE) does — one partitioned window, bins
  *    land within one doc of T. Emits per-bin file counts, byte
  *    totals, and id ranges — the manifest a 100 TB small-file
  *    compaction job executes.
  *
  * House rules: integer/cents arithmetic end-to-end
  * (`CAST(round(x*100.0) AS BIGINT)` shared verbatim), BIGINT casts on
  * every count, total ORDER BY with unique tie-breaks.
  */
object R76Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_skyline ----------

  val qSkyline = QueryDef("q_skyline",
    (s, dir) => {
      val pts = t(s, dir, "part").select(col("p_partkey"),
        expr("CAST(round(p_retailprice * 100.0) AS BIGINT)").as("price_c"),
        col("p_size").cast("long").as("size"))
      // phase 1: partition-local skyline — windows keyed by the physical
      // partition id, so no global-sort funnel; keeps a point iff no
      // same-partition point has (price <, size ≥) or (price =, size >)
      val withPid = pts.withColumn("pid", spark_partition_id())
      val wLt = Window.partitionBy("pid").orderBy("price_c")
        .rangeBetween(Window.unboundedPreceding, -1)
      val wEq = Window.partitionBy("pid", "price_c")
      val local = withPid
        .withColumn("max_lt", max(col("size")).over(wLt))
        .withColumn("max_eq", max(col("size")).over(wEq))
        .where((col("max_lt").isNull || col("size") > col("max_lt")) &&
          col("size") === col("max_eq"))
        .select("p_partkey", "price_c", "size")
      // phase 2: exact cross-partition dominance over the (tiny,
      // ≤ |size domain| per partition) candidate set
      val other = local.select(col("price_c").as("o_price"),
        col("size").as("o_size"))
      local.join(broadcast(other),
          col("o_price") <= col("price_c") && col("o_size") >= col("size") &&
            (col("o_price") < col("price_c") || col("o_size") > col("size")),
          "left_anti")
        .select(col("p_partkey"), col("price_c"),
          col("size").cast("long").as("size"))
        .orderBy("p_partkey")
    },
    Some(
      """WITH pts AS (
        |  SELECT p_partkey, CAST(round(p_retailprice * 100.0) AS BIGINT) AS price_c,
        |    CAST(p_size AS BIGINT) AS size
        |  FROM part)
        |SELECT p_partkey, price_c, size FROM pts a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM pts b
        |  WHERE b.price_c <= a.price_c AND b.size >= a.size
        |    AND (b.price_c < a.price_c OR b.size > a.size))
        |ORDER BY p_partkey""".stripMargin))

  // ---------- q_clamped_runsum ----------

  private val deltaSql =
    """CASE WHEN o_orderkey % 3 = 0
      |  THEN CAST(round(o_totalprice * 100.0) AS BIGINT)
      |  ELSE -CAST((CAST(round(o_totalprice * 100.0) AS BIGINT)
      |         - CAST(round(o_totalprice * 100.0) AS BIGINT) % 2) / 2 AS BIGINT)
      |END""".stripMargin

  val qClampedRunsum = QueryDef("q_clamped_runsum",
    (s, dir) => {
      val ord = t(s, dir, "orders").select(col("o_custkey").as("custkey"),
        col("o_orderdate"), col("o_orderkey"), expr(deltaSql).as("delta"))
      val w = Window.partitionBy("custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wPrev = Window.partitionBy("custkey").orderBy("o_orderdate", "o_orderkey")
      val walk = ord
        .withColumn("s", sum(col("delta")).over(w))
        .withColumn("runmin", least(lit(0L), min(col("s")).over(w)))
        // clamp fires when S_i strictly undercuts the previous floor
        .withColumn("prev_floor",
          least(lit(0L), coalesce(lag(col("runmin"), 1).over(wPrev), lit(0L))))
        .withColumn("clamp",
          when(col("s") < col("prev_floor"), 1L).otherwise(0L))
        .withColumn("bal", col("s") - col("runmin"))
      val wAll = Window.partitionBy("custkey")
      walk
        .withColumn("rn", row_number().over(wPrev))
        .withColumn("n_orders", count(lit(1)).over(wAll).cast("long"))
        .withColumn("n_clamps", sum(col("clamp")).over(wAll).cast("long"))
        .where(col("rn") === col("n_orders"))
        .select(col("custkey"), col("n_orders"), col("n_clamps"),
          col("bal").cast("long").as("final_bal_c"))
        .orderBy("custkey")
    },
    Some(
      s"""WITH ord AS (
         |  SELECT o_custkey AS custkey, o_orderdate, o_orderkey,
         |    $deltaSql AS delta
         |  FROM orders),
         |sums AS (
         |  SELECT custkey,
         |    sum(delta) OVER (PARTITION BY custkey ORDER BY o_orderdate, o_orderkey
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s,
         |    row_number() OVER (PARTITION BY custkey
         |      ORDER BY o_orderdate, o_orderkey) AS rn
         |  FROM ord),
         |walk AS (
         |  SELECT custkey, rn, s,
         |    least(0, min(s) OVER (PARTITION BY custkey ORDER BY rn
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS runmin
         |  FROM sums),
         |marks AS (
         |  SELECT custkey, rn, s, runmin, s - runmin AS bal,
         |    CASE WHEN s < least(0, coalesce(lag(runmin) OVER
         |        (PARTITION BY custkey ORDER BY rn), 0)) THEN 1 ELSE 0 END AS clamp
         |  FROM walk)
         |SELECT custkey,
         |  CAST(count(*) AS BIGINT) AS n_orders,
         |  CAST(sum(clamp) AS BIGINT) AS n_clamps,
         |  CAST(max(CASE WHEN rn = cnt THEN bal END) AS BIGINT) AS final_bal_c
         |FROM (SELECT m.*, count(*) OVER (PARTITION BY custkey) AS cnt FROM marks m)
         |GROUP BY custkey ORDER BY custkey""".stripMargin))

  // ---------- q_file_bins ----------

  private val binTarget = 2048L

  val qFileBins = QueryDef("q_file_bins",
    (s, dir) => {
      val w = Window.partitionBy("source").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      t(s, dir, "documents")
        .select(col("source"), col("doc_id"), col("n_chars"))
        .withColumn("start", sum(col("n_chars")).over(w) - col("n_chars"))
        .withColumn("bin",
          ((col("start") - col("start") % binTarget) / binTarget).cast("long"))
        .groupBy("source", "bin")
        .agg(count(lit(1)).cast("long").as("n_files"),
          sum(col("n_chars")).cast("long").as("bytes"),
          min(col("doc_id")).cast("long").as("first_doc"),
          max(col("doc_id")).cast("long").as("last_doc"))
        .orderBy("source", "bin")
    },
    Some(
      s"""WITH runs AS (
         |  SELECT source, doc_id, n_chars,
         |    sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_chars AS start
         |  FROM documents),
         |binned AS (
         |  SELECT source, doc_id, n_chars,
         |    CAST((start - start % $binTarget) / $binTarget AS BIGINT) AS bin
         |  FROM runs)
         |SELECT source, bin,
         |  CAST(count(*) AS BIGINT) AS n_files,
         |  CAST(sum(n_chars) AS BIGINT) AS bytes,
         |  CAST(min(doc_id) AS BIGINT) AS first_doc,
         |  CAST(max(doc_id) AS BIGINT) AS last_doc
         |FROM binned GROUP BY source, bin
         |ORDER BY source, bin""".stripMargin))

  val all: Seq[QueryDef] = Seq(qSkyline, qClampedRunsum, qFileBins)
}
