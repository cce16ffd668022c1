package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Hundredth wave — sketch mergeability, stationary distributions, and
  * seasonal residuals.
  *
  *  - `q_sketch_merge`: the MERGEABILITY proof for the KMV distinct
  *    sketch (the property that makes sketches distributed-safe):
  *    the k smallest hashes of the FULL corpus must equal the k
  *    smallest of the UNION of two half-corpus sketches — exact
  *    equality by the monoid laws, not approximation. Emits both
  *    estimates and their (provably zero) gap; a refactor that breaks
  *    merge associativity fails the hash, not a tolerance.
  *  - `q_stationary`: the stationary distribution of the 5-state
  *    event-type Markov chain by 24 power-iteration steps in EXACT
  *    integer ppm arithmetic — transition probabilities floor to ppm,
  *    every step floors π·P back to ppm, so both engines walk
  *    bit-identical vectors; the fixed state count makes the walk a
  *    generated CTE chain on the oracle side and a model-sized driver
  *    fold on the Spark side (the q_mmr_rerank discipline: the 5×5
  *    matrix IS the model). Where q_markov_transitions gives one-step
  *    behavior, this is the long-run occupancy forecast.
  *  - `q_seasonal_residuals`: seasonality-adjusted anomaly detection —
  *    daily revenue minus its weekday MEDIAN (exact lower-median order
  *    statistic), residuals screened at 3× the median absolute
  *    residual (exact again), flagged days emitted. The composition of
  *    q_dow_profile and q_mad_outliers that neither covers alone:
  *    anomalies AFTER the weekly cycle is removed.
  */
object R100Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val usPerDay = 86400000000L

  // ---------- q_sketch_merge ----------

  private val kmvK = 64
  // squared term masked to 15 bits: key²·2654435761 overflows signed
  // 64-bit once keys pass ~58,950 (sf≈0.3) — ANSI DuckDB raises while
  // Spark wraps; the mask is the identity at all tested sfs
  private val mixSql =
    "((l_partkey % 32768) * (l_partkey % 32768) * 2654435761 + l_partkey * 40503) % 4294967296"

  val qSketchMerge = QueryDef("q_sketch_merge",
    (s, dir) => {
      val hashes = t(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_orderkey"), expr(mixSql).as("h"))
      // r7: global k-minima via the bounded-heap TopKPerKey operator
      // (constant key; k smallest = k largest of −h) — the previous
      // bare Window.orderBy funneled every distinct hash through ONE
      // partition for a full sort; the heap's map-side partials bound
      // the single-partition stage to ≤ partitions×k rows
      def sketch(df: DataFrame): DataFrame =
        graft.plans.TopKPerKey.topKPerKey(
          df.select(col("h")).distinct()
            .withColumn("g", lit(0L)).withColumn("negh", -col("h")),
          Seq("g"), "negh", kmvK)
          .select("h")
      val full = sketch(hashes)
      // two half-corpus sketches (split by order parity), merged
      val s1 = sketch(hashes.where(col("l_orderkey") % 2 === 0))
      val s2 = sketch(hashes.where(col("l_orderkey") % 2 === 1))
      val merged = sketch(s1.select("h").unionAll(s2.select("h")))
      // the kth smallest exists only when the sketch is full (= k rows)
      def kth(df: DataFrame, nm: String): DataFrame =
        df.agg(when(count(lit(1)) === kmvK.toLong, max(col("h")))
          .cast("long").as(nm))
      kth(full, "h_full").crossJoin(broadcast(kth(merged, "h_merged")))
        .select(col("h_full"), col("h_merged"),
          (col("h_full") - col("h_merged")).as("gap"),
          ((lit((kmvK - 1).toLong) * 4294967296L -
            (lit((kmvK - 1).toLong) * 4294967296L) % col("h_full")) /
            col("h_full")).cast("long").as("estimate"))
    },
    Some(
      s"""WITH hashes AS (
         |  SELECT l_partkey, l_orderkey, $mixSql AS h FROM lineitem),
         |full_sk AS (
         |  SELECT h FROM (
         |    SELECT h, row_number() OVER (ORDER BY h) AS rk
         |    FROM (SELECT DISTINCT h FROM hashes)) WHERE rk <= $kmvK),
         |s1 AS (
         |  SELECT h FROM (
         |    SELECT h, row_number() OVER (ORDER BY h) AS rk FROM (
         |      SELECT DISTINCT h FROM hashes WHERE l_orderkey % 2 = 0))
         |  WHERE rk <= $kmvK),
         |s2 AS (
         |  SELECT h FROM (
         |    SELECT h, row_number() OVER (ORDER BY h) AS rk FROM (
         |      SELECT DISTINCT h FROM hashes WHERE l_orderkey % 2 = 1))
         |  WHERE rk <= $kmvK),
         |merged AS (
         |  SELECT h FROM (
         |    SELECT h, row_number() OVER (ORDER BY h) AS rk FROM (
         |      SELECT DISTINCT h FROM (SELECT h FROM s1 UNION ALL SELECT h FROM s2)))
         |  WHERE rk <= $kmvK),
         |kf AS (
         |  SELECT CAST(max(h) AS BIGINT) AS h_full FROM (
         |    SELECT h, row_number() OVER (ORDER BY h) AS rk FROM full_sk)
         |  WHERE rk = $kmvK),
         |km AS (
         |  SELECT CAST(max(h) AS BIGINT) AS h_merged FROM (
         |    SELECT h, row_number() OVER (ORDER BY h) AS rk FROM merged)
         |  WHERE rk = $kmvK)
         |SELECT h_full, h_merged, CAST(h_full - h_merged AS BIGINT) AS gap,
         |  CAST((${(kmvK - 1).toLong} * 4294967296
         |    - (${(kmvK - 1).toLong} * 4294967296) % h_full) / h_full AS BIGINT)
         |    AS estimate
         |FROM kf CROSS JOIN km""".stripMargin))

  // ---------- q_stationary ----------

  private val statSteps = 24
  private val ppm = 1000000L
  private val stTypes = Seq("click", "error", "purchase", "signup", "view")

  val qStationary = QueryDef("q_stationary",
    (s, dir) => {
      val w = Window.partitionBy("user_id").orderBy("us", "event_id")
      val trans = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("e1"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .withColumn("e2", lead(col("e1"), 1).over(w))
        .where(col("e2").isNotNull)
        .groupBy("e1", "e2").agg(count(lit(1)).cast("long").as("c"))
      val rowTot = trans.groupBy("e1").agg(sum(col("c")).cast("long").as("ct"))
      val pppm = trans.join(rowTot, "e1")
        .select(col("e1"), col("e2"),
          ((col("c") * ppm - (col("c") * ppm) % col("ct")) / col("ct"))
            .cast("long").as("p_ppm"))
      // the 5×5 matrix IS the model — collect, fold exactly, re-emit
      val m = pppm.collect()
        .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
      var pi = stTypes.map(_ => ppm / stTypes.length).toArray
      for (_ <- 1 to statSteps) {
        pi = stTypes.indices.map { i =>
          stTypes.indices.map { j =>
            pi(j) * m.getOrElse((stTypes(j), stTypes(i)), 0L)
          }.sum / ppm
        }.toArray
      }
      import s.implicits._
      stTypes.zip(pi).toDF("state", "pi_ppm")
        .select(col("state"), col("pi_ppm").cast("long").as("pi_ppm"))
        .orderBy("state")
    },
    Some {
      val cols = stTypes.indices
      def stepSql(k: Int): String = {
        val exprs = cols.map { i =>
          val terms = cols.map { j =>
            s"v${k - 1}.p$j * coalesce(m.p_${j}_$i, 0)" }.mkString(" + ")
          s"CAST((($terms) - (($terms)) % $ppm) / $ppm AS BIGINT) AS p$i"
        }.mkString(",\n    ")
        s"""v$k AS (
           |  SELECT
           |    $exprs
           |  FROM v${k - 1} CROSS JOIN mwide m)""".stripMargin
      }
      val mwideCols = cols.flatMap { j =>
        cols.map { i =>
          s"max(CASE WHEN e1 = '${stTypes(j)}' AND e2 = '${stTypes(i)}'" +
            s" THEN p_ppm ELSE 0 END) AS p_${j}_$i"
        }
      }.mkString(",\n    ")
      val steps = (1 to statSteps).map(stepSql).mkString(",\n")
      val initCols = cols.map(i => s"CAST(${ppm / stTypes.length} AS BIGINT) AS p$i")
        .mkString(", ")
      val out = cols.map(i =>
        s"SELECT '${stTypes(i)}' AS state, p$i AS pi_ppm FROM v$statSteps")
        .mkString("\nUNION ALL\n")
      s"""WITH seq AS (
         |  SELECT user_id, event_type AS e1,
         |    lead(event_type, 1) OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts), event_id) AS e2
         |  FROM events),
         |trans AS (
         |  SELECT e1, e2, CAST(count(*) AS BIGINT) AS c
         |  FROM seq WHERE e2 IS NOT NULL GROUP BY 1, 2),
         |rowtot AS (SELECT e1, CAST(sum(c) AS BIGINT) AS ct FROM trans GROUP BY e1),
         |pppm AS (
         |  SELECT t.e1, t.e2,
         |    CAST((c * $ppm - (c * $ppm) % ct) / ct AS BIGINT) AS p_ppm
         |  FROM trans t JOIN rowtot r ON r.e1 = t.e1),
         |mwide AS (
         |  SELECT
         |    $mwideCols
         |  FROM pppm),
         |v0 AS (SELECT $initCols),
         |$steps
         |$out
         |ORDER BY state""".stripMargin
    })

  // ---------- q_seasonal_residuals ----------

  val qSeasonalResiduals = QueryDef("q_seasonal_residuals",
    // r15: the GLOBAL (mad-rank) windows route distributed (CALENDAR
    // whitelist retirement); the per-dow median windows keep their
    // partitioned WindowExec
    (s, dir) => RewriteGlobalRankWindows.force {
      val days = t(s, dir, "orders")
        .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("us"),
          expr("CAST((CAST(round(o_totalprice * 100.0) AS BIGINT) " +
            "- CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT)")
            .as("usd"))
        .withColumn("day", expr(s"CAST((us - us % $usPerDay) / $usPerDay AS BIGINT)"))
        .groupBy("day").agg(sum(col("usd")).cast("long").as("v"))
        .withColumn("dow", expr("day % 7"))
      // exact lower-median per weekday
      val wd = Window.partitionBy("dow").orderBy("v", "day")
      val med = days
        .withColumn("rk", row_number().over(wd).cast("long"))
        .withColumn("nd",
          count(lit(1)).over(Window.partitionBy("dow")).cast("long"))
        .where(col("rk") === expr("CAST((nd + 1 - (nd + 1) % 2) / 2 AS BIGINT)"))
        .select(col("dow"), col("v").as("med"))
      val resid = days.join(broadcast(med), "dow")
        .withColumn("r", col("v") - col("med"))
        .withColumn("ar", abs(col("r")))
      val wmad = Window.orderBy("ar", "day")
      val mad = resid
        .withColumn("rk", row_number().over(wmad).cast("long"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy(lit(1))).cast("long"))
        .where(col("rk") === expr("CAST((n + 1 - (n + 1) % 2) / 2 AS BIGINT)"))
        .select(col("ar").as("mad"))
      resid.crossJoin(broadcast(mad))
        .where(col("ar") > col("mad") * 3L)
        .select(col("day"), col("dow"), col("v"), col("med"), col("r"),
          col("mad"))
        .orderBy("day")
    },
    Some(
      s"""WITH days AS (
         |  SELECT CAST((epoch_us(CAST(o_orderdate AS TIMESTAMP))
         |      - epoch_us(CAST(o_orderdate AS TIMESTAMP)) % $usPerDay)
         |      / $usPerDay AS BIGINT) AS day,
         |    CAST(sum(CAST((CAST(round(o_totalprice * 100.0) AS BIGINT)
         |      - CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT))
         |      AS BIGINT) AS v
         |  FROM orders GROUP BY 1),
         |dowd AS (SELECT day, day % 7 AS dow, v FROM days),
         |med AS (
         |  SELECT dow, v AS med FROM (
         |    SELECT dow, v, row_number() OVER (PARTITION BY dow ORDER BY v, day) AS rk,
         |      count(*) OVER (PARTITION BY dow) AS nd
         |    FROM dowd)
         |  WHERE rk = CAST((nd + 1 - (nd + 1) % 2) / 2 AS BIGINT)),
         |resid AS (
         |  SELECT d.day, d.dow, d.v, m.med, d.v - m.med AS r, abs(d.v - m.med) AS ar
         |  FROM dowd d JOIN med m ON m.dow = d.dow),
         |madt AS (
         |  SELECT ar AS mad FROM (
         |    SELECT ar, row_number() OVER (ORDER BY ar, day) AS rk,
         |      count(*) OVER () AS n
         |    FROM resid)
         |  WHERE rk = CAST((n + 1 - (n + 1) % 2) / 2 AS BIGINT))
         |SELECT day, dow, v, med, r, mad
         |FROM resid CROSS JOIN madt
         |WHERE ar > mad * 3
         |ORDER BY day""".stripMargin))

  val all: Seq[QueryDef] = Seq(qSketchMerge, qStationary, qSeasonalResiduals)
}
