package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Seventy-third wave — a deterministic distinct-count sketch, the
  * calendar spine, and weekday seasonality.
  *
  *  - `q_kmv_distinct`: KMV (k-minimum-values) distinct estimation,
  *    k = 64 — the sketch whose CONTENTS are deterministic (the k
  *    smallest values of a shared quadratic integer hash), so unlike
  *    HLL the whole estimator is oracle-checkable bit-for-bit: both
  *    engines derive the same minima, the same kth value, the same
  *    floor estimate `(k−1)·2³²/h_k`, and the same exact-vs-estimate
  *    error in basis points. Groups smaller than k fall back to the
  *    exact count (the standard KMV rule). Per-group k-minima ride the
  *    bounded-heap [[graft.plans.TopKPerKey]] operator over DISTINCT
  *    hashes (O(n log k), shuffle ≤ partitions×k) — never a full
  *    per-group sort, never the raw corpus.
  *  - `q_calendar_spine`: the gap-filled time spine — generate every
  *    hour between the first and last order, left-join the hourly
  *    counts, and report active/zero-hour coverage. The spine side is
  *    |hours|-sized and generated, not scanned; the idiom behind gap
  *    detection and uniform-grid time series.
  *  - `q_dow_profile`: weekday seasonality of daily revenue — per
  *    day-of-week (epoch-day mod 7: no engine dow() conventions) the
  *    day count, total, floor mean, and the total absolute residual of
  *    daily revenue against that profile. Exact cents end to end;
  *    |days|-sized aggregates only.
  */
object R73Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_kmv_distinct ----------

  val qKmvDistinct = QueryDef("q_kmv_distinct",
    (s, dir) => {
      // the squared term masks to 15 bits so key²·2654435761 never
      // leaves signed 64-bit (ANSI DuckDB would raise above sf≈0.3
      // while Spark wraps); identity at all tested sfs
      val hashes = t(s, dir, "lineitem")
        .select(col("l_returnflag").as("flag"),
          (((col("l_partkey") % 32768L) * (col("l_partkey") % 32768L) * 2654435761L +
            col("l_partkey") * 40503L) % 4294967296L).as("h"))
        .distinct()
      // r7: the k-minima ride the bounded-heap TopKPerKey operator
      // (k smallest = k largest of −h) instead of a per-flag
      // row_number window — the window form fully SORTS every flag's
      // distinct-hash set (billions of rows per flag at 100 TB) where
      // the heap keeps 64 rows per partition and shuffles ≤
      // partitions×64. The 64th-smallest VALUE is deterministic even
      // under hash ties (position-64 of the sorted multiset), so this
      // is value-identical to the window form.
      val nd = hashes.groupBy("flag")
        .agg(count(lit(1)).cast("long").as("exact_distinct"))
      val kept = graft.plans.TopKPerKey.topKPerKey(
        hashes.withColumn("negh", -col("h")), Seq("flag"), "negh", 64)
      val kth = nd.join(
        kept.groupBy("flag")
          .agg(when(count(lit(1)) === 64L, max(col("h")))
            .cast("long").as("h64")),
        "flag")
      val num = lit(63L) * 4294967296L
      kth.withColumn("estimate",
          when(col("h64").isNull, col("exact_distinct"))
            .otherwise(((num - (num % col("h64"))) / col("h64")).cast("long")))
        .select(col("flag"), col("exact_distinct"), col("estimate"),
          (abs(col("estimate") - col("exact_distinct")) * 10000L /
            greatest(col("exact_distinct"), lit(1L))).cast("long").as("err_bp"))
        .orderBy("flag")
    },
    Some(
      """WITH hashes AS (
        |  SELECT DISTINCT l_returnflag AS flag,
        |    ((l_partkey % 32768) * (l_partkey % 32768) * 2654435761 + l_partkey * 40503) % 4294967296 AS h
        |  FROM lineitem),
        |ranked AS (
        |  SELECT flag, h, row_number() OVER (PARTITION BY flag ORDER BY h) AS rk,
        |    CAST(count(*) OVER (PARTITION BY flag) AS BIGINT) AS nd
        |  FROM hashes),
        |kth AS (
        |  SELECT flag, max(nd) AS exact_distinct,
        |    CAST(max(CASE WHEN rk = 64 THEN h END) AS BIGINT) AS h64
        |  FROM ranked WHERE rk <= 64 GROUP BY flag),
        |est AS (
        |  SELECT flag, exact_distinct,
        |    CASE WHEN h64 IS NULL THEN exact_distinct
        |         ELSE CAST((63 * 4294967296 - ((63 * 4294967296) % h64)) / h64 AS BIGINT)
        |    END AS estimate
        |  FROM kth)
        |SELECT flag, exact_distinct, estimate,
        |  CAST(abs(estimate - exact_distinct) * 10000 / greatest(exact_distinct, 1) AS BIGINT) AS err_bp
        |FROM est ORDER BY flag""".stripMargin))

  // ---------- q_calendar_spine ----------

  private val usPerHour = 3600000000L

  val qCalendarSpine = QueryDef("q_calendar_spine",
    (s, dir) => {
      val hrs = t(s, dir, "orders")
        .select(((unix_micros(col("o_orderdate").cast("timestamp")) -
          ((unix_micros(col("o_orderdate").cast("timestamp")) % usPerHour) +
            usPerHour) % usPerHour) / usPerHour).cast("long").as("hr"))
      val bounds = hrs.agg(min(col("hr")).as("lo"), max(col("hr")).as("hi"))
      val spine = bounds.select(
        explode(sequence(col("lo"), col("hi"))).as("hr"))
      val cnt = hrs.groupBy("hr").agg(count(lit(1)).cast("long").as("n"))
      spine.join(cnt, Seq("hr"), "left")
        .select(coalesce(col("n"), lit(0L)).as("n"))
        .agg(count(lit(1)).cast("long").as("n_hours"),
          sum(when(col("n") === 0, 1L).otherwise(0L)).cast("long").as("n_zero"),
          sum(when(col("n") > 0, 1L).otherwise(0L)).cast("long").as("n_active"),
          max(col("n")).cast("long").as("max_per_hour"))
    },
    Some(
      """WITH hrs AS (
        |  SELECT CAST((epoch_us(o_orderdate) - ((epoch_us(o_orderdate) % 3600000000) + 3600000000) % 3600000000)
        |      / 3600000000 AS BIGINT) AS hr
        |  FROM orders),
        |bounds AS (SELECT min(hr) AS lo, max(hr) AS hi FROM hrs),
        |spine AS (SELECT CAST(unnest(range(lo, hi + 1)) AS BIGINT) AS hr FROM bounds),
        |cnt AS (SELECT hr, CAST(count(*) AS BIGINT) AS n FROM hrs GROUP BY hr),
        |fill AS (
        |  SELECT s.hr, coalesce(c.n, 0) AS n
        |  FROM spine s LEFT JOIN cnt c ON s.hr = c.hr)
        |SELECT CAST(count(*) AS BIGINT) AS n_hours,
        |  CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_zero,
        |  CAST(sum(CASE WHEN n > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_active,
        |  CAST(max(n) AS BIGINT) AS max_per_hour
        |FROM fill""".stripMargin))

  // ---------- q_dow_profile ----------

  private val usPerDay = 86400000000L

  val qDowProfile = QueryDef("q_dow_profile",
    (s, dir) => {
      val d = t(s, dir, "orders")
        .select(((unix_micros(col("o_orderdate").cast("timestamp")) -
          ((unix_micros(col("o_orderdate").cast("timestamp")) % usPerDay) +
            usPerDay) % usPerDay) / usPerDay).cast("long").as("day"),
          expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("cents"))
      val daily = d.groupBy("day").agg(sum(col("cents")).cast("long").as("c"))
        .withColumn("dow", ((col("day") % 7) + 7) % 7)
      val prof = daily.groupBy("dow")
        .agg(count(lit(1)).cast("long").as("n_days"),
          sum(col("c")).cast("long").as("total"))
        .withColumn("mean_floor",
          ((col("total") - ((col("total") % col("n_days")) + col("n_days"))
            % col("n_days")) / col("n_days")).cast("long"))
      daily.join(broadcast(prof), "dow")
        .groupBy("dow", "n_days", "total", "mean_floor")
        .agg(sum(abs(col("c") - col("mean_floor"))).cast("long")
          .as("abs_resid"))
        .select("dow", "n_days", "total", "mean_floor", "abs_resid")
        .orderBy("dow")
    },
    Some(
      """WITH d AS (
        |  SELECT CAST((epoch_us(o_orderdate) - ((epoch_us(o_orderdate) % 86400000000) + 86400000000) % 86400000000)
        |      / 86400000000 AS BIGINT) AS day,
        |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        |  FROM orders),
        |daily AS (SELECT day, CAST(sum(cents) AS BIGINT) AS c FROM d GROUP BY day),
        |prof AS (
        |  SELECT ((day % 7) + 7) % 7 AS dow, CAST(count(*) AS BIGINT) AS n_days,
        |    CAST(sum(c) AS BIGINT) AS total,
        |    CAST((sum(c) - ((sum(c) % count(*)) + count(*)) % count(*)) / count(*) AS BIGINT) AS mean_floor
        |  FROM daily GROUP BY 1),
        |resid AS (
        |  SELECT ((d2.day % 7) + 7) % 7 AS dow, abs(d2.c - p.mean_floor) AS ar
        |  FROM daily d2 JOIN prof p ON ((d2.day % 7) + 7) % 7 = p.dow)
        |SELECT p.dow, p.n_days, p.total, p.mean_floor,
        |  CAST(sum(r.ar) AS BIGINT) AS abs_resid
        |FROM prof p JOIN resid r ON p.dow = r.dow
        |GROUP BY p.dow, p.n_days, p.total, p.mean_floor ORDER BY p.dow""".stripMargin))

  val all: Seq[QueryDef] = Seq(qKmvDistinct, qCalendarSpine, qDowProfile)
}
