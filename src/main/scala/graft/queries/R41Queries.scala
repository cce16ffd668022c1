package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Forty-first wave — resampling inference and exact smoothing.
  *
  *  - `q_bootstrap_ci`: a bootstrap confidence interval for the mean
  *    event value with DETERMINISTIC resampling — the Poisson(1)
  *    multiplier bootstrap (each row's replicate weight w ∈ 0..4 drawn
  *    from integer thresholds on an md5 hex-fold, the q_weighted_sample
  *    discipline), so the CI is reproducible and hash-checkable.
  *    Replicate means are ratios of exact BIGINT sums; the interval
  *    picks fixed ranks of the B-sized replicate table.
  *  - `q_ewma_exact`: exponential smoothing with ZERO floating
  *    accumulation — α = 1/2 makes every weight a power of two, so the
  *    window-bounded EWMA is a ratio of exact integer sums (weights
  *    2^(K−j) over the K most recent events per user); one IEEE
  *    division per user at the end.
  *
  * Scale design: bootstrap weights are computed map-side (hash per
  * (row, replicate)); the replicate explode multiplies rows B-fold but
  * the per-replicate aggregation map-side-combines to B partials per
  * partition — the shuffle carries B×partitions rows, never B×corpus
  * (the standard multiplier-bootstrap distribution trick: weights, not
  * data copies). EWMA windows are per-user partition-parallel with a
  * K-bounded frame.
  */
object R41Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_bootstrap_ci ----------

  private val B = 40

  /** md5-hex-fold of column `h` (first 6 digits → [0, 16^6)): verbatim
    * on both engines. */
  private val hexVal: String = (1 to 6).map(i =>
    s"(instr('0123456789abcdef', substr(h, $i, 1)) - 1) * " +
      s"${1L << (4 * (6 - i))}").mkString(" + ")

  /** Integer thresholds of 16^6 for the Poisson(1) pmf (cumulative
    * 0.36788/0.73576/0.91970/0.98101) — weights 0..4. */
  private val poissonCase: String =
    """CASE WHEN u < 6172840 THEN 0
      |     WHEN u < 12345681 THEN 1
      |     WHEN u < 15431891 THEN 2
      |     WHEN u < 16460628 THEN 3
      |     ELSE 4 END""".stripMargin

  val qBootstrapCi = QueryDef("q_bootstrap_ci",
    (s, dir) => RewriteGlobalRankWindows.force {
      val ev = t(s, dir, "events")
        .select(col("event_id"),
          expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
      // the B-fold explode + per-row md5 is the query's entire cost —
      // CPU-dense and bytes-small, the shape AQE size-coalescing
      // misjudges into a near-serial map side (r14: it measured 8.6 s
      // in ONE task at sf0.1) — spread it to the session width before
      // the explode; map-side partial aggregation keeps the shuffle at
      // tasks x B rows
      val width = s.sparkContext.defaultParallelism
      val reps = ev.repartition(width)
        .select(col("event_id"), col("cents"),
          explode(expr(s"sequence(1, $B)")).as("r"))
        .withColumn("h",
          md5(concat(col("event_id").cast("string"), lit(":"),
            col("r").cast("string"))))
        .withColumn("u", expr(hexVal))
        .withColumn("w", expr(poissonCase).cast("long"))
      // pin the B-row replicate means: the distributed rank's count
      // pass and the range exchange's bounds sampling would otherwise
      // each re-materialize the md5 pipeline (r14 — the second 7.7 s
      // stage in the JobStats trace)
      val means = Queries.pin(reps.groupBy("r")
        .agg(sum(col("w") * col("cents")).as("swx"), sum(col("w")).as("sw"))
        .select(col("r"),
          expr("CAST(swx AS DOUBLE) / (CAST(sw AS DOUBLE) * 100.0)").as("m")))
        .withColumn("rk", row_number().over(Window.orderBy(col("m"), col("r"))))
      val full = t(s, dir, "events")
        .agg(sum(expr("CAST(round(value * 100.0) AS BIGINT)")).as("sx"),
          count(lit(1)).as("n"))
        .selectExpr("CAST(sx AS DOUBLE) / (CAST(n AS DOUBLE) * 100.0) AS mean_full")
      means.agg(
          max(when(col("rk") === 2, col("m"))).as("mean_lo"),
          max(when(col("rk") === B - 1, col("m"))).as("mean_hi"))
        .crossJoin(full)
        .selectExpr(s"CAST($B AS INTEGER) AS b", "mean_full", "mean_lo", "mean_hi")
    },
    Some(
      s"""WITH ev AS (SELECT event_id, CAST(round(value * 100.0) AS BIGINT) AS cents
         |            FROM events),
         |reps AS (SELECT event_id, cents, unnest(generate_series(1, $B)) AS r
         |         FROM ev),
         |hashed AS (SELECT cents, r,
         |             md5(CAST(event_id AS VARCHAR) || ':' || CAST(r AS VARCHAR)) AS h
         |           FROM reps),
         |uv AS (SELECT cents, r, $hexVal AS u FROM hashed),
         |wv AS (SELECT cents, r, CAST($poissonCase AS BIGINT) AS w FROM uv),
         |means AS (SELECT r, CAST(sum(w * cents) AS DOUBLE)
         |            / (CAST(sum(w) AS DOUBLE) * 100.0) AS m
         |          FROM wv GROUP BY r),
         |ranked AS (SELECT m, row_number() OVER (ORDER BY m, r) AS rk FROM means),
         |pick AS (SELECT max(CASE WHEN rk = 2 THEN m END) AS mean_lo,
         |           max(CASE WHEN rk = ${B - 1} THEN m END) AS mean_hi
         |         FROM ranked),
         |fullmean AS (SELECT CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS DOUBLE)
         |           / (CAST(count(*) AS DOUBLE) * 100.0) AS mean_full
         |         FROM events)
         |SELECT CAST($B AS INTEGER) AS b, mean_full, mean_lo, mean_hi
         |FROM pick CROSS JOIN fullmean""".stripMargin))

  // ---------- q_ewma_exact ----------

  private val K = 16

  val qEwmaExact = QueryDef("q_ewma_exact",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"),
          expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      val recent = ev.withColumn("j", row_number().over(w))
        .where(col("j") <= K)
        .withColumn("wt", expr(s"CAST(1 AS BIGINT) << ($K - j)"))
      recent.groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_used"),
          sum(col("wt") * col("cents")).as("swx"), sum(col("wt")).as("sw"))
        .selectExpr("user_id", "n_used",
          "CAST(swx AS DOUBLE) / (CAST(sw AS DOUBLE) * 100.0) AS ewma")
        .orderBy("user_id")
    },
    Some(
      s"""WITH ev AS (SELECT user_id, ts, event_id,
         |              CAST(round(value * 100.0) AS BIGINT) AS cents
         |            FROM events),
         |recent AS (SELECT user_id, cents,
         |             row_number() OVER (PARTITION BY user_id
         |               ORDER BY ts DESC, event_id DESC) AS j
         |           FROM ev QUALIFY j <= $K),
         |wt AS (SELECT user_id, cents, CAST(1 AS BIGINT) << ($K - j) AS wt
         |       FROM recent)
         |SELECT user_id, CAST(count(*) AS BIGINT) AS n_used,
         |  CAST(sum(wt * cents) AS DOUBLE) / (CAST(sum(wt) AS DOUBLE) * 100.0) AS ewma
         |FROM wt GROUP BY user_id ORDER BY user_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qBootstrapCi, qEwmaExact)
}
