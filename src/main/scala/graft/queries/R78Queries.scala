package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Seventy-eighth wave — Holt smoothing, CUPED, and sequential-pattern
  * support.
  *
  *  - `q_holt`: Holt's double exponential smoothing (level + trend;
  *    Holt 1957) over each user's daily event counts — the one
  *    recurrence in the repo that is GENUINELY sequential: unlike
  *    q_clamped_runsum there is no prefix-sum closed form once each
  *    step re-quantizes to a fixed scale (the linear-algebra scan
  *    form dies with the rounding). So this is the documented
  *    fallback pattern: `groupByKey(user).mapGroups` with a per-key
  *    in-memory fold — state is one (level, trend) pair, the buffer
  *    is day-count-bounded (≤ |calendar days|, NOT event-count), and
  *    keys scale out across executors. The walk runs ENTIRELY in
  *    scaled-BIGINT fixed point (values ×10⁹) with explicit
  *    truncation toward zero via the repo's `(x - x % d) / d` idiom:
  *    α=0.3/β=0.2 make every exact step an integer at scale 10, so
  *    each quantization is one trunc-div by 10 — integer arithmetic
  *    has no engine- or version-dependent rounding mode (the r6
  *    lesson: DuckDB's DECIMAL downcast flipped from truncate to
  *    round-half-up across releases, so decimal-cast recurrences are
  *    version-fragile in value space; SURVEY §7.4). The output stays
  *    in the ×10⁹ integer space (`level9`/`trend9`/`forecast9`).
  *    The oracle replays the recurrence as a recursive CTE over the
  *    same BIGINT fixed point.
  *  - `q_cuped`: CUPED variance reduction (Deng/Xu/Kohavi/Walker,
  *    WSDM 2013) for the A/B arms — adjusted outcome means
  *    Ȳₐ − θ·(X̄ₐ − X̄) with the pooled θ = cov(X,Y)/var(X), where X
  *    is each user's first-half event count (pre-period) and Y the
  *    second-half purchase count. Every moment (n, Σx, Σy, Σxy, Σx²)
  *    is an exact BIGINT; the final θ/means are ONE identical DOUBLE
  *    expression tree on both engines (each IEEE op exactly rounded →
  *    bit-identical), rounded at 6. Corpus cost: one per-user
  *    aggregate, then constant-size arithmetic.
  *  - `q_seq_pairs`: sequential-pattern support (the 2-sequence core
  *    of GSP/SPADE, Srikant & Agrawal 1996): for every ordered event-
  *    type pair (a then b), the number of users with SOME a-event
  *    strictly before SOME b-event — i.e. min_ts(a) < max_ts(b) per
  *    user, which needs only the per-(user, type) min/max extremes:
  *    one map-side-combined aggregate to ≤ |types| rows per user,
  *    a ≤ |types|²-fanout per-user self-join, and a |types|²-sized
  *    result with exact basis-point support. No sequence explosion.
  */
object R78Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val usPerDay = 86400000000L

  // ---------- q_holt ----------

  /** Fixed-point scale: all level/trend values carry 9 fractional
    * digits as ×10⁹ BIGINTs. With α=0.3 and β=0.2 every exact
    * recurrence step is an integer at scale 10, so quantizing back to
    * scale 9 is one truncate-toward-zero division by 10 — expressed
    * with the version-invariant `(x - x % 10) / 10` idiom on both
    * engines (both define `%` with the dividend's sign, so the form
    * truncates toward zero for negatives too). */
  private val fp9 = 1000000000L

  val qHolt = QueryDef("q_holt",
    (s, dir) => {
      import s.implicits._
      val daily = Tables.events(s, dir)
        .select(col("user_id"),
          expr(s"CAST((unix_micros(ts) - unix_micros(ts) % $usPerDay) / $usPerDay AS BIGINT)")
            .as("day"))
        .groupBy("user_id", "day")
        .agg(count(lit(1)).cast("long").as("x"))
      // e10 = 10^10 × the exact step value; |e10| ≲ 10·x_max·10⁹ stays
      // far inside BIGINT for any per-user daily count
      def trunc10(e: Long): Long = (e - e % 10) / 10
      val walked = daily.select(col("user_id"), col("day"), col("x"))
        .as[(Long, Long, Long)]
        .groupByKey(_._1)
        .mapGroups { (user, it) =>
          // buffer is bounded by DISTINCT DAYS per user, not events
          val xs = it.toArray.sortBy(_._2).map(_._3)
          var l9 = xs.head * fp9; var t9 = 0L
          for (x <- xs.tail) {
            // lvl' = trunc9(0.3·x + 0.7·(lvl + tr))
            val lNew = trunc10(3L * x * fp9 + 7L * (l9 + t9))
            // tr' = trunc9(0.2·(lvl' − lvl) + 0.8·tr)
            t9 = trunc10(2L * (lNew - l9) + 8L * t9)
            l9 = lNew
          }
          (user, xs.length.toLong, l9, t9, l9 + t9)
        }
      walked.toDF("user_id", "n_days", "level9", "trend9", "forecast9")
        .orderBy("user_id")
    },
    Some {
      // FLAT recursive term (no derived table around the `walk`
      // self-reference): engines differ in how liberally they accept
      // recursive references inside subqueries, and the driver's DuckDB
      // is newer than the local one — so the b9 column inlines the l9
      // step expression instead of referencing it through a subquery.
      val e10 = s"(3 * s.x * $fp9 + 7 * (w.l9 + w.b9))"
      val lnew = s"CAST(($e10 - $e10 % 10) / 10 AS BIGINT)"
      val e10b = s"(2 * ($lnew - w.l9) + 8 * w.b9)"
      val bnew = s"CAST(($e10b - $e10b % 10) / 10 AS BIGINT)"
      s"""WITH RECURSIVE daily AS (
         |  SELECT user_id,
         |    CAST((epoch_us(ts) - epoch_us(ts) % $usPerDay) / $usPerDay AS BIGINT) AS day,
         |    CAST(count(*) AS BIGINT) AS x
         |  FROM events GROUP BY 1, 2),
         |series AS (
         |  SELECT user_id, x,
         |    row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS nd
         |  FROM daily),
         |walk AS (
         |  SELECT user_id, rn, nd, x * $fp9 AS l9, CAST(0 AS BIGINT) AS b9
         |  FROM series WHERE rn = 1
         |  UNION ALL
         |  SELECT s.user_id, s.rn, s.nd, $lnew AS l9, $bnew AS b9
         |  FROM walk w JOIN series s ON s.user_id = w.user_id AND s.rn = w.rn + 1)
         |SELECT user_id, CAST(nd AS BIGINT) AS n_days, l9 AS level9, b9 AS trend9,
         |  CAST(l9 + b9 AS BIGINT) AS forecast9
         |FROM walk WHERE rn = nd ORDER BY user_id""".stripMargin
    })

  // ---------- q_cuped ----------

  val qCuped = QueryDef("q_cuped",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), unix_micros(col("ts")).as("us"))
      // pre/post split point as a broadcast scalar, not a driver action
      val mid = ev.agg(expr(
        "CAST(((min(us) + max(us)) - ((min(us) + max(us)) % 2)) / 2 AS BIGINT) AS m"))
      val per = ev.crossJoin(broadcast(mid)).groupBy("user_id")
        .agg(sum(when(col("us") < col("m"), 1L).otherwise(0L)).cast("long").as("x"),
          sum(when(col("us") >= col("m") && col("event_type") === "purchase", 1L)
            .otherwise(0L)).cast("long").as("y"))
        .withColumn("arm",
          when(col("user_id") % 2 === 0, "A").otherwise("B"))
      val g = per.agg(count(lit(1)).cast("long").as("n"),
        sum(col("x")).cast("long").as("sx"),
        sum(col("y")).cast("long").as("sy"),
        sum(col("x") * col("y")).cast("long").as("sxy"),
        sum(col("x") * col("x")).cast("long").as("sxx"))
      val arms = per.groupBy("arm").agg(count(lit(1)).cast("long").as("na"),
        sum(col("x")).cast("long").as("sxa"),
        sum(col("y")).cast("long").as("sya"))
      arms.crossJoin(broadcast(g))
        .withColumn("theta", expr(
          "CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE)"))
        .select(col("arm"), col("na"),
          round(expr("CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)"), 6).as("raw_mean"),
          round(expr("CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)" +
            " - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))" +
            " * (CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))"), 6)
            .as("cuped_mean"))
        .orderBy("arm")
    },
    Some(
      """WITH ev AS (
        |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
        |mid AS (
        |  SELECT CAST(((min(us) + max(us)) - ((min(us) + max(us)) % 2)) / 2 AS BIGINT) AS m
        |  FROM ev),
        |per AS (
        |  SELECT user_id,
        |    CAST(sum(CASE WHEN us < m THEN 1 ELSE 0 END) AS BIGINT) AS x,
        |    CAST(sum(CASE WHEN us >= m AND event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y,
        |    CASE WHEN user_id % 2 = 0 THEN 'A' ELSE 'B' END AS arm
        |  FROM ev CROSS JOIN mid GROUP BY user_id, arm),
        |g AS (
        |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS sx,
        |    CAST(sum(y) AS BIGINT) AS sy, CAST(sum(x * y) AS BIGINT) AS sxy,
        |    CAST(sum(x * x) AS BIGINT) AS sxx
        |  FROM per),
        |arms AS (
        |  SELECT arm, CAST(count(*) AS BIGINT) AS na,
        |    CAST(sum(x) AS BIGINT) AS sxa, CAST(sum(y) AS BIGINT) AS sya
        |  FROM per GROUP BY arm)
        |SELECT arm, na,
        |  round(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE), 6) AS raw_mean,
        |  round(CAST(sya AS DOUBLE) / CAST(na AS DOUBLE)
        |    - (CAST(n * sxy - sx * sy AS DOUBLE) / CAST(n * sxx - sx * sx AS DOUBLE))
        |    * (CAST(sxa AS DOUBLE) / CAST(na AS DOUBLE) - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)), 6)
        |    AS cuped_mean
        |FROM arms CROSS JOIN g ORDER BY arm""".stripMargin))

  // ---------- q_seq_pairs ----------

  /** Support floor in users — keeps the result honest at sf0.001. */
  private val minSupport = 2L

  val qSeqPairs = QueryDef("q_seq_pairs",
    (s, dir) => {
      val ev = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("t"),
          unix_micros(col("ts")).as("us"))
      val ext = ev.groupBy("user_id", "t")
        .agg(min(col("us")).as("first_us"), max(col("us")).as("last_us"))
      val nUsers = ev.select(col("user_id")).distinct()
        .agg(count(lit(1)).cast("long").as("n_users"))
      val sup = ext.as("a").join(ext.as("b"),
          col("a.user_id") === col("b.user_id") && col("a.t") =!= col("b.t") &&
            col("a.first_us") < col("b.last_us"))
        .groupBy(col("a.t").as("ta"), col("b.t").as("tb"))
        .agg(count(lit(1)).cast("long").as("support"))
        .where(col("support") >= minSupport)
      sup.crossJoin(broadcast(nUsers))
        .select(col("ta"), col("tb"), col("support"),
          ((col("support") * 10000L -
            (col("support") * 10000L) % col("n_users")) / col("n_users"))
            .cast("long").as("support_bp"))
        .orderBy("ta", "tb")
    },
    Some(
      s"""WITH ev AS (
         |  SELECT user_id, event_type AS t, epoch_us(ts) AS us FROM events),
         |ext AS (
         |  SELECT user_id, t, min(us) AS first_us, max(us) AS last_us
         |  FROM ev GROUP BY user_id, t),
         |nu AS (SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users FROM ev),
         |sup AS (
         |  SELECT a.t AS ta, b.t AS tb, CAST(count(*) AS BIGINT) AS support
         |  FROM ext a JOIN ext b ON a.user_id = b.user_id AND a.t <> b.t
         |    AND a.first_us < b.last_us
         |  GROUP BY 1, 2)
         |SELECT ta, tb, support,
         |  CAST((support * 10000 - (support * 10000) % n_users) / n_users AS BIGINT)
         |    AS support_bp
         |FROM sup CROSS JOIN nu
         |WHERE support >= $minSupport
         |ORDER BY ta, tb""".stripMargin))

  val all: Seq[QueryDef] = Seq(qHolt, qCuped, qSeqPairs)
}
