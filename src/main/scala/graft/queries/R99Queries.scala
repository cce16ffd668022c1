package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Ninety-ninth wave — wavelet energy, variance decomposition, and
  * exact FDR control.
  *
  *  - `q_haar`: a 3-level UNNORMALIZED Haar decomposition of the daily
  *    revenue series — per level the pair sums and differences
  *    (s = a+b, d = a−b; skipping the √2 keeps every coefficient an
  *    exact BIGINT) with the detail/smooth energy split. Parseval's
  *    identity on the unnormalized transform (s² + d² = 2(a² + b²))
  *    is pinned per level in the spec. The multi-resolution screen
  *    that localizes WHERE a series' variance lives (day-to-day noise
  *    vs week-scale structure). Each level is one pair-keyed
  *    aggregate; the oracle unrolls the three levels as CTEs.
  *  - `q_eta_squared`: one-way variance decomposition of daily revenue
  *    by weekday — η² = SSB/SST and the F statistic from EXACT integer
  *    sums (SSB and SST clear their fractions over the common n_g·N
  *    denominators inside one shared IEEE tree). The effect-size
  *    answer to "how much of revenue variance is the weekly cycle"
  *    that q_dow_profile's per-day means only hint at.
  *  - `q_bh_fdr`: Benjamini–Hochberg FDR control (1995) over EXACT
  *    permutation p-values — the q_perm_test machinery runs per user
  *    segment, every p is the rational (n_ge+1)/201, and the BH step
  *    condition p_(i) ≤ (i/m)·q at q = 0.2 cross-multiplies to the
  *    pure-integer p_num·25 ≤ i·201 — the entire multiple-testing
  *    correction is arithmetic, no float thresholds anywhere. Rejects
  *    are every rank up to the largest satisfying index (the BH
  *    step-up), emitted per segment.
  */
object R99Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private val usPerDay = 86400000000L

  private def dailyRevenue(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP))").as("us"),
        expr("CAST((CAST(round(o_totalprice * 100.0) AS BIGINT) " +
          "- CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT)")
          .as("usd"))
      .withColumn("day", expr(s"CAST((us - us % $usPerDay) / $usPerDay AS BIGINT)"))
      .groupBy("day").agg(sum(col("usd")).cast("long").as("v"))

  private val dailySql =
    s"""days AS (
       |  SELECT CAST((epoch_us(CAST(o_orderdate AS TIMESTAMP))
       |      - epoch_us(CAST(o_orderdate AS TIMESTAMP)) % $usPerDay)
       |      / $usPerDay AS BIGINT) AS day,
       |    CAST(sum(CAST((CAST(round(o_totalprice * 100.0) AS BIGINT)
       |      - CAST(round(o_totalprice * 100.0) AS BIGINT) % 100) / 100 AS BIGINT))
       |      AS BIGINT) AS v
       |  FROM orders GROUP BY 1)""".stripMargin

  // ---------- q_haar ----------

  private val haarLevels = 3

  val qHaar = QueryDef("q_haar",
    (s, dir) => {
      val days = dailyRevenue(s, dir)
      val w = Window.orderBy("day")
      // r15: the seed rank routes through GlobalRank (CALENDAR
      // whitelist retirement); force BEFORE the per-level pins
      var level = RewriteGlobalRankWindows.force(
        days.withColumn("rn", row_number().over(w).cast("long"))
          .select(col("rn"), col("v")))
      val results = (1 to haarLevels).map { l =>
        // each level feeds its stats row AND the next level — pinned
        // (not localCheckpoint) so the 3 level blocks stay reclaimable;
        // stats rows are consumed after the loop, so per-level blocks
        // cannot be freed eagerly
        val paired = Queries.pin(level
          .withColumn("pair", expr("CAST((rn + 1 - (rn + 1) % 2) / 2 AS BIGINT)"))
          .withColumn("sgn", when(col("rn") % 2 === 1, 1L).otherwise(-1L))
          .groupBy("pair")
          .agg(count(lit(1)).cast("long").as("cnt"),
            sum(col("v")).cast("long").as("sc"),
            sum(col("v") * col("sgn")).cast("long").as("dc"))
          .where(col("cnt") === 2)) // complete pairs only
        val stats = paired.agg(lit(l.toLong).as("level"),
          count(lit(1)).cast("long").as("n_pairs"),
          sum(col("dc") * col("dc")).cast("long").as("detail_energy"),
          sum(col("sc") * col("sc")).cast("long").as("smooth_energy"))
        level = paired.select(col("pair").as("rn"), col("sc").as("v"))
        stats
      }
      results.reduce(_ unionAll _)
        .select(col("level"), col("n_pairs"), col("detail_energy"),
          col("smooth_energy"))
        .orderBy("level")
    },
    Some {
      def levelSql(l: Int): String =
        s"""p$l AS (
           |  SELECT CAST((rn + 1 - (rn + 1) % 2) / 2 AS BIGINT) AS rn,
           |    CAST(count(*) AS BIGINT) AS cnt,
           |    CAST(sum(v) AS BIGINT) AS v,
           |    CAST(sum(v * (CASE WHEN rn % 2 = 1 THEN 1 ELSE -1 END)) AS BIGINT) AS d
           |  FROM l${l - 1} GROUP BY 1),
           |l$l AS (SELECT rn, v, d FROM p$l WHERE cnt = 2)""".stripMargin
      val levels = (1 to haarLevels).map(levelSql).mkString(",\n")
      val selects = (1 to haarLevels).map(l =>
        s"""SELECT CAST($l AS BIGINT) AS level, CAST(count(*) AS BIGINT) AS n_pairs,
           |  CAST(sum(d * d) AS BIGINT) AS detail_energy,
           |  CAST(sum(v * v) AS BIGINT) AS smooth_energy
           |FROM l$l""".stripMargin).mkString("\nUNION ALL\n")
      s"""WITH $dailySql,
         |l0 AS (
         |  SELECT CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn, v,
         |    CAST(0 AS BIGINT) AS d
         |  FROM days),
         |$levels
         |$selects
         |ORDER BY level""".stripMargin
    })

  // ---------- q_eta_squared ----------

  val qEtaSquared = QueryDef("q_eta_squared",
    (s, dir) => {
      val days = dailyRevenue(s, dir)
        .withColumn("dow", expr("day % 7")) // day index mod 7
      val g = days.groupBy("dow")
        .agg(count(lit(1)).cast("long").as("ng"),
          sum(col("v")).cast("long").as("sg"))
      val tot = days.agg(count(lit(1)).cast("long").as("n"),
        sum(col("v")).cast("long").as("st"),
        sum(col("v") * col("v")).cast("long").as("q"))
      val ssb = g.crossJoin(broadcast(tot))
        .agg(max(col("n")).as("n"), max(col("st")).as("st"), max(col("q")).as("q"),
          count(lit(1)).cast("long").as("k"),
          sum(expr("CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)"))
            .as("sg2n"))
      ssb.select(col("n").cast("long").as("n_days"), col("k"),
        round(expr(
          "(sg2n - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))" +
            " / (CAST(q AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))"), 6)
          .as("eta2"),
        round(expr(
          "((sg2n - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(k - 1 AS DOUBLE))" +
            " / ((CAST(q AS DOUBLE) - sg2n) / CAST(n - k AS DOUBLE))"), 6).as("f_stat"))
    },
    Some(
      s"""WITH $dailySql,
         |dowd AS (SELECT day % 7 AS dow, v FROM days),
         |g AS (
         |  SELECT dow, CAST(count(*) AS BIGINT) AS ng, CAST(sum(v) AS BIGINT) AS sg
         |  FROM dowd GROUP BY dow),
         |tot AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(v) AS BIGINT) AS st,
         |    CAST(sum(v * v) AS BIGINT) AS q
         |  FROM dowd),
         |agg AS (
         |  SELECT max(n) AS n, max(st) AS st, max(q) AS q,
         |    CAST(count(*) AS BIGINT) AS k,
         |    sum(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)) AS sg2n
         |  FROM g CROSS JOIN tot)
         |SELECT CAST(n AS BIGINT) AS n_days, k,
         |  round((sg2n - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
         |    / (CAST(q AS DOUBLE) - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)), 6)
         |    AS eta2,
         |  round(((sg2n - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
         |      / CAST(k - 1 AS DOUBLE))
         |    / ((CAST(q AS DOUBLE) - sg2n) / CAST(n - k AS DOUBLE)), 6) AS f_stat
         |FROM agg""".stripMargin))

  // ---------- q_bh_fdr ----------

  private val nPerms = 200
  private val permBitSql =
    "(user_id * 2654435761 + i * 40503 + user_id * i * 104729) % 2"

  val qBhFdr = QueryDef("q_bh_fdr",
    (s, dir) => RewriteGlobalRankWindows.force {
      val per = Tables.events(s, dir).groupBy("user_id")
        .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .cast("long").as("y"))
        .withColumn("seg", (col("user_id") % 5).cast("long"))
      val obs = per.groupBy("seg")
        .agg(abs(sum(when(col("user_id") % 2 === 1, col("y"))
          .otherwise(-col("y")))).cast("long").as("t_obs"))
      val perms = per
        .withColumn("i", explode(sequence(lit(0), lit(nPerms - 1))))
        .withColumn("i", col("i").cast("long"))
        .withColumn("signed",
          when(expr(permBitSql) === 1, col("y")).otherwise(-col("y")))
        .groupBy("seg", "i")
        .agg(abs(sum(col("signed"))).cast("long").as("t_perm"))
      val ps = perms.join(broadcast(obs), "seg")
        .groupBy("seg", "t_obs")
        .agg((sum(when(col("t_perm") >= col("t_obs"), 1L).otherwise(0L)) + 1L)
          .cast("long").as("p_num")) // exact p = p_num / 201
      val w = Window.orderBy(col("p_num"), col("seg"))
      val ranked = ps.withColumn("rank", row_number().over(w).cast("long"))
        // BH step-up at q = 0.2 over m = 5: p ≤ (i/5)·0.2 ⟺ p_num·25 ≤ i·201
        .withColumn("step_ok",
          when(col("p_num") * 25L <= col("rank") * 201L, 1L).otherwise(0L))
      val kMax = ranked.agg(coalesce(
        max(when(col("step_ok") === 1, col("rank"))), lit(0L)).as("k"))
      ranked.crossJoin(broadcast(kMax))
        .select(col("seg"), col("t_obs"), col("p_num"), col("rank"),
          when(col("rank") <= col("k"), 1L).otherwise(0L).as("rejected"))
        .orderBy("seg")
    },
    Some(
      s"""WITH per AS (
         |  SELECT user_id,
         |    CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
         |      AS y,
         |    CAST(user_id % 5 AS BIGINT) AS seg
         |  FROM events GROUP BY user_id),
         |obs AS (
         |  SELECT seg,
         |    CAST(abs(sum(CASE WHEN user_id % 2 = 1 THEN y ELSE -y END)) AS BIGINT)
         |      AS t_obs
         |  FROM per GROUP BY seg),
         |perms AS (
         |  SELECT seg, i,
         |    CAST(abs(sum(CASE WHEN $permBitSql = 1 THEN y ELSE -y END)) AS BIGINT)
         |      AS t_perm
         |  FROM per CROSS JOIN (SELECT unnest(generate_series(0, ${nPerms - 1})) AS i)
         |  GROUP BY seg, i),
         |ps AS (
         |  SELECT p.seg, o.t_obs,
         |    CAST(sum(CASE WHEN t_perm >= t_obs THEN 1 ELSE 0 END) + 1 AS BIGINT)
         |      AS p_num
         |  FROM perms p JOIN obs o ON o.seg = p.seg
         |  GROUP BY p.seg, o.t_obs),
         |ranked AS (
         |  SELECT *, CAST(row_number() OVER (ORDER BY p_num, seg) AS BIGINT) AS rank,
         |    CAST(CASE WHEN p_num * 25 <= row_number() OVER (ORDER BY p_num, seg) * 201
         |      THEN 1 ELSE 0 END AS BIGINT) AS step_ok
         |  FROM ps),
         |km AS (
         |  SELECT CAST(coalesce(max(CASE WHEN step_ok = 1 THEN rank END), 0) AS BIGINT)
         |    AS k
         |  FROM ranked)
         |SELECT seg, t_obs, p_num, rank,
         |  CAST(CASE WHEN rank <= k THEN 1 ELSE 0 END AS BIGINT) AS rejected
         |FROM ranked CROSS JOIN km
         |ORDER BY seg""".stripMargin))

  val all: Seq[QueryDef] = Seq(qHaar, qEtaSquared, qBhFdr)
}
