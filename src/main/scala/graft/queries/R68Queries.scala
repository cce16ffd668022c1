package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Sixty-eighth wave — Kneser-Ney smoothing, retention accumulation,
  * and the Lorenz curve.
  *
  *  - `q_kneser_ney`: interpolated Kneser-Ney bigram probabilities
  *    (Kneser & Ney 1995; the KenLM default) with discount d = 3/4 —
  *    P(w₂|w₁) = max(c₁₂−d, 0)/c₁ + d·N₁₊(w₁,•)/c₁ · N₁₊(•,w₂)/N_B.
  *    With d = 3/4 the whole expression clears denominators into ONE
  *    exact integer fraction (×4·c₁·N_B), floored to prob·10⁹ — no
  *    float smoothing arithmetic to diverge between engines. The
  *    count tables (bigram, history, continuation) are the vocabulary-
  *    sized LM shape shared with q_bigram_lm / q_trigram_backoff;
  *    continuation counts N₁₊(•,w₂) are what distinguishes KN from
  *    plain backoff.
  *  - `q_cumulative_distinct`: users-to-date per day — each user
  *    reduces to a first-seen day (one map-side-combined shuffle),
  *    daily new-user counts accumulate over the |days|-sized dimension.
  *    The growth-curve complement of q_windowed_distinct's trailing
  *    window.
  *  - `q_lorenz_deciles`: exact Lorenz curve / decile spend shares.
  *    Scale-right construction: customers collapse to per-VALUE counts,
  *    ONE cumulative sweep over the |distinct values| sequence (the
  *    q_ks_test discipline — never a per-customer global row_number),
  *    then each value-run [hi−cnt, hi) intersects the 10 decile rank
  *    intervals by pure integer interval arithmetic (constant ×10
  *    fanout, map-side). Bit-exact decile counts and cent totals;
  *    shares in floor basis points.
  */
object R68Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_kneser_ney ----------

  val qKneserNey = QueryDef("q_kneser_ney",
    (s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 1000)
        .select(split(col("text"), " ").as("ws"))
        .where(size(col("ws")) >= 2)
      val bg = docs.select(
        explode(expr("transform(sequence(0, size(ws) - 2)," +
          " i -> struct(ws[i] AS w1, ws[i + 1] AS w2))")).as("b"))
        .select(col("b.w1").as("w1"), col("b.w2").as("w2"))
      val c12 = bg.groupBy("w1", "w2").agg(count(lit(1)).as("c"))
      val c1 = c12.groupBy("w1")
        .agg(sum(col("c")).cast("long").as("c1"),
          count(lit(1)).cast("long").as("n_after"))
      val cont = c12.groupBy("w2")
        .agg(count(lit(1)).cast("long").as("n_before"))
      val nb = c12.agg(count(lit(1)).cast("long").as("nb"))
      val num = (greatest(col("c") * 4L - 3L, lit(0L)) * col("nb") +
        col("n_after") * col("n_before") * 3L) * 1000000000L
      val den = col("c1") * col("nb") * 4L
      c12.join(c1, "w1").join(cont, "w2").crossJoin(broadcast(nb))
        .select(col("w1"), col("w2"), col("c"), col("c1"),
          col("n_after"), col("n_before"),
          ((num - num % den) / den).cast("long").as("prob_e9"))
        .orderBy(col("prob_e9").desc, col("w1"), col("w2"))
        .limit(50)
    },
    Some(
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents WHERE doc_id < 1000),
        |idx AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM docs),
        |bg AS (
        |  SELECT ws[CAST(i AS INTEGER)] AS w1, ws[CAST(i AS INTEGER) + 1] AS w2
        |  FROM idx),
        |c12 AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS c FROM bg GROUP BY w1, w2),
        |c1 AS (SELECT w1, CAST(sum(c) AS BIGINT) AS c1,
        |         CAST(count(*) AS BIGINT) AS n_after FROM c12 GROUP BY w1),
        |cont AS (SELECT w2, CAST(count(*) AS BIGINT) AS n_before FROM c12 GROUP BY w2),
        |nb AS (SELECT CAST(count(*) AS BIGINT) AS nb FROM c12),
        |p AS (
        |  SELECT b.w1, b.w2,
        |    CAST((((CASE WHEN 4 * b.c - 3 > 0 THEN 4 * b.c - 3 ELSE 0 END) * nb.nb
        |           + 3 * h.n_after * t.n_before) * 1000000000
        |          - (((CASE WHEN 4 * b.c - 3 > 0 THEN 4 * b.c - 3 ELSE 0 END) * nb.nb
        |              + 3 * h.n_after * t.n_before) * 1000000000 % (4 * h.c1 * nb.nb)))
        |      / (4 * h.c1 * nb.nb) AS BIGINT) AS prob_e9,
        |    b.c, h.c1, h.n_after, t.n_before
        |  FROM c12 b JOIN c1 h ON b.w1 = h.w1 JOIN cont t ON b.w2 = t.w2
        |  CROSS JOIN nb)
        |SELECT w1, w2, c, c1, n_after, n_before, prob_e9
        |FROM p ORDER BY prob_e9 DESC, w1, w2 LIMIT 50""".stripMargin))

  // ---------- q_cumulative_distinct ----------

  val qCumulativeDistinct = QueryDef("q_cumulative_distinct",
    (s, dir) => {
      val usPerDay = 86400000000L
      val ev = Tables.events(s, dir)
        .select(col("user_id"),
          (unix_micros(col("ts")) -
            ((unix_micros(col("ts")) % usPerDay) + usPerDay) % usPerDay)
            .divide(usPerDay).cast("long").as("day"))
      val firstDay = ev.groupBy("user_id").agg(min(col("day")).as("fd"))
      val news = firstDay.groupBy("fd")
        .agg(count(lit(1)).cast("long").as("n_new"))
      val days = ev.select("day").distinct()
      days.join(broadcast(news), col("fd") <= col("day"), "left")
        .groupBy("day")
        .agg(coalesce(sum(col("n_new")), lit(0L)).cast("long")
          .as("cum_users"))
        .orderBy("day")
    },
    Some(
      """WITH ev AS (
        |  SELECT user_id,
        |    CAST((epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000)
        |      / 86400000000 AS BIGINT) AS day
        |  FROM events),
        |first_day AS (SELECT user_id, min(day) AS fd FROM ev GROUP BY user_id),
        |days AS (SELECT DISTINCT day FROM ev),
        |news AS (SELECT fd, CAST(count(*) AS BIGINT) AS n_new FROM first_day GROUP BY fd)
        |SELECT d.day,
        |  CAST(coalesce(sum(n.n_new) FILTER (WHERE n.fd <= d.day), 0) AS BIGINT) AS cum_users
        |FROM days d LEFT JOIN news n ON n.fd <= d.day
        |GROUP BY d.day ORDER BY d.day""".stripMargin))

  // ---------- q_lorenz_deciles ----------

  val qLorenzDeciles = QueryDef("q_lorenz_deciles",
    (s, dir) => RewriteGlobalRankWindows.force {
      val spend = t(s, dir, "orders")
        .groupBy("o_custkey")
        .agg(sum(expr("CAST(round(o_totalprice * 100.0) AS BIGINT)"))
          .cast("long").as("cents"))
      val vals = spend.groupBy("cents").agg(count(lit(1)).as("cnt"))
      val w = Window.orderBy("cents")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val tot = Window.partitionBy(lit(1))
      val sweep = vals
        .withColumn("hi", sum(col("cnt")).over(w))
        .withColumn("n", sum(col("cnt")).over(tot).cast("long"))
        .withColumn("tot", sum(col("cents") * col("cnt")).over(tot)
          .cast("long"))
      val deciles = s.range(1, 11).select(col("id").as("decile"))
      def bound(d: org.apache.spark.sql.Column) = {
        val x = d * col("n")
        (x - x % 10L) / 10L
      }
      val pieces = sweep.crossJoin(broadcast(deciles))
        .withColumn("k",
          least(col("hi"), bound(col("decile"))) -
            greatest(col("hi") - col("cnt"), bound(col("decile") - 1L)))
        .where(col("k") > 0)
      val agg = pieces.groupBy("decile")
        .agg(sum(col("k")).cast("long").as("n_cust"),
          sum(col("k") * col("cents")).cast("long").as("cents"),
          max(col("tot")).as("tot"))
      val sh = col("cents") * 10000L
      agg.select(col("decile"), col("n_cust"), col("cents"),
          ((sh - ((sh % col("tot")) + col("tot")) % col("tot")) / col("tot"))
            .cast("long").as("share_bp"))
        .orderBy("decile")
    },
    Some(
      """WITH spend AS (
        |  SELECT o_custkey, CAST(sum(CAST(round(o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders GROUP BY o_custkey),
        |vals AS (SELECT cents, CAST(count(*) AS BIGINT) AS cnt FROM spend GROUP BY cents),
        |sweep AS (
        |  SELECT cents, cnt,
        |    sum(cnt) OVER (ORDER BY cents ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hi,
        |    CAST(sum(cnt) OVER () AS BIGINT) AS n,
        |    CAST(sum(cents * cnt) OVER () AS BIGINT) AS tot
        |  FROM vals),
        |deciles AS (SELECT CAST(g.g AS BIGINT) AS decile FROM generate_series(1, 10) g(g)),
        |pieces AS (
        |  SELECT d.decile, s.cents, s.n, s.tot,
        |    least(s.hi, (d.decile * s.n - (d.decile * s.n % 10)) / 10)
        |      - greatest(s.hi - s.cnt, ((d.decile - 1) * s.n - ((d.decile - 1) * s.n % 10)) / 10)
        |      AS k
        |  FROM sweep s JOIN deciles d ON true),
        |agg AS (
        |  SELECT decile, CAST(sum(k) AS BIGINT) AS n_cust,
        |    CAST(sum(k * cents) AS BIGINT) AS cents, max(tot) AS tot
        |  FROM pieces WHERE k > 0 GROUP BY decile)
        |SELECT decile, n_cust, cents,
        |  CAST((cents * 10000 - ((cents * 10000 % tot) + tot) % tot) / tot AS BIGINT) AS share_bp
        |FROM agg ORDER BY decile""".stripMargin))

  // ---------- q_asof_native ----------

  /** The broadcast as-of operator ([[graft.plans.AsofJoinNative]],
    * whole-operator tier) against the SAME lateral oracle as
    * q_asof_join's composed union+window form — two independent
    * implementations, one truth. The native form trades the composed
    * form's one |L|+|R| shuffle for a broadcast + per-row binary
    * search (right side dimension-sized by contract); equivalence is
    * additionally spec-pinned on random series in AsofNativeSpec. */
  val qAsofNative = QueryDef("q_asof_native",
    (s, dir) => {
      val e = Tables.events(s, dir).select("event_id", "user_id", "ts")
      // the fixture's o_orderdate physical type round-trips as NTZ some
      // rounds — align it to the probe side's (session-zoned, UTC) type
      val o = t(s, dir, "orders")
        .select(col("o_custkey"),
          col("o_orderdate").cast(e.schema("ts").dataType).as("o_orderdate"),
          col("o_orderkey"))
      graft.plans.AsofJoinNative.asofJoin(e, o,
          leftKey = "user_id", rightKey = "o_custkey",
          leftTime = "ts", rightTime = "o_orderdate",
          rightTie = "o_orderkey")
        .select("event_id", "user_id", "o_orderkey", "o_orderdate")
        .orderBy("event_id")
    },
    Some(
      """SELECT e.event_id, e.user_id, o.o_orderkey, o.o_orderdate
        |FROM events e LEFT JOIN LATERAL (
        |  SELECT o_orderkey, o_orderdate FROM orders
        |  WHERE o_custkey = e.user_id AND o_orderdate <= e.ts
        |  ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 1) o ON TRUE
        |ORDER BY e.event_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qKneserNey, qCumulativeDistinct,
    qLorenzDeciles, qAsofNative)
}
