package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.ext.GraphOps
import graft.queries.Queries.QueryDef

/** Ninety-eighth wave — modularity, instrumental variables, and salting
  * effectiveness.
  *
  *  - `q_modularity`: Newman–Girvan modularity (2004) of the capped
  *    co-purchase graph under the NATION partition — per community the
  *    internal-edge share e_cc and degree share a_c, Q = Σ(e_cc −
  *    a_c²) from exact BIGINT edge/degree sums with the squares in one
  *    shared tree. The score that decides whether q_label_prop-style
  *    communities beat the geographic prior. Community-sized output
  *    plus the Q summary row (nat = −1).
  *  - `q_iv_wald`: the Wald instrumental-variable estimator (the LATE
  *    under monotonicity): a synthetic encouragement z lowers the
  *    activation threshold (d = events ≥ 70 − 5z — documented
  *    construction, giving a REAL first stage on this fixture), and
  *    LATE = (ȳ₁ − ȳ₀)/(d̄₁ − d̄₀) from four exact integer cell sums.
  *    Completes the causal family: q_did (trends), q_psm_att
  *    (selection on observables), q_cuped (variance), q_qte
  *    (quantiles) — IV covers unobserved confounding.
  *  - `q_salt_eval`: the measured effectiveness of key salting on a
  *    deliberately skewed join key (a third of rows share one key):
  *    32-partition sizes under the RAW key vs the 16-way SALTED key,
  *    hottest-partition overshoot in exact basis points for both, and
  *    the tail-reduction ratio. Quantifies what q_salted_join's plan
  *    change actually buys — the audit a skew mitigation ships with.
  */
object R98Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_modularity ----------

  val qModularity = QueryDef("q_modularity",
    (s, dir) => {
      val nations = t(s, dir, "customer")
        .select(col("c_custkey").as("ck"), col("c_nationkey").cast("long").as("nat"))
      // shared capped co-purchase graph (graft.ext.GraphOps) — no
      // forced broadcast of the fact-sized orders map; AQE decides
      val edges = Queries.pin(GraphOps.coPurchaseEdges(
          t(s, dir, "lineitem"), t(s, dir, "orders"))
        .join(broadcast(nations.select(col("ck").as("a"), col("nat").as("na"))), "a")
        .join(broadcast(nations.select(col("ck").as("b"), col("nat").as("nb"))), "b"))
        // referenced by m, internal, and degree — pinned once
      val m = edges.agg(count(lit(1)).cast("long").as("m"))
      // per community: internal edges and total degree
      val internal = edges.where(col("na") === col("nb"))
        .groupBy(col("na").as("nat"))
        .agg(count(lit(1)).cast("long").as("e_in"))
      val degree = edges.select(col("na").as("nat"))
        .unionAll(edges.select(col("nb")))
        .groupBy("nat").agg(count(lit(1)).cast("long").as("deg"))
      val per = degree.join(internal, Seq("nat"), "left")
        .withColumn("e_in", coalesce(col("e_in"), lit(0L)))
        .crossJoin(broadcast(m))
        .withColumn("q_part", expr(
          "CAST(e_in AS DOUBLE) / CAST(m AS DOUBLE)" +
            " - (CAST(deg AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))" +
            " * (CAST(deg AS DOUBLE) / (2.0 * CAST(m AS DOUBLE)))"))
      val summary = per.agg(max(col("m")).as("e_in"),
          sum(col("deg")).cast("long").as("deg"),
          round(sum(col("q_part")), 6).as("q_part"))
        .select(lit(-1L).as("nat"), col("e_in").cast("long").as("e_in"),
          col("deg"), col("q_part"))
      per.select(col("nat"), col("e_in"), col("deg"),
          round(col("q_part"), 6).as("q_part"))
        .unionAll(summary)
        .orderBy("nat")
    },
    Some(
      """WITH li AS (
        |  SELECT DISTINCT l_partkey AS pk, o_custkey AS ck
        |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        |capped AS (
        |  SELECT pk, ck, row_number() OVER (PARTITION BY pk ORDER BY ck) AS rn
        |  FROM li QUALIFY rn <= 4),
        |raw_edges AS (
        |  SELECT DISTINCT x.ck AS a, y.ck AS b
        |  FROM capped x JOIN capped y ON x.pk = y.pk AND x.ck < y.ck),
        |edges AS (
        |  SELECT a, b, CAST(cna.c_nationkey AS BIGINT) AS na,
        |    CAST(cnb.c_nationkey AS BIGINT) AS nb
        |  FROM raw_edges
        |  JOIN customer cna ON cna.c_custkey = a
        |  JOIN customer cnb ON cnb.c_custkey = b),
        |m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM edges),
        |internal AS (
        |  SELECT na AS nat, CAST(count(*) AS BIGINT) AS e_in
        |  FROM edges WHERE na = nb GROUP BY 1),
        |degree AS (
        |  SELECT nat, CAST(count(*) AS BIGINT) AS deg FROM (
        |    SELECT na AS nat FROM edges UNION ALL SELECT nb FROM edges)
        |  GROUP BY nat),
        |per AS (
        |  SELECT d.nat, coalesce(i.e_in, 0) AS e_in, d.deg,
        |    CAST(coalesce(i.e_in, 0) AS DOUBLE) / CAST(m.m AS DOUBLE)
        |      - (CAST(d.deg AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE)))
        |      * (CAST(d.deg AS DOUBLE) / (2.0 * CAST(m.m AS DOUBLE))) AS q_part
        |  FROM degree d LEFT JOIN internal i ON i.nat = d.nat CROSS JOIN m)
        |SELECT nat, CAST(e_in AS BIGINT) AS e_in, deg, round(q_part, 6) AS q_part
        |FROM per
        |UNION ALL
        |SELECT CAST(-1 AS BIGINT), m.m, CAST(sum(deg) AS BIGINT),
        |  round(sum(q_part), 6)
        |FROM per CROSS JOIN m GROUP BY m.m
        |ORDER BY nat""".stripMargin))

  // ---------- q_iv_wald ----------

  val qIvWald = QueryDef("q_iv_wald",
    (s, dir) => {
      val per = Tables.events(s, dir).groupBy("user_id")
        .agg(count(lit(1)).cast("long").as("n_ev"),
          max(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
        .withColumn("z", when(col("user_id") % 4 < 2, 1L).otherwise(0L))
        // encouragement lowers the activation threshold: a REAL first stage
        .withColumn("d",
          when(col("n_ev") >= lit(70L) - lit(5L) * col("z"), 1L).otherwise(0L))
      per.groupBy("z")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(col("d")).cast("long").as("sd"),
          sum(col("y")).cast("long").as("sy"))
        .groupBy(lit(1))
        .agg(max(when(col("z") === 1, col("n"))).as("n1"),
          max(when(col("z") === 1, col("sd"))).as("d1"),
          max(when(col("z") === 1, col("sy"))).as("y1"),
          max(when(col("z") === 0, col("n"))).as("n0"),
          max(when(col("z") === 0, col("sd"))).as("d0"),
          max(when(col("z") === 0, col("sy"))).as("y0"))
        .select(col("n1").cast("long").as("n1"), col("d1").cast("long").as("d1"),
          col("y1").cast("long").as("y1"), col("n0").cast("long").as("n0"),
          col("d0").cast("long").as("d0"), col("y0").cast("long").as("y0"),
          round(expr(
            "(CAST(y1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(y0 AS DOUBLE) / CAST(n0 AS DOUBLE))" +
              " / (CAST(d1 AS DOUBLE) / CAST(n1 AS DOUBLE) - CAST(d0 AS DOUBLE) / CAST(n0 AS DOUBLE))"), 6)
            .as("late"))
    },
    Some(
      """WITH per AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_ev,
        |    CAST(max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT)
        |      AS y,
        |    CAST(CASE WHEN user_id % 4 < 2 THEN 1 ELSE 0 END AS BIGINT) AS z
        |  FROM events GROUP BY user_id),
        |staged AS (
        |  SELECT *, CAST(CASE WHEN n_ev >= 70 - 5 * z THEN 1 ELSE 0 END AS BIGINT)
        |    AS d
        |  FROM per),
        |cells AS (
        |  SELECT z, CAST(count(*) AS BIGINT) AS n, CAST(sum(d) AS BIGINT) AS sd,
        |    CAST(sum(y) AS BIGINT) AS sy
        |  FROM staged GROUP BY z),
        |wide AS (
        |  SELECT
        |    max(CASE WHEN z = 1 THEN n END) AS n1,
        |    max(CASE WHEN z = 1 THEN sd END) AS d1,
        |    max(CASE WHEN z = 1 THEN sy END) AS y1,
        |    max(CASE WHEN z = 0 THEN n END) AS n0,
        |    max(CASE WHEN z = 0 THEN sd END) AS d0,
        |    max(CASE WHEN z = 0 THEN sy END) AS y0
        |  FROM cells)
        |SELECT n1, d1, y1, n0, d0, y0,
        |  round((CAST(y1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(y0 AS DOUBLE) / CAST(n0 AS DOUBLE))
        |    / (CAST(d1 AS DOUBLE) / CAST(n1 AS DOUBLE)
        |      - CAST(d0 AS DOUBLE) / CAST(n0 AS DOUBLE)), 6) AS late
        |FROM wide""".stripMargin))

  // ---------- q_salt_eval ----------

  private val nParts = 32L
  private val saltFan = 16L

  val qSaltEval = QueryDef("q_salt_eval",
    (s, dir) => {
      val keyed = t(s, dir, "lineitem")
        .select(col("l_orderkey").as("k"), col("l_linenumber").as("ln"))
        // deliberate skew: a third of the rows share key 0
        .withColumn("sk",
          when(col("k") % 3 === 0, 0L).otherwise(col("k") % 97L))
      def sizes(keyCol: String): DataFrame =
        keyed.withColumn("p",
          expr(s"($keyCol * 2654435761 + $keyCol * $keyCol * 40503) % $nParts"))
          .groupBy("p").agg(count(lit(1)).cast("long").as("sz"))
          .agg(count(lit(1)).cast("long").as("np"),
            sum(col("sz")).cast("long").as("total"),
            max(col("sz")).cast("long").as("mx"))
      val raw = sizes("sk")
        .select(col("total"), col("mx").as("raw_max"), col("np").as("raw_np"))
      val salted = keyed
        .withColumn("salt", col("ln") % saltFan)
        .withColumn("skv", col("sk") * saltFan + col("salt"))
      val saltedSizes = salted.withColumn("p",
          expr(s"(skv * 2654435761 + skv * skv * 40503) % $nParts"))
        .groupBy("p").agg(count(lit(1)).cast("long").as("sz"))
        .agg(max(col("sz")).cast("long").as("salted_max"),
          count(lit(1)).cast("long").as("salted_np"))
      raw.crossJoin(broadcast(saltedSizes))
        .select(col("total"), col("raw_max"), col("salted_max"),
          ((col("raw_max") * col("raw_np") * 10000L -
            (col("raw_max") * col("raw_np") * 10000L) % col("total")) /
            col("total")).cast("long").as("raw_max_over_mean_bp"),
          ((col("salted_max") * col("salted_np") * 10000L -
            (col("salted_max") * col("salted_np") * 10000L) % col("total")) /
            col("total")).cast("long").as("salted_max_over_mean_bp"))
    },
    Some(
      s"""WITH keyed AS (
         |  SELECT l_orderkey AS k, l_linenumber AS ln,
         |    CASE WHEN l_orderkey % 3 = 0 THEN 0 ELSE l_orderkey % 97 END AS sk
         |  FROM lineitem),
         |raw_sizes AS (
         |  SELECT (sk * 2654435761 + sk * sk * 40503) % $nParts AS p,
         |    CAST(count(*) AS BIGINT) AS sz
         |  FROM keyed GROUP BY 1),
         |raw AS (
         |  SELECT CAST(count(*) AS BIGINT) AS raw_np,
         |    CAST(sum(sz) AS BIGINT) AS total, CAST(max(sz) AS BIGINT) AS raw_max
         |  FROM raw_sizes),
         |salted_sizes AS (
         |  SELECT ((sk * $saltFan + ln % $saltFan) * 2654435761
         |    + (sk * $saltFan + ln % $saltFan) * (sk * $saltFan + ln % $saltFan)
         |    * 40503) % $nParts AS p,
         |    CAST(count(*) AS BIGINT) AS sz
         |  FROM keyed GROUP BY 1),
         |salted AS (
         |  SELECT CAST(max(sz) AS BIGINT) AS salted_max,
         |    CAST(count(*) AS BIGINT) AS salted_np
         |  FROM salted_sizes)
         |SELECT total, raw_max, salted_max,
         |  CAST((raw_max * raw_np * 10000 - (raw_max * raw_np * 10000) % total)
         |    / total AS BIGINT) AS raw_max_over_mean_bp,
         |  CAST((salted_max * salted_np * 10000 - (salted_max * salted_np * 10000) % total)
         |    / total AS BIGINT) AS salted_max_over_mean_bp
         |FROM raw CROSS JOIN salted""".stripMargin))

  val all: Seq[QueryDef] = Seq(qModularity, qIvWald, qSaltEval)
}
