package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Seventy-first wave — Hilbert curve keys, exact point-in-polygon, and
  * the Theil inequality index.
  *
  *  - `q_hilbert_curve`: Hilbert space-filling-curve keys (8 bits per
  *    axis) for the synthetic coordinate lattice — the better-locality
  *    alternative to q_zorder's Morton keys (adjacent Hilbert cells are
  *    always adjacent in space; Z-order jumps). The xy2d rotation
  *    recurrence unrolls into 8 generated levels of pure integer
  *    CASE/mask arithmetic (`&`, `%`, `*` — shared verbatim by BOTH
  *    engines from one Scala loop; validated bit-exact against an
  *    independent straight-Scala xy2d in R6WaveInvariantsSpec). Keys
  *    like these drive range-clustered layouts: sorting 100 TB by
  *    hkey makes bbox scans touch contiguous files.
  *  - `q_point_in_polygon`: exact ray-casting point-in-polygon on the
  *    integer milli-degree lattice — per edge, the half-open crossing
  *    rule with a cross-multiplied orientation test (no division, no
  *    floats, no boundary ambiguity). The 8 edge tests are generated
  *    from one vertex table shared with the oracle; constant work per
  *    point, map-side only, then one aggregate — the geofencing filter
  *    shape.
  *  - `q_theil_index`: Theil's T across nation revenue totals —
  *    Σ (xᵢ/X)·ln(xᵢ·n/X) with per-term DECIMAL(18,9) quantization
  *    (the q_psi discipline) over the 25-nation aggregate; completes
  *    the concentration family (HHI, Lorenz deciles).
  */
object R71Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_hilbert_curve ----------

  /** One unrolled xy2d level: from (x_i, y_i, d_i) to level i+1 at bit
    * k (cell size s = 2^k). Pure `&`/`%`/CASE arithmetic — the SAME
    * text runs on Spark and DuckDB. */
  private def hilbertLevel(i: Int, k: Int): Seq[String] = {
    val s = 1 << k
    val m = s - 1
    val (x, y, d) = (s"x$i", s"y$i", s"d$i")
    val j = i + 1
    Seq(
      s"""CASE WHEN ($y & $s) > 0 THEN $x & $m
         |     WHEN ($x & $s) > 0 THEN $m - ($y & $m)
         |     ELSE $y & $m END AS x$j""".stripMargin,
      s"""CASE WHEN ($y & $s) > 0 THEN $y & $m
         |     WHEN ($x & $s) > 0 THEN $m - ($x & $m)
         |     ELSE $x & $m END AS y$j""".stripMargin,
      s"""$d + ${s * s} * (CASE WHEN ($x & $s) > 0 AND ($y & $s) > 0 THEN 2
         |     WHEN ($x & $s) > 0 THEN 3
         |     WHEN ($y & $s) > 0 THEN 1 ELSE 0 END) AS d$j""".stripMargin)
  }

  private val hilbertKs = Seq(7, 6, 5, 4, 3, 2, 1, 0)

  /** Straight-Scala reference xy2d (Wikipedia's loop) — the independent
    * implementation the generated SQL is pinned against in specs. */
  private[graft] def xy2d(n: Int, x0: Int, y0: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  val qHilbertCurve = QueryDef("q_hilbert_curve",
    (s, dir) => {
      var df = t(s, dir, "events").where(col("event_id") < 2000)
        .selectExpr("event_id",
          "CAST((event_id * 7919) % 2000 * 256 div 2000 AS BIGINT) AS x0",
          "CAST((event_id * 104729) % 3000 * 256 div 3000 AS BIGINT) AS y0",
          "CAST(0 AS BIGINT) AS d0")
      for ((k, i) <- hilbertKs.zipWithIndex)
        df = df.selectExpr(Seq("event_id") ++ hilbertLevel(i, k): _*)
      df.selectExpr("event_id", "d8 AS hkey").orderBy("event_id")
    },
    Some {
      val base =
        """WITH pts AS (
          |  SELECT event_id,
          |    CAST((event_id * 7919) % 2000 * 256 // 2000 AS BIGINT) AS x0,
          |    CAST((event_id * 104729) % 3000 * 256 // 3000 AS BIGINT) AS y0,
          |    CAST(0 AS BIGINT) AS d0
          |  FROM events WHERE event_id < 2000)""".stripMargin
      val levels = hilbertKs.zipWithIndex.map { case (k, i) =>
        s""",
           |l${i + 1} AS (
           |  SELECT event_id, ${hilbertLevel(i, k).mkString(",\n    ")}
           |  FROM ${if (i == 0) "pts" else s"l$i"})""".stripMargin
      }.mkString
      base + levels + "\nSELECT event_id, d8 AS hkey FROM l8 ORDER BY event_id"
    })

  // ---------- q_point_in_polygon ----------

  /** Star-ish test polygon in the integer milli-degree lattice. */
  private[graft] val Poly: Seq[(Long, Long)] = Seq(
    (40200L, -73800L), (40700L, -73300L), (41200L, -73800L),
    (41700L, -73300L), (41700L, -72400L), (41000L, -72900L),
    (40300L, -72400L), (40200L, -73000L))

  /** Generated crossing-count expression (half-open ray-casting rule,
    * cross-multiplied orientation — division-free): shared text for
    * both engines. */
  private[graft] val crossingsSql: String =
    Poly.indices.map { i =>
      val (x1, y1) = Poly(i)
      val (x2, y2) = Poly((i + 1) % Poly.length)
      val t = s"(($x2 - $x1) * (py - $y1) - (px - $x1) * ($y2 - $y1))"
      s"""CASE WHEN $y1 <= py AND py < $y2 AND $t > 0 THEN 1
         |     WHEN $y2 <= py AND py < $y1 AND $t < 0 THEN 1 ELSE 0 END""".stripMargin
    }.mkString("\n       + ")

  /** Straight-Scala reference ray caster for the spec pin. */
  private[graft] def insidePoly(px: Long, py: Long): Boolean = {
    var cnt = 0
    for (i <- Poly.indices) {
      val (x1, y1) = Poly(i)
      val (x2, y2) = Poly((i + 1) % Poly.length)
      val t = (x2 - x1) * (py - y1) - (px - x1) * (y2 - y1)
      if (y1 <= py && py < y2 && t > 0) cnt += 1
      else if (y2 <= py && py < y1 && t < 0) cnt += 1
    }
    cnt % 2 == 1
  }

  val qPointInPolygon = QueryDef("q_point_in_polygon",
    (s, dir) => {
      t(s, dir, "events").where(col("event_id") < 3000)
        .selectExpr("event_id",
          "CAST(40000 + (event_id * 7919) % 2000 AS BIGINT) AS px",
          "CAST(-74000 + (event_id * 104729) % 3000 AS BIGINT) AS py")
        .selectExpr("event_id",
          s"CAST(($crossingsSql) % 2 AS BIGINT) AS inside")
        .agg(count(lit(1)).cast("long").as("n_pts"),
          sum(col("inside")).cast("long").as("n_inside"),
          min(when(col("inside") === 1, col("event_id"))).cast("long")
            .as("first_inside"),
          max(when(col("inside") === 1, col("event_id"))).cast("long")
            .as("last_inside"))
    },
    Some(
      s"""WITH pts AS (
         |  SELECT event_id,
         |    CAST(40000 + (event_id * 7919) % 2000 AS BIGINT) AS px,
         |    CAST(-74000 + (event_id * 104729) % 3000 AS BIGINT) AS py
         |  FROM events WHERE event_id < 3000),
         |hits AS (
         |  SELECT event_id, px, py,
         |    CAST(($crossingsSql) % 2 AS BIGINT) AS inside
         |  FROM pts)
         |SELECT CAST(count(*) AS BIGINT) AS n_pts,
         |  CAST(sum(inside) AS BIGINT) AS n_inside,
         |  CAST(min(CASE WHEN inside = 1 THEN event_id END) AS BIGINT) AS first_inside,
         |  CAST(max(CASE WHEN inside = 1 THEN event_id END) AS BIGINT) AS last_inside
         |FROM hits""".stripMargin))

  // ---------- q_theil_index ----------

  val qTheilIndex = QueryDef("q_theil_index",
    (s, dir) => {
      val x = t(s, dir, "orders")
        .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, dir, "nation")),
          col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(expr("CAST(round(o_totalprice * 100.0) AS BIGINT)"))
          .cast("long").as("cents"))
      val tot = x.agg(sum(col("cents")).cast("long").as("x"),
        count(lit(1)).cast("long").as("n"))
      x.crossJoin(broadcast(tot))
        .withColumn("term", expr(
          "CAST(CAST(cents AS DOUBLE) / CAST(x AS DOUBLE)" +
          " * ln(CAST(cents AS DOUBLE) * CAST(n AS DOUBLE) / CAST(x AS DOUBLE))" +
          " AS DECIMAL(18,9))"))
        .agg(count(lit(1)).cast("long").as("n_nations"),
          sum(col("term")).cast("double").as("theil"))
    },
    Some(
      """WITH x AS (
        |  SELECT n.n_name,
        |    CAST(sum(CAST(round(o.o_totalprice * 100.0) AS BIGINT)) AS BIGINT) AS cents
        |  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        |    JOIN nation n ON c.c_nationkey = n.n_nationkey
        |  GROUP BY n.n_name),
        |tot AS (SELECT CAST(sum(cents) AS BIGINT) AS x, CAST(count(*) AS BIGINT) AS n FROM x),
        |terms AS (
        |  SELECT x.n_name, x.cents,
        |    CAST(CAST(x.cents AS DOUBLE) / CAST(t.x AS DOUBLE)
        |      * ln(CAST(x.cents AS DOUBLE) * CAST(t.n AS DOUBLE) / CAST(t.x AS DOUBLE))
        |      AS DECIMAL(18,9)) AS term
        |  FROM x CROSS JOIN tot t)
        |SELECT CAST(count(*) AS BIGINT) AS n_nations,
        |  CAST(sum(term) AS DOUBLE) AS theil
        |FROM terms""".stripMargin))

  val all: Seq[QueryDef] = Seq(qHilbertCurve, qPointInPolygon, qTheilIndex)
}
