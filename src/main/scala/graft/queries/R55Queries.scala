package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Fifty-fifth wave — geospatial primitives and drawdown.
  *
  *  - `q_geohash`: geohash cell encoding (the standard base32
  *    lon-first bit interleave, precision 5) from integer bit
  *    arithmetic — the spatial twin of q_zorder's Morton keys; the
  *    interleave expression is GENERATED from one Scala loop for both
  *    engines, so the bits are identical by construction. Deterministic
  *    synthetic coordinates ride integer arithmetic on event ids.
  *  - `q_geo_join`: proximity self-join (pairs within 10 km) — each
  *    point buckets into a 0.1° integer grid cell and probes a 3×5
  *    neighborhood (±1 lat, ±2 lon, emitted map-side), candidates
  *    verify with the haversine distance; round(3) km absorbs libm trig
  *    divergence and the threshold compares the ROUNDED value on both
  *    engines. The lon probe is ±2 because at the fixture latitudes
  *    (40-42°N) one 0.1° lon cell is only ~8.3 km, so a true ≤10 km
  *    pair can span up to ~0.121° ≈ 2 cells of longitude (10 km of
  *    latitude is ~0.09° < 1 cell everywhere, so ±1 suffices there).
  *    The standard scale shape: bucket equi-join, never all-pairs; the
  *    neighbor fanout is a constant 15.
  *  - `q_drawdown`: maximum drawdown of the daily revenue curve —
  *    running peak minus running value, all integer cents on the
  *    &#124;days&#124;-sized aggregate; the classic risk statistic.
  */
object R55Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Deterministic city-scale coordinates from event ids (exact
    * integer arithmetic — both engines compute identical doubles):
    * lat ∈ [40, 42), lon ∈ [-74, -71). */
  private val coordSql: String =
    """40.0 + CAST((event_id * 7919) % 2000 AS DOUBLE) / 1000.0 AS lat,
      |  -74.0 + CAST((event_id * 104729) % 3000 AS DOUBLE) / 1000.0 AS lon""".stripMargin

  // ---------- q_geohash ----------

  /** Geohash-5 (25 bits, lon first): generated interleave over integer
    * cell indices ilat (12 bits) / ilon (13 bits). */
  private val interleaveSql: String = {
    // bit k of z (msb k=24): even positions (from msb) take lon bits
    // 12..0, odd take lat bits 11..0
    val terms = (0 until 25).map { pos =>
      val fromMsb = 24 - pos
      val src = if (fromMsb % 2 == 0) "ilon" else "ilat"
      val bit = if (fromMsb % 2 == 0) 12 - fromMsb / 2 else 11 - fromMsb / 2
      s"((($src >> $bit) & 1) << $pos)"
    }
    terms.mkString(" + ")
  }

  private val Base32 = "0123456789bcdefghjkmnpqrstuvwxyz"

  /** base32 chars from the 25-bit z, 5 bits per char. */
  private val geohashSql: String = (4 to 0 by -1).map { c =>
    s"substr('$Base32', 1 + ((z >> ${c * 5}) & 31), 1)"
  }.mkString(" || ")

  val qGeohash = QueryDef("q_geohash",
    (s, dir) => {
      val pts = t(s, dir, "events").where(col("event_id") < 3000)
        .selectExpr(Seq("event_id") ++ coordSql.split(",\n").toSeq: _*)
      pts.selectExpr("event_id",
          "CAST(floor((lat + 90.0) / 180.0 * 4096.0) AS BIGINT) AS ilat",
          "CAST(floor((lon + 180.0) / 360.0 * 8192.0) AS BIGINT) AS ilon")
        .selectExpr("event_id", s"CAST($interleaveSql AS BIGINT) AS z")
        .selectExpr("event_id", s"$geohashSql AS geohash")
        .groupBy("geohash")
        .agg(count(lit(1)).cast("long").as("n"),
          min(col("event_id")).as("min_id"), max(col("event_id")).as("max_id"))
        .orderBy("geohash")
    },
    Some(
      s"""WITH pts AS (SELECT event_id, $coordSql
         |             FROM events WHERE event_id < 3000),
         |cells AS (SELECT event_id,
         |    CAST(floor((lat + 90.0) / 180.0 * 4096.0) AS BIGINT) AS ilat,
         |    CAST(floor((lon + 180.0) / 360.0 * 8192.0) AS BIGINT) AS ilon
         |  FROM pts),
         |zs AS (SELECT event_id, CAST($interleaveSql AS BIGINT) AS z FROM cells),
         |gh AS (SELECT event_id, $geohashSql AS geohash FROM zs)
         |SELECT geohash, CAST(count(*) AS BIGINT) AS n,
         |  min(event_id) AS min_id, max(event_id) AS max_id
         |FROM gh GROUP BY geohash ORDER BY geohash""".stripMargin))

  // ---------- q_geo_join ----------

  /** Haversine km over (lat1, lon1, lat2, lon2) — verbatim-shared;
    * round(3) absorbs trig divergence. */
  private val haversineSql: String =
    """round(6371.0088 * 2.0 * asin(sqrt(
      |    pow(sin(radians(lat2 - lat1) / 2.0), 2)
      |    + cos(radians(lat1)) * cos(radians(lat2))
      |      * pow(sin(radians(lon2 - lon1) / 2.0), 2))), 3)""".stripMargin

  val qGeoJoin = QueryDef("q_geo_join",
    (s, dir) => {
      val pts = t(s, dir, "events").where(col("event_id") < 1500)
        .selectExpr(Seq("event_id") ++ coordSql.split(",\n").toSeq: _*)
        .selectExpr("event_id", "lat", "lon",
          "CAST(floor(lat * 10.0) AS BIGINT) AS cx",
          "CAST(floor(lon * 10.0) AS BIGINT) AS cy")
      val probes = pts.selectExpr("event_id AS a", "lat AS lat1", "lon AS lon1",
          "explode(array(-1, 0, 1)) AS dx", "cx", "cy")
        .selectExpr("a", "lat1", "lon1", "cx + dx AS px", "cy")
        .selectExpr("a", "lat1", "lon1", "px",
          "explode(array(-2, -1, 0, 1, 2)) AS dy", "cy")
        .selectExpr("a", "lat1", "lon1", "px", "cy + dy AS py")
      val cands = probes.join(
          pts.selectExpr("event_id AS b", "lat AS lat2", "lon AS lon2",
            "cx AS px", "cy AS py"),
          Seq("px", "py"))
        .where(col("a") < col("b"))
      cands.withColumn("km", expr(haversineSql))
        .where(col("km") <= 10.0)
        .select("a", "b", "km").distinct()
        .orderBy("a", "b")
    },
    Some(
      s"""WITH pts AS (SELECT event_id, $coordSql
         |             FROM events WHERE event_id < 1500),
         |cells AS (SELECT event_id, lat, lon,
         |    CAST(floor(lat * 10.0) AS BIGINT) AS cx,
         |    CAST(floor(lon * 10.0) AS BIGINT) AS cy
         |  FROM pts),
         |probes AS (SELECT event_id AS a, lat AS lat1, lon AS lon1,
         |    cx + dx.g AS px, cy + dy.g AS py
         |  FROM cells, generate_series(-1, 1) dx(g), generate_series(-2, 2) dy(g)),
         |cands AS (SELECT a, lat1, lon1, c.event_id AS b,
         |    c.lat AS lat2, c.lon AS lon2
         |  FROM probes JOIN cells c ON c.cx = px AND c.cy = py
         |  WHERE a < c.event_id),
         |scored AS (SELECT a, b, $haversineSql AS km FROM cands)
         |SELECT DISTINCT a, b, km FROM scored WHERE km <= 10.0
         |ORDER BY a, b""".stripMargin))

  // ---------- q_drawdown ----------

  val qDrawdown = QueryDef("q_drawdown",
    // r15: day-keyed global windows route distributed (CALENDAR
    // whitelist retirement)
    (s, dir) => RewriteGlobalRankWindows.force {
      val daily = Tables.events(s, dir)
        .select(to_date(col("ts")).as("day"),
          expr("CAST(round(value * 100.0) AS BIGINT)").as("cents"))
        .groupBy("day").agg(sum(col("cents")).as("x"))
      val wAsc = Window.orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
      val c = daily
        .withColumn("cum", sum(col("x")).over(wAsc))
        .withColumn("peak", max(col("cum")).over(wAsc))
        .withColumn("dd", col("peak") - col("cum"))
      c.agg(max(col("dd")).as("max_dd"),
          max(col("peak")).as("peak_cents"),
          count(lit(1)).cast("long").as("n_days"))
        .selectExpr("CAST(max_dd AS BIGINT) AS max_dd_cents",
          "CAST(peak_cents AS BIGINT) AS peak_cents", "n_days")
    },
    Some(
      """WITH daily AS (SELECT CAST(ts AS DATE) AS day,
        |    CAST(sum(CAST(round(value * 100.0) AS BIGINT)) AS BIGINT) AS x
        |  FROM events GROUP BY 1),
        |c AS (SELECT day, x,
        |    CAST(sum(x) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
        |  FROM daily),
        |p AS (SELECT day, cum,
        |    CAST(max(cum) OVER (ORDER BY day
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak
        |  FROM c)
        |SELECT CAST(max(peak - cum) AS BIGINT) AS max_dd_cents,
        |  CAST(max(peak) AS BIGINT) AS peak_cents,
        |  CAST(count(*) AS BIGINT) AS n_days
        |FROM p""".stripMargin))

  val all: Seq[QueryDef] = Seq(qGeohash, qGeoJoin, qDrawdown)
}
