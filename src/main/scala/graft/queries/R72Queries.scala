package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Seventy-second wave — systems-layer operators: consistent-hashing
  * rebalance and grid DBSCAN.
  *
  *  - `q_consistent_hashing`: ring-hash shard assignment (32 virtual
  *    nodes per shard) and the rebalance audit for growing 4 → 5
  *    shards — per old shard, how many keys move. Positions come from
  *    a shared QUADRATIC integer mixer (x²·C + x·D mod 2³²): a linear
  *    multiply would place every shard's vnodes in one arithmetic
  *    progression (measured: two shards lose everything, two lose
  *    nothing), while the quadratic scatters them so each shard cedes
  *    only its successor gaps — the ~1/(n+1) movement contract that
  *    justifies consistent hashing at all. Successor lookup is a
  *    broadcast of the |shards·vnodes| ring against the key corpus —
  *    keys never shuffle. (Production key widths would move the mixer
  *    to 128-bit arithmetic; the ring logic is unchanged.)
  *  - `q_dbscan_cells`: grid-cell DBSCAN over a deterministic
  *    blob+noise point fixture — cells of 200 milli-degrees, core =
  *    cells holding ≥ 0.5% of the corpus (a DENSITY threshold, so the
  *    fixture's cluster structure is scale-invariant: 5 blobs, one
  *    straddling two cells, uniform noise never promoted). Core-cell
  *    adjacency comes from a 3×3 neighbor-probe equi-join (the
  *    q_geo_join shape — never a theta join), components from the
  *    existing min-label propagation ([[graft.ext.GraphOps]]); the
  *    oracle runs the same contraction as a recursive CTE.
  */
object R72Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_consistent_hashing ----------

  private val Ring = 4294967296L // 2^32

  /** Quadratic ring mixer. The squared term masks to 15 bits first so
    * the product stays inside signed 64-bit at EVERY scale factor
    * (unmasked, key² × 2654435761 overflows once keys exceed ~58,950 —
    * ANSI DuckDB raises while Spark wraps, so the oracle compare would
    * diverge above sf≈0.39); the mask is the identity at all tested
    * sfs, and the low bits keep full dispersion. */
  private def mix(x: Column): Column =
    ((x % 32768L) * (x % 32768L) * 2654435761L + x * 40503L) % Ring

  private def vnodes(s: SparkSession, shards: Int): DataFrame =
    s.range(shards * 32L).select(
      expr("id div 32").as("shard"),
      mix(expr("id div 32") * 1009L + col("id") % 32).as("vpos"))

  /** Clockwise successor assignment: first vnode at or after the key's
    * position, wrapping to the ring minimum. */
  private def assign(keys: DataFrame, vn: DataFrame): DataFrame = {
    val succ = keys.crossJoin(broadcast(vn))
      .where(col("vpos") >= col("pos"))
      .groupBy("k")
      .agg(min(struct(col("vpos"), col("shard"))).as("s"))
      .select(col("k"), col("s.shard").as("succ_shard"))
    val wrap = vn.agg(min(struct(col("vpos"), col("shard"))).as("m"))
      .select(col("m.shard").as("wrap_shard"))
    keys.join(succ, Seq("k"), "left").crossJoin(broadcast(wrap))
      .select(col("k"), coalesce(col("succ_shard"), col("wrap_shard"))
        .as("shard"))
  }

  val qConsistentHashing = QueryDef("q_consistent_hashing",
    (s, dir) => {
      val keys = t(s, dir, "customer")
        .select(col("c_custkey").as("k"), mix(col("c_custkey")).as("pos"))
      val a4 = assign(keys, vnodes(s, 4))
        .select(col("k"), col("shard").as("shard_before"))
      val a5 = assign(keys, vnodes(s, 5))
        .select(col("k"), col("shard").as("shard_after"))
      a4.join(a5, "k")
        .groupBy("shard_before")
        .agg(count(lit(1)).cast("long").as("n_keys"),
          sum(when(col("shard_before") =!= col("shard_after"), 1L)
            .otherwise(0L)).cast("long").as("n_moved"))
        .orderBy("shard_before")
    },
    Some(
      """WITH keys AS (SELECT c_custkey AS k,
        |    ((c_custkey % 32768) * (c_custkey % 32768) * 2654435761 + c_custkey * 40503) % 4294967296 AS pos
        |  FROM customer),
        |vnodes4 AS (
        |  SELECT s.g AS shard, v.g AS vnode,
        |    (((s.g * 1009 + v.g) % 32768) * ((s.g * 1009 + v.g) % 32768) * 2654435761 + (s.g * 1009 + v.g) * 40503) % 4294967296 AS vpos
        |  FROM generate_series(0, 3) s(g), generate_series(0, 31) v(g)),
        |vnodes5 AS (
        |  SELECT s.g AS shard, v.g AS vnode,
        |    (((s.g * 1009 + v.g) % 32768) * ((s.g * 1009 + v.g) % 32768) * 2654435761 + (s.g * 1009 + v.g) * 40503) % 4294967296 AS vpos
        |  FROM generate_series(0, 4) s(g), generate_series(0, 31) v(g)),
        |asg4 AS (
        |  SELECT k.k, coalesce(
        |    (SELECT v.shard FROM vnodes4 v WHERE v.vpos >= k.pos
        |     ORDER BY v.vpos, v.shard LIMIT 1),
        |    (SELECT v.shard FROM vnodes4 v ORDER BY v.vpos, v.shard LIMIT 1)) AS shard
        |  FROM keys k),
        |asg5 AS (
        |  SELECT k.k, coalesce(
        |    (SELECT v.shard FROM vnodes5 v WHERE v.vpos >= k.pos
        |     ORDER BY v.vpos, v.shard LIMIT 1),
        |    (SELECT v.shard FROM vnodes5 v ORDER BY v.vpos, v.shard LIMIT 1)) AS shard
        |  FROM keys k)
        |SELECT a4.shard AS shard_before,
        |  CAST(count(*) AS BIGINT) AS n_keys,
        |  CAST(sum(CASE WHEN a4.shard <> a5.shard THEN 1 ELSE 0 END) AS BIGINT) AS n_moved
        |FROM asg4 a4 JOIN asg5 a5 ON a4.k = a5.k
        |GROUP BY a4.shard ORDER BY a4.shard""".stripMargin))

  // ---------- q_dbscan_cells ----------

  val qDbscanCells = QueryDef("q_dbscan_cells",
    (s, dir) => {
      val pts = Tables.events(s, dir).selectExpr(
        """CASE WHEN event_id % 11 = 0
          |     THEN 40000 + (event_id * 7919) % 2000
          |     ELSE 40000 + (event_id % 5) * 400 + (event_id * 7919) % 120
          |END AS px""".stripMargin,
        """CASE WHEN event_id % 11 = 0
          |     THEN -74000 + (event_id * 104729) % 3000
          |     ELSE -74000 + ((event_id * 3 + 1) % 5) * 500 + (event_id * 104729) % 120
          |END AS py""".stripMargin)
      def floorDiv(a: Column, b: Long): Column =
        ((a - ((a % b) + b) % b) / b).cast("long")
      val cells = pts
        .groupBy(floorDiv(col("px"), 200L).as("cx"),
          floorDiv(col("py"), 200L).as("cy"))
        .agg(count(lit(1)).cast("long").as("n_pts"))
      val tot = pts.agg(count(lit(1)).cast("long").as("n"))
      // dense cells are consumed three times (both probe-join sides +
      // the final label join) — pin the tiny core set so the
      // full-events cell aggregation runs once (r9 lesson)
      val core = Queries.pin(cells.crossJoin(broadcast(tot))
        .where(col("n_pts") * 200 >= col("n"))
        .withColumn("cid", col("cx") * 100000L + col("cy") + 50000L))
      // 3x3 probe equi-join for adjacency (q_geo_join shape)
      val probes = core.select(col("cid").as("a"),
          col("cx"), col("cy"),
          explode(sequence(lit(-1), lit(1))).as("dx"))
        .select(col("a"), (col("cx") + col("dx")).as("ncx"), col("cy"),
          explode(sequence(lit(-1), lit(1))).as("dy"))
        .select(col("a"), col("ncx"), (col("cy") + col("dy")).as("ncy"))
      val edges = probes.join(
          core.select(col("cid").as("b"), col("cx").as("ncx"),
            col("cy").as("ncy")),
          Seq("ncx", "ncy"))
        .select(col("a"), col("b"))
      val labels = graft.ext.GraphOps.connectedComponents(s, edges)
        .select(col("node").as("cid"), col("component").as("cluster"))
      labels.join(core, "cid")
        .groupBy("cluster")
        .agg(count(lit(1)).cast("long").as("n_cells"),
          sum(col("n_pts")).cast("long").as("n_points"),
          min(col("cx")).as("min_cx"), max(col("cx")).as("max_cx"),
          min(col("cy")).as("min_cy"), max(col("cy")).as("max_cy"))
        .orderBy("cluster")
    },
    Some(
      """WITH pts AS (
        |  SELECT event_id,
        |    CASE WHEN event_id % 11 = 0
        |         THEN 40000 + (event_id * 7919) % 2000
        |         ELSE 40000 + (event_id % 5) * 400 + (event_id * 7919) % 120 END AS px,
        |    CASE WHEN event_id % 11 = 0
        |         THEN -74000 + (event_id * 104729) % 3000
        |         ELSE -74000 + ((event_id * 3 + 1) % 5) * 500 + (event_id * 104729) % 120 END AS py
        |  FROM events),
        |tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM pts),
        |cells AS (
        |  SELECT (px - ((px % 200) + 200) % 200) / 200 AS cx,
        |    (py - ((py % 200) + 200) % 200) / 200 AS cy,
        |    CAST(count(*) AS BIGINT) AS n_pts
        |  FROM pts GROUP BY 1, 2),
        |core AS (
        |  SELECT CAST(cx AS BIGINT) AS cx, CAST(cy AS BIGINT) AS cy, n_pts,
        |    CAST(cx * 100000 + cy + 50000 AS BIGINT) AS cid
        |  FROM cells CROSS JOIN tot WHERE n_pts * 200 >= tot.n),
        |edges AS (
        |  SELECT a.cid AS src, b.cid AS dst
        |  FROM core a JOIN core b
        |    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1),
        |labels AS (
        |  WITH RECURSIVE r(cid, lbl) AS (
        |    SELECT cid, cid FROM core
        |    UNION
        |    SELECT e.src, r.lbl
        |    FROM r JOIN edges e ON e.dst = r.cid
        |    WHERE r.lbl < e.src
        |  )
        |  SELECT cid, min(lbl) AS cluster FROM r GROUP BY cid)
        |SELECT l.cluster, CAST(count(*) AS BIGINT) AS n_cells,
        |  CAST(sum(c.n_pts) AS BIGINT) AS n_points,
        |  CAST(min(c.cx) AS BIGINT) AS min_cx, CAST(max(c.cx) AS BIGINT) AS max_cx,
        |  CAST(min(c.cy) AS BIGINT) AS min_cy, CAST(max(c.cy) AS BIGINT) AS max_cy
        |FROM labels l JOIN core c ON l.cid = c.cid
        |GROUP BY l.cluster ORDER BY l.cluster""".stripMargin))

  val all: Seq[QueryDef] = Seq(qConsistentHashing, qDbscanCells)
}
