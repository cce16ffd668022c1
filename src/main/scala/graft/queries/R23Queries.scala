package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Twenty-third wave — physical co-location, distributed clustering, and
  * single-pass observability.
  *
  *  - `q_bucketed_join`: Hive-style bucketed tables + shuffle-FREE
  *    sort-merge join — the co-location primitive that amortizes a big
  *    join's shuffle across every downstream query (write once bucketed,
  *    join forever without an Exchange). The reference re-reads its
  *    `raw.indexing` table on every depth iteration
  *    (web_spider_oo.py:97-133) — bucketing is what makes that re-join
  *    cheap at 100 TB.
  *  - `q_kmeans`: distributed Lloyd's k-means over the embeddings table —
  *    full-corpus assignment (no sampled codebook, unlike IVF training),
  *    centroid state is model-sized (k×dims rows, broadcast each round),
  *    and every number is integer-exact so two independent engines
  *    converge to bit-identical clusters.
  *  - `q_kmeans_sample`: cluster-balanced corpus sampling — the
  *    semantic-diversity quota sampler (equal take per k-means cluster,
  *    deterministic md5 priority) used to de-bias training mixes.
  *  - `q_observe`: the `Dataset.observe` API — input-vs-output
  *    accounting metrics collected DURING the main pass (no second scan
  *    of the corpus; at 100 TB a separate counting query doubles cost).
  */
object R23Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def d2(c: Column): Column = c.cast(DecimalType(18, 2))

  // ---------- q_bucketed_join ----------

  /** Bucketed-table join: both sides written `bucketBy(8, key)` +
    * `sortBy(key)`, so the sort-merge join reads pre-partitioned,
    * pre-sorted buckets and needs NO Exchange and NO Sort on either side
    * (BucketedJoinSpec pins the plan). This is the 100 TB design: the
    * one-time bucketed write pays the shuffle ONCE; every later join on
    * the bucket key — the reference's per-depth `indexing` re-joins —
    * is then a local merge. Output is the per-segment open-order
    * revenue rollup (decimal-exact, ORDER BY-pinned). */
  val qBucketedJoin = QueryDef("q_bucketed_join",
    (s, dir) => {
      graft.core.Bucketing.writeBucketed(
        t(s, dir, "orders").select(col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice")),
        "graft_bkt_orders", "o_custkey", 8)
      graft.core.Bucketing.writeBucketed(
        t(s, dir, "customer").select(col("c_custkey"), col("c_mktsegment")),
        "graft_bkt_customer", "c_custkey", 8)
      s.table("graft_bkt_orders").where(col("o_orderstatus") === "O")
        .join(s.table("graft_bkt_customer"),
          col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
          sum(d2(col("o_totalprice"))).cast("double").as("revenue"))
        .orderBy(col("c_mktsegment"))
    },
    Some(
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_orders,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |WHERE o_orderstatus = 'O'
        |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin))

  // ---------- q_kmeans ----------

  /** k-means parameters shared by the query pair and the oracle
    * generator; algorithm + exactness rationale in
    * [[graft.ext.ClusterOps]]. */
  private val kmK = 4          // clusters (seeds = vec_id 0..3)
  private val kmRounds = 3     // fixed Lloyd's rounds — hash-checkable
  private val kmDim = 64

  /** Distributed exact k-means over the full embeddings corpus
    * ([[graft.ext.ClusterOps.kmeans]]): integer-lattice quantization
    * makes every sum order-independent and the floor-division centroid
    * update keeps both engines bit-identical round after round.
    * Output: per-cluster size, membership checksum, centroid norm. */
  val qKmeans = QueryDef("q_kmeans",
    (s, dir) => {
      val (assign, cent) = graft.ext.ClusterOps.kmeans(
        graft.ext.ClusterOps.quantize(t(s, dir, "embeddings")),
        kmK, kmRounds)
      val sizes = assign.groupBy(col("cluster"))
        .agg(count(lit(1)).as("n_points"),
          sum(col("vec_id")).as("sum_vec_id"))
      val norms = cent.groupBy(col("cluster"))
        .agg(sum(col("m") * col("m")).as("centroid_sqnorm"))
      sizes.join(norms, "cluster").orderBy(col("cluster"))
    },
    Some(kmeansOracleSql(kmK, kmRounds, kmDim)))

  /** DuckDB twin: the same fixed rounds unrolled as CTEs over the same
    * long-form lattice (list indexing + range(1,dim+1) replaces
    * posexplode). Every value is BIGINT, so the two engines cannot
    * diverge. */
  private def kmeansOracleSql(k: Int, rounds: Int, dim: Int): String = {
    val sb = new StringBuilder
    sb.append(
      s"""WITH pts AS (
         |  SELECT vec_id, i - 1 AS d,
         |    CAST(floor(CAST(embedding[i] AS DOUBLE) * 1000000) AS BIGINT) AS v
         |  FROM embeddings, range(1, ${dim + 1}) t(i)
         |), c0 AS (
         |  SELECT vec_id AS cluster, d, v AS m FROM pts WHERE vec_id < $k
         |)""".stripMargin)
    for (r <- 1 to rounds) {
      val prev = s"c${r - 1}"
      sb.append(
        s""", dist$r AS (
           |  SELECT p.vec_id, c.cluster,
           |    sum((p.v - c.m) * (p.v - c.m)) AS dd
           |  FROM pts p JOIN $prev c ON p.d = c.d
           |  GROUP BY p.vec_id, c.cluster
           |), a$r AS (
           |  SELECT vec_id, cluster FROM (
           |    SELECT vec_id, cluster,
           |      row_number() OVER (PARTITION BY vec_id
           |                         ORDER BY dd, cluster) AS rk
           |    FROM dist$r) WHERE rk = 1
           |), c$r AS (
           |  SELECT a.cluster, p.d,
           |    (sum(p.v) - ((sum(p.v) % count(*)) + count(*)) % count(*))
           |      / count(*) AS m
           |  FROM pts p JOIN a$r a ON p.vec_id = a.vec_id
           |  GROUP BY a.cluster, p.d
           |)""".stripMargin)
    }
    sb.append(
      s"""
         |SELECT s.cluster, s.n_points, s.sum_vec_id, n.centroid_sqnorm
         |FROM (SELECT cluster, CAST(count(*) AS BIGINT) AS n_points,
         |        CAST(sum(vec_id) AS BIGINT) AS sum_vec_id
         |      FROM a$rounds GROUP BY cluster) s
         |JOIN (SELECT cluster, CAST(sum(m * m) AS BIGINT) AS centroid_sqnorm
         |      FROM c$rounds GROUP BY cluster) n
         |  ON s.cluster = n.cluster
         |ORDER BY s.cluster""".stripMargin)
    sb.toString
  }

  // ---------- q_kmeans_sample ----------

  /** Cluster-balanced sampling: run the same exact k-means, then take a
    * deterministic quota (10 docs) per cluster by md5 priority — the
    * semantic-diversity sampler that keeps a training mix from
    * collapsing onto the dominant cluster. Reruns reproduce the corpus
    * byte-for-byte (hash priority, not rand()). The quota window runs
    * over cluster-partitioned data — at 100 TB each partition streams
    * one cluster, never the corpus. */
  val qKmeansSample = QueryDef("q_kmeans_sample",
    (s, dir) => {
      val emb = t(s, dir, "embeddings")
      val (assign, _) = graft.ext.ClusterOps.kmeans(
        graft.ext.ClusterOps.quantize(emb), kmK, kmRounds)
      assign
        .withColumn("pri", md5(concat(lit("kmsamp:"),
          col("vec_id").cast("string"))))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("cluster")).orderBy(col("pri"), col("vec_id"))))
        .where(col("rk") <= 10)
        .join(emb.select(col("vec_id"), col("label")), "vec_id")
        .select(col("cluster"), col("vec_id"), col("label"))
        .orderBy(col("cluster"), col("vec_id"))
    },
    Some {
      val base = kmeansOracleSql(kmK, kmRounds, kmDim)
      // reuse the unrolled CTE chain; swap the final SELECT for the
      // quota-sample projection
      val cut = base.lastIndexOf("\nSELECT s.cluster")
      base.substring(0, cut) +
        s"""
           |SELECT a.cluster, a.vec_id, e.label FROM (
           |  SELECT cluster, vec_id,
           |    row_number() OVER (PARTITION BY cluster
           |      ORDER BY md5('kmsamp:' || CAST(vec_id AS VARCHAR)),
           |               vec_id) AS rk
           |  FROM a$kmRounds) a
           |JOIN embeddings e ON a.vec_id = e.vec_id
           |WHERE a.rk <= 10
           |ORDER BY a.cluster, a.vec_id""".stripMargin
    })

  // ---------- q_observe ----------

  /** `Dataset.observe`: input-vs-output accounting collected during the
    * ONE pass over the data — the observation node sits below the
    * filter, so pre-filter row/quantity totals and the post-filter
    * survivor count come out of the same scan. At 100 TB the
    * alternative — a separate COUNT query — doubles the read. The
    * observed metrics are exact (count/DECIMAL sum, not sampled), and
    * the oracle recomputes them relationally. */
  val qObserve = QueryDef("q_observe",
    (s, dir) => {
      import s.implicits._
      val obs = org.apache.spark.sql.Observation()
      val filtered = t(s, dir, "lineitem")
        .observe(obs, count(lit(1)).as("in_rows"),
          sum(d2(col("l_quantity"))).cast("double").as("in_qty"))
        .where(col("l_quantity") > 25)
      val outRows = filtered.count() // the one action; populates obs
      val m = obs.get
      Seq((m("in_rows").asInstanceOf[Long],
        m("in_qty").asInstanceOf[Double], outRows))
        .toDF("in_rows", "in_qty", "out_rows")
    },
    Some(
      """SELECT CAST(count(*) AS BIGINT) AS in_rows,
        |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS in_qty,
        |  CAST(count(*) FILTER (WHERE l_quantity > 25) AS BIGINT) AS out_rows
        |FROM lineitem""".stripMargin))

  val all: Seq[QueryDef] =
    Seq(qBucketedJoin, qKmeans, qKmeansSample, qObserve)
}
