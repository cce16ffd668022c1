package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Twenty-sixth wave — warehouse temporal correctness and change capture.
  *
  *  - `q_pit_join`: point-in-time (temporal AS OF) join — every fact row
  *    matches the ONE dimension version whose validity interval contains
  *    the fact timestamp. This is the correctness-critical join of every
  *    SCD2 warehouse (joining on the natural key alone fans out across
  *    versions and double-counts); implemented by composing the
  *    [[graft.operators.AsOfJoin]] operator (one shuffle of |facts|+
  *    |versions|, no pair blowup) with the open-interval validity check.
  *  - `q_snapshot_diff`: CDC-style snapshot diff — two table versions
  *    full-outer-joined on the key and classified into insert / update /
  *    delete rows (the changes-only feed a downstream incremental
  *    consumer wants). The second snapshot is derived deterministically
  *    from the first, so both engines build and diff identical inputs.
  */
object R26Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_pit_join ----------

  /** PIT join: SCD2 versions derive from orders (each order opens a new
    * version of its customer, q_scd2's discipline); facts are events
    * keyed into the same custkey space. AsOfJoin picks the latest
    * version with valid_from ≤ fact ts — exactly the containing
    * interval, since versions tile the timeline per key — and facts
    * before a customer's first version stay version-less (left join
    * semantics; the is_matched flag makes them countable). Output
    * aggregates per version-ordinal so the hash covers the whole
    * match distribution. */
  val qPitJoin = QueryDef("q_pit_join",
    (s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("d_key").orderBy(col("vf"), col("o_orderkey"))
      val dim = t(s, dir, "orders").where(col("o_custkey") <= 200)
        .select(col("o_custkey").as("d_key"), col("o_orderkey"),
          unix_micros(col("o_orderdate").cast("timestamp")).as("vf"))
        .withColumn("version", row_number().over(w))
      val facts = Tables.events(s, dir)
        .select((col("user_id") % 200 + 1).as("f_key"),
          unix_micros(col("ts")).as("f_ts"), col("event_id"))
      graft.operators.AsOfJoin.asOf(facts, dim,
        leftKey = "f_key", rightKey = "d_key",
        leftTime = "f_ts", rightTime = "vf",
        rightTie = "o_orderkey", rightVals = Seq("version"))
        .groupBy(coalesce(col("version"), lit(0)).cast("long").as("version"))
        .agg(count(lit(1)).cast("long").as("n_facts"),
          sum(col("event_id")).as("sum_event_id"))
        .orderBy(col("version"))
    },
    Some(
      """WITH dim AS (
        |  SELECT o_custkey AS d_key, o_orderkey,
        |    epoch_us(o_orderdate) AS vf,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY epoch_us(o_orderdate), o_orderkey)
        |      AS version
        |  FROM orders WHERE o_custkey <= 200
        |), facts AS (
        |  SELECT user_id % 200 + 1 AS f_key, epoch_us(ts) AS f_ts, event_id
        |  FROM events
        |), j AS (
        |  SELECT f.event_id, l.version FROM facts f
        |  LEFT JOIN LATERAL (
        |    SELECT version FROM dim d
        |    WHERE d.d_key = f.f_key AND d.vf <= f.f_ts
        |    ORDER BY d.vf DESC, d.o_orderkey DESC LIMIT 1) l ON TRUE
        |)
        |SELECT CAST(coalesce(version, 0) AS BIGINT) AS version,
        |  CAST(count(*) AS BIGINT) AS n_facts,
        |  CAST(sum(event_id) AS BIGINT) AS sum_event_id
        |FROM j GROUP BY 1 ORDER BY version""".stripMargin))

  // ---------- q_snapshot_diff ----------

  /** CDC snapshot diff. Snapshot B is derived from customer (snapshot
    * A) by three deterministic mutations — custkey%97=0 deleted,
    * custkey%13=0 rebalanced (+100.00 exactly, DECIMAL arithmetic),
    * custkey%89=0 cloned to a shifted key space (inserts) — then
    * A ⟗ B on the key classifies every difference. Only changed rows
    * are emitted (the incremental feed), with old/new balances.
    * At 100 TB both snapshots shuffle once on the key — there is no
    * cheaper exact diff without storage-level change tracking. */
  val qSnapshotDiff = QueryDef("q_snapshot_diff",
    (s, dir) => {
      val d2t = org.apache.spark.sql.types.DecimalType(18, 2)
      val a = t(s, dir, "customer")
        .select(col("c_custkey").as("key"),
          col("c_acctbal").cast(d2t).as("bal"))
      val b = a.where(col("key") % 97 =!= 0)
        .select(col("key"),
          when(col("key") % 13 === 0, col("bal") + lit(100).cast(d2t))
            .otherwise(col("bal")).as("bal"))
        .unionAll(a.where(col("key") % 89 === 0)
          .select((col("key") + 1000000).as("key"), col("bal")))
      a.select(col("key"), col("bal").as("old_bal"))
        .join(b.select(col("key"), col("bal").as("new_bal")),
          Seq("key"), "full_outer")
        .withColumn("op",
          when(col("old_bal").isNull, "insert")
            .when(col("new_bal").isNull, "delete")
            .when(col("old_bal") =!= col("new_bal"), "update"))
        .where(col("op").isNotNull)
        .select(col("op"), col("key"),
          col("old_bal").cast("double").as("old_bal"),
          col("new_bal").cast("double").as("new_bal"))
        .orderBy(col("op"), col("key"))
    },
    Some(
      """WITH a AS (
        |  SELECT c_custkey AS key, CAST(c_acctbal AS DECIMAL(18,2)) AS bal
        |  FROM customer
        |), b AS (
        |  SELECT key,
        |    CASE WHEN key % 13 = 0 THEN bal + CAST(100 AS DECIMAL(18,2))
        |         ELSE bal END AS bal
        |  FROM a WHERE key % 97 <> 0
        |  UNION ALL
        |  SELECT key + 1000000, bal FROM a WHERE key % 89 = 0
        |), d AS (
        |  SELECT coalesce(a.key, b.key) AS key, a.bal AS old_bal,
        |    b.bal AS new_bal,
        |    CASE WHEN a.key IS NULL THEN 'insert'
        |         WHEN b.key IS NULL THEN 'delete'
        |         WHEN a.bal <> b.bal THEN 'update' END AS op
        |  FROM a FULL OUTER JOIN b ON a.key = b.key
        |)
        |SELECT op, key, CAST(old_bal AS DOUBLE) AS old_bal,
        |  CAST(new_bal AS DOUBLE) AS new_bal
        |FROM d WHERE op IS NOT NULL ORDER BY op, key""".stripMargin))

  val all: Seq[QueryDef] = Seq(qPitJoin, qSnapshotDiff)
}
