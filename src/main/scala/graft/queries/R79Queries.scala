package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Seventy-ninth wave — incremental JOIN maintenance, bitemporal
  * reconstruction, and θ-sketch set operations.
  *
  *  - `q_ivm_join`: incremental view maintenance of a row-level JOIN
  *    (orders ⋈ customer) under deterministic mutations on BOTH sides
  *    — the join-delta complement of q_ivm_batch's aggregate
  *    maintenance. Delta rule in remove-then-rederive form:
  *    Q_new = (Q_old ▷ deleted-order-keys ▷ touched-customer-keys)
  *            ∪ (ΔA⁺ ⋈ B_new) ∪ ((A_new ∖ ΔA⁺) ⋈ ΔB⁺), where the
  *    second term carries all new-order pairs and the third re-derives
  *    surviving orders of UPDATED customers (disjoint by construction
  *    — no double count, no missed (ΔA⁺, ΔB⁺) pair). The oracle FULLY
  *    RECOMPUTES the join over the mutated snapshots; the hash match
  *    is the proof that delta maintenance ≡ recompute. Scale: every
  *    delta side is change-rate-sized and BROADCAST into anti/equi
  *    joins against the stored view — maintenance cost tracks Δ, not
  *    the 100 TB base.
  *  - `q_bitemporal`: point-in-time reconstruction over a BITEMPORAL
  *    version log (valid time × transaction time, Snodgrass's two-
  *    dimensional model) — retroactive corrections arrive at later
  *    transaction days and rewrite earlier valid days. AS OF
  *    (tx ≤ 25, valid ≤ 15) keeps, per customer, the latest valid
  *    version among those KNOWN by tx-day 25 — two ordered filters
  *    collapsing to one per-key argmax; corrections visible only past
  *    their tx day. q_scd2 tracks one time axis; auditability at scale
  *    needs both.
  *  - `q_theta_ops`: θ-sketch SET OPERATIONS (union / intersection /
  *    difference estimates — the Apache-DataSketches-style extension
  *    of q_kmv_distinct's single-set KMV): two part-key sets sketch to
  *    their k = 128 minimum mixer-hashes, θ = min(θ_A, θ_B) (universe
  *    when a set undershoots k), every estimate is |sample-space op| ×
  *    U/θ in pure integer arithmetic, and the exact values ride the
  *    same scan for the error report. The whole sketch pipeline is
  *    deterministic (shared quadratic mixer), so BOTH engines build
  *    bit-identical sketches — estimates, not just exacts, are
  *    oracle-hashed. Sketch size is k per set regardless of corpus.
  */
object R79Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_ivm_join ----------

  val qIvmJoin = QueryDef("q_ivm_join",
    (s, dir) => {
      val aOld = t(s, dir, "orders").select(col("o_orderkey").as("k"),
        col("o_custkey").as("ck"),
        expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("cents"))
      val bOld = t(s, dir, "customer").select(col("c_custkey").as("ck"),
        col("c_nationkey").cast("long").as("nat"))
      // deterministic CDC (the q_ivm_batch discipline)
      val delA = aOld.where(col("k") % 17 === 0).select(col("k"))
      val insA = aOld.where(col("k") % 19 === 0)
        .select((col("k") + 10000000L).as("k"), col("ck"),
          (col("cents") + 500L).as("cents"))
      val delB = bOld.where(col("ck") % 23 === 0).select(col("ck"))
      val updB = bOld.where(col("ck") % 11 === 0 && col("ck") % 23 =!= 0)
        .select(col("ck"), ((col("nat") + 1L) % 25L).as("nat"))
      val touchedB = delB.unionAll(updB.select(col("ck")))
      val bNew = bOld.join(broadcast(touchedB), Seq("ck"), "left_anti")
        .unionAll(updB)
      val aNew = aOld.join(broadcast(delA), Seq("k"), "left_anti")
      // stored view stand-in
      val qOld = aOld.join(bOld, "ck")
        .select(col("k"), col("ck"), col("cents"), col("nat"))
      // remove-then-rederive
      val kept = qOld
        .join(broadcast(delA), Seq("k"), "left_anti")
        .join(broadcast(touchedB), Seq("ck"), "left_anti")
        // USING joins float the key column to the front — re-project
        // before the positional unionAll
        .select(col("k"), col("ck"), col("cents"), col("nat"))
      val fromInsA = insA.join(bNew, "ck")
        .select(col("k"), col("ck"), col("cents"), col("nat"))
      val fromUpdB = aNew.join(broadcast(updB), "ck")
        .select(col("k"), col("ck"), col("cents"), col("nat"))
      kept.unionAll(fromInsA).unionAll(fromUpdB)
        .orderBy("k")
    },
    Some(
      """WITH a_old AS (
        |  SELECT o_orderkey AS k, o_custkey AS ck,
        |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        |  FROM orders),
        |b_old AS (
        |  SELECT c_custkey AS ck, CAST(c_nationkey AS BIGINT) AS nat FROM customer),
        |a_new AS (
        |  SELECT k, ck, cents FROM a_old WHERE k % 17 <> 0
        |  UNION ALL
        |  SELECT k + 10000000, ck, cents + 500 FROM a_old WHERE k % 19 = 0),
        |b_new AS (
        |  SELECT ck, nat FROM b_old WHERE ck % 23 <> 0 AND ck % 11 <> 0
        |  UNION ALL
        |  SELECT ck, (nat + 1) % 25 FROM b_old WHERE ck % 11 = 0 AND ck % 23 <> 0)
        |SELECT a.k, a.ck, a.cents, b.nat
        |FROM a_new a JOIN b_new b ON a.ck = b.ck
        |ORDER BY a.k""".stripMargin))

  // ---------- q_bitemporal ----------

  /** Version log shared by both engines: v1 known at tx-day 0 valid
    * from day 0; ck≡0 (mod 7) corrected at tx-day 20 retroactively
    * valid from day 10; ck≡0 (mod 5) revised at tx-day 40 valid from
    * day 30. AS OF tx 25, valid 15. */
  private val asOfTx = 25L
  private val asOfValid = 15L

  val qBitemporal = QueryDef("q_bitemporal",
    (s, dir) => {
      val base = t(s, dir, "customer").select(col("c_custkey").as("ck"),
        expr("CAST(round(c_acctbal * 100.0) AS BIGINT)").as("bal"))
      val v1 = base.select(col("ck"), lit(0L).as("tx_day"),
        lit(0L).as("valid_day"), col("bal"))
      val v2 = base.where(col("ck") % 7 === 0)
        .select(col("ck"), lit(20L).as("tx_day"), lit(10L).as("valid_day"),
          (col("bal") + 1000L).as("bal"))
      val v3 = base.where(col("ck") % 5 === 0)
        .select(col("ck"), lit(40L).as("tx_day"), lit(30L).as("valid_day"),
          (col("bal") + 2000L).as("bal"))
      val log = v1.unionAll(v2).unionAll(v3)
      val w = Window.partitionBy("ck")
        .orderBy(col("valid_day").desc, col("tx_day").desc)
      log.where(col("tx_day") <= asOfTx && col("valid_day") <= asOfValid)
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("ck"), col("valid_day"), col("tx_day"), col("bal"))
        .orderBy("ck")
    },
    Some(
      s"""WITH base AS (
         |  SELECT c_custkey AS ck, CAST(round(c_acctbal * 100.0) AS BIGINT) AS bal
         |  FROM customer),
         |log AS (
         |  SELECT ck, CAST(0 AS BIGINT) AS tx_day, CAST(0 AS BIGINT) AS valid_day, bal FROM base
         |  UNION ALL
         |  SELECT ck, 20, 10, bal + 1000 FROM base WHERE ck % 7 = 0
         |  UNION ALL
         |  SELECT ck, 40, 30, bal + 2000 FROM base WHERE ck % 5 = 0),
         |visible AS (
         |  SELECT ck, valid_day, tx_day, bal,
         |    row_number() OVER (PARTITION BY ck
         |      ORDER BY valid_day DESC, tx_day DESC) AS rn
         |  FROM log WHERE tx_day <= $asOfTx AND valid_day <= $asOfValid)
         |SELECT ck, valid_day, tx_day, bal FROM visible WHERE rn = 1
         |ORDER BY ck""".stripMargin))

  // ---------- q_theta_ops ----------

  private val thetaK = 128
  private val universe = 4294967296L

  /** The q_kmv_distinct quadratic mixer, reused verbatim — the squared
    * term masks to 15 bits so the product never leaves signed 64-bit
    * at any scale factor (identity at all tested sfs). */
  private val mixSql =
    "((l_partkey % 32768) * (l_partkey % 32768) * 2654435761 + l_partkey * 40503) % 4294967296"

  val qThetaOps = QueryDef("q_theta_ops",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      def side(name: String, pred: String): DataFrame =
        li.where(expr(pred))
          .select(col("l_partkey").as("pk"), expr(mixSql).as("h"))
          .distinct()
          .withColumn("side", lit(name))
      val a = side("a", "l_returnflag = 'R'")
      val b = side("b", "l_linenumber % 2 = 0")
      val ab = a.unionAll(b)
      // r7: per-side k-minima via the bounded-heap TopKPerKey operator
      // (k smallest = k largest of −h) instead of a per-side
      // row_number window that fully sorts each side's sample space;
      // the 128th-smallest VALUE is tie-deterministic either way
      val kept = graft.plans.TopKPerKey.topKPerKey(
        ab.withColumn("negh", -col("h")), Seq("side"), "negh", thetaK)
      val thetas = kept
        .groupBy("side")
        .agg(coalesce(when(count(lit(1)) === thetaK.toLong, max(col("h"))),
          lit(universe)).as("th"))
        .agg(min(col("th")).cast("long").as("theta"))
      // sample spaces under the shared θ
      val samp = ab.crossJoin(broadcast(thetas)).where(col("h") < col("theta"))
      val flags = samp.groupBy("pk", "theta")
        .agg(max(when(col("side") === "a", 1L).otherwise(0L)).as("ia"),
          max(when(col("side") === "b", 1L).otherwise(0L)).as("ib"))
      val exact = a.select(col("pk"), lit(1L).as("ia"), lit(0L).as("ib"))
        .unionAll(b.select(col("pk"), lit(0L).as("ia"), lit(1L).as("ib")))
        .groupBy("pk").agg(max(col("ia")).as("ia"), max(col("ib")).as("ib"))
      def scaled(cnt: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
        ((cnt * universe - (cnt * universe) % col("theta")) / col("theta"))
          .cast("long")
      val ests = flags.groupBy("theta")
        .agg(count(lit(1)).as("su"),
          sum(col("ia") * col("ib")).as("si"),
          sum(col("ia") * (lit(1L) - col("ib"))).as("sd"))
        .select(col("theta"), scaled(col("su")).as("est_union"),
          scaled(col("si")).as("est_intersect"), scaled(col("sd")).as("est_diff"))
      val exacts = exact.agg(count(lit(1)).cast("long").as("ex_union"),
        sum(col("ia") * col("ib")).cast("long").as("ex_intersect"),
        sum(col("ia") * (lit(1L) - col("ib"))).cast("long").as("ex_diff"))
      ests.crossJoin(broadcast(exacts))
        .select(col("theta"),
          col("ex_union"), col("est_union"),
          col("ex_intersect"), col("est_intersect"),
          col("ex_diff"), col("est_diff"))
    },
    Some(
      s"""WITH a AS (
         |  SELECT DISTINCT l_partkey AS pk, $mixSql AS h
         |  FROM lineitem WHERE l_returnflag = 'R'),
         |b AS (
         |  SELECT DISTINCT l_partkey AS pk, $mixSql AS h
         |  FROM lineitem WHERE l_linenumber % 2 = 0),
         |ab AS (
         |  SELECT pk, h, 'a' AS side FROM a
         |  UNION ALL SELECT pk, h, 'b' FROM b),
         |ranked AS (
         |  SELECT side, h, row_number() OVER (PARTITION BY side ORDER BY h) AS rk
         |  FROM ab),
         |ths AS (
         |  SELECT side, coalesce(max(CASE WHEN rk = $thetaK THEN h END), $universe) AS th
         |  FROM ranked GROUP BY side),
         |theta AS (SELECT CAST(min(th) AS BIGINT) AS theta FROM ths),
         |samp AS (
         |  SELECT pk, theta,
         |    CAST(max(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ia,
         |    CAST(max(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS ib
         |  FROM ab CROSS JOIN theta WHERE h < theta GROUP BY pk, theta),
         |ests AS (
         |  SELECT theta,
         |    CAST((count(*) * $universe - (count(*) * $universe) % theta) / theta AS BIGINT) AS est_union,
         |    CAST((sum(ia * ib) * $universe - (sum(ia * ib) * $universe) % theta) / theta AS BIGINT) AS est_intersect,
         |    CAST((sum(ia * (1 - ib)) * $universe - (sum(ia * (1 - ib)) * $universe) % theta) / theta AS BIGINT) AS est_diff
         |  FROM samp GROUP BY theta),
         |exact AS (
         |  SELECT pk,
         |    CAST(max(CASE WHEN side = 'a' THEN 1 ELSE 0 END) AS BIGINT) AS ia,
         |    CAST(max(CASE WHEN side = 'b' THEN 1 ELSE 0 END) AS BIGINT) AS ib
         |  FROM ab GROUP BY pk),
         |exacts AS (
         |  SELECT CAST(count(*) AS BIGINT) AS ex_union,
         |    CAST(sum(ia * ib) AS BIGINT) AS ex_intersect,
         |    CAST(sum(ia * (1 - ib)) AS BIGINT) AS ex_diff
         |  FROM exact)
         |SELECT CAST(theta AS BIGINT) AS theta, ex_union, est_union,
         |  ex_intersect, est_intersect, ex_diff, est_diff
         |FROM ests CROSS JOIN exacts""".stripMargin))

  val all: Seq[QueryDef] = Seq(qIvmJoin, qBitemporal, qThetaOps)
}
