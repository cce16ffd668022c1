package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Fifty-ninth wave — batch incremental view maintenance with
  * retractions.
  *
  * `q_ivm_batch`: maintain a per-priority (count, cents) aggregate
  * under a CDC delta WITHOUT rescanning the base table — inserts add,
  * deletes RETRACT, updates retract the old row and add the new one
  * (the retraction arithmetic `q_stream_ivm`'s insert-only upsert
  * never exercises). The Spark side computes
  * old_agg ⊕ delta-contributions; the ORACLE computes the new
  * aggregate by FULL RECOMPUTE over the mutated snapshot — the hash
  * match IS the proof that incremental maintenance ≡ recompute.
  * Mutations are deterministic (the q_snapshot_diff discipline):
  * orderkey%17=0 deleted, %13=0 repriced (+10.00 exactly), a shifted
  * clone key-space inserted.
  *
  * Scale: the maintained view is |priorities|-sized; the delta
  * contributions aggregate is ONE map-side-combined pass over the
  * CHANGE set — cost tracks the change rate, not the base table.
  */
object R59Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val qIvmBatch = QueryDef("q_ivm_batch",
    (s, dir) => {
      val base = t(s, dir, "orders").select(col("o_orderkey").as("k"),
        col("o_orderpriority").as("pri"),
        expr("CAST(round(o_totalprice * 100.0) AS BIGINT)").as("cents"))
      val oldAgg = base.groupBy("pri")
        .agg(count(lit(1)).cast("long").as("n"), sum(col("cents")).as("c"))
      // CDC delta with retractions: (pri, dn, dcents) contributions
      val deletes = base.where(col("k") % 17 === 0)
        .select(col("pri"), lit(-1L).as("dn"), (-col("cents")).as("dcents"))
      val updates = base.where(col("k") % 13 === 0 && col("k") % 17 =!= 0)
        .select(col("pri"), lit(0L).as("dn"), lit(1000L).as("dcents"))
      val inserts = base.where(col("k") % 19 === 0)
        .select(col("pri"), lit(1L).as("dn"), (col("cents") + 500L).as("dcents"))
      val delta = deletes.unionAll(updates).unionAll(inserts)
        .groupBy("pri").agg(sum(col("dn")).as("dn"), sum(col("dcents")).as("dc"))
      oldAgg.join(delta, Seq("pri"), "left_outer")
        .selectExpr("pri",
          "CAST(n + coalesce(dn, 0) AS BIGINT) AS n_new",
          "CAST(c + coalesce(dc, 0) AS BIGINT) AS cents_new")
        .orderBy("pri")
    },
    Some(
      // FULL RECOMPUTE over the mutated snapshot — incremental must match
      """WITH base AS (SELECT o_orderkey AS k, o_orderpriority AS pri,
        |    CAST(round(o_totalprice * 100.0) AS BIGINT) AS cents
        |  FROM orders),
        |snapshot_b AS (
        |  SELECT k, pri,
        |    CASE WHEN k % 13 = 0 THEN cents + 1000 ELSE cents END AS cents
        |  FROM base WHERE k % 17 <> 0
        |  UNION ALL
        |  SELECT k + 10000000 AS k, pri, cents + 500 AS cents
        |  FROM base WHERE k % 19 = 0)
        |SELECT pri, CAST(count(*) AS BIGINT) AS n_new,
        |  CAST(sum(cents) AS BIGINT) AS cents_new
        |FROM snapshot_b GROUP BY pri ORDER BY pri""".stripMargin))

  val all: Seq[QueryDef] = Seq(qIvmBatch)
}
