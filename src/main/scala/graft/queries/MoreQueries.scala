package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Tables
import graft.operators.{AsOfJoin, SkewOps}
import graft.queries.Queries.QueryDef

/** Second wave of operator coverage: as-of join, skew-salted join, range
  * join, grouping sets, the ANSI SQL entry point, percentiles, sketches.
  */
object MoreQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  private def d2(c: org.apache.spark.sql.Column) = c.cast(DecimalType(18, 2))

  /** As-of join: each event enriched with the latest order of the same
    * customer at event time (union+window single-shuffle form). */
  val qAsofJoin = QueryDef("q_asof_join",
    (s, dir) => {
      val e = Tables.events(s, dir).select("event_id", "user_id", "ts")
      val o = t(s, dir, "orders").select("o_custkey", "o_orderdate", "o_orderkey")
      AsOfJoin.asOf(e, o, leftKey = "user_id", rightKey = "o_custkey",
        leftTime = "ts", rightTime = "o_orderdate",
        rightTie = "o_orderkey", rightVals = Seq("o_orderkey", "o_orderdate"))
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

  /** Skew-salted equi-join — result must equal the plain join (the salt is
    * purely physical). Heavy-key-only form: keys at the per-order
    * lineitem-count maximum (7) are salted, the rest take the plain-join
    * branch with no fan-out — both code paths execute on TPC-H data. */
  val qSaltedJoin = QueryDef("q_salted_join",
    (s, dir) => SkewOps.saltedInnerJoinSkewOnly(
      t(s, dir, "lineitem"), t(s, dir, "orders"),
      "l_orderkey", "o_orderkey", saltFactor = 8, heavyThreshold = 7)
      .groupBy("o_orderstatus")
      .agg(count(lit(1)).cast("long").as("n"),
        sum(d2(col("l_extendedprice")) * (lit(1) - d2(col("l_discount"))))
          .cast("double").as("revenue"))
      .orderBy("o_orderstatus"),
    Some(
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus ORDER BY o_orderstatus""".stripMargin))

  /** Range (theta) join: events bucketed by value ranges — broadcast
    * nested-loop against a tiny ranges dim. */
  val qRangeJoin = QueryDef("q_range_join",
    (s, dir) => {
      import s.implicits._
      val ranges = Seq((0, 50), (50, 100), (100, 200), (200, 300), (300, 500))
        .toDF("lo", "hi")
      t(s, dir, "events")
        .join(broadcast(ranges), col("value") >= col("lo") && col("value") < col("hi"))
        .groupBy("lo", "hi")
        .agg(count(lit(1)).cast("long").as("n"),
          sum(d2(col("value"))).cast("double").as("total_value"))
        .orderBy("lo")
    },
    Some(
      """SELECT lo, hi, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS total_value
        |FROM events JOIN (VALUES (0, 50), (50, 100), (100, 200), (200, 300), (300, 500)) r(lo, hi)
        |  ON value >= lo AND value < hi
        |GROUP BY lo, hi ORDER BY lo""".stripMargin))

  /** Explicit GROUPING SETS through the ANSI SQL surface (spark.sql). */
  val qGroupingSets = QueryDef("q_grouping_sets",
    (s, dir) => {
      t(s, dir, "orders").createOrReplaceTempView("orders")
      s.sql(
        """SELECT coalesce(o_orderstatus, 'ALL') AS status,
          |       coalesce(o_orderpriority, 'ALL') AS priority,
          |       CAST(count(*) AS BIGINT) AS n
          |FROM orders
          |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
          |ORDER BY status, priority""".stripMargin)
    },
    Some(
      """SELECT coalesce(o_orderstatus, 'ALL') AS status,
        |       coalesce(o_orderpriority, 'ALL') AS priority,
        |       CAST(count(*) AS BIGINT) AS n
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus, o_orderpriority), (o_orderstatus), ())
        |ORDER BY status, priority""".stripMargin))

  /** TPC-H Q3 shape through spark.sql — the full ANSI SQL entry point over
    * registered views (same text runs on both engines). */
  private val q3Sql =
    """SELECT l_orderkey,
      | CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
      | o_orderdate, o_orderpriority
      |FROM customer JOIN orders ON c_custkey = o_custkey
      | JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-03-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin

  val qSqlQ3 = QueryDef("q_sql_tpch_q3",
    (s, dir) => {
      Seq("customer", "orders", "lineitem")
        .foreach(n => t(s, dir, n).createOrReplaceTempView(n))
      s.sql(q3Sql)
    },
    Some(q3Sql))

  /** Exact interpolated percentiles (Spark `percentile` == DuckDB
    * `quantile_cont`). */
  val qPercentiles = QueryDef("q_percentiles",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("percentile(l_quantity, 0.5)").as("p50"),
        expr("percentile(l_quantity, 0.9)").as("p90"),
        expr("percentile(l_extendedprice, 0.25)").as("price_p25"))
      .orderBy("l_returnflag"),
    Some(
      """SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS p50,
        | quantile_cont(l_quantity, 0.9) AS p90,
        | quantile_cont(l_extendedprice, 0.25) AS price_p25
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Sketch aggregates: HLL approx-distinct next to the exact count.
    * Rows-only (sketch estimates are engine-specific by design). */
  val qApproxDistinct = QueryDef("q_approx_distinct",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
        countDistinct(col("l_partkey")).as("exact_parts"))
      .orderBy("l_returnflag"),
    None)

  /** Embedding near-dup search: most-similar pairs (bounded all-pairs
    * verification form; the unbounded scale path is sign-LSH bucketing,
    * q_ann_lsh / SimilarityOps.annLshTopK). */
  val qEmbeddingPairs = QueryDef("q_embedding_pairs",
    (s, dir) => {
      val e = t(s, dir, "embeddings").where(col("vec_id") < 100)
      val a = e.select(col("vec_id").as("a"), col("embedding").as("ea"))
      val b = e.select(col("vec_id").as("b"), col("embedding").as("eb"))
      a.crossJoin(b).where(col("a") < col("b"))
        .select(col("a"), col("b"),
          round(graft.ext.SimilarityOps.cosine(col("ea"), col("eb")), 4)
            .as("cos_sim"))
        .orderBy(col("cos_sim").desc, col("a"), col("b"))
        .limit(20)
    },
    Some(
      """WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100),
        |dots AS (SELECT a.vec_id AS a, b.vec_id AS b,
        |    sum(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS dot,
        |    sum(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)) AS na,
        |    sum(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS nb
        |  FROM e a, e b, generate_series(1, 64) t(i)
        |  WHERE a.vec_id < b.vec_id GROUP BY 1, 2)
        |SELECT a, b, round(dot / (sqrt(na) * sqrt(nb)), 4) AS cos_sim
        |FROM dots ORDER BY cos_sim DESC, a, b LIMIT 20""".stripMargin))

  /** Pivot (explicit value list -> deterministic schema). */
  val qPivot = QueryDef("q_pivot",
    (s, dir) => t(s, dir, "orders")
      .groupBy("o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("F"), lit(0L)).cast("long").as("n_f"),
        coalesce(col("O"), lit(0L)).cast("long").as("n_o"),
        coalesce(col("P"), lit(0L)).cast("long").as("n_p"))
      .orderBy("o_orderpriority"),
    Some(
      """SELECT o_orderpriority,
        | CAST(count(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
        | CAST(count(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
        | CAST(count(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin))

  /** Array/list scalar functions over the tokenized documents. */
  val qArrayOps = QueryDef("q_array_ops",
    (s, dir) => {
      val toks = split(col("text"), " ")
      t(s, dir, "documents").select(
        col("doc_id"),
        size(toks).cast("long").as("n_toks"),
        size(array_distinct(toks)).cast("long").as("n_uniq"),
        element_at(toks, 1).as("first_tok"),
        element_at(toks, -1).as("last_tok"),
        array_contains(toks, "the").as("has_the"),
        array_join(slice(sort_array(toks), 1, 3), ",").as("sorted3"))
        .orderBy("doc_id")
    },
    Some(
      """WITH d AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents)
        |SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_toks,
        | CAST(len(list_distinct(toks)) AS BIGINT) AS n_uniq,
        | toks[1] AS first_tok, toks[-1] AS last_tok,
        | list_contains(toks, 'the') AS has_the,
        | array_to_string(list_sort(toks)[1:3], ',') AS sorted3
        |FROM d ORDER BY doc_id""".stripMargin))

  /** min_by / max_by (argmin/argmax). The fixtures have duplicate
    * (l_orderkey, l_linenumber) pairs, so the ordering key folds the
    * returned value itself in as the lowest-order tie-break — engines
    * then agree even on tied positions (l_partkey < 1e6 at these SFs). */
  val qArgMinMax = QueryDef("q_argminmax",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(expr("max_by(l_partkey, (l_orderkey * 10 + l_linenumber) * 1000000 + l_partkey)").as("last_part"),
        expr("min_by(l_partkey, (l_orderkey * 10 + l_linenumber) * 1000000 + l_partkey)").as("first_part"),
        count(lit(1)).cast("long").as("n"))
      .orderBy("l_returnflag"),
    Some(
      """SELECT l_returnflag,
        | arg_max(l_partkey, (l_orderkey * 10 + l_linenumber) * 1000000 + l_partkey) AS last_part,
        | arg_min(l_partkey, (l_orderkey * 10 + l_linenumber) * 1000000 + l_partkey) AS first_part,
        | CAST(count(*) AS BIGINT) AS n
        |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Statistical moments + correlation. Rows-only: streaming-moment
    * accumulation orders differ across engines, so last-bit float parity
    * is not guaranteed by design. */
  val qStatsMoments = QueryDef("q_stats_moments",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(stddev_samp(col("l_quantity")).as("sd_qty"),
        var_samp(col("l_extendedprice")).as("var_price"),
        skewness(col("l_quantity")).as("skew_qty"),
        kurtosis(col("l_quantity")).as("kurt_qty"),
        corr(col("l_quantity"), col("l_extendedprice")).as("corr_qty_price"))
      .orderBy("l_returnflag"),
    None)

  /** Moments with cross-engine bit-exactness: raw power sums accumulated
    * exactly in integer cents (associative, order-independent), then
    * mean/variance/skewness derived with a textually identical double
    * expression on both engines. `sqrt` (IEEE correctly-rounded) instead
    * of `pow(x, 1.5)` (libm-dependent last bit). Complements
    * q_stats_moments (built-in streaming sketches, rows-only by design).
    */
  val qMomentsExact = QueryDef("q_moments_exact",
    (s, dir) => t(s, dir, "lineitem")
      .groupBy("l_returnflag")
      .agg(
        count(lit(1)).cast("long").as("n"),
        sum(expr("CAST(round(l_quantity * 100) AS BIGINT)")).as("s1"),
        sum(expr("CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)")).as("s2"),
        sum(expr("CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)")).as("s3"))
      .select(col("l_returnflag"), col("n"),
        expr("CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0").as("mean_qty"),
        expr("(CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) / 10000.0").as("var_qty"),
        expr("""((CAST(s3 AS DOUBLE) - 3.0 * CAST(s2 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
                 + 2.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / CAST(n AS DOUBLE))
                / (((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                   * sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)))""")
          .as("skew_qty"))
      .orderBy("l_returnflag"),
    Some(
      """WITH sums AS (
        |  SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
        |         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS s1,
        |         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS s2,
        |         CAST(sum(CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT) * CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS s3
        |  FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, n,
        |       CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 100.0 AS mean_qty,
        |       (CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) / 10000.0 AS var_qty,
        |       ((CAST(s3 AS DOUBLE) - 3.0 * CAST(s2 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)
        |         + 2.0 * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) / CAST(n AS DOUBLE))
        |        / (((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
        |           * sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))) AS skew_qty
        |FROM sums ORDER BY l_returnflag""".stripMargin))

  /** Typed Dataset surface: case-class rows, typed filter, groupByKey +
    * Aggregator[IN,BUF,OUT] aggregation — exact (cents-integer) sums so
    * the oracle matches. */
  val qTypedDs = QueryDef("q_typed_ds",
    (s, dir) => {
      import s.implicits._
      import TypedAggs._
      t(s, dir, "lineitem")
        .select(col("l_returnflag"), col("l_quantity")).as[LiQty]
        .filter(_.l_quantity >= 10)
        .groupByKey(_.l_returnflag)
        .agg(sumQtyCents.toColumn.name("cents"), rowCount.toColumn.name("n"))
        .toDF("l_returnflag", "cents", "n")
        .select(col("l_returnflag"),
          (col("cents").cast("double") / 100.0).as("sum_qty"), col("n"))
        .orderBy("l_returnflag")
    },
    Some(
      """SELECT l_returnflag,
        | CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_qty,
        | CAST(count(*) AS BIGINT) AS n
        |FROM lineitem WHERE l_quantity >= 10
        |GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin))

  /** Custom physical operator: heap-based per-key top-k
    * (graft.plans.TopKPerKey — LogicalPlan + Strategy + Exec), verified
    * against the DuckDB window formulation via a unique order value. */
  val qTopkCustom = QueryDef("q_topk_custom",
    (s, dir) => {
      // 1e7 multiplier keeps v unique up to 10M custkeys (sf ~600)
      val withV = t(s, dir, "customer").withColumn("v",
        round(col("c_acctbal") * 100).cast("long") * 10000000L
          + lit(9999999L) - col("c_custkey"))
      graft.plans.TopKPerKey.topKPerKey(withV, Seq("c_nationkey"), "v", 3)
        .select(col("c_nationkey"), col("c_custkey"), col("c_acctbal"), col("v"))
        .orderBy(col("c_nationkey"), col("v").desc)
    },
    Some(
      """WITH c AS (SELECT c_nationkey, c_custkey, c_acctbal,
        |    CAST(round(c_acctbal * 100) AS BIGINT) * 10000000 + 9999999 - c_custkey AS v
        |  FROM customer),
        |r AS (SELECT *, row_number() OVER (PARTITION BY c_nationkey ORDER BY v DESC) AS rn FROM c)
        |SELECT c_nationkey, c_custkey, c_acctbal, v FROM r WHERE rn <= 3
        |ORDER BY c_nationkey, v DESC""".stripMargin))

  val all: Seq[QueryDef] = Seq(
    qAsofJoin, qSaltedJoin, qRangeJoin, qGroupingSets, qSqlQ3,
    qPercentiles, qApproxDistinct, qEmbeddingPairs, qPivot, qArrayOps,
    qArgMinMax, qStatsMoments, qMomentsExact, qTypedDs, qTopkCustom)
}

/** Tiny typed aggregators for the Dataset[T] demo (q_typed_ds). */
object TypedAggs {
  import org.apache.spark.sql.{Encoder, Encoders}
  import org.apache.spark.sql.expressions.Aggregator

  case class LiQty(l_returnflag: String, l_quantity: Double)

  /** Sum of quantity in integer cents — exact under double input with
    * two decimal places. */
  val sumQtyCents: Aggregator[LiQty, Long, Long] =
    new Aggregator[LiQty, Long, Long] {
      override def zero: Long = 0L
      override def reduce(b: Long, e: LiQty): Long =
        b + math.round(e.l_quantity * 100)
      override def merge(a: Long, b: Long): Long = a + b
      override def finish(r: Long): Long = r
      override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }

  val rowCount: Aggregator[LiQty, Long, Long] =
    new Aggregator[LiQty, Long, Long] {
      override def zero: Long = 0L
      override def reduce(b: Long, e: LiQty): Long = b + 1
      override def merge(a: Long, b: Long): Long = a + b
      override def finish(r: Long): Long = r
      override def bufferEncoder: Encoder[Long] = Encoders.scalaLong
      override def outputEncoder: Encoder[Long] = Encoders.scalaLong
    }
}
