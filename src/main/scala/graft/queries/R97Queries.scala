package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Ninety-seventh wave — Zipf exponent, silhouette score, and hash
  * balance.
  *
  *  - `q_zipf`: the Zipf rank-frequency exponent of the corpus
  *    vocabulary (Zipf 1949): top-100 term frequencies, least-squares
  *    slope of ln f on ln r from exact integer counts (the ln/IEEE
  *    tree shared verbatim — q_theil_index precedent), with R². The
  *    heavy-tail companion to q_hill_tail: |slope| ≈ 1 is the
  *    signature of natural language, and a flat slope flags synthetic
  *    or templated text.
  *  - `q_silhouette`: cluster-quality silhouette (Rousseeuw 1987) of
  *    the labeled embedding corpus on the ×10⁶ integer lattice —
  *    squared distances are EXACT BIGINT fold sums (integer addition
  *    is order-free, so no float-order hazard at any parallelism),
  *    a(i)/b(i) are same-label and best-other-label mean distances,
  *    s(i) = (b−a)/max(a,b) one shared tree. 100 probes × corpus —
  *    the validation that grades q_kmeans' assignments, not just its
  *    convergence.
  *  - `q_hash_balance`: partition-balance audit of the house mixer
  *    hash over 32 buckets of order custkeys — bucket sizes, the
  *    max/mean imbalance in exact basis points, and the χ² uniformity
  *    statistic. The first thing to check before trusting a hash
  *    layout with 100 TB: a 2× hot bucket doubles the stage tail.
  */
object R97Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_zipf ----------

  private val zipfTop = 100

  val qZipf = QueryDef("q_zipf",
    // r16: route the global window(s) through the distributed rewrite
    (s, dir) => RewriteGlobalRankWindows.force {
      val freq = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("tok"))
        .groupBy("tok").agg(count(lit(1)).cast("long").as("f"))
      val top = freq.orderBy(col("f").desc, col("tok")).limit(zipfTop)
      val w = Window.orderBy(col("f").desc, col("tok"))
      val pts = top.withColumn("r", row_number().over(w).cast("long"))
        .withColumn("x", expr("ln(CAST(r AS DOUBLE))"))
        .withColumn("y", expr("ln(CAST(f AS DOUBLE))"))
      pts.agg(count(lit(1)).cast("long").as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"))
        .select(col("n"),
          round(expr(
            "(CAST(n AS DOUBLE) * sxy - sx * sy) / (CAST(n AS DOUBLE) * sxx - sx * sx)"), 4)
            .as("slope"),
          round(expr(
            "((CAST(n AS DOUBLE) * sxy - sx * sy) * (CAST(n AS DOUBLE) * sxy - sx * sy))" +
              " / ((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy))"), 4)
            .as("r2"))
    },
    Some(
      s"""WITH freq AS (
         |  SELECT tok, CAST(count(*) AS BIGINT) AS f FROM (
         |    SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
         |  GROUP BY tok),
         |top AS (
         |  SELECT f, row_number() OVER (ORDER BY f DESC, tok) AS r
         |  FROM freq QUALIFY r <= $zipfTop),
         |pts AS (
         |  SELECT ln(CAST(r AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y FROM top),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
         |    sum(x * y) AS sxy, sum(x * x) AS sxx, sum(y * y) AS syy
         |  FROM pts)
         |SELECT n,
         |  round((CAST(n AS DOUBLE) * sxy - sx * sy)
         |    / (CAST(n AS DOUBLE) * sxx - sx * sx), 4) AS slope,
         |  round(((CAST(n AS DOUBLE) * sxy - sx * sy) * (CAST(n AS DOUBLE) * sxy - sx * sy))
         |    / ((CAST(n AS DOUBLE) * sxx - sx * sx) * (CAST(n AS DOUBLE) * syy - sy * sy)), 4)
         |    AS r2
         |FROM agg""".stripMargin))

  // ---------- q_silhouette ----------

  val qSilhouette = QueryDef("q_silhouette",
    (s, dir) => {
      val e = t(s, dir, "embeddings")
        .select(col("vec_id"), col("label").cast("long").as("label"),
          expr("transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT))")
            .as("q"))
      val probes = e.where(col("vec_id") < 100)
        .select(col("vec_id").as("pid"), col("label").as("plabel"),
          col("q").as("pq"))
      // corpus side is one parquet row-group at this slice — unwidened,
      // the corpus×probes distance fold runs in a single task (~1.9 s
      // measured); at real scale the scan is already many-partitioned
      val scored = e.repartition(s.sparkContext.defaultParallelism)
        .join(broadcast(probes), col("vec_id") =!= col("pid"))
        .withColumn("d2", expr("aggregate(zip_with(pq, q," +
          " (a, b) -> (a - b) * (a - b)), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      val grouped = scored.groupBy("pid", "plabel", "label")
        .agg(count(lit(1)).cast("long").as("cnt"),
          sum(col("d2")).cast("long").as("sd2"))
        .withColumn("mean_d2", expr("CAST(sd2 AS DOUBLE) / CAST(cnt AS DOUBLE)"))
        // the ~1e12-scale means exceed double ULP at 4 decimals, so the
        // EMITTED values are exact integer floors; sil rides the doubles
        .withColumn("floor_d2", expr("CAST((sd2 - sd2 % cnt) / cnt AS BIGINT)"))
      val a = grouped.where(col("label") === col("plabel"))
        .select(col("pid"), col("plabel"), col("mean_d2").as("a"),
          col("floor_d2").as("a_d2"))
      val wb = Window.partitionBy("pid").orderBy(col("mean_d2"), col("label"))
      val b = grouped.where(col("label") =!= col("plabel"))
        .withColumn("rn", row_number().over(wb)).where(col("rn") === 1)
        .select(col("pid"), col("mean_d2").as("b"), col("floor_d2").as("b_d2"))
      a.join(b, "pid")
        .select(col("pid"), col("plabel").as("label"),
          col("a_d2"), col("b_d2"),
          round(expr("(b - a) / greatest(a, b)"), 6).as("sil"))
        .orderBy("pid")
    },
    Some(
      """WITH e AS (
        |  SELECT vec_id, CAST(label AS BIGINT) AS label, embedding FROM embeddings),
        |d2s AS (
        |  SELECT p.vec_id AS pid, p.label AS plabel, c.label AS label,
        |    CAST(sum((CAST(round(CAST(p.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
        |      - CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT))
        |      * (CAST(round(CAST(p.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)
        |      - CAST(round(CAST(c.embedding[i] AS DOUBLE) * 1000000.0) AS BIGINT)))
        |      AS BIGINT) AS d2
        |  FROM e p, e c, generate_series(1, 64) t(i)
        |  WHERE p.vec_id < 100 AND c.vec_id <> p.vec_id
        |  GROUP BY 1, 2, 3, c.vec_id),
        |grouped AS (
        |  SELECT pid, plabel, label, CAST(count(*) AS BIGINT) AS cnt,
        |    CAST(sum(d2) AS BIGINT) AS sd2,
        |    CAST(sum(d2) AS DOUBLE) / CAST(count(*) AS DOUBLE) AS mean_d2
        |  FROM d2s GROUP BY 1, 2, 3),
        |floored AS (
        |  SELECT *, CAST((sd2 - sd2 % cnt) / cnt AS BIGINT) AS floor_d2
        |  FROM grouped),
        |aa AS (
        |  SELECT pid, plabel, mean_d2 AS a, floor_d2 AS a_d2
        |  FROM floored WHERE label = plabel),
        |bb AS (
        |  SELECT pid, mean_d2 AS b, floor_d2 AS b_d2 FROM (
        |    SELECT *, row_number() OVER (PARTITION BY pid
        |      ORDER BY mean_d2, label) AS rn
        |    FROM floored WHERE label <> plabel)
        |  WHERE rn = 1)
        |SELECT aa.pid, plabel AS label, a_d2, b_d2,
        |  round((b - a) / greatest(a, b), 6) AS sil
        |FROM aa JOIN bb ON bb.pid = aa.pid
        |ORDER BY aa.pid""".stripMargin))

  // ---------- q_hash_balance ----------

  private val nBuckets = 32L

  val qHashBalance = QueryDef("q_hash_balance",
    (s, dir) => {
      // the squared term masks to 15 bits so key²·40503 stays inside
      // signed 64-bit at every scale factor (identity at tested sfs)
      val sizes = t(s, dir, "orders")
        .select(expr(s"(o_custkey * 2654435761 + (o_custkey % 32768) * (o_custkey % 32768) * 40503) % $nBuckets")
          .as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).cast("long").as("sz"))
      sizes.agg(count(lit(1)).cast("long").as("n_buckets"),
          sum(col("sz")).cast("long").as("total"),
          min(col("sz")).cast("long").as("min_sz"),
          max(col("sz")).cast("long").as("max_sz"),
          sum(col("sz") * col("sz")).cast("long").as("ss"))
        .select(col("n_buckets"), col("total"), col("min_sz"), col("max_sz"),
          // max/mean imbalance: how much the hottest bucket overshoots
          ((col("max_sz") * col("n_buckets") * 10000L -
            (col("max_sz") * col("n_buckets") * 10000L) % col("total")) /
            col("total")).cast("long").as("max_over_mean_bp"),
          // χ² uniformity: Σ(sz−e)²/e with e = total/n — shared tree
          round(expr(
            "CAST(ss AS DOUBLE) * CAST(n_buckets AS DOUBLE) / CAST(total AS DOUBLE)" +
              " - CAST(total AS DOUBLE)"), 6).as("chi2"))
    },
    Some(
      s"""WITH sizes AS (
         |  SELECT (o_custkey * 2654435761 + (o_custkey % 32768) * (o_custkey % 32768) * 40503) % $nBuckets
         |    AS bucket, CAST(count(*) AS BIGINT) AS sz
         |  FROM orders GROUP BY 1),
         |agg AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_buckets,
         |    CAST(sum(sz) AS BIGINT) AS total,
         |    CAST(min(sz) AS BIGINT) AS min_sz, CAST(max(sz) AS BIGINT) AS max_sz,
         |    CAST(sum(sz * sz) AS BIGINT) AS ss
         |  FROM sizes)
         |SELECT n_buckets, total, min_sz, max_sz,
         |  CAST((max_sz * n_buckets * 10000 - (max_sz * n_buckets * 10000) % total)
         |    / total AS BIGINT) AS max_over_mean_bp,
         |  round(CAST(ss AS DOUBLE) * CAST(n_buckets AS DOUBLE) / CAST(total AS DOUBLE)
         |    - CAST(total AS DOUBLE), 6) AS chi2
         |FROM agg""".stripMargin))

  val all: Seq[QueryDef] = Seq(qZipf, qSilhouette, qHashBalance)
}
