package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef
import graft.rules.RewriteGlobalRankWindows

/** Eightieth wave — Viterbi decoding, largest-remainder apportionment,
  * and a transparent Bloom-filter audit.
  *
  *  - `q_viterbi`: Viterbi decoding (Viterbi 1967) of a 2-state HMM
  *    (quiet/active) over each user's event sequence, with integer
  *    log-score emission/transition tables generated ONCE in Scala and
  *    shared verbatim with the oracle. The trick that makes the DP
  *    oracle-able: with a constant state count, the per-step value
  *    vector is a fixed set of COLUMNS, so the recursion is a
  *    recursive CTE carrying (v_quiet, v_active) — and on the Spark
  *    side a per-key mapGroups fold (the q_holt discipline: per-key
  *    state is one integer pair, keys scale out). All-integer
  *    arithmetic, deterministic argmax tie-break (quiet wins ties).
  *  - `q_apportion`: largest-remainder (Hamilton) apportionment of
  *    1000 sampling seats across (lang, source) corpus cells by token
  *    mass — floor quotas plus one extra seat to the largest
  *    remainders (n·S mod T, ranked with a total tie-break) until the
  *    house is full. The exact-integer answer to "how many documents
  *    do I sample from each cell" that q_domain_mix's basis-point
  *    shares only approximate — Σ seats = S exactly, every cell within
  *    one seat of its real quota. One dimension-sized sweep.
  *  - `q_bloom_audit`: a GLASS-BOX Bloom filter (m = 4096 bits, k = 3
  *    quadratic mixers) built relationally — member keys explode to
  *    their k bit positions, probes of true NON-members count how many
  *    of their k positions are set, and a false positive is a probe
  *    with all k present. Emits the exact fill ratio, measured FP
  *    rate, and the fill-based prediction (bits_set/m)^k — the audit
  *    that sizes q_bloom_anti's opaque filter before a 100 TB
  *    anti-join. Deterministic mixers → both engines build the
  *    identical filter; the FP COUNT itself is oracle-hashed.
  */
object R80Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_viterbi ----------

  /** (emission-quiet, emission-active) integer log scores per event
    * type — one source of truth for both engines. */
  private val emit: Seq[(String, Int, Int)] = Seq(
    ("view", 5, 2), ("click", 4, 4), ("error", 1, 3),
    ("signup", 2, 5), ("purchase", 1, 6))

  /** Sticky transition scores: stay = 8, switch = 3. */
  private val stay = 8
  private val switchT = 3

  private def emitCase(idx: Int): String =
    "CASE t " + emit.map { case (n, e0, e1) =>
      s"WHEN '$n' THEN ${if (idx == 0) e0 else e1}"
    }.mkString(" ") + " ELSE 0 END"

  val qViterbi = QueryDef("q_viterbi",
    (s, dir) => {
      import s.implicits._
      val e0 = emit.map(e => e._1 -> e._2).toMap
      val e1 = emit.map(e => e._1 -> e._3).toMap
      val seq0 = Tables.events(s, dir)
        .select(col("user_id"), col("event_type").as("t"),
          unix_micros(col("ts")).as("us"), col("event_id"))
        .as[(Long, String, Long, Long)]
      seq0.groupByKey(_._1)
        .mapGroups { (user, it) =>
          val ts = it.toArray.sortBy(r => (r._3, r._4)).map(_._2)
          var v0 = e0(ts.head).toLong; var v1 = e1(ts.head).toLong
          for (t <- ts.tail) {
            val n0 = e0(t) + math.max(v0 + stay, v1 + switchT)
            val n1 = e1(t) + math.max(v0 + switchT, v1 + stay)
            v0 = n0; v1 = n1
          }
          (user, ts.length.toLong, math.max(v0, v1),
            if (v0 >= v1) 0L else 1L)
        }
        .toDF("user_id", "n_events", "best_score", "final_state")
        .orderBy("user_id")
    },
    Some(
      s"""WITH RECURSIVE series AS (
         |  SELECT user_id, event_type AS t,
         |    row_number() OVER (PARTITION BY user_id
         |      ORDER BY epoch_us(ts), event_id) AS rn,
         |    count(*) OVER (PARTITION BY user_id) AS ne
         |  FROM events),
         |walk AS (
         |  SELECT user_id, rn, ne,
         |    CAST(${emitCase(0)} AS BIGINT) AS v0,
         |    CAST(${emitCase(1)} AS BIGINT) AS v1
         |  FROM series WHERE rn = 1
         |  UNION ALL
         |  SELECT s.user_id, s.rn, s.ne,
         |    ${emitCase(0).replace("CASE t", "CASE s.t")}
         |      + greatest(w.v0 + $stay, w.v1 + $switchT),
         |    ${emitCase(1).replace("CASE t", "CASE s.t")}
         |      + greatest(w.v0 + $switchT, w.v1 + $stay)
         |  FROM walk w JOIN series s ON s.user_id = w.user_id AND s.rn = w.rn + 1)
         |SELECT user_id, CAST(ne AS BIGINT) AS n_events,
         |  CAST(greatest(v0, v1) AS BIGINT) AS best_score,
         |  CAST(CASE WHEN v0 >= v1 THEN 0 ELSE 1 END AS BIGINT) AS final_state
         |FROM walk WHERE rn = ne ORDER BY user_id""".stripMargin))

  // ---------- q_apportion ----------

  private val seats = 1000L

  val qApportion = QueryDef("q_apportion",
    (s, dir) => RewriteGlobalRankWindows.force {
      val cells = t(s, dir, "documents")
        .groupBy("lang", "source")
        .agg(sum(col("n_chars")).cast("long").as("toks"))
      val tot = Window.partitionBy(lit(1))
      val ranked = cells
        .withColumn("t", sum(col("toks")).over(tot).cast("long"))
        .withColumn("base",
          ((col("toks") * seats - (col("toks") * seats) % col("t")) / col("t"))
            .cast("long"))
        .withColumn("rem", (col("toks") * seats) % col("t"))
        .withColumn("leftover", (lit(seats) - sum(col("base")).over(tot)).cast("long"))
        .withColumn("rk", row_number().over(
          Window.orderBy(col("rem").desc, col("lang"), col("source"))))
      ranked
        .select(col("lang"), col("source"), col("toks"), col("base"),
          (col("base") + when(col("rk") <= col("leftover"), 1L).otherwise(0L))
            .cast("long").as("seats"))
        .orderBy("lang", "source")
    },
    Some(
      s"""WITH cells AS (
         |  SELECT lang, source, CAST(sum(n_chars) AS BIGINT) AS toks
         |  FROM documents GROUP BY lang, source),
         |quotas AS (
         |  SELECT lang, source, toks,
         |    CAST(sum(toks) OVER () AS BIGINT) AS t,
         |    CAST((toks * $seats - (toks * $seats) % sum(toks) OVER ())
         |      / sum(toks) OVER () AS BIGINT) AS base,
         |    (toks * $seats) % sum(toks) OVER () AS rem
         |  FROM cells),
         |ranked AS (
         |  SELECT q.*, CAST($seats - sum(base) OVER () AS BIGINT) AS leftover,
         |    row_number() OVER (ORDER BY rem DESC, lang, source) AS rk
         |  FROM quotas q)
         |SELECT lang, source, toks, base,
         |  CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT) AS seats
         |FROM ranked ORDER BY lang, source""".stripMargin))

  // ---------- q_bloom_audit ----------

  private val bloomM = 4096L
  private val hashConsts = Seq((2654435761L, 40503L), (2246822519L, 3266489917L),
    (668265263L, 374761393L))

  /** k probe positions for a key column named `key` — generated from
    * the same constants on both sides. */
  private def posSql(i: Int): String = {
    val (c, d) = hashConsts(i)
    s"(key * key * $c + key * $d + $i) % $bloomM"
  }

  val qBloomAudit = QueryDef("q_bloom_audit",
    (s, dir) => {
      val cust = t(s, dir, "customer")
      val members = cust.where(col("c_custkey") % 3 === 0)
        .select(col("c_custkey").as("key"))
      val probes = cust.where(col("c_custkey") % 3 =!= 0)
        .select(col("c_custkey").as("key"))
      def positions(df: DataFrame): DataFrame =
        df.select(col("key"), explode(array(
          hashConsts.indices.map(i => expr(posSql(i))): _*)).as("pos"))
      val bits = positions(members).select("pos").distinct()
      val nBits = bits.agg(count(lit(1)).cast("long").as("bits_set"))
      val probeHits = positions(probes)
        .join(bits.withColumn("hit", lit(1L)), Seq("pos"), "left")
        .groupBy("key")
        .agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))
      val fp = probeHits.agg(count(lit(1)).cast("long").as("n_probes"),
        sum(when(col("hits") === hashConsts.length.toLong, 1L).otherwise(0L))
          .cast("long").as("n_fp"))
      val nm = members.agg(count(lit(1)).cast("long").as("n_members"))
      fp.crossJoin(broadcast(nBits)).crossJoin(broadcast(nm))
        .select(col("n_members"), col("bits_set"), col("n_probes"), col("n_fp"),
          ((col("n_fp") * 1000000L - (col("n_fp") * 1000000L) % col("n_probes"))
            / col("n_probes")).cast("long").as("fp_ppm"),
          // x*x*x, not pow(): integer-exponent pow is not ulp-specified
          // across engines; three IEEE multiplies are
          round(expr(s"(CAST(bits_set AS DOUBLE) / $bloomM) * " +
            s"(CAST(bits_set AS DOUBLE) / $bloomM) * " +
            s"(CAST(bits_set AS DOUBLE) / $bloomM)"), 6).as("fp_predicted"))
    },
    Some {
      val posUnion = hashConsts.indices
        .map(i => s"SELECT key, ${posSql(i)} AS pos FROM members")
        .mkString(" UNION ALL ")
      val probeUnion = hashConsts.indices
        .map(i => s"SELECT key, ${posSql(i)} AS pos FROM probes")
        .mkString(" UNION ALL ")
      s"""WITH members AS (
         |  SELECT c_custkey AS key FROM customer WHERE c_custkey % 3 = 0),
         |probes AS (
         |  SELECT c_custkey AS key FROM customer WHERE c_custkey % 3 <> 0),
         |bits AS (SELECT DISTINCT pos FROM ($posUnion)),
         |nb AS (SELECT CAST(count(*) AS BIGINT) AS bits_set FROM bits),
         |probe_pos AS ($probeUnion),
         |hits AS (
         |  SELECT p.key,
         |    CAST(sum(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS h
         |  FROM probe_pos p LEFT JOIN bits b ON p.pos = b.pos
         |  GROUP BY p.key),
         |fp AS (
         |  SELECT CAST(count(*) AS BIGINT) AS n_probes,
         |    CAST(sum(CASE WHEN h = ${hashConsts.length} THEN 1 ELSE 0 END) AS BIGINT) AS n_fp
         |  FROM hits),
         |nm AS (SELECT CAST(count(*) AS BIGINT) AS n_members FROM members)
         |SELECT n_members, bits_set, n_probes, n_fp,
         |  CAST((n_fp * 1000000 - (n_fp * 1000000) % n_probes) / n_probes AS BIGINT) AS fp_ppm,
         |  round((CAST(bits_set AS DOUBLE) / $bloomM) * (CAST(bits_set AS DOUBLE) / $bloomM)
         |    * (CAST(bits_set AS DOUBLE) / $bloomM), 6) AS fp_predicted
         |FROM fp CROSS JOIN nb CROSS JOIN nm""".stripMargin
    })

  val all: Seq[QueryDef] = Seq(qViterbi, qApportion, qBloomAudit)
}
