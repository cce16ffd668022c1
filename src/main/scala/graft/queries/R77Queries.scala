package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Seventy-seventh wave — exact Shapley attribution, prefix-filtered
  * set-similarity join, and reciprocal nearest-neighbor pairs.
  *
  *  - `q_shapley`: exact Shapley-value channel attribution (Shapley
  *    1953; the marketing-attribution form) over the 4 non-purchase
  *    event types. v(S) = number of converted users whose touched
  *    channel set (strictly before their first purchase) is ⊆ S.
  *    With |C| = 4 the 2⁴ coalition lattice is a CONSTANT: users
  *    reduce to a 16-row (mask, count) table in one aggregation, and
  *    φ_c comes from a broadcast join against the 32-row
  *    (channel, S) weight table generated once in Scala and shared
  *    verbatim with the oracle as a VALUES list. Weights are scaled
  *    by 4! = 24 so every number stays an exact BIGINT
  *    (φ·24 = Σ_S |S|!(3−|S|)!·[v(S∪c)−v(S)]). Corpus cost: one
  *    shuffle to per-user masks, then constant-size arithmetic —
  *    scale-free. Efficiency axiom (Σφ = v(C)−v(∅)) is pinned in
  *    R6WaveInvariantsSpec.
  *  - `q_prefix_join`: set-similarity self-join with PREFIX FILTERING
  *    (Chaudhuri/Ganti/Kaushik ICDE'06; PPJoin, Xiao et al. WWW'08) —
  *    document pairs with token-set Jaccard ≥ 0.9 over a bounded slice
  *    (doc_id < 1000 — the oracle is inherently pair-quadratic; the
  *    Spark side is the scale path). Tokens sort by
  *    ascending global frequency (rarest first — a per-doc array sort
  *    against the broadcast-joined frequency table, NO global rank
  *    window); a pair at Jaccard ≥ τ must share a token within the
  *    first |x| − ⌈τ|x|⌉ + 1 tokens, so candidates come from an
  *    equi-join on exploded PREFIX tokens only (rare by construction →
  *    skew-free buckets), then exact verification on the candidates.
  *    The oracle generates candidates from ALL shared tokens — so the
  *    driver's hash compare doubles as the losslessness proof of the
  *    prefix filter at sf0.01. The threshold gate cross-multiplies
  *    (10·∩ ≥ 9·∪), jacc_bp is an integer floor — no floats anywhere.
  *  - `q_mutual_knn`: reciprocal nearest-neighbor pairs (mutual
  *    top-1 by cosine; Gowda & Krishna 1978 — the pairing step behind
  *    RNN-based embedding dedup and margin-based bitext mining).
  *    Brute-force corpus (the q_knn_cosine parity discipline:
  *    index-ordered fold, round(·,4), vec_id tie-break) — at 100 TB
  *    the same mutual-join runs over ivfPqTopK shortlists instead;
  *    this is the exact baseline that grades those shortlists.
  */
object R77Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_shapley ----------

  /** Channel → bit, one source of truth for both engines. */
  private val channelBits: Seq[(String, Int)] =
    Seq("click" -> 1, "view" -> 2, "signup" -> 4, "error" -> 8)

  private def fact(n: Int): Long = (1 to n).foldLeft(1L)(_ * _)

  /** (channel, cbit, smask, w24) for every channel c and S ⊆ C∖{c};
    * w24 = |S|!·(|C|−1−|S|)! (the Shapley weight × |C|!). */
  private val shapleyWeights: Seq[(String, Int, Int, Long)] = {
    val full = channelBits.map(_._2).sum
    for {
      (name, cbit) <- channelBits
      smask <- 0 to full
      if (smask & cbit) == 0 && (smask & ~full) == 0
    } yield {
      val sz = Integer.bitCount(smask)
      (name, cbit, smask, fact(sz) * fact(channelBits.length - 1 - sz))
    }
  }

  private val bitCaseSql: String =
    "CASE event_type " +
      channelBits.map { case (n, b) => s"WHEN '$n' THEN $b" }.mkString(" ") +
      " END"

  private val weightsValuesSql: String =
    shapleyWeights
      .map { case (n, c, m, w) => s"('$n', $c, $m, $w)" }
      .mkString(", ")

  val qShapley = QueryDef("q_shapley",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("us"))
      val fp = ev.where(col("event_type") === "purchase")
        .groupBy("user_id").agg(min(col("us")).as("pus"))
      val bits = ev.join(fp, "user_id")
        .where(col("us") < col("pus") && col("event_type") =!= "purchase")
        .select(col("user_id"), expr(bitCaseSql).as("bit"))
        .distinct()
      val masks = fp.join(bits, Seq("user_id"), "left")
        .groupBy("user_id")
        .agg(coalesce(sum(col("bit")), lit(0L)).as("mask"))
      val conv = masks.groupBy("mask")
        .agg(count(lit(1)).cast("long").as("n"))
      val w = s.createDataFrame(shapleyWeights)
        .toDF("channel", "cbit", "smask", "w24")
      def subsetOf(m: Column, x: Column): Column =
        when(m.bitwiseAND(x) === m, 1L).otherwise(0L)
      conv.crossJoin(broadcast(w))
        .withColumn("contrib", col("w24") * col("n") *
          (subsetOf(col("mask"), col("smask").bitwiseOR(col("cbit"))) -
            subsetOf(col("mask"), col("smask"))))
        .groupBy("channel")
        .agg(sum(col("contrib")).cast("long").as("phi_x24"))
        .orderBy("channel")
    },
    Some(
      s"""WITH ev AS (
         |  SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
         |fp AS (
         |  SELECT user_id, min(us) AS pus FROM ev
         |  WHERE event_type = 'purchase' GROUP BY user_id),
         |bits AS (
         |  SELECT DISTINCT e.user_id, $bitCaseSql AS bit
         |  FROM ev e JOIN fp ON e.user_id = fp.user_id
         |  WHERE e.us < fp.pus AND e.event_type <> 'purchase'),
         |mk AS (
         |  SELECT f.user_id, coalesce(sum(b.bit), 0) AS mask
         |  FROM fp f LEFT JOIN bits b ON b.user_id = f.user_id
         |  GROUP BY f.user_id),
         |conv AS (SELECT mask, CAST(count(*) AS BIGINT) AS n FROM mk GROUP BY mask),
         |w(channel, cbit, smask, w24) AS (VALUES $weightsValuesSql)
         |SELECT w.channel,
         |  CAST(sum(w.w24 * conv.n *
         |    ((CASE WHEN (conv.mask & (w.smask | w.cbit)) = conv.mask THEN 1 ELSE 0 END)
         |   - (CASE WHEN (conv.mask & w.smask) = conv.mask THEN 1 ELSE 0 END)))
         |    AS BIGINT) AS phi_x24
         |FROM w CROSS JOIN conv
         |GROUP BY w.channel ORDER BY w.channel""".stripMargin))

  // ---------- q_prefix_join ----------

  /** τ = 9/10: the gate and the prefix length both ride the fraction.
    * The synthetic corpus is drawn from a tiny vocabulary, so docs are
    * mutually similar — 0.6 would return 57% of ALL pairs (measured),
    * which grades the verifier, not the filter. At 0.9 the prefix is
    * ~n/10 tokens and the filter actually prunes. */
  private val tauNum = 9
  private val tauDen = 10

  val qPrefixJoin = QueryDef("q_prefix_join",
    (s, dir) => {
      val toks = t(s, dir, "documents").where(col("doc_id") < 1000)
        .select(col("doc_id"), explode(array_distinct(split(col("text"), " ")))
          .as("tok"))
      val freq = toks.groupBy("tok").agg(count(lit(1)).cast("long").as("f"))
      // per-doc rarest-first token array: sort by (global freq, token) —
      // a broadcast-joined array sort, not a global rank window
      // pinned: the sorted-token relation feeds the prefix explode AND
      // both verify sides — unpersisted, the tokenize+join+collect chain
      // ran once per consumer (slice-sized; Bench clearCache reclaims)
      val docs = Queries.pin(toks.join(freq, "tok")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(struct(col("f"), col("tok")))).as("sorted"),
          count(lit(1)).cast("long").as("n"))
        .withColumn("arr", expr("transform(sorted, x -> x.tok)"))
        // prefix length |x| − ⌈τ|x|⌉ + 1, ceil via (num·n + den − 1) / den
        .withColumn("plen", expr(
          s"n - CAST((($tauNum * n + $tauDen - 1) - (($tauNum * n + $tauDen - 1) % $tauDen)) / $tauDen AS BIGINT) + 1"))
        .select(col("doc_id"), col("arr"), col("n"),
          expr("slice(arr, 1, CAST(plen AS INT))").as("prefix")))
      // the exploded prefix relation is a few KB at this slice, so AQE
      // size-coalescing runs the self-join AND the verify below in ONE
      // task — serializing the only CPU-heavy stages of the query
      // (~2 s of array work measured single-task; JobStats r10). Pin
      // the width to the session's core count: bytes-tiny but
      // compute-dense is the one shape size-based coalescing misjudges.
      val width = s.sparkContext.defaultParallelism
      val pre = docs.select(col("doc_id"), col("n"),
        explode(col("prefix")).as("tok"))
        .repartition(width, col("tok"))
      // PPJoin length filter rides the candidate join: Jaccard ≥ τ needs
      // τ·max(|A|,|B|) ≤ min(|A|,|B|) — lossless, prunes before verify
      val cands = pre.as("x").join(pre.as("y"),
          col("x.tok") === col("y.tok") && col("x.doc_id") < col("y.doc_id") &&
            least(col("x.n"), col("y.n")) * tauDen >=
              greatest(col("x.n"), col("y.n")) * tauNum)
        .select(col("x.doc_id").as("a"), col("y.doc_id").as("b"))
        .repartition(width, col("a"), col("b")).distinct()
      val da = docs.select(col("doc_id").as("a"), col("arr").as("arr_a"),
        col("n").as("na"))
      val db = docs.select(col("doc_id").as("b"), col("arr").as("arr_b"),
        col("n").as("nb"))
      cands.join(da, "a").join(db, "b")
        .withColumn("inter",
          size(array_intersect(col("arr_a"), col("arr_b"))).cast("long"))
        .withColumn("un", col("na") + col("nb") - col("inter"))
        .where(col("inter") * tauDen >= col("un") * tauNum)
        .select(col("a"), col("b"), col("inter"),
          ((col("inter") * 10000L - (col("inter") * 10000L) % col("un")) /
            col("un")).cast("long").as("jacc_bp"))
        .orderBy("a", "b")
    },
    Some(
      s"""WITH toks AS (
         |  SELECT DISTINCT doc_id, tok FROM (
         |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
         |    FROM documents WHERE doc_id < 1000)),
         |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM toks GROUP BY doc_id),
         |inter AS (
         |  SELECT a.doc_id AS a, b.doc_id AS b, CAST(count(*) AS BIGINT) AS inter
         |  FROM toks a JOIN toks b ON a.tok = b.tok AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT a, b, inter,
         |  CAST((inter * 10000 - (inter * 10000) % (sa.n + sb.n - inter))
         |    / (sa.n + sb.n - inter) AS BIGINT) AS jacc_bp
         |FROM inter JOIN sizes sa ON sa.doc_id = a JOIN sizes sb ON sb.doc_id = b
         |WHERE inter * $tauDen >= (sa.n + sb.n - inter) * $tauNum
         |ORDER BY a, b""".stripMargin))

  // ---------- q_mutual_knn ----------

  private val mutualMaxVec = 500

  val qMutualKnn = QueryDef("q_mutual_knn",
    (s, dir) => {
      val e = t(s, dir, "embeddings").where(col("vec_id") < mutualMaxVec)
        .select(col("vec_id"), col("embedding"),
          expr("aggregate(embedding, CAST(0.0 AS DOUBLE)," +
            " (acc, x) -> acc + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))").as("n2"))
      // the probe side of the broadcast product is one parquet
      // row-group at this slice — unwidened, all 500×499 dot products
      // run in a single task (~2.3 s measured; at corpus scale the scan
      // is already many-partitioned and this repartition is a no-op
      // cost-wise next to the O(n²) fold it spreads)
      val a = e.select(col("vec_id").as("a_id"), col("embedding").as("ea"),
        col("n2").as("aa"))
        .repartition(s.sparkContext.defaultParallelism)
      val b = e.select(col("vec_id").as("b_id"), col("embedding").as("eb"),
        col("n2").as("bb"))
      val scored = a.join(broadcast(b), col("a_id") =!= col("b_id"))
        .withColumn("dot", expr("aggregate(zip_with(ea, eb," +
          " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE))," +
          " CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"))
        .select(col("a_id"), col("b_id"),
          round(col("dot") / (sqrt(col("aa")) * sqrt(col("bb"))), 4)
            .as("cos_sim"))
      val w = Window.partitionBy("a_id")
        .orderBy(col("cos_sim").desc, col("b_id"))
      val nb = scored.withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select(col("a_id"), col("b_id"), col("cos_sim"))
      nb.as("x").join(nb.as("y"),
          col("y.a_id") === col("x.b_id") && col("y.b_id") === col("x.a_id") &&
            col("x.a_id") < col("x.b_id"))
        .select(col("x.a_id").as("a"), col("x.b_id").as("b"),
          col("x.cos_sim").as("cos_sim"))
        .orderBy("a")
    },
    Some(
      s"""WITH e AS (
         |  SELECT vec_id, embedding FROM embeddings WHERE vec_id < $mutualMaxVec),
         |dots AS (
         |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |    sum(CAST(a.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS dot,
         |    sum(CAST(a.embedding[i] AS DOUBLE) * CAST(a.embedding[i] AS DOUBLE)) AS aa,
         |    sum(CAST(b.embedding[i] AS DOUBLE) * CAST(b.embedding[i] AS DOUBLE)) AS bb
         |  FROM e a, e b, generate_series(1, 64) t(i)
         |  WHERE a.vec_id <> b.vec_id GROUP BY 1, 2),
         |scored AS (
         |  SELECT a_id, b_id, round(dot / (sqrt(aa) * sqrt(bb)), 4) AS cos_sim
         |  FROM dots),
         |nb AS (
         |  SELECT a_id, b_id, cos_sim,
         |    row_number() OVER (PARTITION BY a_id ORDER BY cos_sim DESC, b_id) AS rn
         |  FROM scored)
         |SELECT x.a_id AS a, x.b_id AS b, x.cos_sim
         |FROM nb x JOIN nb y
         |  ON y.a_id = x.b_id AND y.b_id = x.a_id AND x.a_id < x.b_id
         |WHERE x.rn = 1 AND y.rn = 1
         |ORDER BY a""".stripMargin))

  val all: Seq[QueryDef] = Seq(qShapley, qPrefixJoin, qMutualKnn)
}
