package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Sixty-sixth wave — quantization, novelty, windowed distinct, and
  * MMR reranking.
  *
  *  - `q_embedding_quantize`: symmetric int8 quantization of the
  *    embedding corpus — per-dimension absmax scale, nearest-integer
  *    codes, exact reconstruction-error audit. Everything rides the
  *    integer lattice (values pre-scaled ×10⁶ as in q_gram_matrix), so
  *    code = round(|v|·127/absmax) computes as the exact floor form
  *    `(2|v|·127 + m − (2|v|·127 + m) mod 2m) / 2m` on NONNEGATIVE
  *    operands (no floor-vs-truncate divergence). The per-dim absmax
  *    is a d-sized broadcastable aggregate; max error must be ≤ m/2 —
  *    the audit a serving stack runs before shipping int8 indexes.
  *  - `q_ngram_novelty`: per-language trigram novelty — the share of a
  *    doc's distinct trigrams whose FIRST occurrence (min doc_id) is in
  *    that doc. Gram first-occurrence is one map-side-combined shuffle;
  *    novelty in exact basis points. The dataset-growth curve metric
  *    (how much new text each source actually contributes).
  *  - `q_windowed_distinct`: trailing-7-day distinct users per day.
  *    Spark has no COUNT(DISTINCT) OVER RANGE; the scalable form
  *    expands each distinct (user, day) pair to the ≤7 window ends it
  *    can serve (constant fanout = window length, map-side) and
  *    re-aggregates — never a per-day rescan of the corpus.
  *  - `q_mmr_rerank`: Maximal Marginal Relevance reranking (Carbonell &
  *    Goldstein 1998), λ = 0.5: greedily pick k = 5 of the top-10
  *    relevance candidates, each round scoring
  *    `rel_bp − max(sim_bp to already-selected)` in exact basis points
  *    (relevance = 'scan' term count normalized to the candidate max;
  *    similarity = bigram Jaccard). The DISTRIBUTED work is candidate
  *    generation (corpus top-k + k² pairwise sims); the greedy loop
  *    runs driver-side over the model-sized (≤10 rel rows, ≤90 sim
  *    rows) tables — the kmeans-centroid collect discipline. The
  *    oracle unrolls the same 5 greedy rounds as generated CTE levels
  *    (the q_bpe_merges pattern).
  */
object R66Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------- q_embedding_quantize ----------

  val qEmbeddingQuantize = QueryDef("q_embedding_quantize",
    (s, dir) => {
      val pts = t(s, dir, "embeddings").select(col("vec_id"),
          posexplode(expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
            .as(Seq("d", "v")))
        .select(col("d").cast("long").as("d"), col("v"))
      val m = pts.groupBy("d")
        .agg(greatest(max(abs(col("v"))), lit(1L)).as("absmax"))
      val q = pts.join(broadcast(m), "d")
        .withColumn("x", abs(col("v")) * 254L + col("absmax"))
        .withColumn("code",
          when(col("v") < 0, lit(-1L)).otherwise(lit(1L)) *
            ((col("x") - col("x") % (col("absmax") * 2L)) /
              (col("absmax") * 2L)).cast("long"))
      q.groupBy("d", "absmax")
        .agg(sum(col("code")).cast("long").as("sum_code"),
          max(abs(col("v") * 127L - col("code") * col("absmax")))
            .cast("long").as("max_err_scaled"))
        .select(col("d"), col("absmax"), col("sum_code"), col("max_err_scaled"))
        .orderBy("d")
    },
    Some(
      """WITH pts AS (
        |  SELECT vec_id, CAST(i - 1 AS BIGINT) AS d,
        |    CAST(floor(CAST(embedding[CAST(i AS INTEGER)] AS DOUBLE) * 1000000) AS BIGINT) AS v
        |  FROM embeddings, range(1, 65) t(i)),
        |m AS (SELECT d, CAST(greatest(max(abs(v)), 1) AS BIGINT) AS absmax FROM pts GROUP BY d),
        |q AS (
        |  SELECT p.vec_id, p.d, p.v, m.absmax,
        |    CASE WHEN p.v < 0 THEN -1 ELSE 1 END
        |      * CAST(((2 * abs(p.v) * 127 + m.absmax)
        |              - (2 * abs(p.v) * 127 + m.absmax) % (2 * m.absmax))
        |        / (2 * m.absmax) AS BIGINT) AS code
        |  FROM pts p JOIN m ON p.d = m.d),
        |e AS (
        |  SELECT d, absmax,
        |    CAST(sum(code) AS BIGINT) AS sum_code,
        |    CAST(max(abs(v * 127 - code * absmax)) AS BIGINT) AS max_err_scaled
        |  FROM q GROUP BY d, absmax)
        |SELECT d, absmax, sum_code, max_err_scaled FROM e ORDER BY d""".stripMargin))

  // ---------- q_ngram_novelty ----------

  val qNgramNovelty = QueryDef("q_ngram_novelty",
    (s, dir) => {
      val docs = t(s, dir, "documents").where(col("doc_id") < 2000)
        .select(col("doc_id"), col("lang"), split(col("text"), " ").as("ws"))
        .where(size(col("ws")) >= 3)
      val grams = docs.select(col("doc_id"), col("lang"),
          explode(expr("transform(sequence(0, size(ws) - 3)," +
            " i -> concat(ws[i], ' ', ws[i + 1], ' ', ws[i + 2]))")).as("gram"))
        .distinct()
      val first = grams.groupBy("gram").agg(min(col("doc_id")).as("first_doc"))
      val perDoc = grams.join(first, "gram")
        .groupBy("doc_id", "lang")
        .agg(count(lit(1)).as("n_grams"),
          sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L))
            .as("n_new"))
      val nn = col("n_new") * 10000L
      val g = col("n_grams")
      perDoc.groupBy("lang")
        .agg(count(lit(1)).cast("long").as("n_docs"),
          sum(g).cast("long").as("grams"),
          sum(col("n_new")).cast("long").as("new_grams"))
        .withColumn("novelty_bp",
          ((col("new_grams") * 10000L -
            ((col("new_grams") * 10000L % col("grams")) + col("grams"))
              % col("grams")) / col("grams")).cast("long"))
        .select(col("lang"), col("n_docs"), col("grams"), col("new_grams"),
          col("novelty_bp"))
        .orderBy("lang")
    },
    Some(
      """WITH docs AS (
        |  SELECT doc_id, lang, string_split(text, ' ') AS ws
        |  FROM documents WHERE doc_id < 2000),
        |idx AS (SELECT doc_id, lang, ws, unnest(range(1, len(ws) - 1)) AS i FROM docs),
        |grams AS (
        |  SELECT DISTINCT doc_id, lang,
        |    ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1] || ' '
        |      || ws[CAST(i AS INTEGER) + 2] AS gram
        |  FROM idx),
        |first_seen AS (SELECT gram, min(doc_id) AS first_doc FROM grams GROUP BY gram),
        |per_doc AS (
        |  SELECT g.doc_id, g.lang,
        |    CAST(count(*) AS BIGINT) AS n_grams,
        |    CAST(sum(CASE WHEN f.first_doc = g.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_new
        |  FROM grams g JOIN first_seen f ON g.gram = f.gram
        |  GROUP BY g.doc_id, g.lang)
        |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_grams) AS BIGINT) AS grams,
        |  CAST(sum(n_new) AS BIGINT) AS new_grams,
        |  CAST((sum(n_new) * 10000 - ((sum(n_new) * 10000 % sum(n_grams)) + sum(n_grams)) % sum(n_grams))
        |    / sum(n_grams) AS BIGINT) AS novelty_bp
        |FROM per_doc GROUP BY lang ORDER BY lang""".stripMargin))

  // ---------- q_windowed_distinct ----------

  val qWindowedDistinct = QueryDef("q_windowed_distinct",
    (s, dir) => {
      val usPerDay = 86400000000L
      val ev = Tables.events(s, dir)
        .select(col("user_id"),
          (unix_micros(col("ts")) -
            ((unix_micros(col("ts")) % usPerDay) + usPerDay) % usPerDay)
            .divide(usPerDay).cast("long").as("day"))
      val pairs = ev.distinct()
      val days = pairs.select("day").distinct()
      val expanded = pairs.select(col("user_id"),
        explode(sequence(lit(0L), lit(6L))).as("off"), col("day"))
        .select(col("user_id"), (col("day") + col("off")).as("win_end"))
      val counts = expanded.groupBy("win_end")
        .agg(countDistinct(col("user_id")).cast("long").as("n_users"))
      days.join(counts, days("day") === counts("win_end"))
        .select(col("day"), col("n_users"))
        .orderBy("day")
    },
    Some(
      """WITH ev AS (
        |  SELECT user_id,
        |    CAST((epoch_us(ts) - ((epoch_us(ts) % 86400000000) + 86400000000) % 86400000000)
        |      / 86400000000 AS BIGINT) AS day
        |  FROM events),
        |pairs AS (SELECT DISTINCT user_id, day FROM ev),
        |days AS (SELECT DISTINCT day FROM ev),
        |expanded AS (
        |  SELECT p.user_id, p.day + CAST(o.g AS BIGINT) AS win_end
        |  FROM pairs p, generate_series(0, 6) o(g)),
        |counts AS (
        |  SELECT win_end, CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
        |  FROM expanded GROUP BY win_end)
        |SELECT d.day, c.n_users
        |FROM days d JOIN counts c ON c.win_end = d.day
        |ORDER BY d.day""".stripMargin))

  // ---------- q_mmr_rerank ----------

  private val MmrK = 5

  /** Oracle: the same greedy rounds unrolled as generated CTE levels. */
  private val mmrOracle: String = {
    val base =
      """WITH docs AS (
        |  SELECT doc_id, string_split(text, ' ') AS ws
        |  FROM documents WHERE doc_id < 1000),
        |rel AS (
        |  SELECT doc_id, CAST(len(list_filter(ws, x -> x = 'scan')) AS BIGINT) AS rel
        |  FROM docs),
        |cands AS (SELECT doc_id, rel FROM rel WHERE rel > 0 ORDER BY rel DESC, doc_id LIMIT 10),
        |mx AS (SELECT CAST(max(rel) AS BIGINT) AS mr FROM cands),
        |crel AS (
        |  SELECT c.doc_id,
        |    CAST((c.rel * 10000 - (c.rel * 10000 % mx.mr)) / mx.mr AS BIGINT) AS rel_bp
        |  FROM cands c, mx),
        |cdocs AS (SELECT d.doc_id, d.ws FROM docs d JOIN cands c ON d.doc_id = c.doc_id),
        |idx AS (SELECT doc_id, ws, unnest(range(1, len(ws))) AS i FROM cdocs),
        |grams AS (
        |  SELECT DISTINCT doc_id,
        |    ws[CAST(i AS INTEGER)] || ' ' || ws[CAST(i AS INTEGER) + 1] AS g
        |  FROM idx),
        |sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM grams GROUP BY doc_id),
        |inter AS (
        |  SELECT a.doc_id AS a, b.doc_id AS b, CAST(count(*) AS BIGINT) AS ni
        |  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
        |  GROUP BY a.doc_id, b.doc_id),
        |sims0 AS (
        |  SELECT i.a, i.b,
        |    CAST((i.ni * 10000 - (i.ni * 10000 % (sa.n + sb.n - i.ni)))
        |      / (sa.n + sb.n - i.ni) AS BIGINT) AS sim_bp
        |  FROM inter i JOIN sizes sa ON sa.doc_id = i.a JOIN sizes sb ON sb.doc_id = i.b),
        |sims AS (SELECT a, b, sim_bp FROM sims0
        |         UNION ALL SELECT b AS a, a AS b, sim_bp FROM sims0),
        |s1 AS (SELECT doc_id, CAST(1 AS BIGINT) AS rank, rel_bp AS score_bp
        |       FROM crel ORDER BY rel_bp DESC, doc_id LIMIT 1),
        |p1 AS (SELECT doc_id FROM s1)""".stripMargin
    val rounds = (2 to MmrK).map { r =>
      s""",
         |r$r AS (
         |  SELECT c.doc_id, CAST(c.rel_bp - coalesce(max(sim.sim_bp), 0) AS BIGINT) AS score_bp
         |  FROM crel c LEFT JOIN
         |    (SELECT s.a, s.sim_bp FROM sims s JOIN p${r - 1} p ON s.b = p.doc_id) sim
         |    ON sim.a = c.doc_id
         |  WHERE c.doc_id NOT IN (SELECT doc_id FROM p${r - 1})
         |  GROUP BY c.doc_id, c.rel_bp),
         |s$r AS (SELECT doc_id, CAST($r AS BIGINT) AS rank, score_bp
         |        FROM r$r ORDER BY score_bp DESC, doc_id LIMIT 1),
         |p$r AS (SELECT doc_id FROM p${r - 1} UNION ALL SELECT doc_id FROM s$r)""".stripMargin
    }.mkString
    val union = (1 to MmrK)
      .map(r => s"SELECT doc_id, rank, score_bp FROM s$r")
      .mkString("\n", " UNION ALL ", "\nORDER BY rank")
    base + rounds + union
  }

  val qMmrRerank = QueryDef("q_mmr_rerank",
    (s, dir) => {
      import s.implicits._
      val docs = t(s, dir, "documents").where(col("doc_id") < 1000)
        .select(col("doc_id"), split(col("text"), " ").as("ws"))
      val rel = docs.select(col("doc_id"),
        size(expr("filter(ws, x -> x = 'scan')")).cast("long").as("rel"))
      val cands = rel.where(col("rel") > 0)
        .orderBy(col("rel").desc, col("doc_id")).limit(10)
      val mx = cands.agg(max(col("rel")).as("mr"))
      val crel = cands.crossJoin(broadcast(mx))
        .select(col("doc_id"),
          ((col("rel") * 10000L - (col("rel") * 10000L % col("mr"))) /
            col("mr")).cast("long").as("rel_bp"))
      val grams = docs.join(broadcast(cands.select("doc_id")), "doc_id")
        .where(size(col("ws")) >= 2)
        .select(col("doc_id"),
          explode(expr("transform(sequence(0, size(ws) - 2)," +
            " i -> concat(ws[i], ' ', ws[i + 1]))")).as("g"))
        .distinct()
      val sizes = grams.groupBy("doc_id").agg(count(lit(1)).as("n"))
      val a = grams.select(col("doc_id").as("a"), col("g"))
      val b = grams.select(col("doc_id").as("b"), col("g"))
      val inter = a.join(b, "g").where(col("a") < col("b"))
        .groupBy("a", "b").agg(count(lit(1)).as("ni"))
      val sims = inter
        .join(sizes.select(col("doc_id").as("a"), col("n").as("na")), "a")
        .join(sizes.select(col("doc_id").as("b"), col("n").as("nb")), "b")
        .select(col("a"), col("b"),
          ((col("ni") * 10000L -
            (col("ni") * 10000L % (col("na") + col("nb") - col("ni")))) /
            (col("na") + col("nb") - col("ni"))).cast("long").as("sim_bp"))
      // model-sized collects (<=10 rel rows, <=45 sim pairs): the greedy
      // argmax is inherently sequential — kmeans-centroid discipline
      val relRows = crel.as[(Long, Long)].collect().toMap
      val simRows = sims.as[(Long, Long, Long)].collect()
        .flatMap { case (x, y, v) => Seq((x, y) -> v, (y, x) -> v) }.toMap
      val selected = scala.collection.mutable.ArrayBuffer.empty[(Long, Long, Long)]
      val remaining = scala.collection.mutable.SortedSet(relRows.keys.toSeq: _*)
      var rank = 1L
      while (rank <= MmrK && remaining.nonEmpty) {
        val scored = remaining.toSeq.map { c =>
          val maxSim =
            if (selected.isEmpty) 0L
            else selected.map(sel => simRows.getOrElse((c, sel._1), 0L)).max
          val score = if (selected.isEmpty) relRows(c) else relRows(c) - maxSim
          (c, score)
        }
        val (pick, score) = scored.minBy { case (c, sc) => (-sc, c) }
        selected += ((pick, rank, score))
        remaining -= pick
        rank += 1
      }
      selected.toSeq.toDF("doc_id", "rank", "score_bp").orderBy("rank")
    },
    Some(mmrOracle))

  val all: Seq[QueryDef] = Seq(qEmbeddingQuantize, qNgramNovelty,
    qWindowedDistinct, qMmrRerank)
}
