package graft.ext

import scala.collection.mutable
import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge induction — the tokenizer-training step of
  * a training-data pipeline, structured the way production trainers
  * (SentencePiece, HF tokenizers) structure it:
  *
  *  1. ONE distributed aggregation folds the corpus into a
  *     (distinct form, frequency) table — the only pass whose cost
  *     scales with corpus size;
  *  2. every merge round then runs against that table with incremental
  *     pair-count maintenance: a round touches ONLY the forms that
  *     contain the merged pair, so round cost is independent of both
  *     corpus size and round number.
  *
  * Two granularities share the loop:
  *  - [[trainMergesWordLevel]] — the production configuration: forms
  *    are whitespace words split into characters, so the table is
  *    VOCABULARY-sized (further bounded by `maxWords`, a deterministic
  *    top-N-by-frequency cap — the standard trainer practice) and the
  *    driver-side state is model-sized like the IVF/PQ codebooks;
  *  - [[trainMerges]] — the sequence-level twin (symbols = whitespace
  *    tokens, adjacency spans the whole document): kept because its
  *    semantics are pinned by the original oracle; its table is
  *    DISTINCT-DOCUMENT-sized, so it is the bounded-input/oracle form,
  *    not the 100 TB path.
  *
  * Merge semantics (identical in the in-memory loop, the Spark encode
  * expression, and the DuckDB oracle):
  *  - pair counting is per adjacent POSITION (an overlapping run
  *    `a a a` contributes two (a,a) counts), frequency-weighted;
  *  - argmax tie-break is (count desc, w1, w2) under unsigned UTF-8
  *    byte order — the collation Spark's UTF8String and DuckDB both
  *    sort by, so any engine reproduces the same vocabulary;
  *  - merging is leftmost non-overlapping greedy substitution, exactly
  *    what a scalar `replace` of `" w1  w2 "` with `" w1w2 "` does over
  *    the double-space-delimited string form (each symbol sees a
  *    boundary space on each side that belongs to no other symbol, so
  *    a merged symbol can never match inside another symbol's
  *    characters).
  *
  * ENCODING stays a single map-side pass at any corpus size: the
  * trained merges are model-sized literals folded into one chained-
  * replace projection ([[encode]], [[encodeWordLevel]]) — no shuffle.
  */
object BpeOps {

  /** One BPE merge: rank (1-based), the two merged tokens, and the
    * pair's corpus frequency at merge time. */
  case class Merge(rank: Int, w1: String, w2: String, n: Long)

  /** Delimited corpus form of a space-tokenized text column. */
  def corpusForm(docs: DataFrame, textCol: String): DataFrame =
    docs.select(
      concat(lit("  "),
        array_join(filter(split(col(textCol), " "), t => length(t) > 0), "  "),
        lit("  ")).as("s"))

  /** Adjacent-pair counts over the corpus form (kept as the
    * spec/property reference for the incremental loop's bookkeeping). */
  def pairCounts(corpus: DataFrame): DataFrame =
    corpus
      .select(split(trim(col("s")), "  ").as("arr"))
      .where(size(col("arr")) >= 2)
      // sequence(1, 0) would be a DESCENDING two-element array in Spark,
      // so the >=2 guard above is load-bearing
      .select(explode(expr(
        "transform(sequence(1, size(arr) - 1), " +
          "i -> struct(element_at(arr, i) AS w1, element_at(arr, i + 1) AS w2))"))
        .as("p"))
      .groupBy(col("p.w1").as("w1"), col("p.w2").as("w2"))
      .agg(count(lit(1)).cast("long").as("n"))

  /** Unsigned byte-wise UTF-8 "less than" — matches Spark UTF8String
    * and DuckDB string ordering (Java's String.compareTo compares
    * UTF-16 code units and diverges on supplementary characters). */
  private def byteLess(a: String, b: String): Boolean = {
    val x = a.getBytes("UTF-8"); val y = b.getBytes("UTF-8")
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val d = (x(i) & 0xff) - (y(i) & 0xff)
      if (d != 0) return d < 0
      i += 1
    }
    x.length < y.length
  }

  /** Leftmost non-overlapping greedy substitution of the pair — the
    * array twin of `replace(s, " w1  w2 ", " w1w2 ")` on the delimited
    * string form (both scan left to right and continue AFTER the
    * matched region, so `a a a` merges to `aa a`, not `a aa`). */
  private def mergePair(s: Array[String], w1: String, w2: String): Array[String] = {
    val out = ArrayBuffer.empty[String]
    var j = 0
    while (j < s.length) {
      if (j < s.length - 1 && s(j) == w1 && s(j + 1) == w2) {
        out += (w1 + w2); j += 2
      } else { out += s(j); j += 1 }
    }
    out.toArray
  }

  /** The shared merge loop over an aggregated (form, freq) table with
    * INCREMENTAL pair-count maintenance: `counts` holds the global
    * frequency-weighted pair counts, `where` indexes which forms
    * contain each pair, and a merge round re-counts only the affected
    * forms — every other form's contribution is untouched. Round cost
    * is therefore O(affected forms × form length) + an argmax scan of
    * the (model-sized) live pair set, independent of corpus size and
    * of how many rounds ran before. */
  private def trainOnForms(table: Array[(Array[String], Long)],
      iterations: Int): Seq[Merge] = {
    val forms: Array[Array[String]] = table.map(_._1)
    val freqs: Array[Long] = table.map(_._2)
    val counts = mutable.HashMap.empty[(String, String), Long]
    val where = mutable.HashMap.empty[(String, String), mutable.Set[Int]]

    def pairsAt(i: Int): Iterator[(String, String)] = {
      val s = forms(i)
      (0 until s.length - 1).iterator.map(j => (s(j), s(j + 1)))
    }
    def unindex(i: Int): Unit = pairsAt(i).foreach { p =>
      val n = counts(p) - freqs(i)
      if (n == 0L) counts.remove(p) else counts(p) = n
      where.get(p).foreach { ws => ws -= i; if (ws.isEmpty) where.remove(p) }
    }
    def index(i: Int): Unit = pairsAt(i).foreach { p =>
      counts.update(p, counts.getOrElse(p, 0L) + freqs(i))
      where.getOrElseUpdate(p, mutable.Set.empty[Int]) += i
    }
    forms.indices.foreach(index)

    val merges = ArrayBuffer.empty[Merge]
    var r = 1
    // counts empty = no adjacent pair anywhere: stop (same exhaustion
    // rule as the unrolled oracle, whose later rounds then emit nothing)
    while (r <= iterations && counts.nonEmpty) {
      var bw1: String = null; var bw2: String = null; var bn = 0L
      counts.foreach { case ((w1, w2), n) =>
        if (bw1 == null || n > bn || (n == bn &&
            (byteLess(w1, bw1) || (w1 == bw1 && byteLess(w2, bw2))))) {
          bw1 = w1; bw2 = w2; bn = n
        }
      }
      merges += Merge(r, bw1, bw2, bn)
      // snapshot: unindex/index mutate `where` while we iterate
      val affected = where.get((bw1, bw2)).map(_.toArray).getOrElse(Array.empty)
      affected.foreach { i =>
        unindex(i)
        forms(i) = mergePair(forms(i), bw1, bw2)
        index(i)
      }
      r += 1
    }
    merges.toSeq
  }

  /** Train `iterations` merges at SEQUENCE level (symbols = whitespace
    * tokens of each row, adjacency spans the row); returns them in rank
    * order. One corpus pass aggregates identical rows into (form, freq);
    * the merge loop is then incremental and corpus-independent per
    * round. NOTE the table here is distinct-ROW-sized — bounded-input /
    * oracle use; [[trainMergesWordLevel]] is the production path whose
    * table is vocabulary-sized. */
  def trainMerges(spark: SparkSession, docs: DataFrame, textCol: String,
      iterations: Int): DataFrame = {
    import spark.implicits._
    val table = corpusForm(docs, textCol)
      .groupBy("s").agg(count(lit(1)).cast("long").as("freq"))
      .collect()
      .map(r => (r.getString(0).trim.split("  ").filter(_.nonEmpty),
        r.getLong(1)))
    trainOnForms(table, iterations).toDF("rank", "w1", "w2", "n")
  }

  /** Apply trained merges (rank order) to a corpus: the ENCODE step.
    * Chained scalar replaces — merges ship to executors as literals in
    * one projection, so encoding any corpus size is a single map-side
    * pass (this is how a trained tokenizer is applied at 100 TB: the
    * vocabulary is model-sized, the data never re-shuffles). */
  def encode(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge]): DataFrame = {
    val corpus = docs.select(col(idCol),
      concat(lit("  "),
        array_join(filter(split(col(textCol), " "), t => length(t) > 0), "  "),
        lit("  ")).as("s"))
    val encoded = merges.sortBy(_.rank).foldLeft(corpus) { (df, m) =>
      df.withColumn("s",
        replace(col("s"), lit(s" ${m.w1}  ${m.w2} "), lit(s" ${m.w1}${m.w2} ")))
    }
    encoded.select(col(idCol),
      when(length(trim(col("s"))) === 0, lit(0L))
        .otherwise(size(split(trim(col("s")), "  ")).cast("long"))
        .as("n_tokens"))
  }

  // ------------------------------------------------------------------
  // Word-level (production) configuration: character merges inside
  // whitespace words over a vocabulary-sized (word, freq) table.
  // ------------------------------------------------------------------

  /** The ONE corpus-scaling pass of word-level training: whitespace
    * words counted, then capped to the `maxWords` most frequent
    * (ties broken by word, byte order — deterministic in any engine).
    * The cap is the standard trainer practice (SentencePiece
    * subsamples, HF caps the word table): the kept head carries the
    * overwhelming pair mass while bounding driver state at 100 TB,
    * where the raw distinct-word tail is unbounded web junk. */
  def wordFreqTable(docs: DataFrame, textCol: String, maxWords: Int): DataFrame =
    docs.select(explode(filter(split(col(textCol), "\\s+"),
        w => length(w) > 0)).as("word"))
      .groupBy("word").agg(count(lit(1)).cast("long").as("freq"))
      .orderBy(col("freq").desc, col("word")).limit(maxWords)

  /** Train `iterations` character-level merges inside whitespace words
    * — standard BPE. The collected table is maxWords-bounded (model-
    * sized, the codebook-collect discipline); every merge round runs
    * incrementally against it, touching only words that contain the
    * merged pair. */
  def trainMergesWordLevel(spark: SparkSession, docs: DataFrame,
      textCol: String, iterations: Int, maxWords: Int): DataFrame = {
    import spark.implicits._
    val table = wordFreqTable(docs, textCol, maxWords).collect()
      .map(r => (r.getString(0).split("").filter(_.nonEmpty), r.getLong(1)))
    trainOnForms(table, iterations).toDF("rank", "w1", "w2", "n")
  }

  /** Word-level delimited form of a whole document: each word's
    * characters joined by TWO spaces, words separated by FOUR (two
    * from each word's own boundary wrap) — a merge pattern
    * `" w1  w2 "` needs exactly two interior spaces, so merges can
    * never cross a word boundary. */
  private def wordCharForm(textCol: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val words = filter(split(textCol, "\\s+"), w => length(w) > 0)
    concat(lit("  "),
      array_join(transform(words,
        w => array_join(filter(split(w, ""), c => length(c) > 0), "  ")),
        "    "),
      lit("  "))
  }

  /** Word-level ENCODE: one chained-replace projection (map-side, no
    * shuffle); `n_tokens` counts the resulting subword symbols across
    * the whole document (separators are runs of 2+ spaces). */
  def encodeWordLevel(docs: DataFrame, textCol: String, idCol: String,
      merges: Seq[Merge]): DataFrame = {
    val corpus = docs.select(col(idCol), wordCharForm(col(textCol)).as("s"))
    val encoded = merges.sortBy(_.rank).foldLeft(corpus) { (df, m) =>
      df.withColumn("s",
        replace(col("s"), lit(s" ${m.w1}  ${m.w2} "), lit(s" ${m.w1}${m.w2} ")))
    }
    encoded.select(col(idCol),
      when(length(trim(col("s"))) === 0, lit(0L))
        .otherwise(size(split(trim(col("s")), " {2,}")).cast("long"))
        .as("n_tokens"))
  }

  // ------------------------------------------------------------------
  // DuckDB oracles. Sequence-level generators replay the historic
  // corpus-form semantics; word-level generators replay the
  // production semantics. Both unroll the SAME rounds as CTE levels
  // generated from the same constants as the Spark queries.
  // ------------------------------------------------------------------

  /** Corpus-form SQL fragment. coalesce: DuckDB's array_to_string of an
    * EMPTY list is NULL (Spark's array_join is ''), so a zero-token doc
    * would otherwise poison its whole row with NULL. */
  private def corpusFormSql(cte: String, cols: String, maxDoc: Int): String =
    s"""$cte AS (SELECT $cols'  ' || coalesce(array_to_string(
       |    list_filter(string_split(text, ' '), x -> len(x) > 0), '  '), '')
       |    || '  ' AS s
       |  FROM documents WHERE doc_id < $maxDoc)""".stripMargin

  /** Per-round training CTE level (pairs → argmax → merged corpus).
    * Forms ride with freq = 1 per row; aggregating identical rows the
    * way [[trainMerges]] does would change nothing (sum over equal
    * addends), so the unrolled oracle keeps the simpler per-row shape. */
  private def trainLevelSql(r: Int): String =
    s"""p$r AS (SELECT arr[i] AS w1, arr[i + 1] AS w2
       |  FROM (SELECT arr, unnest(generate_series(1, len(arr) - 1)) AS i
       |        FROM (SELECT string_split(trim(s), '  ') AS arr
       |              FROM docs${r - 1})
       |        WHERE len(arr) >= 2)),
       |b$r AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n FROM p$r
       |  GROUP BY w1, w2 ORDER BY n DESC, w1, w2 LIMIT 1),
       |docs$r AS (SELECT replace(s, ' ' || b.w1 || '  ' || b.w2 || ' ',
       |    ' ' || b.w1 || b.w2 || ' ') AS s
       |  FROM docs${r - 1}, b$r b)""".stripMargin

  /** DuckDB oracle for [[trainMerges]]: the same `iterations` rounds
    * unrolled as CTE levels, generated from the same constants. */
  def trainMergesOracleSql(maxDoc: Int, iterations: Int): String = {
    val base = corpusFormSql("docs0", "", maxDoc)
    val levels = (1 to iterations).map(trainLevelSql)
    val union = (1 to iterations)
      .map(r => s"SELECT $r AS rank, w1, w2, n FROM b$r")
      .mkString("\nUNION ALL\n")
    s"WITH ${(base +: levels).mkString(",\n")}\n$union\nORDER BY rank"
  }

  /** DuckDB oracle for train-then-[[encode]]: the training CTE levels
    * plus chained replaces whose search/replacement strings come from
    * scalar subqueries over each round's argmax row. */
  def encodeOracleSql(trainMaxDoc: Int, iterations: Int,
      encodeMaxDoc: Int): String = {
    val base = corpusFormSql("docs0", "", trainMaxDoc)
    val levels = (1 to iterations).map(trainLevelSql)
    val enc0 = corpusFormSql("enc0", "doc_id, ", encodeMaxDoc)
    val encLevels = (1 to iterations).map { r =>
      // if round r found no pair, b_r is empty and both scalar subqueries
      // are NULL; coalescing BOTH to the same placeholder makes the
      // replace an identity (search == replacement), matching Spark's
      // "apply only the merges that exist" — replace(s, NULL, ...) would
      // instead NULL the whole corpus
      s"""enc$r AS (SELECT doc_id, replace(s,
         |    coalesce((SELECT ' ' || w1 || '  ' || w2 || ' ' FROM b$r), '~'),
         |    coalesce((SELECT ' ' || w1 || w2 || ' ' FROM b$r), '~')) AS s
         |  FROM enc${r - 1})""".stripMargin
    }
    // no outer stripMargin: the interpolated fragments contain lines that
    // BEGIN with the SQL || operator, which stripMargin would mangle
    s"WITH ${(base +: levels).mkString(",\n")},\n" +
      s"${(enc0 +: encLevels).mkString(",\n")}\n" +
      "SELECT doc_id,\n" +
      "  CASE WHEN len(trim(s)) = 0 THEN 0\n" +
      "       ELSE CAST(len(string_split(trim(s), '  ')) AS BIGINT) END\n" +
      "    AS n_tokens\n" +
      s"FROM enc$iterations ORDER BY doc_id"
  }

  /** Word-level (word, freq) table + char-split delimited form as SQL —
    * mirrors [[wordFreqTable]] (same cap, same deterministic order). */
  private def wordFormSql(cte: String, maxDoc: Int, maxWords: Int): String =
    s"""$cte AS (SELECT '  ' || array_to_string(string_split(word, ''), '  ')
       |    || '  ' AS s, freq
       |  FROM (SELECT word, CAST(count(*) AS BIGINT) AS freq
       |        FROM (SELECT unnest(list_filter(regexp_split_to_array(text, '\\s+'),
       |                x -> len(x) > 0)) AS word
       |              FROM documents WHERE doc_id < $maxDoc)
       |        GROUP BY word ORDER BY freq DESC, word LIMIT $maxWords))""".stripMargin

  /** Per-round word-level CTE: same pair/argmax/replace shape as
    * [[trainLevelSql]] but frequency-WEIGHTED (sum(freq), not count). */
  private def wordLevelSql(r: Int): String =
    s"""wp$r AS (SELECT arr[i] AS w1, arr[i + 1] AS w2, freq
       |  FROM (SELECT arr, freq, unnest(generate_series(1, len(arr) - 1)) AS i
       |        FROM (SELECT string_split(trim(s), '  ') AS arr, freq
       |              FROM wdocs${r - 1})
       |        WHERE len(arr) >= 2)),
       |wb$r AS (SELECT w1, w2, CAST(sum(freq) AS BIGINT) AS n FROM wp$r
       |  GROUP BY w1, w2 ORDER BY n DESC, w1, w2 LIMIT 1),
       |wdocs$r AS (SELECT replace(s, ' ' || b.w1 || '  ' || b.w2 || ' ',
       |    ' ' || b.w1 || b.w2 || ' ') AS s, freq
       |  FROM wdocs${r - 1}, wb$r b)""".stripMargin

  /** DuckDB oracle for [[trainMergesWordLevel]]. */
  def trainMergesWordLevelOracleSql(maxDoc: Int, iterations: Int,
      maxWords: Int): String = {
    val base = wordFormSql("wdocs0", maxDoc, maxWords)
    val levels = (1 to iterations).map(wordLevelSql)
    val union = (1 to iterations)
      .map(r => s"SELECT $r AS rank, w1, w2, n FROM wb$r")
      .mkString("\nUNION ALL\n")
    s"WITH ${(base +: levels).mkString(",\n")}\n$union\nORDER BY rank"
  }

  /** DuckDB oracle for word-level train-then-[[encodeWordLevel]]: the
    * weighted training levels plus per-document chained replaces over
    * the 4-space word-separated char form (same '~' identity-coalesce
    * rule as [[encodeOracleSql]]). */
  def encodeWordLevelOracleSql(trainMaxDoc: Int, iterations: Int,
      maxWords: Int, encodeMaxDoc: Int): String = {
    val base = wordFormSql("wdocs0", trainMaxDoc, maxWords)
    val levels = (1 to iterations).map(wordLevelSql)
    val enc0 =
      s"""enc0 AS (SELECT doc_id, '  ' || coalesce(array_to_string(list_transform(
         |    list_filter(regexp_split_to_array(text, '\\s+'), x -> len(x) > 0),
         |    w -> array_to_string(string_split(w, ''), '  ')), '    '), '')
         |    || '  ' AS s
         |  FROM documents WHERE doc_id < $encodeMaxDoc)""".stripMargin
    val encLevels = (1 to iterations).map { r =>
      s"""enc$r AS (SELECT doc_id, replace(s,
         |    coalesce((SELECT ' ' || w1 || '  ' || w2 || ' ' FROM wb$r), '~'),
         |    coalesce((SELECT ' ' || w1 || w2 || ' ' FROM wb$r), '~')) AS s
         |  FROM enc${r - 1})""".stripMargin
    }
    s"WITH ${(base +: levels).mkString(",\n")},\n" +
      s"${(enc0 +: encLevels).mkString(",\n")}\n" +
      "SELECT doc_id,\n" +
      "  CASE WHEN len(trim(s)) = 0 THEN 0\n" +
      "       ELSE CAST(len(regexp_split_to_array(trim(s), ' {2,}')) AS BIGINT) END\n" +
      "    AS n_tokens\n" +
      s"FROM enc$iterations ORDER BY doc_id"
  }
}
