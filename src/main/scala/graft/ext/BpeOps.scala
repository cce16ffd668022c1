package graft.ext

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding merge induction — the tokenizer-training step of
  * a training-data pipeline, as an iterative Spark job (the same
  * driver-loop shape as `CrawlGraph.bfs`: per-round distributed work,
  * one tiny synchronization value back to the driver).
  *
  * Each round: count adjacent token pairs corpus-wide (one map-side
  * explode + one hash aggregation — the only shuffle), pick the most
  * frequent pair (count desc, then lexicographic — a DETERMINISTIC
  * tie-break so any engine reproduces the same vocabulary), and merge
  * that pair everywhere. The merge is a single scalar `replace` over a
  * delimited string form, so no per-row UDF and no re-tokenization:
  *
  *  - corpus form: tokens joined by TWO spaces, whole string wrapped
  *    in "  " — every token sees a space on each side that belongs to
  *    no other token;
  *  - merge rank r replaces " w1  w2 " with " w1w2 " — the search
  *    consumes one boundary space per side and the replacement
  *    restores it, so neighbouring separators stay intact and a token
  *    can never match inside another token's characters ("b  b" cannot
  *    match inside "ab  b": the pattern requires a LEADING space);
  *  - scanning is leftmost non-overlapping in both engines (Java
  *    StringUtils and DuckDB `replace` walk the source left to right
  *    and continue after the matched region), which is exactly greedy
  *    BPE application order.
  *
  * The per-round `.first()` pulls ONE row (the argmax pair) — the
  * algorithm's inherent sync point, same as Misra-Gries candidate
  * confirmation; everything data-sized stays distributed. Rounds
  * persist the corpus form and unpersist the previous round, so
  * lineage and storage are O(1) in rounds (the GraphOps discipline).
  *
  * At 100 TB the pair count is a shuffle of (pair, partial-count)
  * pairs — map-side combined, vocabulary-sized, not corpus-sized; the
  * merge pass is embarrassingly parallel. This is how production BPE
  * trainers distribute (count → argmax → substitute), just with the
  * substitution pushed into a codegen'd scalar instead of a UDF.
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

  /** Adjacent-pair counts over the corpus form (the per-round shuffle). */
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

  /** Train `iterations` merges; returns them in rank order. */
  def trainMerges(spark: SparkSession, docs: DataFrame, textCol: String,
      iterations: Int): DataFrame = {
    import spark.implicits._
    val merges = ArrayBuffer.empty[Merge]
    var corpus = corpusForm(docs, textCol).persist()
    try {
      var r = 1
      var exhausted = false
      while (r <= iterations && !exhausted) {
        val best = pairCounts(corpus)
          .orderBy(col("n").desc, col("w1"), col("w2"))
          .limit(1).collect()
        if (best.isEmpty) {
          // no adjacent pair anywhere: every later round would re-run the
          // full count shuffle just to find the same nothing — stop now
          exhausted = true
        } else {
          val (w1, w2, n) = (best(0).getString(0), best(0).getString(1),
            best(0).getLong(2))
          merges += Merge(r, w1, w2, n)
          val next = corpus.select(
            replace(col("s"), lit(s" $w1  $w2 "), lit(s" $w1$w2 ")).as("s"))
            .persist()
          next.count() // materialize before dropping the parent
          corpus.unpersist()
          corpus = next
          r += 1
        }
      }
    } finally corpus.unpersist()
    merges.toSeq.toDF("rank", "w1", "w2", "n")
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

  /** Corpus-form SQL fragment. coalesce: DuckDB's array_to_string of an
    * EMPTY list is NULL (Spark's array_join is ''), so a zero-token doc
    * would otherwise poison its whole row with NULL. */
  private def corpusFormSql(cte: String, cols: String, maxDoc: Int): String =
    s"""$cte AS (SELECT $cols'  ' || coalesce(array_to_string(
       |    list_filter(string_split(text, ' '), x -> len(x) > 0), '  '), '')
       |    || '  ' AS s
       |  FROM documents WHERE doc_id < $maxDoc)""".stripMargin

  /** Per-round training CTE level (pairs → argmax → merged corpus). */
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
}
