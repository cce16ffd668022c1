package graft.ext

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for an LLM training-data pipeline (north-star
  * extensions, BASELINE.json): tokenization, language ID, quality scoring,
  * fingerprinting. All pure column expressions — codegen'd, scan-pushable,
  * no UDFs — so they stream through a 100 TB `documents` table at full
  * whole-stage-codegen speed.
  */
object TextOps {

  /** Whitespace tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish pre-tokenizer count: runs of letters, runs of digits, or a
    * single other non-space char (the GPT-2 pre-tokenizer shape, minus
    * unicode classes). */
  val bpeishPattern = "[a-z]+|[A-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(bpeishPattern), lit(0))).cast("long")

  /** Per-language stopword lists for the n-gram/stopword language-ID
    * heuristic. Tiny on purpose: the heuristic is argmax of hit counts. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "is", "of", "and"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "la", "los", "y", "es"))

  /** Count of tokens that are in `words` (language score). */
  def stopwordHits(text: Column, words: Seq[String]): Column =
    size(filter(tokens(text), t => t.isin(words.map(lit(_)): _*))).cast("long")

  /** Argmax language-ID over [[stopwords]]; "und" (undetermined) if all
    * scores are zero. Deterministic tie-break: language key order en,de,fr,es. */
  def langId(text: Column): Column = {
    val ordered = Seq("en", "de", "fr", "es")
    val scores = ordered.map(l => stopwordHits(text, stopwords(l)))
    val best = scores.reduce((a, b) => greatest(a, b))
    ordered.zip(scores).foldRight(lit("und")) { case ((l, s), acc) =>
      when(s === best && best > 0, lit(l)).otherwise(acc)
    }
  }

  /** Quality-score components: token count, mean token length, stopword
    * ratio, non-alpha ratio. Returned as a struct-free set of columns via
    * helpers so queries can select what they need. */
  def meanTokenLen(text: Column): Column =
    (length(regexp_replace(text, " ", "")).cast("double") /
      tokenCount(text).cast("double"))

  def stopwordRatio(text: Column): Column =
    (stopwordHits(text, stopwords.values.flatten.toSeq.distinct).cast("double") /
      tokenCount(text).cast("double"))

  def nonAlphaRatio(text: Column): Column =
    (length(regexp_replace(text, "[a-zA-Z ]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double"))

  /** Composite quality score in [0,1]-ish: rewards stopword density and
    * moderate token length, penalizes non-alpha noise. */
  def qualityScore(text: Column): Column =
    round(lit(0.5) * stopwordRatio(text) +
      lit(0.5) * (lit(1.0) - nonAlphaRatio(text)), 4)

  /** Document fingerprint: md5 of case/whitespace-normalized text —
    * the canonical-form exact-dup key. */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), " +", " ")))

  /** Word n-grams as ARRAY<STRING> (shingles for Jaccard / MinHash).
    * Empty array when the doc has fewer than n tokens (guards the
    * descending-`sequence` pitfall). NOTE: the `transform` evaluates
    * interpreted (higher-order functions have no codegen) with n array
    * lookups per gram — fine for bounded fixtures, but corpus-sized
    * explodes should use [[ngramRows]]. */
  def wordNgrams(text: Column, n: Int): Column = {
    val toks = tokens(text)
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", (0 until n).map(k => get(toks, i + k)): _*)))
      .otherwise(array().cast("array<string>"))
  }

  /** Corpus-scale n-gram stream: (idCol, pos, gram) via ONE token
    * explode + codegen'd window `lead`s — gram strings identical to
    * `explode(wordNgrams(text, n))` (spec-pinned), ~4× faster measured
    * (the HOF form's interpreted per-gram array lookups dominate its
    * profile). The doc-keyed sort the window needs is shared by any
    * downstream per-doc window (winnowing's min-window rides it for
    * free). */
  def ngramRows(docs: org.apache.spark.sql.DataFrame, idCol: String,
                textCol: String, n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ws = Window.partitionBy(idCol).orderBy("pos")
    docs
      .select(col(idCol),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tk")))
      .withColumn("gram", concat_ws(" ",
        col("tk") +: (1 until n).map(k => lead("tk", k).over(ws)): _*))
      .withColumn("last_tk", lead("tk", n - 1).over(ws))
      .where(col("last_tk").isNotNull)
      .select(col(idCol), col("pos"), col("gram"))
  }
}
