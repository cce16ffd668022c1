package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.BpeOps

/** BPE merge induction: the delimited-string merge must behave exactly
  * like greedy pair substitution over token sequences — including the
  * cases the encoding could get wrong (overlapping runs, merged tokens
  * whose characters contain another token, frequency ties). */
class BpeOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def merges(texts: Seq[String], iters: Int): Seq[(Int, String, String, Long)] =
    BpeOps.trainMerges(spark, texts.toDF("text"), "text", iters)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq

  test("counts and merges a hand-computed corpus") {
    // pairs: (a,b)×2, (b,a)×1, (b,c)×1 → merge (a,b); then (ab,c)×1,(b,ab)×1 → tie → (ab,c)
    val got = merges(Seq("a b c", "b a b"), 2)
    assert(got == Seq((1, "a", "b", 2L), (2, "ab", "c", 1L)))
  }

  test("overlapping run merges greedily leftmost: a a a -> (aa, a)") {
    // (a,a) appears twice in "a a a"; after the merge the doc must read
    // "aa a" (leftmost pair wins), giving round 2 the pair (aa, a)
    val got = merges(Seq("a a a", "a a a"), 2)
    assert(got(0) == ((1, "a", "a", 4L)))
    assert(got(1) == ((2, "aa", "a", 2L)))
  }

  test("alternating run merges BOTH pairs in one pass: a b a b") {
    val got = merges(Seq("a b a b"), 1)
    assert(got == Seq((1, "a", "b", 2L)))
    // apply the merge the way trainMerges does and re-count: both "a b"
    // occurrences must have merged (scan continues after the match)
    val corpus = BpeOps.corpusForm(Seq("a b a b").toDF("text"), "text")
      .selectExpr("replace(s, ' a  b ', ' ab ') AS s")
    val pairs = BpeOps.pairCounts(corpus)
      .as[(String, String, Long)].collect().toSeq
    assert(pairs == Seq(("ab", "ab", 1L)))
  }

  test("merged token cannot match inside another token's characters") {
    // after (a,b)->ab, the doc "ab  b" must NOT let pair (b,b) or (ab,b)
    // match inside "ab"; the only remaining pair is (ab, b)
    val got = merges(Seq("a b b", "a b b"), 2)
    assert(got(0) == ((1, "a", "b", 2L)))
    assert(got(1) == ((2, "ab", "b", 2L)))
  }

  test("frequency ties break lexicographically on (w1, w2)") {
    // (z,y) and (a,b) both appear once -> (a,b) must win rank 1
    val got = merges(Seq("z y", "a b"), 1)
    assert(got == Seq((1, "a", "b", 1L)))
  }

  test("single-token and empty docs contribute no pairs") {
    val got = merges(Seq("only", "", "  ", "a b"), 1)
    assert(got == Seq((1, "a", "b", 1L)))
  }

  test("encode applies merges in rank order and counts resulting tokens") {
    // merges: (a,b) then (ab,c) — "a b c d" encodes to [abc, d] = 2 tokens;
    // rank order matters: applying (ab,c) first would find nothing
    val ms = Seq(BpeOps.Merge(1, "a", "b", 0L), BpeOps.Merge(2, "ab", "c", 0L))
    val docs = Seq((1L, "a b c d"), (2L, "c a b"), (3L, ""), (4L, "x"))
      .toDF("doc_id", "text")
    val got = BpeOps.encode(docs, "text", "doc_id", ms)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 0L), (4L, 1L)))
  }

  test("no persisted corpus RDDs leak after training") {
    val before = spark.sparkContext.getPersistentRDDs.keySet
    merges(Seq("a b c a b", "c a b"), 3)
    val leaked = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(leaked.isEmpty, s"leaked persisted RDDs: $leaked")
  }

  // ---------- word-level (production) trainer ----------

  import org.apache.spark.sql.functions._

  private def wordMerges(texts: Seq[String], iters: Int,
      maxWords: Int): Seq[(Int, String, String, Long)] =
    BpeOps.trainMergesWordLevel(spark, texts.toDF("text"), "text",
      iters, maxWords).orderBy("rank")
      .as[(Int, String, String, Long)].collect().toSeq

  test("word-table trainer ≡ corpus-form trainer on char-exploded words") {
    // the verdict-r4 equivalence pin: exploding every word OCCURRENCE
    // into a row of single-space-joined characters makes the sequence-
    // level trainer compute exactly the word-level semantics (pairs
    // cannot cross rows = cannot cross words); the incremental
    // word-table loop must reproduce it merge for merge
    val texts = Seq("the cat sat on the mat", "the cat cat", "mat on mat",
      "aaa aa a the", "", "  ", "sat")
    val docs = texts.toDF("text")
    val viaWordTable = wordMerges(texts, 6, maxWords = 1000)
    val charRows = docs.select(explode(filter(split(col("text"), "\\s+"),
        w => length(w) > 0)).as("w"))
      .select(array_join(filter(split(col("w"), ""), c => length(c) > 0), " ")
        .as("text"))
    val viaCorpusForm = BpeOps.trainMerges(spark, charRows, "text", 6)
      .orderBy("rank").as[(Int, String, String, Long)].collect().toSeq
    assert(viaWordTable == viaCorpusForm)
  }

  test("word-level merges are within-word and frequency-weighted") {
    // 'ab' appears 3×, 'cd' 2× -> (a,b) n=3 wins round 1; no pair ever
    // spans the word boundary (e.g. (b,c) must NOT appear)
    val got = wordMerges(Seq("ab cd ab", "ab cd"), 2, maxWords = 100)
    assert(got(0) == ((1, "a", "b", 3L)))
    assert(got(1) == ((2, "c", "d", 2L)))
  }

  test("maxWords cap keeps only the top-frequency words") {
    // cap=1 keeps only 'ab' (freq 2 beats 'xy' freq 1): the (x,y) pair
    // must contribute nothing
    val got = wordMerges(Seq("ab xy ab"), 2, maxWords = 1)
    assert(got == Seq((1, "a", "b", 2L)))
  }

  test("word-level encode merges within words and counts subword tokens") {
    val ms = Seq(BpeOps.Merge(1, "a", "b", 0L), BpeOps.Merge(2, "ab", "c", 0L))
    // "abc ab" -> [abc] [ab] = 2; "cab" -> [c a b]->[c ab] = 2; "" -> 0
    val docs = Seq((1L, "abc ab"), (2L, "cab"), (3L, ""), (4L, "x y"))
      .toDF("doc_id", "text")
    val got = BpeOps.encodeWordLevel(docs, "text", "doc_id", ms)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(got == Seq((1L, 2L), (2L, 2L), (3L, 0L), (4L, 2L)))
  }
}
