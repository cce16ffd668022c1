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
}
