package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{DedupOps, SimilarityOps, TextOps}

class DedupSimSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val docs = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "the quick brown fox jumps over the lazy cat"),
    (2L, "completely different words here entirely unrelated text"),
    (3L, "the quick brown fox jumps over the lazy dog") // exact dup of 0
  ).toDF("doc_id", "text")

  def shingles = docs.select($"doc_id",
    explode(TextOps.wordNgrams($"text", 3)).as("shingle")).distinct()

  test("exact dedup marks later duplicate, keeps first") {
    val got = DedupOps.markExactDups(docs, "doc_id", "text")
      .select("doc_id", "is_dup").as[(Long, Boolean)].collect().toMap
    assert(got == Map(0L -> false, 1L -> false, 2L -> false, 3L -> true))
  }

  test("jaccard: exact dup pair = 1.0, near pair high, unrelated absent") {
    val got = DedupOps.jaccardPairs(shingles, "doc_id", 0.01)
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, j) => (a, b) -> j }.toMap
    assert(got((0L, 3L)) == 1.0)
    assert(got((0L, 1L)) > 0.5 && got((0L, 1L)) < 1.0)
    assert(!got.contains((0L, 2L)) && !got.contains((1L, 2L)))
  }

  test("overlapPairs == jaccardPairs at a zero floor (edge set identical)") {
    // the components/canonical/survivor queries swapped jaccardPairs(0.0)
    // for the 3-shuffle-cheaper overlapPairs — pin the equivalence the
    // swap relies on: sharing >= 1 shingle implies jaccard > 0
    val direct = DedupOps.overlapPairs(shingles, "doc_id")
      .as[(Long, Long)].collect().toSet
    val viaJaccard = DedupOps.jaccardPairs(shingles, "doc_id", 0.0)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    assert(direct == viaJaccard)
    assert(direct.nonEmpty && direct.forall { case (a, b) => a < b })
  }

  test("overlapPairs hot-shingle cap bounds the candidate set") {
    // a boilerplate shingle present in EVERY doc makes the raw self-join
    // quadratic: 20 docs sharing one hot shingle alone emit 190 pairs.
    // With the df cap, the hot shingle is dropped before the join and only
    // the genuine co-occurrence edges (disjoint dup pairs) survive.
    val n = 20
    val hotCorpus = (0L until n).flatMap { id =>
      // every doc carries the boilerplate; docs 2k/2k+1 share a real shingle
      Seq((id, "BOILERPLATE"), (id, s"pair_${id / 2}"))
    }.toDF("doc_id", "shingle")
    val uncapped = DedupOps.overlapPairs(hotCorpus, "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(uncapped.size == n * (n - 1) / 2) // quadratic blowup, as documented
    val capped = DedupOps.overlapPairs(hotCorpus, "doc_id", maxShingleDf = 5)
      .as[(Long, Long)].collect().toSet
    assert(capped == (0L until n by 2).map(k => (k, k + 1)).toSet)
    // below the cap the guard is a no-op: same edge set as the bare join
    val under = DedupOps.overlapPairs(shingles, "doc_id",
      maxShingleDf = 1000).as[(Long, Long)].collect().toSet
    val bare = DedupOps.overlapPairs(shingles, "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(under == bare)
  }

  test("single-pass minhashBands == explode-based signatures + lshBands") {
    val fast = DedupOps.minhashBands(
      docs.select($"doc_id", explode(TextOps.wordNgrams($"text", 3)).as("shingle")),
      "doc_id", numSeeds = 8, rowsPerBand = 4)
      .as[(Long, Int, String)].collect().toSet
    val slow = DedupOps.lshBands(
      DedupOps.minhashSignatures(shingles, "doc_id", 8), "doc_id", 4)
      .as[(Long, Int, String)].collect().toSet
    assert(fast == slow)
  }

  test("LSH candidates include the exact-dup pair") {
    val bands = DedupOps.minhashBands(
      docs.select($"doc_id", explode(TextOps.wordNgrams($"text", 3)).as("shingle")),
      "doc_id", 8, 4)
    val pairs = DedupOps.lshCandidatePairs(bands, "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 3L)))
  }

  test("incremental LSH probe: delta×index finds exactly the delta-touching pairs") {
    // the q_minhash_incremental shape (r13, VERDICT r12 task 2 — its
    // oracle row was vacuous at the old fixture knobs): a crafted
    // corpus where doc 4 collides with docs 0/3 and docs 1/2 collide
    // with each other; a delta containing ONLY doc 4 must probe the
    // full band index and emit exactly the pairs touching doc 4 —
    // never the (0,3) or (1,2) pairs the full join would also find.
    val corpus = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta"),
      (3L, "the quick brown fox jumps over the lazy dog"),
      (4L, "the quick brown fox jumps over the lazy dog") // the delta doc
    ).toDF("doc_id", "text")
    val sh = corpus.select($"doc_id",
      explode(TextOps.wordNgrams($"text", 3)).as("shingle")).distinct()
    val bands = DedupOps.lshBands(
      DedupOps.minhashSignatures(sh, "doc_id", 8), "doc_id", rowsPerBand = 4)
    val delta = bands.where($"doc_id" === 4L)
      .select($"doc_id".as("did"), $"band", $"band_sig")
    val got = delta.join(bands, Seq("band", "band_sig"))
      .where($"doc_id" =!= $"did")
      .select(least($"did", $"doc_id").as("a"),
        greatest($"did", $"doc_id").as("b"))
      .distinct().as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 4L), (3L, 4L)),
      s"delta probe must emit exactly the pairs touching doc 4, got $got")
    // sanity: the FULL candidate set does contain the non-delta pairs
    // the probe correctly excluded
    val full = DedupOps.lshCandidatePairs(bands, "doc_id")
      .as[(Long, Long)].collect().toSet
    assert(full.contains((0L, 3L)) && full.contains((1L, 2L)), full.toString)
  }

  test("simhash: identical texts get identical fingerprints, in [0, 2^16)") {
    val got = DedupOps.simhash16(
      docs.select($"doc_id", explode(split($"text", " ")).as("tok")),
      "doc_id", "tok").as[(Long, Long)].collect().toMap
    assert(got(0L) == got(3L))
    assert(got.values.forall(v => v >= 0 && v < 65536))
    assert(got(0L) != got(2L)) // near-certain for different token bags
  }

  test("cosine: orthogonal = 0, identical = 1") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.0f, 2.0f)), (2L, Array(3.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val got = SimilarityOps.knnBruteForce(vecs.where($"vec_id" === 0), vecs, 3)
      .select("vec_id", "cos_sim").as[(Long, Double)].collect().toMap
    assert(got(0L) == 1.0 && got(2L) == 1.0 && got(1L) == 0.0)
  }

  test("sign-LSH bucket is deterministic and bounded by bit width") {
    val vecs = (0L until 50L).map { i =>
      (i, Array.tabulate(16)(d => math.sin(i * 16 + d).toFloat))
    }.toDF("vec_id", "embedding")
    val b1 = vecs.select($"vec_id",
      SimilarityOps.signLshBucket($"embedding", 6, 16).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b1.values.forall(v => v >= 0 && v < 64))
    val b2 = vecs.select($"vec_id",
      SimilarityOps.signLshBucket($"embedding", 6, 16).as("b"))
      .as[(Long, Long)].collect().toMap
    assert(b1 == b2)
  }

  test("langId prefers the language whose stopwords dominate") {
    val got = Seq((1L, "der hund und die katze ist da"),
      (2L, "the cat is on the mat"), (3L, "xyzzy qwerty"))
      .toDF("id", "text")
      .select($"id", TextOps.langId($"text").as("l")).as[(Long, String)]
      .collect().toMap
    assert(got == Map(1L -> "de", 2L -> "en", 3L -> "und"))
  }

  test("fused CosineSim == composed zip_with/aggregate form, bit-for-bit") {
    val rng = new scala.util.Random(11)
    val rows = (1 to 50).map { i =>
      (i.toLong, Array.fill(16)(rng.nextFloat() * 2 - 1),
        Array.fill(16)(rng.nextFloat() * 2 - 1))
    }
    val df = rows.toDF("id", "a", "b")
    val got = df.select($"id",
        graft.functions.CosineSim($"a", $"b").as("fused"),
        graft.ext.SimilarityOps.cosineComposed($"a", $"b").as("composed"))
      .as[(Long, Double, Double)].collect()
    // bit-for-bit: same IEEE operation sequence (no rounding tolerance)
    got.foreach { case (_, f, c) => assert(f == c) }
  }

  test("CosineSim null contract: null array, null element, length mismatch") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f), Array(1.0f, 2.0f)),
      (2L, null.asInstanceOf[Array[Float]], Array(1.0f, 2.0f)),
      (3L, Array(1.0f, 2.0f), Array(1.0f))
    ).toDF("id", "a", "b")
    val got = df.select($"id", graft.functions.CosineSim($"a", $"b"))
      .as[(Long, Option[Double])].collect().toMap
    assert(got(1L).exists(v => math.abs(v - 1.0) < 1e-12))
    assert(got(2L).isEmpty && got(3L).isEmpty)
    // null element inside the array
    val nullElem = Seq(Tuple1(1L)).toDF("x").select(
      graft.functions.CosineSim(
        array(lit(1.0f), lit(null).cast("float")),
        array(lit(1.0f), lit(2.0f))).as("c"))
      .as[Option[Double]].collect().head
    assert(nullElem.isEmpty)
  }

  test("wordNgrams guards short docs (no descending-sequence blowup)") {
    val got = Seq("one two", "a b c d").toDF("text")
      .select(TextOps.wordNgrams($"text", 3).as("g"))
      .as[Seq[String]].collect()
    assert(got(0).isEmpty && got(1) == Seq("a b c", "b c d"))
  }
}
