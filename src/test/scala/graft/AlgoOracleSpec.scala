package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ext.{DedupOps, GraphOps}

/** Brute-force oracles for the four operators that previously shipped
  * without specs (round-3 ADVICE): SimHash Hamming pairs, prefix-filter
  * set-similarity join, PageRank, and single-source shortest paths.
  * Each distributed result is compared against a plain-Scala
  * reimplementation on a corpus small enough to enumerate.
  */
class AlgoOracleSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  // ---------- simhashHammingPairs ----------

  test("simhashHammingPairs == brute-force Hamming scan (16-bit, d<=3)") {
    val rng = new scala.util.Random(3)
    val sims = (1L to 60L).map(i => (i, (rng.nextInt(1 << 16)).toLong))
    val expected = (for {
      (a, sa) <- sims; (b, sb) <- sims if a < b
      h = java.lang.Long.bitCount(sa ^ sb) if h <= 3
    } yield (a, b, h)).toSet
    val got = DedupOps.simhashHammingPairs(
      sims.toDF("doc_id", "simhash"), "doc_id", maxDist = 3, bits = 16)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == expected)
    assert(expected.nonEmpty) // fixture actually exercises the join
  }

  test("simhashHammingPairs 64-bit maxDist=0: single full-width chunk (mask edge)") {
    // w == 64 ⇒ the (1L << w) - 1 mask would be 0 under mod-64 shifting,
    // collapsing every chunk_val to 0 (all-pairs cross join). With the
    // fix, candidates join on the full fingerprint: only true duplicates.
    val sims = Seq(
      (1L, 0x7fffffffffffffffL), (2L, 0x7fffffffffffffffL),
      (3L, Long.MinValue), (4L, Long.MinValue), (5L, 42L))
    val got = DedupOps.simhashHammingPairs(
      sims.toDF("doc_id", "simhash"), "doc_id", maxDist = 0, bits = 64)
      .as[(Long, Long, Int)].collect().toSet
    assert(got == Set((1L, 2L, 0), (3L, 4L, 0)))
  }

  // ---------- prefixFilterJoin ----------

  test("prefixFilterJoin == brute-force Jaccard over all pairs (t = 6/10)") {
    val rng = new scala.util.Random(17)
    val vocab = (0 until 40).map(i => f"tok$i%02d")
    val docs: Seq[(Long, Set[String])] = (1L to 30L).map { i =>
      // overlapping sets with varying size so some pairs clear 0.6
      val base = rng.nextInt(30)
      val toks = (0 until 6 + rng.nextInt(6))
        .map(j => vocab((base + j) % vocab.size)).toSet
      (i, toks)
    }
    val tokens = docs.flatMap { case (id, ts) => ts.map(id -> _) }
      .toDF("doc_id", "tok")
    val expected = (for {
      (a, ta) <- docs; (b, tb) <- docs if a < b
      inter = (ta & tb).size; union = (ta | tb).size
      if 10 * inter >= 6 * union
    } yield (a, b, inter.toLong, ta.size.toLong, tb.size.toLong)).toSet
    val got = DedupOps.prefixFilterJoin(tokens, "doc_id", tNum = 6, tDen = 10)
      .select("doc_a", "doc_b", "inter", "n_a", "n_b")
      .as[(Long, Long, Long, Long, Long)].collect().toSet
    assert(got == expected)
    assert(expected.nonEmpty)
  }

  test("prefixFilterJoin t=1 finds exactly the identical sets") {
    val tokens = Seq(
      (1L, "a"), (1L, "b"), (2L, "a"), (2L, "b"), (3L, "a")).toDF("doc_id", "tok")
    val got = DedupOps.prefixFilterJoin(tokens, "doc_id", tNum = 1, tDen = 1)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  // ---------- pageRank ----------

  /** The distributed update replayed in plain Scala with the identical
    * integer arithmetic — bit-exact expected ranks. */
  private def refPageRank(edges: Seq[(Long, Long)], nodes: Seq[Long],
                          iters: Int): Map[Long, Long] = {
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var r = nodes.map(_ -> 1000000000L).toMap
    for (_ <- 0 until iters) {
      val contribs = scala.collection.mutable.Map.empty[Long, Long]
        .withDefaultValue(0L)
      edges.foreach { case (s, d) => contribs(d) += r(s) / outdeg(s) }
      r = nodes.map(n => n -> (150000000L + 85L * contribs(n) / 100L)).toMap
    }
    r
  }

  test("pageRank matches the integer-exact reference on a hand-sized graph") {
    // classic 4-node fixture: 1→2, 1→3, 2→3, 3→1, 4→3 (dangling none;
    // node 4 has no in-links so it keeps the base rank)
    val edges = Seq((1L, 2L), (1L, 3L), (2L, 3L), (3L, 1L), (4L, 3L))
    val nodes = Seq(1L, 2L, 3L, 4L)
    val expected = refPageRank(edges, nodes, iters = 10)
    val got = GraphOps.pageRank(spark, edges.toDF("src", "dst"),
      nodes.toDF("node"), iterations = 10)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    // sanity on the fixture itself: 3 collects the most rank, 4 the least
    assert(got(3L) > got(1L) && got(1L) > got(4L))
    assert(got(4L) == 150000000L)
  }

  test("pageRank leaves no persisted RDDs or checkpoint blocks behind") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val edges = (1L to 50L).map(i => (i, i % 50 + 1)).toDF("src", "dst")
    val nodes = (1L to 50L).toDF("node")
    GraphOps.pageRank(spark, edges, nodes, iterations = 3).count()
    // the returned result itself is one localCheckpoint; everything
    // intermediate (per-round ranks, edge/outdeg/node caches) is freed
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1)
  }

  // ---------- shortestPaths ----------

  /** Reference SSSP: plain Bellman-Ford to fixpoint. */
  private def refSssp(edges: Seq[(Long, Long, Long)],
                      src: Long): Map[Long, Long] = {
    var dist = Map(src -> 0L)
    var changed = true
    while (changed) {
      changed = false
      edges.foreach { case (s, d, w) =>
        dist.get(s).foreach { ds =>
          val nd = ds + w
          if (dist.get(d).forall(_ > nd)) { dist += d -> nd; changed = true }
        }
      }
    }
    dist
  }

  test("shortestPaths == reference Bellman-Ford on a random weighted graph") {
    val rng = new scala.util.Random(23)
    val edges = (1 to 120).map { _ =>
      (rng.nextInt(30).toLong, rng.nextInt(30).toLong, (1 + rng.nextInt(9)).toLong)
    }.filter { case (a, b, _) => a != b }
    val expected = refSssp(edges, 0L)
    val got = GraphOps.shortestPaths(spark, edges.toDF("src", "dst", "w"), 0L)
      .as[(Long, Long)].collect().toMap
    assert(got == expected)
    assert(expected.size > 1) // source reaches something
  }

  test("shortestPaths prefers the cheap 2-hop path over the direct edge") {
    val edges = Seq((0L, 1L, 10L), (0L, 2L, 1L), (2L, 1L, 2L))
    val got = GraphOps.shortestPaths(spark, edges.toDF("src", "dst", "w"), 0L)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(0L -> 0L, 2L -> 1L, 1L -> 3L))
  }

  test("shortestPaths leaves no persisted RDDs behind") {
    val before = spark.sparkContext.getPersistentRDDs.size
    val edges = (1 to 40).map(i => (i.toLong % 20, (i + 1).toLong % 20, 1L))
      .filter { case (a, b, _) => a != b }.toDF("src", "dst", "w")
    GraphOps.shortestPaths(spark, edges, 0L).count()
    assert(spark.sparkContext.getPersistentRDDs.size <= before + 1)
  }
}
