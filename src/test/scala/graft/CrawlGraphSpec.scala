package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.core.CrawlGraph

/** BFS invariants (SURVEY.md §5.3): min-depth labeling, cycle safety,
  * fixpoint before pen_depth, deterministic surrogate keys, and the
  * INTENDED per-parent edge semantics (§2.10 fidelity note). */
class CrawlGraphSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  val edges = Seq(
    ("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "a"), // cycle d->a
    ("d", "e"), ("x", "y") // x unreachable from a
  ).toDF("parent", "child")

  test("bfs labels minimum depth and survives cycles") {
    val got = CrawlGraph.bfs(spark, edges, Seq("a"), 5)
      .as[(Int, String)].collect().map(_.swap).toMap
    assert(got == Map("a" -> 0, "b" -> 1, "c" -> 1, "d" -> 2, "e" -> 3))
  }

  test("bfs reaches fixpoint when frontier empties before maxDepth") {
    val got = CrawlGraph.bfs(spark, edges, Seq("a"), 50)
    assert(got.count() == 5)
  }

  test("bfs visited and frontier stay disjoint (no duplicate urls)") {
    val got = CrawlGraph.bfs(spark, edges, Seq("a"), 5)
    assert(got.select("url").distinct().count() == got.count())
  }

  test("bfs with bloom-pruned visited filter is result-identical") {
    val plain = CrawlGraph.bfs(spark, edges, Seq("a"), 5)
      .as[(Int, String)].collect().toSet
    val bloomed = CrawlGraph.bfs(spark, edges, Seq("a"), 5,
      bloomPruneVisited = true).as[(Int, String)].collect().toSet
    assert(bloomed == plain && plain.nonEmpty)
  }

  test("surrogate keys are dense, zero-based, ordered by name") {
    val links = Seq("c", "a", "b", "a").toDF("url")
    val got = CrawlGraph.surrogateKeys(links, "url")
      .as[(Long, String)].collect().sortBy(_._1).toSeq
    assert(got == Seq((0L, "a"), (1L, "b"), (2L, "c")))
  }

  test("scalable surrogate keys match the window-based form") {
    val links = (1 to 500).map(i => s"url_${i % 97}").toDF("url")
    val a = CrawlGraph.surrogateKeys(links, "url")
      .as[(Long, String)].collect().toSet
    val b = CrawlGraph.surrogateKeysScalable(spark, links, "url")
      .as[(Long, String)].collect().toSet
    assert(a == b)
  }

  test("crawl emits INTENDED per-parent edges, dedups, skips non-200/xlsx") {
    // r links to p1,p2; p1 links to p2,bad(404),skip.xlsx; p2 links back to r
    val pages = Seq(
      ("https://s.test/", 200,
        """<a href="/p1">1</a><a href="/p2">2</a><a href="/p2">dup</a>"""),
      ("https://s.test/p1", 200,
        """<a href="/p2">2</a><a href="/bad">b</a><a href="/skip.xlsx">x</a>"""),
      ("https://s.test/p2", 200, """<a href="/">home</a>"""),
      ("https://s.test/bad", 404, """<a href="/never">n</a>"""),
      ("https://s.test/skip.xlsx", 200, """<a href="/never">n</a>""")
    ).toDF("url", "status", "html")
    val (edges, uniq) = CrawlGraph.crawl(spark, pages, "https://s.test/", 3)
    val got = edges.as[(Int, String, String)].collect().toSet
    // "/" self-link on p2 is dropped by F1; dup href dedup'd by A1;
    // 404 page is fetched-but-not-mined; xlsx skipped before mining
    assert(got == Set(
      (0, "https://s.test/", "https://s.test/p1"),
      (0, "https://s.test/", "https://s.test/p2"),
      (1, "https://s.test/p1", "https://s.test/p2"),
      (1, "https://s.test/p1", "https://s.test/bad"),
      (1, "https://s.test/p1", "https://s.test/skip.xlsx")))
    val names = uniq.as[(Long, String)].collect().toSeq.sortBy(_._1).map(_._2)
    assert(names == names.sorted && names.contains("https://s.test/bad"))
  }

  test("crawlActualEdges replays prefix accumulation; actual ≠ intended") {
    val root = "https://s.test/"
    // depth-1 parents sort a < b < c; a mines x, b mines NOTHING (junk
    // only — admitted but childless), c mines y
    val pages = Seq(
      (root, 200, """<a href="/a">1</a><a href="/b">2</a><a href="/c">3</a>"""),
      (root + "a", 200, """<a href="/x">x</a>"""),
      (root + "b", 200, """<a href="/login/z">junk</a>"""),
      (root + "c", 200, """<a href="/y">y</a>""")
    ).toDF("url", "status", "html")
    val actual = CrawlGraph.crawlActualEdges(spark, pages, root, 3)
      .as[(Int, String, String)].collect().toSet
    // the reference's accumulation: b (after a) is credited with a's x
    // despite mining nothing itself; c (after both) with x AND its own y
    assert(actual == Set(
      (0, root, root + "a"), (0, root, root + "b"), (0, root, root + "c"),
      (1, root + "a", root + "x"),
      (1, root + "b", root + "x"),
      (1, root + "c", root + "x"), (1, root + "c", root + "y")))
    val (intended, _) = CrawlGraph.crawl(spark, pages, root, 3)
    val intendedSet = intended.as[(Int, String, String)].collect().toSet
    assert(intendedSet == Set(
      (0, root, root + "a"), (0, root, root + "b"), (0, root, root + "c"),
      (1, root + "a", root + "x"), (1, root + "c", root + "y")))
    assert(actual != intendedSet) // the §2.10 divergence, executable
  }

  test("processingRank: no WindowExec / single-partition funnel; dense rank") {
    val parents = Seq("c", "a", "b", "d").toDF("parent")
    val ranked = CrawlGraph.processingRank(spark, parents)
    assert(ranked.as[(String, Long)].collect().sortBy(_._2).toSeq ==
      Seq(("a", 1L), ("b", 2L), ("c", 3L), ("d", 4L)))
    // the rank assignment must not ride a global-order window: the sort
    // is range-partitioned, offsets come from zipWithIndex
    val plan = ranked.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.toLowerCase.contains("singlepartition"), plan)
  }
}
