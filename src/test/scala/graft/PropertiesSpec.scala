package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

import graft.core.LinkOps
import graft.functions.ContainsAny

/** ScalaCheck properties (SURVEY.md §5.3): the custom ContainsAny
  * expression is extensionally equal to the built-in composition and to
  * Scala string semantics; set-operation invariants (A1-A3, F4) hold. */
class PropertiesSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private val params = SCTest.Parameters.default
    .withMinSuccessfulTests(20)
    .withInitialSeed(org.scalacheck.rng.Seed(42L))

  private def check(p: Prop): Unit = {
    val res = SCTest.check(params, p)
    assert(res.passed, res.status.toString)
  }

  val linkGen: Gen[String] = Gen.listOfN(4, Gen.oneOf(
    "/", "app", "App", "API", "book", "boo", "k", "tel", "#", "@", "x",
    "career", "care", "er", "mail", "MAIL", "", "zzz")).map(_.mkString)

  test("property: ContainsAny == OR-composition for arbitrary strings") {
    check(Prop.forAll(Gen.listOfN(40, linkGen)) { links =>
      links.isEmpty || {
        val df = links.toDF("link").select(
          ContainsAny($"link", LinkOps.filterWords).as("a"),
          LinkOps.hitsBlacklistComposed($"link").as("b"))
        df.where($"a" =!= $"b").count() == 0
      }
    })
  }

  test("property: ContainsAny matches Scala sub.contains semantics") {
    check(Prop.forAll(Gen.listOfN(40, linkGen)) { links =>
      links.isEmpty || {
        val got = links.toDF("link")
          .select(ContainsAny($"link", LinkOps.filterWords))
          .as[Boolean].collect().toSeq
        got == links.map(l => LinkOps.filterWords.exists(l.contains))
      }
    })
  }

  test("property: union+distinct is idempotent and commutative (A1-A3)") {
    check(Prop.forAll(Gen.listOfN(30, Gen.alphaStr), Gen.listOfN(30, Gen.alphaStr)) {
      (xs, ys) =>
        val a = xs.toDF("v"); val b = ys.toDF("v")
        val ab = a.union(b).distinct().as[String].collect().toSet
        val ba = b.union(a).distinct().as[String].collect().toSet
        val abb = a.union(b).union(b).distinct().as[String].collect().toSet
        ab == ba && ab == abb && ab == (xs.toSet ++ ys.toSet)
    })
  }

  test("property: anti-join == set difference (F4 visited semantics)") {
    check(Prop.forAll(Gen.listOfN(30, Gen.choose(0, 20)), Gen.listOfN(15, Gen.choose(0, 20))) {
      (xs, ys) =>
        val anti = xs.distinct.toDF("k")
          .join(ys.distinct.toDF("k"), Seq("k"), "left_anti")
          .as[Int].collect().toSet
        anti == (xs.toSet -- ys.toSet)
    })
  }

  test("property: bloom-pruned anti-join == plain left_anti on random key sets") {
    check(Prop.forAll(Gen.listOfN(60, Gen.choose(0L, 40L)),
      Gen.listOfN(25, Gen.choose(0L, 40L))) { (xs, ys) =>
      xs.isEmpty || ys.isEmpty || {
        val left = xs.toDF("lk")
        val right = ys.toDF("rk")
        val plain = left.join(right, $"lk" === $"rk", "left_anti")
          .as[Long].collect().sorted.toSeq
        val bloomed = graft.operators.BloomOps
          .bloomPrunedAntiJoin(left, right, "lk", "rk", expectedItems = 64L)
          .as[Long].collect().sorted.toSeq
        bloomed == plain
      }
    })
  }

  test("property: TopKByCount agrees with a Scala groupBy reference") {
    val valGen = Gen.oneOf("a", "b", "c", "dd", "e", "f")
    check(Prop.forAll(Gen.listOfN(50, valGen), Gen.choose(1, 5)) { (vs, k) =>
      vs.isEmpty || {
        val got = vs.toDF("v")
          .agg(graft.functions.TopKByCount(col("v"), k).as("t"))
          .as[String].collect().head
        val want = vs.groupBy(identity).view.mapValues(_.size.toLong).toSeq
          .sortBy { case (v, n) => (-n, v) }.take(k)
          .map { case (v, n) => s"$v:$n" }.mkString(",")
        got == want
      }
    })
  }

  test("property: sessionize interval-merge never regresses bounds and conserves counts") {
    import graft.streaming.Sessionize.{SessEvent, SessState, SessionOut}
    import org.apache.spark.sql.streaming.{GroupStateTimeout, TestGroupState}
    val gapUs = 100L
    check(Prop.forAll(Gen.listOfN(12, Gen.choose(0L, 1000L)),
      Gen.option(Gen.zip(Gen.choose(300L, 700L), Gen.choose(0L, 100L)))) {
      (times, openSpec) =>
        val open = openSpec.map { case (st, len) => SessState(st, st + len, 2L) }
        val st = TestGroupState.create[SessState](
          optionalState = open.map(org.apache.spark.api.java.Optional.of[SessState])
            .getOrElse(org.apache.spark.api.java.Optional.empty[SessState]()),
          timeoutConf = GroupStateTimeout.EventTimeTimeout,
          batchProcessingTimeMs = 1L,
          eventTimeWatermarkMs = org.apache.spark.api.java.Optional.of(java.lang.Long.valueOf(0L)),
          hasTimedOut = false)
        val out = graft.streaming.Sessionize.updateSessions(gapUs)(
          1L, times.map(SessEvent(1L, _)).iterator, st).toSeq
        val all = out ++ st.getOption.map(s => SessionOut(1L, s.start, s.end, s.n))
        val totalN = all.map(_.n).sum
        val expectN = times.size.toLong + open.map(_.n).getOrElse(0L)
        // counts conserved, every session well-formed, sessions separated by > gap
        val sorted = all.sortBy(_.start_us)
        val separated = sorted.zip(sorted.drop(1)).forall {
          case (x, y) => y.start_us - x.end_us > gapUs }
        totalN == expectN && all.forall(s => s.start_us <= s.end_us) && separated
    })
  }

  test("ngramRows equals explode(wordNgrams) gram-for-gram") {
    // the codegen'd window-lead form must produce the IDENTICAL gram
    // stream as the HOF array form it replaces on hot paths
    val docs = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "documents").where(org.apache.spark.sql.functions.col("doc_id") < 60)
    for (n <- Seq(3, 5)) {
      val viaArray = docs.select(
          org.apache.spark.sql.functions.col("doc_id"),
          org.apache.spark.sql.functions.posexplode(
            graft.ext.TextOps.wordNgrams(
              org.apache.spark.sql.functions.col("text"), n))
            .as(Seq("pos", "gram")))
      val viaLeads = graft.ext.TextOps.ngramRows(docs, "doc_id", "text", n)
      assert(viaLeads.exceptAll(viaArray).isEmpty &&
        viaArray.exceptAll(viaLeads).isEmpty, s"n=$n gram streams differ")
    }
  }

  test("PairProducts generator equals the composed flatten/transform form") {
    import org.apache.spark.sql.functions._
    val emb = graft.core.Tables.load(spark, "/root/testdata/sf0.001",
      "embeddings").where(col("vec_id") < 40)
      .select(col("vec_id"), expr(
        "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
        .as("v"))
    val viaGen = emb.select(col("vec_id"),
      graft.functions.PairProducts(col("v")).as(Seq("di", "dj", "p")))
    val viaHof = emb.select(col("vec_id"), explode(expr(
        """flatten(transform(sequence(0, size(v) - 1),
          |  i -> transform(sequence(i, size(v) - 1),
          |    j -> struct(i AS di, j AS dj, v[i] * v[j] AS p))))""".stripMargin))
        .as("e"))
      .select(col("vec_id"), col("e.di"), col("e.dj"), col("e.p"))
    assert(viaGen.exceptAll(viaHof).isEmpty && viaHof.exceptAll(viaGen).isEmpty)
    // null element => no rows (a partial Gram row would bias the matrix)
    val withNull = spark.sql("SELECT array(1L, CAST(NULL AS BIGINT), 3L) AS v")
    assert(withNull.select(graft.functions.PairProducts(col("v"))
      .as(Seq("di", "dj", "p"))).count() == 0)
  }
}


