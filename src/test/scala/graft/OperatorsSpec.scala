package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AsOfJoin, SkewOps}

class OperatorsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  def ts(s: String) = Timestamp.valueOf(s)

  test("asOf picks latest right row <= left time, per key, left-outer") {
    val trades = Seq(
      (1L, 10L, ts("2024-01-01 10:00:05")),
      (2L, 10L, ts("2024-01-01 10:00:00")), // equal-time: quote at :00 matches
      (3L, 10L, ts("2024-01-01 09:59:00")), // before any quote -> null
      (4L, 20L, ts("2024-01-01 12:00:00"))  // key with no quotes -> null
    ).toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (100L, 10L, ts("2024-01-01 10:00:00"), 1.0),
      (101L, 10L, ts("2024-01-01 10:00:03"), 2.0),
      (102L, 10L, ts("2024-01-01 10:00:03"), 3.0), // tie -> greater qid wins
      (103L, 30L, ts("2024-01-01 00:00:00"), 9.0)
    ).toDF("qid", "sym", "qt", "price")
    val got = AsOfJoin.asOf(trades, quotes, "sym", "sym", "t", "qt",
      rightTie = "qid", rightVals = Seq("qid", "price"))
      .select("trade_id", "qid", "price")
      .as[(Long, Option[Long], Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(1L) == ((Some(102L), Some(3.0))))
    assert(got(2L) == ((Some(100L), Some(1.0))))
    assert(got(3L) == ((None, None)))
    assert(got(4L) == ((None, None)))
  }

  test("asOf equals the naive range-join + rank formulation on random data") {
    val rng = new scala.util.Random(7)
    val left = (1 to 200).map(i =>
      (i.toLong, (rng.nextInt(5)).toLong, rng.nextInt(1000).toLong))
      .toDF("lid", "k", "t")
    val right = (1 to 300).map(i =>
      (i.toLong, (rng.nextInt(6)).toLong, rng.nextInt(1000).toLong, rng.nextDouble()))
      .toDF("rid", "k", "t", "v")
    val fast = AsOfJoin.asOf(left, right, "k", "k", "t", "t", "rid", Seq("rid"))
      .select("lid", "rid").as[(Long, Option[Long])].collect().toMap
    val naive = left.as("l").join(right.as("r"),
        $"l.k" === $"r.k" && $"r.t" <= $"l.t", "left")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy($"lid")
          .orderBy($"r.t".desc_nulls_last, $"rid".desc_nulls_last)))
      .where($"rn" === 1)
      .select($"lid", $"rid").as[(Long, Option[Long])].collect().toMap
    assert(fast == naive)
  }

  test("asOf never matches null keys or null right timestamps") {
    val trades = Seq(
      (1L, Option(10L), ts("2024-01-01 10:00:05")),
      (2L, Option.empty[Long], ts("2024-01-01 10:00:05")))
      .toDF("trade_id", "sym", "t")
    val quotes = Seq(
      (100L, Option(10L), Option(ts("2024-01-01 09:00:00")), 1.0),
      (101L, Option(10L), Option.empty[java.sql.Timestamp], 9.0), // null time
      (102L, Option.empty[Long], Option(ts("2024-01-01 09:00:00")), 8.0)) // null key
      .toDF("qid", "sym", "qt", "price")
    val got = AsOfJoin.asOf(trades, quotes, "sym", "sym", "t", "qt", "qid",
      Seq("qid"))
      .select("trade_id", "qid").as[(Long, Option[Long])].collect().toMap
    assert(got == Map(1L -> Some(100L), 2L -> None))
  }

  test("asOf rejects a non-integral tie column loudly") {
    val l = Seq((1L, 1L, 1L)).toDF("lid", "k", "t")
    val r = Seq((1L, 1L, "uuid-x", 1.0)).toDF("k", "t", "tie", "v")
    intercept[IllegalArgumentException] {
      AsOfJoin.asOf(l, r, "k", "k", "t", "t", "tie", Seq("v"))
    }
  }

  test("jaccardPairs candidate-restricted path equals the all-pairs path") {
    val sh = Seq((1L, "x"), (1L, "y"), (2L, "x"), (2L, "z"), (3L, "x"))
      .toDF("doc_id", "shingle")
    val all = graft.ext.DedupOps.jaccardPairs(sh, "doc_id", 0.0)
      .as[(Long, Long, Double)].collect().toSet
    val cand = Seq((1L, 2L), (1L, 3L), (2L, 3L)).toDF("a", "b")
    val restricted = graft.ext.DedupOps
      .jaccardPairs(sh, "doc_id", 0.0, Some(cand))
      .as[(Long, Long, Double)].collect().toSet
    assert(restricted == all && all.nonEmpty)
  }

  test("bloom-pruned anti-join result is identical to the plain left_anti join") {
    val left = (1L to 3000L).map(k => (k, s"row_$k")).toDF("lk", "payload")
    // right covers a stripe of the key space; tiny fpp so both branches
    // (definitely-absent fast path + exact anti-join on maybes) get rows
    val right = (500L to 1500L).map(k => (k, "r")).toDF("rk", "x")
    val plain = left.join(right, $"lk" === $"rk", "left_anti")
      .select("lk", "payload").as[(Long, String)].collect().toSet
    val bloomed = graft.operators.BloomOps
      .bloomPrunedAntiJoin(left, right, "lk", "rk", expectedItems = 2000L)
      .select("lk", "payload").as[(Long, String)].collect().toSet
    assert(bloomed == plain && plain.size == 2000 - 1)
  }

  test("bloom-pruned anti-join keeps null-key rows and handles string keys + same key name") {
    // null keys never match -> a plain left_anti KEEPS them; same-named
    // key columns must not collide (the crawl's url⟕url shape)
    val left = Seq(Some("u1"), Some("u2"), None, Some("u3"))
      .toDF("url")
    val right = Seq("u2").toDF("url")
    val plain = left.join(right, Seq("url"), "left_anti")
      .as[Option[String]].collect().toSet
    val bloomed = graft.operators.BloomOps
      .bloomPrunedAntiJoin(left, right, "url", "url", expectedItems = 100L)
      .as[Option[String]].collect().toSet
    assert(bloomed == plain && plain == Set(Some("u1"), None, Some("u3")))
  }

  test("salted join result is identical to the plain join") {
    val big = (1 to 5000).map(i => (if (i % 3 == 0) 1L else i.toLong, i))
      .toDF("k", "payload") // heavy skew on k=1
    val small = (1L to 100L).map(k => (k, s"dim_$k")).toDF("k2", "name")
    val plain = big.join(small, $"k" === $"k2")
      .select("k", "payload", "name").as[(Long, Int, String)].collect().toSet
    val salted = SkewOps.saltedInnerJoin(big, small, "k", "k2", 16)
      .select("k", "payload", "name").as[(Long, Int, String)].collect().toSet
    assert(salted == plain && plain.nonEmpty)
  }

  test("skew-only salted join == plain join; duplicate rows preserved") {
    // k=1 is heavy (1667 rows), every other key is light (1 row); payload
    // duplicates make set-compare insufficient — compare as multiset
    val big = (1 to 5000).map(i => (if (i % 3 == 0) 1L else i.toLong, i % 7))
      .toDF("k", "payload")
    val small = (1L to 100L).map(k => (k, s"dim_$k")).toDF("k2", "name")
    def multiset(rows: Array[(Long, Int, String)]) =
      rows.groupBy(identity).view.mapValues(_.length).toMap
    val plain = multiset(big.join(small, $"k" === $"k2")
      .select("k", "payload", "name").as[(Long, Int, String)].collect())
    val skewOnly = multiset(SkewOps.saltedInnerJoinSkewOnly(
      big, small, "k", "k2", saltFactor = 16, heavyThreshold = 100)
      .select("k", "payload", "name").as[(Long, Int, String)].collect())
    assert(skewOnly == plain && plain.nonEmpty)
  }

  test("skew-only salted join: no heavy keys at all degrades to zero fan-out") {
    val big = (1L to 200L).map(k => (k, k * 2)).toDF("k", "payload")
    val small = (1L to 100L).map(k => (k, s"dim_$k")).toDF("k2", "name")
    val joined = SkewOps.saltedInnerJoinSkewOnly(
      big, small, "k", "k2", saltFactor = 8, heavyThreshold = 2)
    val got = joined.select("k", "payload", "name")
      .as[(Long, Long, String)].collect().toSet
    val plain = big.join(small, $"k" === $"k2")
      .select("k", "payload", "name").as[(Long, Long, String)].collect().toSet
    assert(got == plain)
  }

  test("skew-only salted join fans out ONLY the heavy branch (plan pin)") {
    val big = (1 to 3000).map(i => (if (i % 2 == 0) 1L else i.toLong, i))
      .toDF("k", "payload")
    val small = (1L to 50L).map(k => (k, s"dim_$k")).toDF("k2", "name")
    val joined = SkewOps.saltedInnerJoinSkewOnly(
      big, small, "k", "k2", saltFactor = 8, heavyThreshold = 1000)
    // exactly ONE Generate (the explode replicating the heavy build rows);
    // the light branch joins without any fan-out. The full-replication
    // form (saltedInnerJoin) also has one Generate but applies it to the
    // ENTIRE build side — here the generator's input is filtered first.
    val plan = joined.queryExecution.optimizedPlan
    val gens = plan.collect {
      case g: org.apache.spark.sql.catalyst.plans.logical.Generate => g
    }
    assert(gens.size == 1, s"expected one explode, got ${gens.size}")
    // the heavy-branch explode consumes a semi-join-filtered input, never
    // the raw build relation
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.joinType
    }
    assert(joins.count(_.sql.contains("SEMI")) >= 2) // both sides split
    assert(joins.count(_.sql.contains("ANTI")) >= 2)
  }
}
