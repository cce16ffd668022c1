package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, In, Or, StringStartsWith}
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.scalatest.funsuite.AnyFunSuite

import graft.catalog.{FilterEval, RowTableStore}
import graft.queries.R107Queries

/** The DSv2 row-level-operations + metadata-column contracts (r9):
  * what the q_dsv2_* oracle hashes cannot see.
  *
  *  - TWO-TIER routing: a DELETE whose predicate translates to Filters
  *    runs the metadata tier INSIDE the connector (pushed filters
  *    observable at the store, exact-complement survivors); UPDATE,
  *    MERGE, and untranslatable DELETEs run the GROUP REWRITE
  *    (ReplaceData) — the store's lastDelete/lastReplace markers pin
  *    which path each command took;
  *  - the filter evaluator is exact-or-refuse (no approximated
  *    predicates can reach a metadata delete);
  *  - metadata columns ride the pruning path: unselected, they are
  *    absent from the scan's read schema (and the wide html column is
  *    pruned alongside); selected, their values identify the
  *    generating split exactly.
  */
class Dsv2RowOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  private def withCatalog[T](body: => T): T = {
    spark.conf.set(R107Queries.catalogConf, R107Queries.catalogImpl)
    body
  }
  private val tbl = "graft_tab.spec.t"

  private def freshTable(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $tbl")
    spark.sql(s"CREATE TABLE $tbl (k BIGINT, grp STRING, v BIGINT)")
    spark.range(0, 100)
      .select(col("id").as("k"),
        concat(lit("g"), (col("id") % 4).cast("string")).as("grp"),
        (col("id") * 10).as("v"))
      .writeTo(tbl).append()
  }

  test("DELETE removes exactly the matching groups, inside the connector") {
    withCatalog {
      freshTable()
      assert(spark.table(tbl).count() == 100)
      spark.sql(s"DELETE FROM $tbl WHERE grp = 'g1' OR (grp = 'g2' AND k < 50)")
      val left = spark.table(tbl).collect().map(r => (r.getLong(0),
        r.getString(1))).toSet
      val expect = (0L until 100L).map(k => (k, s"g${k % 4}"))
        .filterNot { case (k, g) => g == "g1" || (g == "g2" && k < 50) }
        .toSet
      assert(left == expect, "survivors must be the exact complement")
      // the delete ran INSIDE the connector: the pushed predicate is
      // visible at the store, and it is the OR tree, not a row list
      val pushed = RowTableStore.lastDeleteFilters("spec.t")
      assert(pushed.exists(_.exists {
        case Or(_, _) => true
        case _ => false
      }), s"expected a pushed Or filter, got ${pushed.map(_.toSeq)}")
    }
  }

  test("DELETE with an untranslatable predicate falls back to the rewrite") {
    withCatalog {
      freshTable()
      // k % 2 is an expression, not a data-source Filter — the metadata
      // delete tier cannot run it; with SupportsRowLevelOperations the
      // command executes through the group REWRITE instead (scan all,
      // write back survivors), which is exactly the two-tier contract
      spark.sql(s"DELETE FROM $tbl WHERE k % 2 = 0")
      val left = spark.table(tbl).collect().map(_.getLong(0)).toSet
      assert(left == (1L until 100L by 2).toSet,
        "rewrite delete must remove exactly the matching rows")
      assert(RowTableStore.lastReplaceCommand("spec.t")
        .contains("DELETE"), "expected the ReplaceData path")
    }
  }

  test("UPDATE runs through the group rewrite with exact results") {
    withCatalog {
      freshTable()
      spark.sql(s"UPDATE $tbl SET v = v + 1000000 WHERE grp = 'g3'")
      val got = spark.table(tbl).collect()
        .map(r => (r.getLong(0), r.getLong(2))).toMap
      (0L until 100L).foreach { k =>
        val expect = if (k % 4 == 3) k * 10 + 1000000 else k * 10
        assert(got(k) == expect, s"k=$k")
      }
      assert(RowTableStore.lastReplaceCommand("spec.t")
        .contains("UPDATE"), "expected the ReplaceData path")
      assert(spark.table(tbl).count() == 100,
        "update must not add or drop rows")
    }
  }

  test("MERGE upserts through the group rewrite") {
    withCatalog {
      freshTable()
      spark.range(90, 110)
        .select(col("id").as("k"), lit("gm").as("grp"),
          (col("id") * 100).as("v"))
        .createOrReplaceTempView("merge_src")
      spark.sql(
        s"""MERGE INTO $tbl t USING merge_src s ON t.k = s.k
           |WHEN MATCHED THEN UPDATE SET t.v = s.v, t.grp = s.grp
           |WHEN NOT MATCHED THEN INSERT (k, grp, v) VALUES (s.k, s.grp, s.v)
           |""".stripMargin)
      val got = spark.table(tbl).collect()
        .map(r => (r.getLong(0), (r.getString(1), r.getLong(2)))).toMap
      assert(got.size == 110)
      (0L until 90L).foreach(k => assert(got(k) == (s"g${k % 4}", k * 10)))
      (90L until 110L).foreach(k => assert(got(k) == ("gm", k * 100)))
      assert(RowTableStore.lastReplaceCommand("spec.t")
        .contains("MERGE"), "expected the ReplaceData path")
    }
  }

  test("FilterEval translatability is exact-or-refuse") {
    val sc = StructType(Seq(StructField("k", LongType),
      StructField("grp", StringType)))
    assert(FilterEval.translatable(
      Or(EqualTo("grp", "a"), In("k", Array(1L, 2L))), sc))
    assert(!FilterEval.translatable(EqualNullSafe("grp", "a"), sc),
      "EqualNullSafe is not implemented, must be refused")
    assert(!FilterEval.translatable(StringStartsWith("grp", "a"), sc))
    assert(!FilterEval.translatable(EqualTo("missing", 1L), sc),
      "unknown column must be refused")
    // null comparisons are SQL three-valued: never match
    assert(!FilterEval.eval(EqualTo("grp", "a"), sc, Seq(1L, null)))
    assert(!FilterEval.eval(org.apache.spark.sql.sources
      .LessThan("k", 5L), sc, Seq(null, "a")))
    // ...and UNKNOWN must survive Not un-collapsed (r10 fix): a NULL
    // column under Not(EqualTo) is UNKNOWN, not a match — collapsing
    // early would make "col <> v" delete NULL rows SQL keeps
    import org.apache.spark.sql.sources.{And, IsNull, Not}
    assert(!FilterEval.eval(Not(EqualTo("grp", "a")), sc, Seq(1L, null)))
    assert(!FilterEval.eval(Not(In("grp", Array[Any]("a", "b"))),
      sc, Seq(1L, null)))
    // Kleene AND/OR: UNKNOWN AND FALSE = FALSE, so NOT of it is TRUE
    assert(FilterEval.eval(Not(And(EqualTo("grp", "a"),
      EqualTo("k", 99L))), sc, Seq(1L, null)))
    // IsNull decides null columns definitively even under Not
    assert(FilterEval.eval(Not(IsNull("grp")), sc, Seq(1L, "a")))
    assert(!FilterEval.eval(Not(IsNull("grp")), sc, Seq(1L, null)))
  }

  test("metadata DELETE with <> keeps NULL rows (three-valued Not)") {
    withCatalog {
      freshTable()
      // add two NULL-grp rows; `grp <> 'g1'` is UNKNOWN for them, so a
      // correct metadata-tier delete must NOT remove them
      spark.range(1000, 1002)
        .select(col("id").as("k"), lit(null).cast("string").as("grp"),
          lit(0L).as("v"))
        .writeTo(tbl).append()
      spark.sql(s"DELETE FROM $tbl WHERE grp <> 'g1'")
      val left = spark.table(tbl).collect()
        .map(r => (r.getLong(0), Option(r.getString(1)))).toSet
      val expect = (0L until 100L).filter(_ % 4 == 1)
        .map(k => (k, Some(s"g1"))).toSet ++
        Set((1000L, None), (1001L, None))
      assert(left == expect,
        "survivors must be the g1 rows AND the NULL rows")
      // and it ran on the metadata tier (Not(EqualTo) is translatable)
      assert(RowTableStore.lastDeleteFilters("spec.t").isDefined)
    }
  }

  test("overwrite tier routing: TRUNCATE / INSERT OVERWRITE / by-filter") {
    withCatalog {
      freshTable()
      // TRUNCATE routes to the metadata tier (SupportsDelete's default
      // truncateTable → deleteWhere(AlwaysTrue))
      spark.sql(s"TRUNCATE TABLE $tbl")
      assert(spark.table(tbl).count() == 0)
      assert(RowTableStore.lastDeleteFilters("spec.t").exists(_.exists {
        case org.apache.spark.sql.sources.AlwaysTrue() => true
        case _ => false
      }), "TRUNCATE must arrive as a pushed AlwaysTrue delete")
      // INSERT OVERWRITE = full swap through SupportsOverwrite
      spark.range(0, 10)
        .select(col("id").as("k"), lit("gA").as("grp"),
          col("id").as("v"))
        .createOrReplaceTempView("ovr_src")
      spark.sql(s"INSERT OVERWRITE $tbl SELECT * FROM ovr_src")
      assert(spark.table(tbl).count() == 10)
      assert(RowTableStore.lastOverwriteFilters("spec.t").exists(_.forall {
        case org.apache.spark.sql.sources.AlwaysTrue() => true
        case _ => false
      }), "INSERT OVERWRITE must arrive as overwrite(AlwaysTrue)")
      // overwrite-by-filter replaces EXACTLY the matching group
      spark.range(100, 105)
        .select(col("id").as("k"), lit("gB").as("grp"), col("id").as("v"))
        .writeTo(tbl).overwrite(col("grp") === "gB")
      val got = spark.table(tbl).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == (0L until 10L).map((_, "gA")).toSet ++
        (100L until 105L).map((_, "gB")).toSet,
        "non-matching gA rows must be untouched, gB group swapped in")
      assert(RowTableStore.lastOverwriteFilters("spec.t").exists(_.exists {
        case EqualTo("grp", _) => true
        case _ => false
      }), "the overwrite condition must cross as a pushed EqualTo")
    }
  }

  test("dropped-and-recreated table carries no stale path markers") {
    withCatalog {
      freshTable()
      spark.sql(s"UPDATE $tbl SET v = v + 1 WHERE grp = 'g0'")
      spark.sql(s"DELETE FROM $tbl WHERE grp = 'g1'")
      assert(RowTableStore.lastReplaceCommand("spec.t").isDefined)
      assert(RowTableStore.lastDeleteFilters("spec.t").isDefined)
      freshTable() // drop + recreate
      assert(RowTableStore.lastReplaceCommand("spec.t").isEmpty,
        "recreate must not inherit the predecessor's rewrite marker")
      assert(RowTableStore.lastDeleteFilters("spec.t").isEmpty)
      assert(RowTableStore.lastOverwriteFilters("spec.t").isEmpty)
    }
  }

  test("metadata columns: values identify the generating split exactly") {
    val got = spark.read.format("graft-pages")
      .option("rows", "100").option("parts", "4").load()
      .select(col("page_id"), col("_split_id"), col("_pos_in_split"))
      .collect()
    assert(got.length == 100)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getInt(1) == (id / 25).toInt,
        s"page $id expected split ${id / 25}")
      assert(r.getLong(2) == id % 25, s"page $id expected pos ${id % 25}")
    }
  }

  test("metadata columns are pruned unless selected (html pruned too)") {
    def scanDesc(df: org.apache.spark.sql.DataFrame): String =
      df.queryExecution.executedPlan.toString
    val base = spark.read.format("graft-pages")
      .option("rows", "100").option("parts", "4").load()
    val without = scanDesc(base.select("page_id"))
    assert(!without.contains("_split_id") && !without.contains("html"),
      s"unselected metadata/html must not ride the read schema:\n$without")
    val withMeta = scanDesc(base.select(col("page_id"), col("_split_id")))
    assert(withMeta.contains("_split_id") && !withMeta.contains("html"),
      s"selected metadata must be in the read schema, html still pruned:\n" +
        withMeta)
  }

  // ---- atomic partition management (r11) ----

  private val ptbl = "graft_tab.spec.p"
  private def freshPartitioned(): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $ptbl")
    spark.sql(s"CREATE TABLE $ptbl (k BIGINT, grp STRING, v BIGINT) " +
      "PARTITIONED BY (grp)")
    spark.range(0, 40)
      .select(col("id").as("k"),
        concat(lit("g"), (col("id") % 4).cast("string")).as("grp"),
        (col("id") * 10).as("v"))
      .writeTo(ptbl).append()
    spark.sql(s"ALTER TABLE $ptbl ADD PARTITION (grp = 'g0') " +
      "PARTITION (grp = 'g1') PARTITION (grp = 'g2') PARTITION (grp = 'g3')")
  }
  private def partsOf(t: String): Seq[String] =
    spark.sql(s"SHOW PARTITIONS $t").collect().map(_.getString(0)).toSeq

  test("SHOW PARTITIONS lists exactly the registered partitions, sorted") {
    withCatalog {
      freshPartitioned()
      assert(partsOf(ptbl) == Seq("grp=g0", "grp=g1", "grp=g2", "grp=g3"))
    }
  }

  test("DROP PARTITION is a metadata op that takes the partition's rows") {
    withCatalog {
      freshPartitioned()
      spark.sql(s"ALTER TABLE $ptbl DROP PARTITION (grp = 'g1')")
      assert(partsOf(ptbl) == Seq("grp=g0", "grp=g2", "grp=g3"))
      val left = spark.table(ptbl).select("grp").distinct()
        .collect().map(_.getString(0)).toSet
      assert(left == Set("g0", "g2", "g3"),
        "the dropped partition's rows must go with it (Hive semantics)")
      // partition drop is NOT the DELETE tier: no pushed-delete marker
      assert(RowTableStore.lastDeleteFilters("spec.p").isEmpty,
        "DROP PARTITION must not masquerade as a metadata DELETE")
    }
  }

  test("multi-partition ADD/DROP is atomic: one bad spec, no change") {
    withCatalog {
      freshPartitioned()
      // one duplicate (g0) in a multi-ADD: nothing may be registered
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $ptbl ADD PARTITION (grp = 'gX') " +
          "PARTITION (grp = 'g0')")
      }
      assert(partsOf(ptbl) == Seq("grp=g0", "grp=g1", "grp=g2", "grp=g3"),
        "failed multi-ADD must register nothing (no gX)")
      // one missing (gY) in a multi-DROP: nothing may be dropped
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $ptbl DROP PARTITION (grp = 'g2'), " +
          "PARTITION (grp = 'gY')")
      }
      assert(partsOf(ptbl) == Seq("grp=g0", "grp=g1", "grp=g2", "grp=g3"),
        "failed multi-DROP must drop nothing (g2 intact)")
      assert(spark.table(ptbl).count() == 40,
        "failed multi-DROP must not touch any rows")
    }
  }

  test("TRUNCATE PARTITION empties the partition but keeps it registered") {
    withCatalog {
      freshPartitioned()
      spark.sql(s"TRUNCATE TABLE $ptbl PARTITION (grp = 'g0')")
      assert(partsOf(ptbl) == Seq("grp=g0", "grp=g1", "grp=g2", "grp=g3"),
        "TRUNCATE must not unregister (that is DROP's job)")
      val grps = spark.table(ptbl).select("grp").distinct()
        .collect().map(_.getString(0)).toSet
      assert(grps == Set("g1", "g2", "g3") &&
        spark.table(ptbl).count() == 30,
        "exactly the truncated partition's rows must be gone")
    }
  }

  test("RENAME PARTITION moves the registry entry and rewrites its rows") {
    withCatalog {
      freshPartitioned()
      spark.sql(s"ALTER TABLE $ptbl PARTITION (grp = 'g3') " +
        "RENAME TO PARTITION (grp = 'g9')")
      assert(partsOf(ptbl) == Seq("grp=g0", "grp=g1", "grp=g2", "grp=g9"))
      val grps = spark.table(ptbl).groupBy("grp").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(grps == Map("g0" -> 10L, "g1" -> 10L, "g2" -> 10L, "g9" -> 10L),
        "the renamed partition's rows must carry the new value")
      // missing source and occupied target must both refuse, no change
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $ptbl PARTITION (grp = 'gZ') " +
          "RENAME TO PARTITION (grp = 'gW')")
      }
      intercept[Exception] {
        spark.sql(s"ALTER TABLE $ptbl PARTITION (grp = 'g0') " +
          "RENAME TO PARTITION (grp = 'g1')")
      }
      assert(partsOf(ptbl) == Seq("grp=g0", "grp=g1", "grp=g2", "grp=g9"))
    }
  }

  test("partial partition spec filters the listing") {
    withCatalog {
      freshPartitioned()
      assert(partsOf(s"$ptbl PARTITION (grp = 'g2')") == Seq("grp=g2"))
    }
  }
}
