package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Twenty-ninth wave — the entity-resolution pipeline, end to end.
  *
  * `q_entity_resolution` composes four operators this library already
  * ships into the canonical ER topology:
  *
  *   1. BLOCK — deletion-neighborhood candidate generation
  *      (R20's FastSS trick: shuffle Σ|name|+1 keys, never |A|×|B|);
  *   2. VERIFY — exact levenshtein ≤ 1 on candidates only;
  *   3. CLUSTER — connected components over the verified match graph
  *      ([[graft.ext.GraphOps.connectedComponents]]);
  *   4. SURVIVE — one golden record per cluster by a deterministic
  *      survivorship rule (longest name, ties lexicographic).
  *
  * The DuckDB oracle replays the whole pipeline with brute-force
  * verification and a recursive-CTE transitive closure — proving both
  * that the blocking loses nothing AND that the distributed component
  * labels match exact closure. This is the composition story: each
  * stage is an independently-tested operator, and the pipeline output
  * is still bit-exact.
  */
object R29Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  /** Records: the 4-10-char document vocabulary as "entities"
    * (rid = rank in name order), plus a deterministically corrupted
    * twin of every even-length name (2nd char deleted, rid + 100000) —
    * the typo'd duplicate feed an ER system exists to reconcile.
    * Identical odd-length twins model EXACT duplicate records (edit
    * distance 0), which must also land in one cluster. */
  val qEntityResolution = QueryDef("q_entity_resolution",
    (s, dir) => {
      val vocab = t(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("w"))
        .where(length(col("w")).between(4, 10)).distinct()
        .withColumn("rid",
          row_number().over(Window.partitionBy(lit(1)).orderBy(col("w")))
            .cast("long"))
      val recs = vocab.select(col("rid"), col("w").as("name"))
        .unionAll(vocab.select((col("rid") + 100000L).as("rid"),
          when(length(col("w")) % 2 === 0,
            concat(substring(col("w"), 1, 1), expr("substring(w, 3)")))
            .otherwise(col("w")).as("name")))
        // persisted: the record set is read by the blocking self-join
        // (twice), the cluster join, and survivorship — without it the
        // corpus-wide vocabulary explode re-runs per reference
        // (vocabulary-sized in memory; Bench clearCache reclaims it)
        .persist()
      // 1+2: block on 1-deletion variants, verify exact distance
      val keyed = recs.select(col("rid"), col("name"),
        explode(R20Queries.deletionVariants("name")).as("k"))
        .persist()
      val edges = keyed.select(col("rid").as("a"), col("name").as("na"),
          col("k"))
        .join(keyed.select(col("rid").as("b"), col("name").as("nb"),
          col("k")), "k")
        .where(col("a") < col("b")).select("a", "na", "b", "nb").distinct()
        .where(levenshtein(col("na"), col("nb")) <= 1)
        .select("a", "b")
      // 3: cluster the match graph; singletons stay their own cluster
      val comps = graft.ext.GraphOps.connectedComponents(s, edges)
      val clustered = recs.join(comps,
          recs("rid") === comps("node"), "left")
        .select(col("rid"), col("name"),
          coalesce(col("component"), col("rid")).as("cluster"))
      // 4: survivorship — longest name, tie lexicographic, tie min rid
      val w = Window.partitionBy("cluster")
        .orderBy(length(col("name")).desc, col("name"), col("rid"))
      clustered
        .withColumn("rk", row_number().over(w))
        .groupBy("cluster")
        .agg(count(lit(1)).cast("long").as("n_records"),
          max(when(col("rk") === 1, col("name"))).as("canonical"))
        .orderBy("cluster")
    },
    Some(
      """WITH RECURSIVE vocab AS (
        |  SELECT w, CAST(row_number() OVER (ORDER BY w) AS BIGINT) AS rid
        |  FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS w
        |        FROM documents)
        |  WHERE length(w) BETWEEN 4 AND 10
        |), recs AS (
        |  SELECT rid, w AS name FROM vocab
        |  UNION ALL
        |  SELECT rid + 100000,
        |    CASE WHEN length(w) % 2 = 0
        |         THEN substr(w, 1, 1) || substr(w, 3) ELSE w END
        |  FROM vocab
        |), pairs AS (
        |  SELECT a.rid AS a, b.rid AS b FROM recs a, recs b
        |  WHERE a.rid < b.rid AND levenshtein(a.name, b.name) <= 1
        |),
        |edges AS (SELECT a AS src, b AS dst FROM pairs
        |          UNION SELECT b, a FROM pairs),
        |reach(node, other) AS (
        |  SELECT src, src FROM edges
        |  UNION
        |  SELECT r.node, e.dst FROM reach r JOIN edges e ON e.src = r.other
        |), comp AS (
        |  SELECT node, min(other) AS component FROM reach GROUP BY node
        |), clustered AS (
        |  SELECT r.rid, r.name, coalesce(c.component, r.rid) AS cluster
        |  FROM recs r LEFT JOIN comp c ON r.rid = c.node
        |), ranked AS (
        |  SELECT cluster, name,
        |    row_number() OVER (PARTITION BY cluster
        |      ORDER BY length(name) DESC, name, rid) AS rk
        |  FROM clustered
        |)
        |SELECT cluster, CAST(count(*) AS BIGINT) AS n_records,
        |  max(CASE WHEN rk = 1 THEN name END) AS canonical
        |FROM ranked GROUP BY cluster ORDER BY cluster""".stripMargin))

  val all: Seq[QueryDef] = Seq(qEntityResolution)
}
