package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Fifty-seventh wave — image dedup by perceptual hash.
  *
  * `q_image_phash`: the visual-dedup fingerprint computed from REAL
  * decoded pixels ([[graft.ext.MultimodalOps.perceptualHash]] —
  * `javax.imageio` decode → NN 2×2 thumbnail → average-hash bits via
  * cross-multiplied integer brightness comparisons), then hash-bucket
  * grouping: images sharing a phash are near-dup candidates — the
  * image-side twin of exact-md5 text dedup, and the missing
  * application layer above the r5 decode plumbing. The oracle replays
  * the fixture pixel formula through the SAME downsample mapping and
  * bit rule, so a decoder that does not read pixels cannot match.
  *
  * Scale: decode + hash are map-side (mapPartitions batches); the only
  * shuffle groups by the 2^(grid²)-bounded hash value.
  */
object R57Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val qImagePhash = QueryDef("q_image_phash",
    (s, dir) => {
      val hashes = graft.ext.MultimodalOps.perceptualHash(s,
        graft.ext.MultimodalOps.imagesFromDocuments(s,
          t(s, dir, "documents").where(col("doc_id") < 120)),
        grid = 2).toDF()
      hashes
        .withColumn("n_same",
          count(lit(1)).over(Window.partitionBy("phash")).cast("long"))
        .select("doc_id", "phash", "n_same")
        .orderBy("doc_id")
    },
    Some(
      """WITH d AS (SELECT doc_id, doc_id % 5 + 1 AS w, doc_id % 4 + 1 AS h
        |           FROM documents WHERE doc_id < 120),
        |gi AS (SELECT doc_id, w, h, unnest(generate_series(0, 1)) AS i FROM d),
        |gj AS (SELECT doc_id, w, h, i, unnest(generate_series(0, 1)) AS j FROM gi),
        |px AS (SELECT doc_id, j * 2 + i AS k,
        |         (i * w) // 2 AS x, (j * h) // 2 AS y
        |       FROM gj),
        |gray AS (SELECT doc_id, k,
        |    CAST((doc_id * 7 + x * 13 + y * 31) % 256
        |      + (doc_id * 11 + x * 3 + y * 17) % 256
        |      + (doc_id * 5 + x * 19 + y * 23) % 256 AS BIGINT) AS g
        |  FROM px),
        |tot AS (SELECT doc_id, CAST(sum(g) AS BIGINT) AS total
        |        FROM gray GROUP BY 1),
        |bits AS (SELECT gray.doc_id,
        |    CAST(sum(CASE WHEN g * 4 > total THEN 1 << k ELSE 0 END) AS BIGINT)
        |      AS phash
        |  FROM gray JOIN tot ON tot.doc_id = gray.doc_id
        |  GROUP BY gray.doc_id)
        |SELECT doc_id, phash,
        |  CAST(count(*) OVER (PARTITION BY phash) AS BIGINT) AS n_same
        |FROM bits ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qImagePhash)
}
