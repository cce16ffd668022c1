package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Tables
import graft.queries.Queries.QueryDef

/** Fifty-eighth wave — audio fingerprint dedup.
  *
  * `q_audio_fp`: energy-band fingerprint from REAL decoded PCM
  * ([[graft.ext.MultimodalOps.audioFingerprint]] — WAV parse → 4 equal
  * windows → Σ|amplitude| per window → louder-than-mean bits via
  * cross-multiplied integers) + hash-bucket grouping: the audio twin
  * of q_image_phash, completing perceptual dedup across the
  * image/audio modalities. Oracle replays the sample formula through
  * the identical band mapping and bit rule.
  *
  * Scale: decode + fingerprint are map-side; the only shuffle groups
  * by the 2^bands-bounded hash.
  */
object R58Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  val qAudioFp = QueryDef("q_audio_fp",
    (s, dir) => {
      val fps = graft.ext.MultimodalOps.audioFingerprint(s,
        graft.ext.MultimodalOps.wavsFromDocuments(s,
          t(s, dir, "documents").where(col("doc_id") < 200)),
        bands = 4).toDF()
      fps
        .withColumn("n_same",
          count(lit(1)).over(Window.partitionBy("afp")).cast("long"))
        .select("doc_id", "n_samples", "afp", "n_same")
        .orderBy("doc_id")
    },
    Some(
      """WITH d AS (SELECT doc_id, CAST(doc_id % 50 + 20 AS BIGINT) AS n
        |           FROM documents WHERE doc_id < 200),
        |sm AS (SELECT doc_id, n, unnest(generate_series(0, n - 1)) AS i FROM d),
        |amp AS (SELECT doc_id, n,
        |    least((i * 4) // n, 3) AS k,
        |    CAST(abs((doc_id * 31 + i * 17) % 2003 - 1001) AS BIGINT) AS a
        |  FROM sm),
        |bands AS (SELECT doc_id, n, k, CAST(sum(a) AS BIGINT) AS e
        |          FROM amp GROUP BY 1, 2, 3),
        |tot AS (SELECT doc_id, CAST(sum(e) AS BIGINT) AS total
        |        FROM bands GROUP BY 1),
        |bits AS (SELECT bands.doc_id, max(bands.n) AS n_samples,
        |    CAST(sum(CASE WHEN e * 4 > total THEN 1 << k ELSE 0 END) AS BIGINT)
        |      AS afp
        |  FROM bands JOIN tot ON tot.doc_id = bands.doc_id
        |  GROUP BY bands.doc_id)
        |SELECT doc_id, n_samples, afp,
        |  CAST(count(*) OVER (PARTITION BY afp) AS BIGINT) AS n_same
        |FROM bits ORDER BY doc_id""".stripMargin))

  val all: Seq[QueryDef] = Seq(qAudioFp)
}
