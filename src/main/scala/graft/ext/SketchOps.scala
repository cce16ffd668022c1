package graft.ext

import java.io.ByteArrayInputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.CountMinSketch

/** Count-min sketch point-frequency estimation.
  *
  * The reference counts link frequencies exactly (its corpus fits one
  * node); at 100 TB a full `GROUP BY url` materializes a key-cardinality-
  * sized result just to answer "how often does THIS url appear?". A CMS
  * answers point queries from a fixed (width × depth) counter grid:
  * the aggregation is one map-side-mergeable pass (Spark's
  * `count_min_sketch` agg merges partials pairwise, like the HLL and
  * bloom aggs the engine already uses), and the driver-side state is
  * model-sized — eps=0.005/conf=0.99 is a 2 KB grid regardless of
  * corpus size, the same collect-a-model shape as the IVF/PQ codebooks.
  *
  * Guarantee (Cormode-Muthukrishnan): est ≥ exact always (counters only
  * over-count), and est ≤ exact + eps·N with probability ≥ confidence.
  * SketchOpsSpec pins both sides against exact counts.
  */
object SketchOps {

  /** One-pass CMS over `keyCol` (long), then point estimates for
    * `candidates`. The sketch bytes cross the driver once (model-sized);
    * the estimates come from the deserialized grid, not another scan. */
  def cmsEstimates(df: DataFrame, keyCol: String, eps: Double,
                   confidence: Double, seed: Int,
                   candidates: Seq[Long]): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val bytes = df
      .agg(expr(s"count_min_sketch($keyCol, ${eps}d, ${confidence}d, $seed)")
        .as("cms"))
      .head().getAs[Array[Byte]](0)
    val cms = CountMinSketch.readFrom(new ByteArrayInputStream(bytes))
    candidates.map(k => (k, cms.estimateCount(Long.box(k))))
      .toDF("key", "est")
  }
}
