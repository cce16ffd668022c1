package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Two-pass exact heavy hitters with a Misra-Gries candidate sketch —
  * the bounded-memory path to "most frequent values" at 100 TB.
  *
  * A plain groupBy-count over a high-cardinality column shuffles every
  * distinct value. Misra-Gries instead keeps only k counters per
  * partition (classic guarantee: any value with true frequency
  * > n/(k+1) survives the sketch), the per-partition summaries merge on
  * the driver (numPartitions × k entries — tiny), and ONE exact
  * aggregation restricted to the surviving candidates confirms true
  * counts. The sketch can only over-approximate the candidate set, so
  * the final answer is EXACT — identical to the single-pass groupBy —
  * while the shuffle carries only candidate rows.
  */
object HeavyHitters {

  /** Merge-able Misra-Gries summary: at most k keys with lower-bound
    * counts. Insertion decrements all keys when full (the classic
    * k-counter form); merging sums summaries then subtracts the
    * (k+1)-largest count (Agarwal et al., "Mergeable Summaries"). */
  private[ext] def mgInsert(state: Map[String, Long], v: String,
                            k: Int): Map[String, Long] =
    state.get(v) match {
      case Some(c) => state.updated(v, c + 1)
      case None if state.size < k => state.updated(v, 1L)
      case None =>
        state.flatMap { case (key, c) =>
          if (c > 1) Some(key -> (c - 1)) else None
        }
    }

  private[ext] def mgMerge(a: Map[String, Long], b: Map[String, Long],
                           k: Int): Map[String, Long] = {
    val summed = (a.keySet ++ b.keySet).iterator
      .map(key => key -> (a.getOrElse(key, 0L) + b.getOrElse(key, 0L)))
      .toMap
    if (summed.size <= k) summed
    else {
      val cut = summed.values.toSeq.sorted(Ordering[Long].reverse)(k)
      summed.flatMap { case (key, c) =>
        if (c > cut) Some(key -> (c - cut)) else None
      }
    }
  }

  /** One pass over a single-column frame: per-partition (rowCount,
    * Misra-Gries summary), merged on the driver. Returns (n,
    * candidates) from the SAME snapshot — folding the count into the
    * sketch pass both saves a full scan and keeps n consistent with the
    * candidates (a separate count() over a non-deterministic source
    * would make the threshold lie). */
  def mgCandidatesWithCount(values: DataFrame, k: Int): (Long, Seq[String]) = {
    require(k >= 1, "k must be >= 1")
    require(values.columns.length == 1,
      s"mgCandidatesWithCount expects exactly one column, " +
        s"got ${values.columns.mkString(", ")}")
    val partials = values.select(col(values.columns.head).cast("string"))
      .rdd
      .mapPartitions { it =>
        var st = Map.empty[String, Long]
        var c = 0L
        it.foreach { r =>
          if (!r.isNullAt(0)) { c += 1; st = mgInsert(st, r.getString(0), k) }
        }
        Iterator.single((c, st))
      }
      .collect()
    val n = partials.map(_._1).sum
    val merged = partials.map(_._2)
      .foldLeft(Map.empty[String, Long])((a, b) => mgMerge(a, b, k))
    (n, merged.keys.toSeq)
  }

  /** Candidate values whose true count MAY exceed n/(k+1). */
  def mgCandidates(values: DataFrame, k: Int): Seq[String] =
    mgCandidatesWithCount(values, k)._2

  /** Exact heavy hitters: every value of `valueCol` with true count
    * strictly greater than n/(k+1), where n is the total (non-null)
    * value count. Integer-exact threshold (`cnt * (k+1) > n` — no
    * division), so results are engine-reproducible bit-for-bit.
    * Two scans total: sketch+count, then candidate confirmation. The
    * input must be deterministic across the two scans (as for any
    * multi-pass algorithm over a recomputed plan — persist it if not).
    */
  def heavyHitters(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    val vals = df.select(valueCol.cast("string").as("v"))
      .where(col("v").isNotNull)
    val (n, candidates) = mgCandidatesWithCount(vals, k)
    // exact confirmation over candidates only — the shuffle carries just
    // candidate rows, the guarantee makes this equal to a full groupBy
    vals.where(col("v").isin(candidates: _*))
      .groupBy("v").agg(count(lit(1)).cast("long").as("cnt"))
      .where(col("cnt") * (k + 1) > n)
  }
}
