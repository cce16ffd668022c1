package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning — the scale form of the reference's visited
  * anti-join (`web_spider_oo.py:99-101`, F4/J3 in SURVEY.md §2).
  *
  * At 100 TB the frontier⟕visited anti-join shuffles the full left side
  * every iteration even though most rows miss. A bloom filter built on
  * the right side's keys and broadcast to the left classifies each left
  * row without a shuffle:
  *
  *  - "definitely absent" rows are emitted immediately (no false
  *    negatives — this is exact);
  *  - "maybe present" rows (the small side after pruning: true hits +
  *    fpp·misses) go through the exact anti-join.
  *
  * The union is row-identical to the plain `left_anti` join (spec +
  * oracle-checked), but only the maybe-fraction is shuffled. Spark's AQE
  * runtime filters (`spark.sql.optimizer.runtime.bloomFilter.enabled`)
  * apply the same idea adaptively to inner joins; this explicit form
  * covers anti-join semantics, which runtime filters don't.
  */
object BloomOps {

  /** Exact anti-join with bloom pre-pruning. Keys must be LONG (the
    * typed `mightContainLong` fast path — hash non-numeric keys to LONG
    * with xxhash64 first).
    *
    * @param expectedItems sizing for the filter (right side cardinality)
    * @param fpp           target false-positive probability
    */
  def bloomPrunedAntiJoin(left: DataFrame, right: DataFrame,
                          leftKey: String, rightKey: String,
                          expectedItems: Long = 1000000L,
                          fpp: Double = 0.01): DataFrame = {
    val bf = right.stat.bloomFilter(rightKey, expectedItems, fpp)
    val bcast = left.sparkSession.sparkContext.broadcast(bf)
    val mightContain = udf((k: Long) => bcast.value.mightContainLong(k))
    val probe: Column = mightContain(col(leftKey))
    val definitelyAbsent = left.filter(!probe)
    val maybePresent = left.filter(probe)
      .join(right.select(col(rightKey)),
        col(leftKey) === col(rightKey), "left_anti")
    definitelyAbsent.unionByName(maybePresent)
  }
}
