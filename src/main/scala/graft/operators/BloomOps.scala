package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType, StringType}

/** Bloom-filter join pruning — the scale form of the reference's visited
  * anti-join (`web_spider_oo.py:99-101`, F4/J3 in SURVEY.md §2).
  *
  * At 100 TB the frontier⟕visited anti-join shuffles the full left side
  * every iteration even though most rows miss. A bloom filter built on
  * the right side's keys and broadcast to the left classifies each left
  * row without a shuffle:
  *
  *  - "definitely absent" rows (including null-key rows, which can never
  *    match) are emitted immediately — blooms have no false negatives,
  *    so this branch is exact;
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

  /** Exact anti-join with bloom pre-pruning. Keys may be integral (the
    * typed `mightContainLong` fast path) or string (`mightContainString`
    * — the crawl's url-keyed shape). `leftKey == rightKey` is fine: the
    * right key is renamed internally before the join.
    *
    * @param expectedItems sizing for the filter (right side cardinality)
    * @param fpp           target false-positive probability
    */
  def bloomPrunedAntiJoin(left: DataFrame, right: DataFrame,
                          leftKey: String, rightKey: String,
                          expectedItems: Long = 1000000L,
                          fpp: Double = 0.01): DataFrame = {
    def isIntegral(t: org.apache.spark.sql.types.DataType) = t match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    val lType = left.schema(leftKey).dataType
    val rType = right.schema(rightKey).dataType
    // the bloom filter hashes by the INSERTED type — probing a
    // string-built filter with longs (or vice versa) would silently
    // classify everything "absent" and break the exactness contract
    require((isIntegral(lType) && isIntegral(rType)) ||
      (lType == StringType && rType == StringType),
      s"bloomPrunedAntiJoin keys must both be integral or both string, " +
        s"got left=$lType right=$rType")
    val bf = right.stat.bloomFilter(rightKey, expectedItems, fpp)
    val bcast = left.sparkSession.sparkContext.broadcast(bf)
    val mightContain: Column =
      if (isIntegral(lType)) {
        val u = udf((k: Long) => bcast.value.mightContainLong(k))
        u(col(leftKey).cast("long"))
      } else {
        val u = udf((k: String) => bcast.value.mightContainString(k))
        u(col(leftKey))
      }
    // join-key alias chosen to be absent from the left's columns — a
    // fixed name could collide and make the condition ambiguous
    val rk = Iterator.from(0).map(i => s"__bloom_rk$i")
      .find(n => !left.columns.contains(n)).get
    // null keys never match the right side: a plain left_anti KEEPS them,
    // so they belong on the definitely-absent fast path (the UDF would
    // return null and silently drop them from both branches otherwise)
    val definitelyAbsent = left.filter(col(leftKey).isNull || !mightContain)
    val maybePresent = left.filter(col(leftKey).isNotNull && mightContain)
      .join(right.select(col(rightKey).as(rk)),
        col(leftKey) === col(rk), "left_anti")
    definitelyAbsent.unionByName(maybePresent)
  }
}
