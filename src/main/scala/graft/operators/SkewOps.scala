package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffled equi-joins: key salting.
  *
  * When one join key carries a disproportionate share of rows, the shuffle
  * partition owning it becomes the straggler. Salting splits each hot key
  * into `saltFactor` sub-keys: the skewed (large) side gets a
  * deterministic pseudo-random salt per row, the other side is replicated
  * once per salt value, and the join runs on (key, salt). Result is
  * row-identical to the plain join (spec-tested) — only the partitioning
  * changes. AQE's skew-join split covers the same ground adaptively at
  * runtime (`spark.sql.adaptive.skewJoin.enabled`); explicit salting is
  * the static form that also works under joins AQE can't split (e.g.
  * pre-bucketed inputs).
  */
object SkewOps {

  /** Inner equi-join with the skewed side salted.
    *
    * @param skewed     large/skewed side
    * @param replicated small side (replicated saltFactor times)
    * @param skewedKey  join key column in `skewed`
    * @param repKey     join key column in `replicated`
    * @param saltFactor number of sub-keys per join key
    */
  def saltedInnerJoin(skewed: DataFrame, replicated: DataFrame,
                      skewedKey: String, repKey: String,
                      saltFactor: Int): DataFrame = {
    // deterministic per-row salt: hash of the whole row, not rand(), so
    // results are reproducible and retries are safe
    val salted = skewed.withColumn("__salt",
      pmod(hash(struct(skewed.columns.map(col): _*)), lit(saltFactor)))
    val fanned = replicated.withColumn("__salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    salted.join(fanned,
      salted(skewedKey) === fanned(repKey) && salted("__salt") === fanned("__salt"))
      .drop("__salt")
  }

  /** Inner equi-join that salts ONLY the heavy keys.
    *
    * [[saltedInnerJoin]] replicates the ENTIRE build side `saltFactor`
    * times — correct, but at scale the replication is wasted work for the
    * (vast) majority of keys that aren't skewed. This form first runs an
    * exact per-key count over the skewed side (map-side partial combine:
    * the shuffle carries one (key, count) row per key per input
    * partition — key-sized, not data-sized, and deterministic where a
    * sample would not be), then:
    *
    *  - keys with count >= `heavyThreshold` go through the salted join
    *    (skewed side salted, build side replicated `saltFactor`×);
    *  - every other key goes through the plain join with NO fan-out;
    *  - the union of the two is row-identical to the plain join.
    *
    * The heavy-key set is persisted and broadcast into semi/anti-join
    * splitters on both sides — it has at most |skewed|/heavyThreshold
    * keys, small by construction. Inner-join semantics make the split
    * exact: null keys match nothing in either branch.
    */
  def saltedInnerJoinSkewOnly(skewed: DataFrame, replicated: DataFrame,
                              skewedKey: String, repKey: String,
                              saltFactor: Int,
                              heavyThreshold: Long): DataFrame = {
    require(heavyThreshold > 0, "heavyThreshold must be positive")
    val heavy = skewed.groupBy(col(skewedKey))
      .agg(count(lit(1)).as("__n"))
      .where(col("__n") >= heavyThreshold)
      .select(col(skewedKey).as("__hk"))
      .persist() // feeds 4 splitters below; freed by the ContextCleaner
    val sHeavy = skewed.join(broadcast(heavy),
      skewed(skewedKey) === heavy("__hk"), "left_semi")
    val sLight = skewed.join(broadcast(heavy),
      skewed(skewedKey) === heavy("__hk"), "left_anti")
    val rHeavy = replicated.join(broadcast(heavy),
      replicated(repKey) === heavy("__hk"), "left_semi")
    val rLight = replicated.join(broadcast(heavy),
      replicated(repKey) === heavy("__hk"), "left_anti")
    val saltedPart =
      saltedInnerJoin(sHeavy, rHeavy, skewedKey, repKey, saltFactor)
    val plainPart = sLight.join(rLight, sLight(skewedKey) === rLight(repKey))
    // both branches emit skewed-columns ++ replicated-columns — positional
    // union is exact
    saltedPart.union(plainPart)
  }
}
