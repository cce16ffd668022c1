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
}
