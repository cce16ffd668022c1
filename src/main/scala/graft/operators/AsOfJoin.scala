package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join: for each left row, the single latest right
  * row with `rightTime <= leftTime` within the same key — the canonical
  * time-series enrichment operator (absent from both the reference and
  * Spark's built-ins; SURVEY.md §2.4 notes the gap).
  *
  * Implementation is the scalable union+window form, per the preference
  * order "(a) compose existing ops if semantics allow":
  *   1. tag both sides and union them (no pair explosion — input sizes add,
  *      never multiply, unlike the naive range-join + rank formulation);
  *   2. one shuffle partitions by key and sorts by (time, side, tie);
  *   3. `last(right_payload, ignoreNulls)` over the running window carries
  *      the most recent right row onto every left row.
  * Cost: one shuffle of |L|+|R| rows — survives 100 TB inputs wherever a
  * groupBy on the key does. Right rows sort BEFORE left rows at equal
  * timestamps, giving inclusive (<=) semantics; ties among right rows
  * resolve to the greatest `rightTie` for determinism.
  */
object AsOfJoin {

  /**
    * @param left       probe side
    * @param right      quote side
    * @param leftKey    join key column name in `left`
    * @param rightKey   join key column name in `right`
    * @param leftTime   event-time column in `left`
    * @param rightTime  event-time column in `right`
    * @param rightTie   unique tie-break column in `right`
    * @param rightVals  right columns to carry onto matched left rows
    * @return all `left` columns + `rightVals` (null when no right row
    *         precedes the left row — left-outer as-of semantics)
    */
  def asOf(left: DataFrame, right: DataFrame,
           leftKey: String, rightKey: String,
           leftTime: String, rightTime: String,
           rightTie: String, rightVals: Seq[String]): DataFrame = {
    // the deterministic tie-break requires an integral tie column — a
    // silent cast-to-null here would destroy it without any error
    right.schema(rightTie).dataType match {
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
      case other => throw new IllegalArgumentException(
        s"rightTie '$rightTie' must be an integral column, got $other")
    }
    // join semantics: NULL keys never match and a NULL rightTime never
    // satisfies rightTime <= leftTime — drop such right rows up front
    // (they would otherwise sort first and be carried onto every left row)
    val rightClean = right.filter(col(rightKey).isNotNull &&
      col(rightTime).isNotNull)
    val payload = struct((rightVals :+ rightTie).distinct.map(col): _*)
    val l = left.select(
      col(leftKey).as("__k"), col(leftTime).as("__t"),
      lit(1).as("__side"), lit(null).cast("long").as("__tie"),
      struct(left.columns.map(col): _*).as("__left"),
      lit(null).cast(
        right.select(payload).schema.fields.head.dataType).as("__right"))
    val r = rightClean.select(
      col(rightKey).as("__k"), col(rightTime).as("__t"),
      lit(0).as("__side"), col(rightTie).cast("long").as("__tie"),
      lit(null).cast(
        left.select(struct(left.columns.map(col): _*)).schema.fields.head.dataType)
        .as("__left"),
      payload.as("__right"))
    val w = Window.partitionBy("__k")
      .orderBy(col("__t"), col("__side"), col("__tie").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__match", last(col("__right"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
    val leftCols = left.columns.map(c => col("__left").getField(c).as(c))
    val rightCols = rightVals.map(c => col("__match").getField(c).as(c))
    carried.select(leftCols ++ rightCols: _*)
  }
}
