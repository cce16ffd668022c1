package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join for two LARGE sides. `q_range_join` covers the
  * broadcast-NLJ shape (tiny ranges dim); when BOTH sides are big, a
  * nested loop is O(|L|·|R|) and a plain theta join cannot shuffle on
  * any key. The scale recipe is overlap binning:
  *
  *  1. explode every interval to the fixed-width bins it covers
  *     (`sequence` — map-side, fan-out = interval length / bin width);
  *  2. hash-shuffle both sides on the bin — overlapping intervals are
  *     now CO-LOCATED (two intervals overlap only if they share a bin);
  *  3. apply the exact predicate `l_lo < r_hi AND r_lo < l_hi` inside
  *     the equi-join;
  *  4. emit each pair ONCE without a distinct: only from the FIRST bin
  *     both intervals cover, `bin == max(floor(l_lo/w), floor(r_lo/w))`
  *     — the dedup is a scalar filter, not a shuffle.
  *
  * Shuffle volume is rows × avg-bins-per-interval; pick `binWidth` near
  * the typical interval length so that factor stays small. This is the
  * classic distributed interval-join shape (genomics/temporal engines
  * use the same binning; cf. the sweep-line variant in `q_sweepline`
  * for COUNTING overlaps rather than enumerating pairs).
  *
  * Intervals are half-open `[lo, hi)` on any integral type; rows with
  * `lo >= hi` (empty) or null bounds are dropped.
  */
object IntervalJoin {

  /** Floor division on LONG columns. `floor(col / w)` would divide in
    * DOUBLE and corrupt bins beyond 2^53 (nanosecond epochs are ~1.7e18
    * — the same hazard Tables.events documents); `div` truncates toward
    * zero, which is wrong for negative bounds. Decimal division is
    * exact over the full long range and floor() gives true floor. */
  private def floorDiv(c: Column, w: Long): Column =
    floor(c.cast("decimal(28,0)") / w).cast("long")

  private def bins(lo: Column, hi: Column, w: Long): Column =
    sequence(floorDiv(lo, w), floorDiv(hi - 1, w))

  /** Inner overlap join. `left` needs (lo, hi) columns named by
    * `leftLo`/`leftHi`, same for `right`; output = left columns then
    * right columns, one row per overlapping pair. */
  def binnedOverlapJoin(left: DataFrame, leftLo: String, leftHi: String,
      right: DataFrame, rightLo: String, rightHi: String,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val l = left
      .where(col(leftLo).isNotNull && col(leftHi).isNotNull &&
        col(leftLo) < col(leftHi))
      .withColumn("__bin", explode(bins(col(leftLo), col(leftHi), binWidth)))
    val r = right
      .where(col(rightLo).isNotNull && col(rightHi).isNotNull &&
        col(rightLo) < col(rightHi))
      .withColumn("__bin", explode(bins(col(rightLo), col(rightHi), binWidth)))
    // explicit aliases: both sides may share lineage (self-join on one
    // table), where bare df("col") references resolve ambiguously
    val lA = l.alias("__ivl")
    val rA = r.alias("__ivr")
    def lc(n: String) = col(s"__ivl.$n")
    def rc(n: String) = col(s"__ivr.$n")
    lA.join(rA,
        lc("__bin") === rc("__bin") &&
          lc(leftLo) < rc(rightHi) && rc(rightLo) < lc(leftHi) &&
          // first shared bin: dedup as a scalar predicate, no distinct
          lc("__bin") === greatest(
            floorDiv(lc(leftLo), binWidth),
            floorDiv(rc(rightLo), binWidth)))
      .drop("__bin")
  }
}
