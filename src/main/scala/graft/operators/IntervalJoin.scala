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

  /** Floor division on LONG columns, exact over the FULL long range.
    * `floor(col / w)` divides in DOUBLE and corrupts bins beyond 2^53
    * (nanosecond epochs are ~1.7e18 — the hazard Tables.events
    * documents); decimal division rounds HALF_UP at its derived scale
    * before floor(), mis-binning values within w·5e-11 of a boundary
    * once w ≥ ~2e10 (minute/hour-wide ns bins). So: stay in integer
    * arithmetic. `div` truncates toward zero — already floor for c ≥ 0;
    * for c < 0, floor(c/w) = -((-c-1) div w) - 1, where -(c+1) cannot
    * overflow (c = Long.MinValue maps to Long.MaxValue). */
  private def floorDiv(c: Column, w: Long): Column =
    when(c >= 0, call_function("div", c, lit(w)))
      .otherwise(-call_function("div", -(c + 1), lit(w)) - 1)

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
