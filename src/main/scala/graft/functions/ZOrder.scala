package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve values as pure column expressions — the
  * multi-dimension data-layout primitive. Sorting / range-partitioning a
  * table by `zValue2(x, y)` clusters rows so that EVERY interleaved
  * dimension has tight per-file min/max ranges, which makes parquet
  * row-group and file skipping effective for predicates on either (or
  * both) columns — where a linear `ORDER BY x, y` layout only prunes on
  * the leading column.
  *
  * The bit interleave is unrolled into `bits` shift/and/or terms: plain
  * integer expressions, fully inside whole-stage codegen, no UDF. The
  * same formula is emitted as ANSI SQL by [[zSql2]] so query oracles stay
  * generated from one set of constants (integer-exact cross-engine).
  *
  * At 100 TB: z-ordering is a write-time layout choice —
  * `repartitionByRange(zValue2(...))` + `sortWithinPartitions` on the
  * z-value; readers need no knowledge of it (pruning falls out of
  * ordinary min/max stats).
  */
object ZOrder {

  /** Morton-interleave the low `bits` bits of two non-negative integral
    * columns: x occupies even result bits, y odd. Inputs must already be
    * range-reduced (e.g. `pmod` or quantile-bucketed) to fit `bits`. */
  def zValue2(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xs = x.cast("long")
    val ys = y.cast("long")
    (0 until bits).map { i =>
      shiftleft(shiftright(xs, i).bitwiseAND(lit(1L)), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(ys, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }.reduce(_ bitwiseOR _)
  }

  /** The same interleave as ANSI SQL over column expressions `x`/`y` —
    * for DuckDB oracles generated from the same `bits` constant. Inputs
    * are cast to BIGINT to mirror zValue2's long cast: without it,
    * INTEGER-typed inputs overflow DuckDB's 32-bit left shift at
    * bits >= 16 even though [1,31] is the documented range. */
  def zSql2(x: String, y: String, bits: Int): String = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val xb = s"CAST($x AS BIGINT)"
    val yb = s"CAST($y AS BIGINT)"
    (0 until bits).map { i =>
      s"(((($xb >> $i) & 1) << ${2 * i}) | ((($yb >> $i) & 1) << ${2 * i + 1}))"
    }.mkString("(", " | ", ")")
  }
}
