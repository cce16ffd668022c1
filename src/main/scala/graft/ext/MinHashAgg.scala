package graft.ext

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash signature aggregator (`Aggregator[IN, BUF, OUT]`, the
  * engine's UDAF surface — SURVEY.md §2.9): folds a group's shingles into
  * a numSeeds-long vector of per-seed minimum hashes.
  *
  * Complements the column-expression forms in [[DedupOps]]: use this on
  * `KeyValueGroupedDataset` (typed pipelines), the column forms in
  * DataFrame pipelines. Same scale shape as `minhashBands`: the buffer is
  * O(numSeeds) per group and merges associatively, so partial aggregation
  * happens map-side before the shuffle.
  *
  * Hashing is JVM-stable MurmurHash3 (scala stdlib) masked to 32 bits —
  * deterministic across executors/retries, independent of the md5/xxhash64
  * column variants (signature VALUES differ between the three forms;
  * near-dup detection behavior is equivalent, spec-tested).
  */
class MinHashAgg(numSeeds: Int)
    extends Aggregator[String, Array[Long], Seq[Long]] {

  private def h(s: String, seed: Int): Long =
    MurmurHash3.stringHash(s, seed).toLong & 0xffffffffL

  override def zero: Array[Long] = Array.fill(numSeeds)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    var j = 0
    while (j < numSeeds) {
      val v = h(shingle, j)
      if (v < buf(j)) buf(j) = v
      j += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var j = 0
    while (j < numSeeds) { if (b(j) < a(j)) a(j) = b(j); j += 1 }
    a
  }

  override def finish(r: Array[Long]): Seq[Long] = r.toSeq

  override def bufferEncoder: Encoder[Array[Long]] = Encoders.kryo[Array[Long]]
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}
