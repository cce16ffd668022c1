package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators for LLM training-data pipelines (north-star
  * extensions): exact, MinHash+LSH, SimHash, n-gram Jaccard.
  *
  * Scale design (100 TB `documents`):
  *  - exact dedup is one hash-shuffle on a 16-byte key (not the full text);
  *  - MinHash/LSH turns the O(n²) pair problem into an equi-join on
  *    (band, signature) buckets — only bucket-colliding candidates are
  *    ever paired, and the band join is an ordinary shuffled equi-join
  *    that AQE can skew-split;
  *  - exact Jaccard is positioned as the *verifier* of LSH candidates
  *    (never run all-pairs at scale);
  *  - all hashing is md5-based column expressions — deterministic across
  *    executors, no RNG, codegen'd.
  */
object DedupOps {

  /** Exact-dup key: md5 of the raw text (16 bytes instead of the document
    * for the dedup shuffle). */
  def exactKey(text: Column): Column = md5(text)

  /** Keep-first exact dedup: marks every row, `is_dup` = not the minimal
    * doc_id within its hash group. */
  def markExactDups(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy("dup_key").orderBy(idCol)
    docs.withColumn("dup_key", exactKey(col(textCol)))
      .withColumn("is_dup", row_number().over(w) > 1)
  }

  /** Deterministic per-shingle hash for seed `s`: md5 of "s:shingle".
    * Hex strings compare lexicographically, so `min` over them is a valid
    * min-hash. */
  def seedHash(shingle: Column, seed: Column): Column =
    md5(concat(seed.cast("string"), lit(":"), shingle))

  /** MinHash signatures: one row per (id, seed) with the min seed-hash over
    * the document's shingle set.
    *
    * @param shingled DataFrame (id, shingle) — distinct shingles per doc
    * @param numSeeds signature length
    */
  def minhashSignatures(shingled: DataFrame, idCol: String,
                        numSeeds: Int): DataFrame =
    shingled
      .select(col(idCol), explode(sequence(lit(0), lit(numSeeds - 1))).as("seed"),
        col("shingle"))
      .groupBy(col(idCol), col("seed"))
      .agg(min(seedHash(col("shingle"), col("seed"))).as("minhash"))

  /** Single-pass MinHash banding — the 100 TB scale path. Instead of
    * exploding shingles × seeds (numSeeds× the shuffle volume), computes
    * all seed-minima as `numSeeds` parallel `min` aggregates in ONE
    * hash aggregation (map-side partial combine: each input partition
    * reduces to one row per doc before the shuffle), then explodes the
    * tiny per-doc signature into (band, band_sig) rows.
    * Duplicate shingles need no pre-distinct: `min` is idempotent.
    * Semantics identical to minhashSignatures + lshBands (spec-tested).
    */
  /** Cheap per-seed hash for the scale path: one xxhash64 per (seed,
    * shingle) — an order of magnitude cheaper than md5 while still
    * deterministic across executors. Not used in oracle-matched queries
    * (DuckDB has no xxhash64). */
  def seedHashFast(shingle: Column, seed: Column): Column =
    xxhash64(seed, shingle)

  def minhashBands(shingled: DataFrame, idCol: String, numSeeds: Int,
                   rowsPerBand: Int,
                   hashFn: (Column, Column) => Column = seedHash): DataFrame = {
    require(numSeeds % rowsPerBand == 0)
    val mins = (0 until numSeeds).map(sd =>
      min(hashFn(col("shingle"), lit(sd))).as(s"m$sd"))
    val sig = shingled.groupBy(col(idCol)).agg(mins.head, mins.tail: _*)
    val bandCols = (0 until numSeeds / rowsPerBand).map { b =>
      struct(lit(b).as("band"),
        concat_ws(",", (0 until rowsPerBand)
          .map(r => col(s"m${b * rowsPerBand + r}")): _*).as("band_sig"))
    }
    sig.select(col(idCol), explode(array(bandCols: _*)).as("bs"))
      .select(col(idCol), col("bs.band").as("band"), col("bs.band_sig").as("band_sig"))
  }

  /** LSH banding: group the signature into bands of `rowsPerBand` seeds,
    * concatenating the minhashes (seed-ordered) into one band signature.
    * Docs sharing ANY full band signature are near-dup candidates. */
  def lshBands(signatures: DataFrame, idCol: String, rowsPerBand: Int): DataFrame =
    signatures
      .withColumn("band", (col("seed") / rowsPerBand).cast("int"))
      .groupBy(col(idCol), col("band"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("seed"),
        col("minhash")))), s => s.getField("minhash")), ",").as("band_sig"))

  /** Candidate near-dup pairs from LSH buckets: equi-join on
    * (band, band_sig), a < b, distinct. This is the scale path — the join
    * keys are tiny and the explosion is bounded by true near-dups. */
  def lshCandidatePairs(bands: DataFrame, idCol: String): DataFrame = {
    val a = bands.select(col(idCol).as("a"), col("band"), col("band_sig"))
    val b = bands.select(col(idCol).as("b"), col("band"), col("band_sig"))
    a.join(b, Seq("band", "band_sig")).where(col("a") < col("b"))
      .select("a", "b").distinct()
  }

  /** Exact n-gram Jaccard similarity for given (id, shingle) sets:
    * |A∩B| / |A∪B|. With `candidates` (an (a, b) pair list, a < b — e.g.
    * [[lshCandidatePairs]] output) the intersection is computed ONLY for
    * those pairs by routing each side's shingles through the pair list —
    * the 100 TB verifier path. Without it, an all-pairs shingle self-join
    * runs: only for small verification sets.
    */
  def jaccardPairs(shingled: DataFrame, idCol: String, minJaccard: Double,
                   candidates: Option[DataFrame] = None): DataFrame = {
    val sizes = shingled.groupBy(col(idCol)).agg(count("*").as("n"))
    val inter = candidates match {
      case Some(pairs) =>
        pairs.select(col("a"), col("b"))
          .join(shingled.select(col(idCol).as("a"), col("shingle")), "a")
          .join(shingled.select(col(idCol).as("b"), col("shingle")),
            Seq("b", "shingle"))
          .groupBy("a", "b").agg(count("*").as("inter"))
      case None =>
        val a = shingled.select(col(idCol).as("a"), col("shingle"))
        val b = shingled.select(col(idCol).as("b"), col("shingle"))
        a.join(b, "shingle").where(col("a") < col("b"))
          .groupBy("a", "b").agg(count("*").as("inter"))
    }
    inter
      .join(sizes.select(col(idCol).as("a"), col("n").as("na")), "a")
      .join(sizes.select(col(idCol).as("b"), col("n").as("nb")), "b")
      .select(col("a"), col("b"),
        (col("inter").cast("double") /
          (col("na") + col("nb") - col("inter")).cast("double")).as("jaccard"))
      .where(col("jaccard") >= minJaccard)
  }

  /** 16-bit SimHash from md5 hex-digit parities: for hex position j (0-15),
    * each token votes +1/-1 by the parity of md5(token)'s j-th hex digit;
    * bit j of the fingerprint is 1 iff the vote sum is positive.
    * Integer-only arithmetic -> bit-exact across engines.
    */
  def simhash16(tokened: DataFrame, idCol: String, tokenCol: String): DataFrame =
    tokened
      .select(col(idCol), col(tokenCol).as("tok"),
        explode(sequence(lit(0), lit(15))).as("j"))
      .select(col(idCol), col("j"),
        expr("(instr('0123456789abcdef', substring(md5(tok), j + 1, 1)) - 1) % 2")
          .as("bit"))
      .groupBy(col(idCol), col("j"))
      .agg(sum(col("bit") * 2 - 1).as("vote"))
      .groupBy(col(idCol))
      .agg(sum(when(col("vote") > 0,
        pow(lit(2), col("j")).cast("long")).otherwise(0L)).as("simhash"))
}
