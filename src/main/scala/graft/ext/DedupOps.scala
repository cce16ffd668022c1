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

  /** Distinct co-shingle pairs (a < b): the candidate edge set when NO
    * similarity floor applies. [[jaccardPairs]] at minJaccard = 0 keeps
    * every pair that shares a shingle (inter >= 1 implies jaccard > 0),
    * yet still computes per-doc sizes and joins them back twice only for
    * the filter to pass everything — three shuffles for a discarded
    * column. The components/canonical/survivor dedup queries consume
    * only the edge list, so they take this direct form (r10 trim).
    *
    * Hot-shingle guard (`maxShingleDf`): the raw self-join emits
    * df·(df−1)/2 pairs per shingle, so ONE pathological shingle (a
    * boilerplate line, the empty-string token) in d documents inflates the
    * candidate set quadratically in d. Passing a document-frequency cap
    * drops shingles with df > cap before the join — the standard
    * prefix-filtering move: a shingle that common carries no dedup signal
    * (compare [[lshCandidatePairs]], whose candidate volume is bounded by
    * band width by construction). At the default (no cap) the plan is the
    * bare two-shuffle self-join — the fixture-scale EDGE-SET semantics the
    * oracle queries pin; at 100 TB always pass an explicit cap, or use the
    * LSH-banded candidate generator, which is the documented scale route.
    */
  def overlapPairs(shingled: DataFrame, idCol: String,
                   maxShingleDf: Int = Int.MaxValue): DataFrame = {
    val src =
      if (maxShingleDf == Int.MaxValue) shingled
      else {
        // anti-join against the (by definition small) hot-shingle list;
        // the df aggregation is map-side-combining on the same shingle
        // key the join needs, and AQE broadcasts the tiny hot side
        val hot = shingled.groupBy(col("shingle"))
          .agg(countDistinct(col(idCol)).as("df"))
          .where(col("df") > maxShingleDf)
          .select("shingle")
        shingled.join(hot, Seq("shingle"), "left_anti")
      }
    val a = src.select(col(idCol).as("a"), col("shingle"))
    val b = src.select(col(idCol).as("b"), col("shingle"))
    a.join(b, "shingle").where(col("a") < col("b"))
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

  /** All pairs within Hamming distance `maxDist` of each other's SimHash,
    * by pigeonhole banding: split the `bits`-bit fingerprint into
    * `maxDist + 1` contiguous chunks — two fingerprints differing in at
    * most `maxDist` bits must agree on at least one whole chunk, so an
    * equi-join on (chunk index, chunk value) generates candidates with NO
    * false negatives; `bit_count(a XOR b) <= maxDist` then verifies
    * exactly. This is the O(n²)-free Hamming search (Manku et al.,
    * "Detecting Near-Duplicates for Web Crawling", WWW 2007): candidate
    * volume is bounded by bucket collisions, not the pair space, and the
    * chunk join shuffles only (id, 2·chunk-bits) rows.
    *
    * @param simhashed (id, simhash) — e.g. [[simhash16]] output
    * @return (doc_a, doc_b, hamming) with doc_a < doc_b
    */
  def simhashHammingPairs(simhashed: DataFrame, idCol: String,
                          maxDist: Int, bits: Int = 16): DataFrame = {
    val chunks = maxDist + 1
    require(bits % chunks == 0,
      s"bits=$bits must divide into maxDist+1=$chunks equal chunks")
    val w = bits / chunks
    // JVM shifts are mod 64: (1L << 64) - 1 == 0, which would collapse
    // every chunk_val to 0 and silently degrade the candidate join to an
    // all-pairs cross join — mask with -1L (all ones) in the w == 64 case
    val mask = if (w == 64) -1L else (1L << w) - 1
    val banded = simhashed.select(
      col(idCol), col("simhash"),
      explode(sequence(lit(0), lit(chunks - 1))).as("chunk"))
      .select(col(idCol), col("simhash"), col("chunk"),
        expr(s"shiftright(simhash, chunk * $w) & $mask")
          .as("chunk_val"))
    val a = banded.select(col(idCol).as("doc_a"), col("simhash").as("sim_a"),
      col("chunk"), col("chunk_val"))
    val b = banded.select(col(idCol).as("doc_b"), col("simhash").as("sim_b"),
      col("chunk"), col("chunk_val"))
    a.join(b, Seq("chunk", "chunk_val")).where(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"),
        expr("CAST(bit_count(sim_a ^ sim_b) AS INT)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxDist)
  }

  /** Set-similarity self-join with prefix filtering (Chaudhuri et al.
    * ICDE'06 / Bayardo et al. WWW'07): exact Jaccard ≥ tNum/tDen pairs
    * without the all-pairs token join. Tokens are globally ordered by
    * (document frequency, token) — rarest first; a document's PREFIX is
    * its first `n - ⌈t·n⌉ + 1` tokens in that order. Two sets with
    * Jaccard ≥ t must share at least one prefix token, so candidates
    * come from an equi-join on prefix tokens only — at scale the prefix
    * is the rare ~(1-t) fraction of each document, so bucket sizes stay
    * tiny where a raw token join explodes on stopwords. Verification
    * computes exact intersection sizes for candidates only, and the
    * threshold test is integer cross-multiplication (no float).
    *
    * The threshold is a rational tNum/tDen so ⌈t·n⌉ = (tNum·n + tDen - 1)
    * div tDen is integer-exact — a double `ceil(0.6*n)` can round the
    * prefix the WRONG way (0.6*5 = 3.0000000000000004 in IEEE) and lose
    * pairs.
    *
    * @param tokens distinct (id, tok) pairs per document
    * @return (doc_a, doc_b, inter, n_a, n_b, jaccard), doc_a < doc_b
    */
  def prefixFilterJoin(tokens: DataFrame, idCol: String,
                       tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"need 0 < $tNum/$tDen <= 1")
    val toks = tokens.select(col(idCol).as("id"), col("tok"))
    val df = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = Window.partitionBy("id").orderBy(col("df"), col("tok"))
    val ordered = toks.join(df, "tok")
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy("id")))
    // the prefix subtree (df join + two windows over the full token table)
    // is the heaviest part of the plan and feeds BOTH sides of the
    // candidate self-join — persist so it is computed once, not twice.
    // Freed by Spark's ContextCleaner when the result goes out of scope
    // (the result is lazy, so an eager unpersist here would defeat it).
    val prefix = ordered.where(
      col("rn") <= col("n") - expr(s"($tNum * n + ${tDen - 1}) div $tDen") + 1)
      .persist()
    val cands = prefix.select(col("id").as("doc_a"), col("tok"))
      .join(prefix.select(col("id").as("doc_b"), col("tok")), "tok")
      .where(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()
    val sizes = toks.groupBy("id").agg(count(lit(1)).as("n"))
    val inter = cands
      .join(toks.select(col("id").as("doc_a"), col("tok")), "doc_a")
      .join(toks.select(col("id").as("doc_b"), col("tok")), Seq("doc_b", "tok"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("id").as("doc_a"), col("n").as("n_a")), "doc_a")
      .join(sizes.select(col("id").as("doc_b"), col("n").as("n_b")), "doc_b")
      .where(lit(tDen) * col("inter") >=
        lit(tNum) * (col("n_a") + col("n_b") - col("inter")))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("n_a"), col("n_b"),
        (col("inter").cast("double") /
          (col("n_a") + col("n_b") - col("inter")).cast("double")).as("jaccard"))
  }
}
