package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (north star; SURVEY.md §7.4).
  *
  * Scale design (the 100 TB contract):
  *  - NOTHING here is all-pairs. Near-dup discovery goes through banded
  *    LSH keys — the only join is an equi-join on (band, bucket-hash), so
  *    comparisons are bounded by bucket co-membership, not n².
  *  - pathological buckets (boilerplate shingles shared by millions of
  *    docs) are capped by `maxBucketSize` before the pair join — the
  *    standard LSH skew guard; dropped buckets are the known trade-off.
  *  - signatures/fingerprints are fixed-size per doc (64 ints / 1 long),
  *    so shuffle width is constant regardless of document length.
  *
  * All hashing uses Spark's built-in murmur3 (`hash`) / `xxhash64`
  * expressions — codegen'd, no UDFs.
  */
object Dedup {

  /** Exact dedup groups, deterministically: group by normalized-text
    * fingerprint, keep the smallest doc_id as canonical (dropDuplicates
    * would keep an arbitrary row — not reproducible). */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id"): DataFrame =
    docs
      .withColumn("fp", Text.fingerprint(Text.tokens(col("text"))))
      .groupBy("fp")
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_dups"))

  /** Distinct k-shingle (token k-gram) hashes of a token array — the set
    * MinHash sketches. 64-bit so collisions are negligible at corpus scale. */
  def shingleHashes(toks: Column, k: Int = 3): Column =
    array_distinct(transform(Text.ngrams(toks, k), s => xxhash64(s)))

  /** MinHash signature: `numHashes` independent permutations simulated by
    * seeding murmur3 with the permutation index; each signature slot is the
    * min over the doc's shingle hashes. Empty docs sign as Int.MaxValue.
    *
    * Computed as ONE fold over the shingle array (accumulator = the
    * signature vector). The naive form — numHashes separate
    * `array_min(transform(...))` expressions — lets `CollapseProject`
    * inline the upstream shingle construction into every one of them,
    * re-tokenizing each document 64 times; measured 25× slower at sf0.1. */
  def minhashSignature(shingles: Column, numHashes: Int = 64): Column =
    aggregate(
      shingles,
      array_repeat(lit(Int.MaxValue), numHashes),
      (acc, s) => zip_with(
        acc,
        sequence(lit(0), lit(numHashes - 1)),
        (best, i) => least(best, hash(i, s))))

  /** Banded LSH keys: split the signature into `bands` equal slices and
    * hash each slice. Docs sharing ANY (band, hash) key are candidates.
    * With 64 hashes / 16 bands (4 rows per band), the match-probability
    * curve s^4 per band puts the 50% threshold near jaccard ≈ 0.55. */
  def lshBandKeys(sig: Column, bands: Int = 16, numHashes: Int = 64): Column = {
    val rows = numHashes / bands
    array((0 until bands).map { b =>
      struct(
        lit(b).as("band"),
        hash((0 until rows).map(r => element_at(sig, b * rows + r + 1)): _*).as("bucket"))
    }: _*)
  }

  /** (id, band, bucket) exploded LSH keys for a document frame.
    *
    * The signature is materialized behind an explicit repartition BEFORE
    * the band explode: `Generate` re-evaluates its input per output row,
    * and `CollapseProject` would otherwise inline the whole
    * tokenize→shingle→signature expression into it — measured 8× slower
    * at sf0.1. The barrier shuffle carries only (id, 64 ints) per doc, and
    * `ReuseExchange` shares it between the two sides of the candidate
    * self-join. */
  def bandTable(docs: DataFrame, idCol: String = "doc_id", k: Int = 3,
                numHashes: Int = 64, bands: Int = 16): DataFrame =
    docs
      .select(col(idCol),
        minhashSignature(shingleHashes(Text.tokens(col("text")), k), numHashes).as("__sig"))
      .repartition(col(idCol))
      .select(col(idCol), explode(lshBandKeys(col("__sig"), bands, numHashes)).as("__key"))
      .select(col(idCol), col("__key.band").as("band"), col("__key.bucket").as("bucket"))

  /** Candidate near-dup pairs (a < b) via the band-bucket equi-join, with
    * the bucket-size skew cap. */
  def candidatePairs(docs: DataFrame, idCol: String = "doc_id", k: Int = 3,
                     numHashes: Int = 64, bands: Int = 16,
                     maxBucketSize: Int = 1000): DataFrame = {
    val bt = bandTable(docs, idCol, k, numHashes, bands)
    val capped = bt
      .withColumn("__n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("band", "bucket")))
      .filter(col("__n") <= maxBucketSize)
      .drop("__n")
    capped.as("x").join(capped.as("y"),
        col("x.band") === col("y.band") && col("x.bucket") === col("y.bucket") &&
          col(s"x.$idCol") < col(s"y.$idCol"))
      .select(col(s"x.$idCol").as("a_id"), col(s"y.$idCol").as("b_id"))
      .distinct()
  }

  /** Set Jaccard of two arrays (duplicates allowed — the inputs are
    * treated as sets). The union size is derived as
    * |distinct A| + |distinct B| − |A∩B| rather than materializing
    * `array_union` — linear hash-set passes, no union array allocation.
    * `array_intersect` already returns distinct elements, so the identity
    * holds for arbitrary input (deriving it from raw `size(a)+size(b)`
    * double-counts duplicates and broke self-similarity = 1). */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(array_distinct(a)) + size(array_distinct(b)) - inter
    when(union === 0, lit(0.0)).otherwise(inter.cast("double") / union)
  }

  /** Verified near-dup pairs: LSH candidates re-checked with true shingle
    * Jaccard ≥ `threshold`. The expensive exact check runs only on
    * candidate pairs, never the cross product. */
  def nearDupPairs(docs: DataFrame, threshold: Double = 0.7,
                   idCol: String = "doc_id", k: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol), shingleHashes(Text.tokens(col("text")), k).as("sh"))
    candidatePairs(docs, idCol, k)
      .join(sh.withColumnRenamed(idCol, "a_id").withColumnRenamed("sh", "a_sh"), "a_id")
      .join(sh.withColumnRenamed(idCol, "b_id").withColumnRenamed("sh", "b_sh"), "b_id")
      .withColumn("jaccard", jaccard(col("a_sh"), col("b_sh")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Per-token 64-bit hashes (materialize once; simhash folds over these). */
  def tokenHashes(toks: Column): Column = transform(toks, t => xxhash64(t))

  /** 64-bit SimHash: bit i of the result is set iff the majority of token
    * hashes have bit i set (+1/-1 vote per token). Near-identical docs
    * land within a few bits of Hamming distance. The 64 folds are plain
    * Catalyst `aggregate` expressions over the prehashed array. */
  def simhash64(tokenHashes: Column): Column = {
    val bitVotes = (0 until 64).map { i =>
      aggregate(tokenHashes, lit(0L),
        (acc, h) => acc + when(h.bitwiseAND(lit(1L << i)) =!= 0L, 1L).otherwise(-1L))
    }
    bitVotes.zipWithIndex
      .map { case (v, i) => when(v > 0, lit(1L << i)).otherwise(lit(0L)) }
      .reduce(_ + _)
  }

  /** Hamming distance between two 64-bit fingerprints. */
  def hamming64(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash LSH keys: 4 × 16-bit bands — two fingerprints within Hamming
    * distance 3 share at least one band (pigeonhole), so near-dup lookup
    * is again an equi-join on (band, key), never all-pairs. */
  def simhashBands(sim: Column, bands: Int = 4): Column = {
    val width = 64 / bands
    val mask = (1L << width) - 1
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        shiftrightunsigned(sim, b * width).bitwiseAND(lit(mask)).as("bucket"))
    }: _*)
  }
}
