package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication family for large-scale corpus curation: exact
  * (hash-groupBy), MinHash+LSH banding, SimHash, n-gram Jaccard.
  *
  * Scale notes (the reason each shape was chosen):
  * - exact: one shuffle on the 128-bit fingerprint; at 100 TB the
  *   fingerprint (16 B) shuffles, never the text.
  * - MinHash/LSH: signature computed scan-side per row (no shuffle),
  *   then one shuffle keyed on (band, bandHash) whose fan-in is only
  *   colliding docs — the standard near-dup shape for trillion-token
  *   corpora (cf. the MinHashLSH literature / Spark MLlib MinHashLSH).
  * - SimHash: 64-bit signature per doc; near-dup = hamming ≤ k via
  *   band-exact match on signature chunks.
  */
object Dedup {

  /** Word 3-shingles (distinct), lowercased. */
  def shingles(text: Column, n: Int = 3): Column = {
    val words = filter(split(lower(text), "\\s+"), w => length(w) > 0)
    val count = size(words) - (n - 1)
    when(count > 0,
      array_distinct(transform(sequence(lit(1), count), i =>
        concat_ws(" ", (0 until n).map(j => element_at(words, i + j)): _*))))
      .otherwise(array().cast("array<string>"))
  }

  /** Exact dedup: keep one survivor row per normalized-text fingerprint
    * (min of `idCol` = deterministic survivor). Returns
    * (fingerprint, keeper id, copies).
    */
  def exact(df: DataFrame, textCol: String, idCol: String): DataFrame =
    df.groupBy(TextAnalysis.fingerprint(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keeper"), count(lit(1)).as("copies"))

  /** MinHash signature: `numHashes` minima of seeded xxhash64 over the
    * shingle set. Computed entirely scan-side (HOFs, no shuffle).
    */
  def minhashSignature(text: Column, numHashes: Int = 32): Column = {
    val sh = shingles(text)
    transform(sequence(lit(0), lit(numHashes - 1)), seed =>
      array_min(transform(sh, s => xxhash64(s, seed))))
  }

  /** LSH band keys: signature sliced into `bands` bands, each hashed.
    * Docs sharing any (band index, band hash) are near-dup candidates.
    */
  def lshBandKeys(signature: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map(b =>
      struct(lit(b).as("band"),
        xxhash64(array_join(slice(signature, b * rows + 1, rows), ","))
          .as("band_hash"))): _*)

  /** Candidate near-dup pairs via MinHash+LSH banding.
    * Returns (id_a, id_b) with id_a < id_b, distinct.
    */
  def minhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        numHashes: Int = 32, bands: Int = 8): DataFrame = {
    val rows = numHashes / bands
    val sig = df.select(col(idCol).as("id"),
      minhashSignature(col(textCol), numHashes).as("sig"))
    val buckets = sig
      .select(col("id"), explode(lshBandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("id"), col("bk.band"), col("bk.band_hash"))
    buckets.as("a").join(buckets.as("b"),
        col("a.band") === col("b.band") &&
        col("a.band_hash") === col("b.band_hash") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Estimated Jaccard from two MinHash signatures (fraction of equal
    * components).
    */
  def minhashJaccard(sigA: Column, sigB: Column): Column =
    aggregate(zip_with(sigA, sigB, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(sigA)

  /** Exact n-gram Jaccard between two texts' shingle sets. */
  def jaccard(textA: Column, textB: Column, n: Int = 3): Column = {
    val a = shingles(textA, n)
    val b = shingles(textB, n)
    val inter = size(array_intersect(a, b)).cast("double")
    val union = (size(a) + size(b)).cast("double") - inter
    when(union > 0, inter / union).otherwise(lit(0.0))
  }

  /** SimHash-64: sign-aggregated bit votes of shingle hashes.
    * Near-dups have small hamming distance; at scale, split into 4
    * 16-bit bands and exact-match any band (hamming ≤ 3 guarantee).
    */
  def simhash(text: Column): Column = {
    val hs = transform(shingles(text), s => xxhash64(s))
    aggregate(hs,
      array_repeat(lit(0), 64),
      (acc, h) => zip_with(acc,
        array((0 until 64).map(j =>
          when(shiftright(h, j).bitwiseAND(1) === 1, 1).otherwise(-1)): _*),
        (a, b) => a + b),
      acc => (0 until 64).map(j =>
        when(element_at(acc, j + 1) > 0, shiftleft(lit(1L), j))
          .otherwise(lit(0L))).reduce((a, b) => a.bitwiseOR(b)))
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup candidates: docs agreeing on any 16-bit quarter of
    * the signature (catches all pairs with hamming ≤ 3).
    */
  def simhashCandidates(df: DataFrame, textCol: String, idCol: String,
                        maxHamming: Int = 3): DataFrame = {
    val sig = df.select(col(idCol).as("id"), simhash(col(textCol)).as("sig"))
    val banded = sig.select(col("id"), col("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("band"),
          shiftright(col("sig"), b * 16).bitwiseAND(0xFFFFL).as("bits"))): _*))
        .as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.bits"))
    banded.as("a").join(banded.as("b"),
        col("a.band") === col("b.band") && col("a.bits") === col("b.bits") &&
        col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        hamming(col("a.sig"), col("b.sig")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxHamming)
  }
}
