package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Deduplication operators for training-data pipelines: exact, MinHash+LSH,
 * SimHash, and n-gram Jaccard verification. All signature computation is
 * pure Catalyst expressions (codegen'd, one scan); candidate generation
 * is a self-equi-join on band keys — the standard "shuffle only
 * signatures, never full texts against full texts" shape that survives
 * 100 TB: the join key space (bands × hash) spreads uniformly, and only
 * same-bucket pairs are ever materialized.
 */
object Dedup {

  // ------------------------------------------------------------------
  // Exact dedup (hash-groupBy)
  // ------------------------------------------------------------------

  /** Groups by the normalized content fingerprint; returns one row per
    * group with its size and a representative (min) id. Filter
    * `n_dups > 1` for actionable duplicates; at 10^12 rows this is one
    * partial-aggregated shuffle of (hash, id). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String,
      key: Column => Column = TextAnalysis.fingerprint): DataFrame =
    df.select(
        F.col(idCol).cast("string").as("doc_id"),
        key(F.col(textCol)).as("fp"))
      .groupBy("fp")
      .agg(F.count(F.lit(1)).as("n_dups"), F.min("doc_id").as("keep_id"))

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  /** MinHash signature over k-word shingles via Carter-Wegman universal
    * hashing, the family Spark MLlib's MinHashLSH uses:
    * `h_i(s) = (a_i·h(s) + b_i) mod P` with INDEPENDENT seeded random
    * coefficients per hash function (a deterministic sequence like
    * `h1 + i·h2` correlates components: for large i the argmin sorts by
    * h2 alone, so unrelated docs sharing one shingle agree on most
    * components — observed est_jaccard ≥ 0.58 on random pairs). The
    * minima update runs in the custom codegen expression
    * [[graft.functions.MinHashSig]] — the `aggregate`×`zip_with`
    * formulation is interpreted at ~160 µs/shingle. */
  def minhashSignature(
      text: Column, numHashes: Int = 64, shingleK: Int = 5,
      seed: Long = 42L): Column =
    graft.functions.MinHashSig(
      TextAnalysis.shingleHashes(text, shingleK), numHashes, seed)

  /** LSH banding: candidate pairs whose signatures collide in ≥1 of
    * `bands` bands (rowsPerBand = numHashes/bands). Shuffle carries
    * (bandIdx, bandHash, id) — narrow rows — and the self-join only
    * touches same-bucket ids. Estimated Jaccard = fraction of equal
    * minhash components, computed on the candidate pairs only. */
  def minhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 64, bands: Int = 16,
      minJaccard: Double = 0.7): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rows = numHashes / bands
    val sigs = df.select(
        F.col(idCol).cast("string").as("doc_id"),
        minhashSignature(F.col(textCol), numHashes).as("sig"))
      // signatures reused by banding AND the pair-verify join
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val banded = sigs.select(
      F.col("doc_id"), F.col("sig"),
      F.explode(F.array((0 until bands).map { b =>
        F.struct(
          F.lit(b).as("band"),
          F.xxhash64(F.slice(F.col("sig"), b * rows + 1, rows))
            .as("bhash"))
      }: _*)).as("bk"))
      .select(F.col("doc_id"), F.col("sig"),
        F.col("bk.band").as("band"), F.col("bk.bhash").as("bhash"))

    val l = banded.select(
      F.col("band"), F.col("bhash"),
      F.col("doc_id").as("id_a"), F.col("sig").as("sig_a"))
    val r = banded.select(
      F.col("band"), F.col("bhash"),
      F.col("doc_id").as("id_b"), F.col("sig").as("sig_b"))
    l.join(r, Seq("band", "bhash"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select(
        F.col("id_a"), F.col("id_b"),
        // count of EQUAL components (size() alone would count the whole
        // 64-slot array, nulls included, and report 1.0 for every pair)
        (F.size(F.filter(
          F.zip_with(F.col("sig_a"), F.col("sig_b"), (a, b) => a === b),
          eq => eq)).cast("double") / numHashes).as("est_jaccard"))
      .groupBy("id_a", "id_b")
      .agg(F.first("est_jaccard").as("est_jaccard"))
      .filter(F.col("est_jaccard") >= minJaccard)
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 64-bit SimHash over word hashes: bit i of the result is 1 iff the
    * weighted sum of bit i across all word hashes is positive. Built as
    * one `aggregate` over the word array accumulating 64 counters —
    * stays columnar. */
  /** 64-bit SimHash via the custom codegen expression
    * [[graft.functions.SimHash64]] — the higher-order-function
    * formulation (aggregate over words × zip_with over 64 counters) runs
    * interpreted at ~6 ms/doc; the codegen loop is bit-identical and
    * orders of magnitude cheaper. Empty split artifacts are skipped
    * inside the expression. */
  def simhash64(text: Column): Column =
    graft.functions.SimHash64(F.split(F.trim(F.lower(text)), "\\s+"))

  /** SimHash near-dup candidates: band the 64-bit hash into 4×16-bit
    * chunks (any pair within Hamming distance 3 shares ≥1 chunk), join
    * on chunk equality, verify with `bit_count(xor) <= maxHamming`. */
  def simhashCandidates(
      df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val hashed = df.select(
      F.col(idCol).cast("string").as("doc_id"),
      simhash64(F.col(textCol)).as("sh"))
    val banded = hashed.select(
      F.col("doc_id"), F.col("sh"),
      F.explode(F.array((0 until 4).map { b =>
        F.struct(F.lit(b).as("band"),
          F.shiftright(F.col("sh"), b * 16).bitwiseAND(0xFFFFL)
            .as("chunk"))
      }: _*)).as("bk"))
      .select(F.col("doc_id"), F.col("sh"),
        F.col("bk.band").as("band"), F.col("bk.chunk").as("chunk"))
    val l = banded.select(F.col("band"), F.col("chunk"),
      F.col("doc_id").as("id_a"), F.col("sh").as("sh_a"))
    val r = banded.select(F.col("band"), F.col("chunk"),
      F.col("doc_id").as("id_b"), F.col("sh").as("sh_b"))
    l.join(r, Seq("band", "chunk"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select(F.col("id_a"), F.col("id_b"),
        F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
          .as("hamming"))
      .groupBy("id_a", "id_b").agg(F.min("hamming").as("hamming"))
      .filter(F.col("hamming") <= maxHamming)
  }

  // ------------------------------------------------------------------
  // N-gram Jaccard (exact verification of candidate pairs)
  // ------------------------------------------------------------------

  /** Exact word-n-gram Jaccard for given (id_a, id_b) candidate pairs —
    * joins texts back in (broadcast-friendly when the candidate set is
    * small, which LSH guarantees) and computes
    * |A∩B| / |A∪B| over distinct shingle hashes. */
  def ngramJaccard(
      pairs: DataFrame, df: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    val grams = df.select(
      F.col(idCol).cast("string").as("_id"),
      F.array_distinct(TextAnalysis.shingleHashes(F.col(textCol), k))
        .as("_grams"))
    pairs
      .join(grams.withColumnRenamed("_id", "id_a")
        .withColumnRenamed("_grams", "grams_a"), Seq("id_a"))
      .join(grams.withColumnRenamed("_id", "id_b")
        .withColumnRenamed("_grams", "grams_b"), Seq("id_b"))
      .withColumn("jaccard", F.round(
        F.size(F.array_intersect(F.col("grams_a"), F.col("grams_b")))
          .cast("double") /
          F.size(F.array_union(F.col("grams_a"), F.col("grams_b"))), 6))
      .drop("grams_a", "grams_b")
  }

  // ------------------------------------------------------------------
  // Embedding-cosine near-dup
  // ------------------------------------------------------------------

  /** Near-duplicates by embedding cosine ≥ threshold, using the
    * Similarity module's LSH bucketing to avoid the full cross product. */
  def embeddingNearDup(
      df: DataFrame, idCol: String, vecCol: String,
      minCosine: Double = 0.95, planes: Int = 12,
      seed: Long = 42L): DataFrame =
    Similarity.lshSelfPairs(df, idCol, vecCol, planes, seed)
      .filter(F.col("cosine") >= minCosine)
}
