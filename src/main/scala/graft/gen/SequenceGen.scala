package graft.gen

import org.apache.spark.sql.{Dataset, SparkSession}

/** One pre-tokenized training sequence — the `input_hint` row shape:
  * `(doc_id string, tokens array<int32>, n_tok int32, source string)`. */
final case class SequenceRow(
    doc_id: String,
    tokens: Array[Int],
    n_tok: Int,
    source: String)

/**
 * Deterministic synthetic generator for the `input_hint` table with
 * planted violations of every constraint class (FIXTURES.md §1) — the
 * engine's analogue of the JSON-Schema test suite's adversarial cases.
 * Everything derives from a splitmix64 stream keyed by (seed, rowIndex):
 * same seed ⇒ byte-identical table at any parallelism, which is what
 * makes golden-output tests and the two-cluster-size bench comparable.
 *
 * Planted violations (all at index-derived positions, so tests can
 * compute the exact expected set):
 *  - duplicate doc_id           : every DupEvery-th row copies the
 *                                 PREVIOUS row's id — which, when row
 *                                 i−1 is itself a hot-dup row (i ≡ 1
 *                                 mod HotDupEvery, first at i=10007),
 *                                 copies an id no plain row carries, so
 *                                 that occurrence is NOT a pair; tests
 *                                 must replay docIdOf and group (as
 *                                 ValidatorSpec does), never count
 *                                 n/DupEvery. Additionally rows
 *                                 ≡ HotDupEvery create ONE hot key
 *                                 ("<prefix>-hot") to exercise skew
 *  - out-of-range token         : every BadTokenEvery-th row sets
 *                                 tokens(0) = vocabSize + 7
 *  - n_tok ≠ size(tokens)       : every BadNtokEvery-th row adds 1
 *  - dangling source            : every BadSourceEvery-th row uses
 *                                 "src_unknown" (absent from the dim)
 *  - drifted partition          : source "src0" draws sequence lengths
 *                                 from a shifted distribution
 */
object SequenceGen {
  val VocabSize = 50257
  val DupEvery = 10007
  val HotDupEvery = 5003
  val BadTokenEvery = 9931
  val BadNtokEvery = 9973
  val BadSourceEvery = 9887

  /** splitmix64 — deterministic, stateless per (seed, index, stream). */
  private def mix(seed: Long, i: Long, stream: Long): Long = {
    var z = seed + i * 0x9E3779B97F4A7C15L + stream * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }
  private def unif(seed: Long, i: Long, stream: Long): Double =
    ((mix(seed, i, stream) >>> 11).toDouble / (1L << 53).toDouble)

  def row(seed: Long, i: Long, nSources: Int,
      plantViolations: Boolean): SequenceRow = {
    val srcIdx = (mix(seed, i, 1) & Long.MaxValue) % nSources
    val source =
      if (plantViolations && i > 0 && i % BadSourceEvery == 0) "src_unknown"
      else s"src$srcIdx"
    // lognormal-ish length, shifted for src0 (the drifted partition)
    val g = {
      // Box-Muller from two uniforms
      val u1 = math.max(unif(seed, i, 2), 1e-12)
      val u2 = unif(seed, i, 3)
      math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.Pi * u2)
    }
    val mu = if (plantViolations && srcIdx == 0) 5.8 else 5.0
    val len0 = math.exp(mu + 0.6 * g).toInt
    val len = math.min(2048, math.max(1, len0))
    val tokens = new Array[Int](len)
    var j = 0
    while (j < len) {
      tokens(j) = ((mix(seed, i, 100 + j) & Long.MaxValue) % VocabSize).toInt
      j += 1
    }
    if (plantViolations && i > 0 && i % BadTokenEvery == 0)
      tokens(0) = VocabSize + 7
    val nTok =
      if (plantViolations && i > 0 && i % BadNtokEvery == 0) len + 1 else len
    val docId =
      if (plantViolations && i > 0 && i % HotDupEvery == 0) f"seq-hot"
      else if (plantViolations && i > 0 && i % DupEvery == 0)
        f"seq-${i - 1}%012d"
      else f"seq-$i%012d"
    SequenceRow(docId, tokens, nTok, source)
  }

  /** Distributed generation: `spark.range` gives the index space its
    * natural partitioning; each task derives its rows statelessly. */
  def generate(
      spark: SparkSession,
      nRows: Long,
      nSources: Int = 8,
      seed: Long = 42L,
      plantViolations: Boolean = true,
      numPartitions: Int = 64): Dataset[SequenceRow] = {
    import spark.implicits._
    spark.range(0L, nRows, 1L, numPartitions)
      .map(i => row(seed, i, nSources, plantViolations))
  }

  /** The sources dimension table (referential-integrity target). */
  def sourcesDim(spark: SparkSession, nSources: Int = 8) = {
    import spark.implicits._
    (0 until nSources).map(i => (s"src$i", s"synthetic source $i"))
      .toDF("source", "description")
  }
}
