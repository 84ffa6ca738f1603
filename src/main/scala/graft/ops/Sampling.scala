package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Deterministic sampling for training-data pipelines. Unlike
 * `df.sample()` (seeded per-partition RNG: the kept set changes with the
 * partitioning, a repartition or AQE re-plan silently changes the
 * sample), these operators hash the ROW KEY, so the same row is kept or
 * dropped on every run, at every parallelism, from every checkpoint —
 * the property a reproducible training mix actually needs, and the same
 * trick that lets a later incremental run extend the sample without
 * re-drawing it.
 *
 * Scale shape: a pure codegen projection + filter — no shuffle, no
 * state, pushdown-friendly (the scan reads only the key/strata columns
 * plus whatever the caller selects).
 */
object Sampling {

  /** 2^31 — the LCG modulus; bucket values are uniform in [0, M). */
  val Modulus: Long = 2147483648L
  private val MulA = 1103515245L
  private val AddC = 12345L

  /** The sampling bucket of a non-negative integral key: one
    * multiplicative-congruential step, reduced mod 2^31. The key is
    * pre-reduced mod 2^31 so the multiply stays within Long at ANY key
    * magnitude (max (2^31-1)*1103515245 + 12345 ≈ 2.4e18 < 2^63) —
    * unguarded `key * A` would overflow past ~8.4e9 keys, exactly the
    * 10^12-row regime this is for. The whole formula is plain 64-bit
    * integer arithmetic, reproducible in any engine (the DuckDB oracle
    * replays it verbatim). */
  def bucket(key: Column): Column =
    F.pmod(F.pmod(key.cast("long"), F.lit(Modulus)) * MulA + AddC,
      F.lit(Modulus))

  /** Keep rows whose bucket falls under `rate` (0..1): a deterministic
    * Bernoulli sample of expected fraction `rate`, keyed — NOT seeded —
    * so membership is a pure function of the key. */
  def hashSample(df: DataFrame, keyCol: String, rate: Double): DataFrame = {
    require(rate >= 0 && rate <= 1, s"rate must be in [0,1], got $rate")
    df.filter(bucket(F.col(keyCol)) < (rate * Modulus).toLong)
  }

  /** Stratified deterministic sample: a per-stratum rate (e.g. keep 50%
    * of `en`, 20% of everything else) applied by the same keyed bucket,
    * emitting the bucket for audit. Rates are driver-side literals
    * compiled into one CASE expression — no join, no shuffle; the
    * filter + strata comparison stay inside whole-stage codegen over
    * the scan. */
  def stratifiedSample(df: DataFrame, keyCol: String, strataCol: String,
      rates: Map[String, Double], defaultRate: Double): DataFrame = {
    (rates.values.toSeq :+ defaultRate).foreach(r =>
      require(r >= 0 && r <= 1, s"rate must be in [0,1], got $r"))
    // refuse rather than silently replace an existing column: the audit
    // contract of the emitted bucket is worthless if it clobbered data
    require(!df.columns.contains("sample_bucket"),
      "input already has a 'sample_bucket' column - rename it first " +
        "(stratifiedSample emits its audit bucket under that name)")
    val threshold = rates.toSeq.sortBy(_._1).foldLeft(
      F.when(F.lit(false), 0L)) { case (acc, (stratum, rate)) =>
        acc.when(F.col(strataCol) === stratum, (rate * Modulus).toLong)
    }.otherwise((defaultRate * Modulus).toLong)
    df.withColumn("sample_bucket", bucket(F.col(keyCol)))
      .filter(F.col("sample_bucket") < threshold)
  }
}
