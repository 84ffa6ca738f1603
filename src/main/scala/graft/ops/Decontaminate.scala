package graft.ops

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Benchmark decontamination — flag training documents that share k-word
 * shingles with an evaluation/benchmark corpus (the standard
 * "n-gram overlap" leak check run before training).
 *
 * Scale shape (10^12-doc corpus vs a small benchmark set): the
 * benchmark's distinct shingle hashes are a SMALL table (millions of
 * longs), broadcast to every task; the corpus side explodes its
 * distinct shingles once and counts join hits per document — one scan,
 * one broadcast hash join, one partial-aggregated groupBy(doc). No
 * all-pairs anything; the corpus text never moves.
 */
object Decontaminate {

  /** Distinct shingle hashes of the benchmark corpus (the broadcast
    * side). k must match the corpus-side shingling. Blank/whitespace
    * texts are excluded: they would contribute the hash of the empty
    * word list, making every blank corpus doc "contaminated" —
    * exact-dup semantics masquerading as k-gram overlap. */
  def benchmarkShingles(
      bench: DataFrame, textCol: String, k: Int): DataFrame =
    bench
      .filter(F.length(F.trim(F.col(textCol))) > 0)
      .select(F.explode(F.array_distinct(
        TextAnalysis.shingleHashes(F.col(textCol), k))).as("_sh"))
      .distinct()

  /** Per-document contamination evidence: the number of the document's
    * DISTINCT k-shingles that appear anywhere in the benchmark set,
    * plus the document's total distinct shingle count (so callers can
    * threshold on absolute hits or on the contained fraction). Only
    * documents with ≥ 1 hit are returned. */
  def contaminationHits(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int = 8): DataFrame = {
    val benchSh = benchmarkShingles(bench, benchTextCol, k)
    hitCounts(
      docShingles(docs, idCol, textCol, k)
        .join(F.broadcast(benchSh), Seq("_sh")))
  }

  /** [[contaminationHits]] for a benchmark set too large to broadcast
    * as an exact hash table (a full eval-suite shingle inventory at
    * 10^12-doc scale runs to GBs of longs): a Bloom filter of the
    * benchmark shingles — a few MB of bits, built distributed via
    * `stat.bloomFilter`'s treeAggregate — prunes the corpus's exploded
    * shingles in whole-stage codegen BEFORE any join, and only the
    * survivors (true hits + an `fpp` sliver of the scan) enter an
    * ordinary shuffle join against the exact set for verification.
    * Bloom filters have no false negatives and every survivor is
    * exactly verified, so the output is IDENTICAL to
    * [[contaminationHits]] — the driver query `d_decontam_bloom` pins
    * both paths to one shared oracle string. The corpus text still
    * never moves; what shuffles is the pruned `(doc_id, shingle)`
    * survivor stream, smaller than the unpruned one by ~1/fpp. */
  def contaminationHitsBloom(
      docs: DataFrame, idCol: String, textCol: String,
      bench: DataFrame, benchTextCol: String, k: Int = 8,
      fpp: Double = 0.001): DataFrame = {
    // localCheckpoint, not persist/unpersist: the returned DataFrame is
    // LAZY — an unpersist in a finally block would evict the cache
    // before the exact-verify join ever executes, recomputing the
    // benchmark shingles from text at action time. The checkpoint
    // materializes them ONCE and serves the count, the bloom build and
    // the verify join from the same store; it is released when the
    // returned frame is garbage-collected.
    val benchSh = benchmarkShingles(bench, benchTextCol, k)
      .localCheckpoint()
    val n = math.max(benchSh.count(), 1L)
    val bloom = benchSh.stat.bloomFilter("_sh", n, fpp)
    val bytes = {
      val out = new java.io.ByteArrayOutputStream()
      bloom.writeTo(out)
      out.toByteArray
    }
    val pruned = docShingles(docs, idCol, textCol, k)
      .filter(org.apache.spark.sql.GraftSqlBridge.column(
        graft.functions.BloomMightContain(
          org.apache.spark.sql.GraftSqlBridge.expression(F.col("_sh")),
          bytes)))
      // exact verify of the bloom survivors — deliberately NOT
      // broadcast: not fitting in a broadcast is this path's premise
      .join(benchSh, Seq("_sh"))
    hitCounts(pruned)
  }

  /** Corpus-side distinct shingles, exploded, with a per-ROW key
    * deterministic from content: duplicate doc_ids (which this
    * pipeline's sibling dedup ops exist to find!) must not merge into
    * one group — summed hits over first()'s arbitrary n_grams gave
    * nondeterministic fractions that could exceed 1.0. */
  private def docShingles(docs: DataFrame, idCol: String,
      textCol: String, k: Int): DataFrame =
    docs
      .filter(F.length(F.trim(F.col(textCol))) > 0)
      .select(
        F.col(idCol).cast("string").as("doc_id"),
        F.xxhash64(F.col(idCol).cast("string"), F.col(textCol)).as("_rk"),
        F.array_distinct(TextAnalysis.shingleHashes(F.col(textCol), k))
          .as("_grams"))
      .select(F.col("doc_id"), F.col("_rk"),
        F.size(F.col("_grams")).as("n_grams"),
        F.explode(F.col("_grams")).as("_sh"))

  private def hitCounts(joined: DataFrame): DataFrame =
    joined
      .groupBy("doc_id", "_rk", "n_grams")
      // DISTINCT matched shingles, not joined rows: rows with identical
      // (doc_id, text) share the content-derived _rk and merge into one
      // group — a plain count would sum each duplicate row's hits while
      // n_grams stays per-doc, pushing contained_frac past 1.0 for the
      // exact-duplicate inputs this pipeline explicitly expects
      .agg(F.countDistinct(F.col("_sh")).as("n_hits"))
      .select(F.col("doc_id"), F.col("n_hits"), F.col("n_grams"),
        F.round(F.col("n_hits").cast("double") / F.col("n_grams"), 6)
          .as("contained_frac"))
}
