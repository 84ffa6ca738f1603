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
    // per-ROW key, deterministic from content: duplicate doc_ids (which
    // this pipeline's sibling dedup ops exist to find!) must not merge
    // into one group — summed hits over first()'s arbitrary n_grams
    // gave nondeterministic fractions that could exceed 1.0
    val docSh = docs
      .filter(F.length(F.trim(F.col(textCol))) > 0)
      .select(
        F.col(idCol).cast("string").as("doc_id"),
        F.xxhash64(F.col(idCol).cast("string"), F.col(textCol)).as("_rk"),
        F.array_distinct(TextAnalysis.shingleHashes(F.col(textCol), k))
          .as("_grams"))
    docSh
      .select(F.col("doc_id"), F.col("_rk"),
        F.size(F.col("_grams")).as("n_grams"),
        F.explode(F.col("_grams")).as("_sh"))
      .join(F.broadcast(benchSh), Seq("_sh"))
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
}
