package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

import graft.functions.{CosineSim, HyperplaneBucket}

/**
 * Similarity search over an embedding column (`array<float|double>`).
 *
 * Two paths, same contract:
 *  - [[cosineTopK]] — brute-force: broadcast the (small) query set
 *    against the corpus, one scan, exact. The correctness baseline.
 *  - [[lshTopK]] — random-hyperplane LSH: corpus and queries are
 *    bucketed by sign-bit signatures; only same-bucket pairs are scored.
 *    The 100 TB path: the cross product never materializes, the shuffle
 *    carries (bucket, vector) once, and recall is tunable via
 *    planes/probes.
 *
 * All vector arithmetic runs in the custom codegen expressions
 * [[graft.functions.CosineSim]] / [[graft.functions.HyperplaneBucket]]
 * (one flat loop each) — the higher-order-function formulation
 * (`aggregate`×`zip_with`) evaluates its lambdas interpreted, which is
 * the dominant cost at 10^9 × O(planes + candidates) evaluations.
 */
object Similarity {

  /** Cosine similarity between two float/double-array columns —
    * codegen'd, one pass, value-identical to
    * `dot(a,b)/(sqrt(dot(a,a))*sqrt(dot(b,b)))` in double. */
  def cosine(a: Column, b: Column): Column = CosineSim(a, b)

  /** Brute-force top-k cosine neighbors of each query vector.
    * `queries` MUST be small (it is broadcast); corpus side streams. */
  def cosineTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val q = queries.select(
      F.col(idCol).cast("string").as("query_id"),
      F.col(vecCol).as("qv"))
    val c = corpus.select(
      F.col(idCol).cast("string").as("neighbor_id"),
      F.col(vecCol).as("cv"))
    val scored = F.broadcast(q).join(c,
        if (excludeSelf) F.col("query_id") =!= F.col("neighbor_id")
        else F.lit(true))
      .select(F.col("query_id"), F.col("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("cv")), 6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(F.col("cosine").desc, F.col("neighbor_id"))
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
  }

  /** Sign-bit LSH bucket of a vector: bit p = sign(v · plane_p), packed
    * into a long key — all planes in one codegen pass. The plane matrix
    * is deterministic from (dim, planes, seed); see
    * [[graft.functions.HyperplaneBucket.planesFor]] for embedding the
    * identical literals in an independent oracle. */
  def lshBucket(vec: Column, dim: Int, planes: Int, seed: Long): Column =
    HyperplaneBucket(vec, dim, planes, seed)

  /** Approximate top-k: score only same-bucket (query, corpus) pairs.
    * Multi-probe: each QUERY also probes the buckets at Hamming
    * distance 1 (flip each bit), trading `planes+1`× signature rows for
    * recall — the standard probe/recall lever. */
  def lshTopK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int, dim: Int,
      planes: Int = 10, seed: Long = 42L,
      multiProbe: Boolean = true): DataFrame = {
    val bucket = lshBucket(F.col(vecCol), dim, planes, seed)
    // corpus: one bucket per row; queries: home bucket + 1-bit probes
    val c = corpus.select(
      F.col(idCol).cast("string").as("neighbor_id"),
      F.col(vecCol).as("cv"), bucket.as("bucket"))
    val probeBuckets =
      if (!multiProbe) F.array(bucket)
      else F.array(bucket +: (0 until planes).map(p =>
        bucket.bitwiseXOR(F.shiftleft(F.lit(1L), p))): _*)
    val q = queries.select(
        F.col(idCol).cast("string").as("query_id"),
        F.col(vecCol).as("qv"),
        F.explode(probeBuckets).as("bucket"))
    // no pair-dedup needed — and the groupBy it replaced was a full
    // extra shuffle: each NEIGHBOR lives in exactly one bucket and the
    // probe list (home + single-bit flips) contains all-distinct
    // values, so a (query, neighbor) pair can join at most once
    val scored = F.broadcast(q).join(c, Seq("bucket"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("cv")), 6).as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(F.col("cosine").desc, F.col("neighbor_id"))
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
  }

  /** All same-bucket pairs of one table with their cosine — the
    * embedding near-dup primitive (no top-k, pair-oriented). `dim` is a
    * parameter (the embedding dimension is schema/contract knowledge,
    * never sniffed from data). Pair generation goes through the shared
    * capped-bucket path (see [[Dedup.bucketedPairs]]): one shuffle of
    * (bucket, id, vec), never an uncapped self-join. */
  def lshSelfPairs(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      planes: Int, seed: Long, maxBucket: Int = 1024): DataFrame = {
    val sig = df.select(
      F.col(idCol).cast("string").as("doc_id"),
      F.col(vecCol).as("v"),
      lshBucket(F.col(vecCol), dim, planes, seed).as("bucket"))
    // each doc sits in exactly ONE bucket and bucketedPairs emits each
    // within-bucket pair once, so pairs cannot repeat — no dedup
    // aggregation (its groupBy was a full extra shuffle of every
    // scored pair on the near-dup hot path)
    Dedup.bucketedPairs(sig, Seq("bucket"), "doc_id", Seq("v"), maxBucket)
      .select(F.col("id_a"), F.col("id_b"),
        F.round(cosine(F.col("v_a"), F.col("v_b")), 6).as("cosine"))
  }
}
