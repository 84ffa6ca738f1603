package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

/**
 * Similarity search over an embedding column (`array<float>`).
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
 * All arithmetic is `zip_with`/`aggregate` higher-order expressions —
 * vectorized by codegen, no UDFs.
 */
object Similarity {

  /** Cosine similarity between two float-array columns (expression). */
  def cosine(a: Column, b: Column): Column = {
    val dot = F.aggregate(F.zip_with(a, b, (x, y) => x * y),
      F.lit(0.0), (acc, x) => acc + x)
    val na = F.sqrt(F.aggregate(F.transform(a, x => x * x),
      F.lit(0.0), (acc, x) => acc + x))
    val nb = F.sqrt(F.aggregate(F.transform(b, x => x * x),
      F.lit(0.0), (acc, x) => acc + x))
    dot / (na * nb)
  }

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

  /** Deterministic random hyperplanes (driver-side, seeded) as literal
    * nested arrays — broadcast with the plan, no data pass needed. */
  private def hyperplanes(
      dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH signature of a vector: bit p = sign(v · plane_p),
    * packed into a long bucket key. */
  def lshBucket(vec: Column, dim: Int, planes: Int, seed: Long): Column = {
    val hp = hyperplanes(dim, planes, seed)
    val bits = hp.zipWithIndex.map { case (plane, p) =>
      val planeLit = F.array(plane.map(F.lit): _*)
      val dot = F.aggregate(F.zip_with(vec, planeLit, (x, w) => x * w),
        F.lit(0.0), (acc, x) => acc + x)
      F.when(dot >= 0, F.shiftleft(F.lit(1L), p)).otherwise(F.lit(0L))
    }
    bits.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate top-k: score only same-bucket (query, corpus) pairs.
    * Multi-probe: each vector also lands in the buckets at Hamming
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
    val scored = F.broadcast(q).join(c, Seq("bucket"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        F.round(cosine(F.col("qv"), F.col("cv")), 6).as("cosine"))
      .groupBy("query_id", "neighbor_id")
      .agg(F.first("cosine").as("cosine"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(F.col("cosine").desc, F.col("neighbor_id"))
    scored.withColumn("rank", F.row_number().over(w))
      .filter(F.col("rank") <= k)
  }

  /** All same-bucket pairs of one table with their cosine — the
    * embedding near-dup primitive (no top-k, pair-oriented). */
  def lshSelfPairs(
      df: DataFrame, idCol: String, vecCol: String,
      planes: Int, seed: Long): DataFrame = {
    val first = df.select(F.col(vecCol)).limit(1).collect()
    if (first.isEmpty) {
      return df.sparkSession.emptyDataFrame
        .withColumn("id_a", F.lit(""))
        .withColumn("id_b", F.lit(""))
        .withColumn("cosine", F.lit(0.0))
        .limit(0)
    }
    val dim = first(0).getSeq[Any](0).size
    val sig = df.select(
      F.col(idCol).cast("string").as("doc_id"),
      F.col(vecCol).as("v"),
      lshBucket(F.col(vecCol), dim, planes, seed).as("bucket"))
    val l = sig.select(F.col("bucket"), F.col("doc_id").as("id_a"),
      F.col("v").as("va"))
    val r = sig.select(F.col("bucket"), F.col("doc_id").as("id_b"),
      F.col("v").as("vb"))
    l.join(r, Seq("bucket"))
      .filter(F.col("id_a") < F.col("id_b"))
      .select(F.col("id_a"), F.col("id_b"),
        F.round(cosine(F.col("va"), F.col("vb")), 6).as("cosine"))
      .groupBy("id_a", "id_b").agg(F.first("cosine").as("cosine"))
  }
}
