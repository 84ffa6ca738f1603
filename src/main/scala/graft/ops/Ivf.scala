package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.{functions => F}

import graft.functions.NearestCell

/**
 * IVF (inverted-file) approximate nearest-neighbor search — the
 * centroid-partitioned complement to [[Similarity.lshTopK]].
 *
 * Index shape (the 100 TB story): the corpus is PARTITIONED BY CELL
 * (nearest centroid, one codegen projection — no shuffle to assign);
 * a query probes only its `nprobe` nearest cells, so the scored
 * candidate set is `nprobe/k` of the corpus instead of all of it. On a
 * real deployment the corpus would be written bucketed/partitioned by
 * `cell` so a probe prunes at the file level; in-session we carry the
 * cell column and join on it.
 *
 * Centroids are driver-side data by design (k ≤ a few thousand rows —
 * the standard IVF coarse quantizer). Two ways to get them:
 *  - [[Ivf.fitKMeans]] — Spark MLlib k-means on an L2-normalized sample
 *    (Euclidean on unit vectors is monotone in cosine), seeded.
 *  - [[Ivf.centroidsFromRows]] — first-k corpus vectors, normalized:
 *    deterministic and reproducible in plain SQL, which is what the
 *    driver-facing oracle checks end-to-end.
 */
object Ivf {

  /** L2-normalize a double array (driver-side). */
  private def normalize(v: Array[Double]): Array[Double] = {
    var s = 0.0
    var i = 0
    while (i < v.length) { s += v(i) * v(i); i += 1 }
    val n = math.sqrt(s)
    if (n == 0) v else v.map(_ / n)
  }

  /** k-means coarse quantizer over an L2-normalized sample. Returns
    * L2-normalized centroids (spherical k-means convention). */
  def fitKMeans(
      df: DataFrame, vecCol: String, k: Int, seed: Long = 42L,
      sampleFraction: Double = 1.0, maxIter: Int = 10)
      : Array[Array[Double]] = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val sample =
      (if (sampleFraction < 1.0) df.sample(sampleFraction, seed) else df)
        .select(F.col(vecCol).cast("array<double>").as("_v"))
        // null vectors NPE inside array_to_vector's UDF, and a
        // zero-norm vector normalizes to all-NULL elements (Spark
        // Divide yields NULL on a 0 divisor) — a corrupt origin point
        // that distorts every centroid. Drop both before the fit.
        .filter(F.col("_v").isNotNull &&
          F.aggregate(F.transform(F.col("_v"), x => x * x),
            F.lit(0.0), (a, x) => a + x) > 0)
        .select(array_to_vector(normalizeCol(F.col("_v"))).as("features"))
    val model = new KMeans()
      .setK(k).setSeed(seed).setMaxIter(maxIter)
      .fit(sample)
    model.clusterCenters.map(c => normalize(c.toArray))
  }

  /** First `k` rows (ordered by `idCol`) as normalized centroids — the
    * deterministic, SQL-reproducible quantizer used by the oracle-
    * checked driver query. Collects exactly k rows (bounded). */
  def centroidsFromRows(
      df: DataFrame, idCol: String, vecCol: String, k: Int)
      : Array[Array[Double]] =
    df.orderBy(F.col(idCol))
      .select(F.col(vecCol).cast("array<double>"))
      .limit(k)
      .collect()
      .map(r => normalize(r.getSeq[Double](0).toArray))

  /** Column form of L2 normalization (used at fit time only — the
    * search path never needs to normalize, argmax-dot is norm-free). */
  private def normalizeCol(v: Column): Column = {
    val n = F.sqrt(F.aggregate(F.transform(v, x => x * x),
      F.lit(0.0), (a, x) => a + x))
    F.transform(v, x => x / n)
  }

  /** Hard cap on the broadcast query-set size (probes = queries ×
    * nprobe rows, each carrying the full query vector). Past this,
    * broadcasting would OOM the driver — callers with a huge query set
    * should flip the join (treat queries as the corpus) or fall back to
    * a shuffle join on `cell`. */
  val MaxBroadcastQueries = 100000

  /** Approximate top-k: corpus rows are scored only for queries probing
    * their cell. `nprobe` trades recall for cost (cells scanned).
    *
    * Contract: the QUERY set is the small side (≤ [[MaxBroadcastQueries]]
    * rows, enforced with a bounded limit+count probe — never a full
    * scan); the corpus side streams. */
  def topK(
      queries: DataFrame, corpus: DataFrame,
      idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    // corpus: one codegen projection assigns the cell — no shuffle
    val c = corpus.select(
      F.col(idCol).cast("string").as("neighbor_id"),
      F.col(vecCol).as("cv"),
      NearestCell(F.col(vecCol), centroids).as("cell"))
    rankTopK(probeCells(queries, idCol, vecCol, centroids, nprobe), c, k)
  }

  /** Materialize the corpus as an IVF index: parquet PARTITIONED BY the
    * assigned cell. This is the 100 TB layout — a probe then reads only
    * the probed cells' files (static partition pruning), instead of
    * joining the whole corpus on the cell column. */
  def writeIndex(
      corpus: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], path: String): Unit =
    corpus.select(
        F.col(idCol).cast("string").as("neighbor_id"),
        // double storage unifies the index schema; numerically it
        // changes nothing vs topK's raw column — float→double widening
        // is exact and the scoring expressions (VectorOps) widen every
        // element to double before accumulating anyway
        F.col(vecCol).cast("array<double>").as("cv"),
        NearestCell(F.col(vecCol), centroids).as("cell"))
      .write.mode("overwrite").partitionBy("cell").parquet(path)

  /** Approximate top-k against a [[writeIndex]] table: the distinct
    * probed cells (≤ min(queries × nprobe, #centroids) values — driver-
    * bounded by construction) become a static `cell IN (...)` predicate
    * on the partitioned scan, so only those cells' files are listed and
    * read — verify with `.explain` (PartitionFilters) or `inputFiles`. */
  def topKFromIndex(
      spark: org.apache.spark.sql.SparkSession,
      queries: DataFrame, indexPath: String,
      idCol: String, vecCol: String, k: Int,
      centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    // materialize the (small, broadcast-capped) probe set ONCE: it is
    // consumed twice below (cell collect + broadcast join), and an
    // uncheckpointed plan would re-run the query-side scan + window +
    // cap-probe for each consumer
    val probes = probeCells(queries, idCol, vecCol, centroids, nprobe)
      .localCheckpoint()
    val cells = probes.select("cell").distinct()
      .collect().map(_.getInt(0)).sorted
    val pruned = spark.read.parquet(indexPath)
      .filter(F.col("cell").isin(cells.map(Integer.valueOf): _*))
    rankTopK(probes, pruned, k)
  }

  /** Per-query probe list `(query_id, qv, cell)`: rank all centroids by
    * dot product (centroid count is small by the IVF contract), keep the
    * `nprobe` best. Enforces the broadcast cap on the query set. */
  private def probeCells(
      queries: DataFrame, idCol: String, vecCol: String,
      centroids: Array[Array[Double]], nprobe: Int): DataFrame = {
    require(nprobe >= 1 && nprobe <= centroids.length,
      "nprobe must be in [1, k-centroids]")
    val qProbe = queries.limit(MaxBroadcastQueries + 1).count()
    require(qProbe <= MaxBroadcastQueries,
      s"Ivf.topK broadcasts the query set (× nprobe probes); got more " +
        s"than $MaxBroadcastQueries query rows — swap sides or use a " +
        s"shuffle join on the cell column for query sets this large")
    val spark = queries.sparkSession
    import spark.implicits._
    val cents = centroids.zipWithIndex.map { case (cv, i) =>
      (i, cv.toSeq)
    }.toSeq.toDF("cell", "centroid")
    val q0 = queries.select(
      F.col(idCol).cast("string").as("query_id"), F.col(vecCol).as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(F.col("_dot").desc, F.col("cell"))
    q0.crossJoin(F.broadcast(cents))
      .withColumn("_dot",
        graft.functions.DotProduct(F.col("qv"), F.col("centroid")))
      .withColumn("_r", F.row_number().over(w))
      .filter(F.col("_r") <= nprobe)
      .select(F.col("query_id"), F.col("qv"), F.col("cell"))
  }

  /** Score the probed corpus rows and keep each query's top k. */
  private def rankTopK(
      probes: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val scored = F.broadcast(probes).join(corpus, Seq("cell"))
      .filter(F.col("query_id") =!= F.col("neighbor_id"))
      .select(F.col("query_id"), F.col("neighbor_id"),
        F.round(Similarity.cosine(F.col("qv"), F.col("cv")), 6)
          .as("cosine"))
    val wk = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id")
      .orderBy(F.col("cosine").desc, F.col("neighbor_id"))
    scored.withColumn("rank", F.row_number().over(wk))
      .filter(F.col("rank") <= k)
  }
}
