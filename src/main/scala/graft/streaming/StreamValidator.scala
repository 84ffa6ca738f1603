package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.{functions => F}

import graft.compile.CompiledSuite

/**
 * Structured-Streaming face of the validator: the same compiled
 * constraint suite (row-local Catalyst predicates are stateless
 * expressions, so they apply to a streaming DataFrame unchanged —
 * compile once, validate the infinite table). Dataset-level checks
 * (uniqueness/RI/drift) are batch-scope by definition and stay on the
 * batch path; the streaming analogue of the verdict is a watermarked
 * event-time window aggregate.
 */
object StreamValidator {

  /** Violation stream: one row per failed constraint per record —
    * identical construction to the batch detail path (array-of-structs →
    * filter → explode), appended continuously. */
  def violations(
      stream: DataFrame, suite: CompiledSuite, idCol: String): DataFrame = {
    // dataset-level checks would be SILENTLY dropped here — reject them
    // outright; the caller must strip them deliberately (batch path owns
    // unique/RI/drift semantics)
    require(suite.datasetChecks.isEmpty,
      "streaming path validates row-local checks only; dataset-level " +
        "checks (unique/RI/drift) belong to the batch path")
    val structs = F.array(suite.rowChecks.map { c =>
      F.struct(
        F.lit(c.id).as("constraint_id"),
        c.pred.as("ok"),
        F.coalesce(c.observed.cast("string"), F.lit("null")).as("observed"),
        F.lit(c.expected).as("expected"),
        F.coalesce(c.instancePath, F.lit("/")).as("instance_path"))
    }: _*)
    stream.select(
        F.col(idCol).cast("string").as("doc_id"),
        F.explode(F.filter(structs, s => !s.getField("ok"))).as("_v"))
      .select(
        F.col("doc_id"),
        F.col("_v.constraint_id").as("constraint_id"),
        F.col("_v.observed").as("observed"),
        F.col("_v.expected").as("expected"),
        F.col("_v.instance_path").as("instance_path"))
  }

  /** Windowed verdicts: per (event-time window × partition) validity,
    * watermarked so state is bounded — the streaming analogue of the
    * per-partition verdict row. Late data beyond the watermark is
    * dropped by Spark; the window's verdict finalizes at watermark
    * passage (append output mode). */
  def windowedVerdicts(
      stream: DataFrame,
      suite: CompiledSuite,
      timeCol: String,
      windowDuration: String,
      watermarkDelay: String,
      partitionCols: Seq[String]): DataFrame = {
    // predicate evaluated ONCE into a projected column (same reasoning
    // as Validator.aggVerdict: no duplicated predicate tree under two
    // aggregate expressions)
    val okc = F.col("_graft_ok")
    val keys = F.window(F.col(timeCol), windowDuration) +:
      partitionCols.map(F.col)
    stream
      .withColumn("_graft_ok", suite.rowPredicate)
      .withWatermark(timeCol, watermarkDelay)
      .groupBy(keys: _*)
      .agg(
        F.count(F.lit(1)).as("n_rows"),
        F.sum(F.when(okc, 0L).otherwise(1L)).as("n_bad_rows"),
        F.coalesce(F.every(okc), F.lit(true)).as("rows_ok"))
  }
}
