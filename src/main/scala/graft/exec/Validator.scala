package graft.exec

import org.apache.spark.sql.{DataFrame, Column}
import org.apache.spark.sql.{functions => F}

import graft.compile.CompiledSuite

/** One typed violation row — the engine's `ValidationError`
  * (`ValidationError.java:6-22`): `constraint_id` plays `evaluatePath`,
  * `expected` the message, `instance_path` the `instanceLocation`
  * (JSON-Pointer-ish path into the row, with the first failing element
  * index for array-scoped checks), and `observed` is added per the
  * north rule. */
final case class Violation(
    doc_id: String,
    constraint_id: String,
    observed: String,
    expected: String,
    instance_path: String)

/** Detail-path result — the engine's `ValidationResult`
  * (`ValidationResult.java:13-26`): a per-partition verdict DataFrame plus
  * the typed violation rows. Both are lazy plans; nothing executes until
  * an action runs. */
final case class ValidationReport(verdicts: DataFrame, violations: DataFrame)

/**
 * Evaluates a [[CompiledSuite]] over a DataFrame — the analogue of
 * `BlazeValidator` (`BlazeValidator.java:14-27`), with the reference's
 * two modes kept intact:
 *
 *  - [[Validator.validate]]    — FastValidation (`blaze_wrapper.cpp:92`):
 *    boolean verdict per partition, short-circuit AND inside whole-stage
 *    codegen, NO violation rows materialized.
 *  - [[Validator.validateWithDetails]] — detail mode
 *    (`blaze_wrapper.cpp:162-248`): per-constraint evaluation yielding
 *    typed violation rows + the verdicts.
 *
 * The "unit of verdict" is an Iceberg-style partition (the north rule),
 * not a document: `partitionCols` plays the role of the instance boundary.
 * Malformed values produce violations, never job failures — mirroring the
 * reference's catch-all (`blaze_wrapper.cpp:140-146`): all lowered
 * predicates are null-tolerant and use non-throwing functions.
 */
object Validator {

  /** Fast boolean path: ONE scan, ONE small shuffle (the per-partition
    * verdict groupBy). Dataset-level checks contribute only a count.
    *
    * `globalDf`: the frame DATASET-LEVEL checks evaluate over, when it
    * must be wider than `df` — a resumed/partial run validates only the
    * pending partitions, but a uniqueness duplicate can span partitions
    * validated in different runs and a drift baseline must be the whole
    * table's distribution. Defaults to `df` (single full-table run). */
  def validate(
      df: DataFrame,
      suite: CompiledSuite,
      partitionCols: Seq[String],
      idCol: String = "doc_id",
      dims: Map[String, DataFrame] = Map.empty,
      globalDf: Option[DataFrame] = None): DataFrame = {
    val ok = suite.rowPredicate
    val rowVerdicts = aggVerdict(df, ok, partitionCols)
    attachDatasetCounts(rowVerdicts, df, globalDf.getOrElse(df), suite,
      idCol, partitionCols, dims)
  }

  /** Detail path: violation rows from every source, union'd, plus
    * verdicts. Row-local violations are built columnar — an array of
    * per-constraint structs filtered to failures then exploded — so the
    * whole construction stays inside codegen with zero UDFs. */
  def validateWithDetails(
      df: DataFrame,
      suite: CompiledSuite,
      partitionCols: Seq[String],
      idCol: String = "doc_id",
      dims: Map[String, DataFrame] = Map.empty,
      globalDf: Option[DataFrame] = None): ValidationReport = {

    val rowViolations: DataFrame =
      if (suite.rowChecks.isEmpty) emptyViolations(df)
      else {
        val structs = F.array(suite.rowChecks.map { c =>
          F.struct(
            F.lit(c.id).as("constraint_id"),
            // NULL predicate results are failures everywhere: without
            // the coalesce the filter below drops the null element and
            // a row counted bad by the verdict emits no violation row
            F.coalesce(c.pred, F.lit(false)).as("ok"),
            // observed can render decimals/arrays to strings — `when`
            // branches are lazy in codegen, so pay that only on rows
            // that failed (passing structs are filtered out below and
            // their observed value never surfaces)
            F.when(F.coalesce(c.pred, F.lit(false)), F.lit("null"))
              .otherwise(F.coalesce(c.observed.cast("string"),
                F.lit("null")))
              .as("observed"),
            F.lit(c.expected).as("expected"),
            // instance_path can re-scan an array to find the first
            // failing index — `when` branches are lazy in codegen, so
            // pay that only on rows that actually failed the check
            F.when(F.coalesce(c.pred, F.lit(false)), F.lit("/"))
              .otherwise(F.coalesce(c.instancePath, F.lit("/")))
              .as("instance_path"))
        }: _*)
        // Gate rows through ONE codegen any-constraint-failed
        // disjunction BEFORE building/exploding the violation structs:
        // on a mostly-clean table (the normal case) the vast majority
        // of rows short-circuit out of the scan stage without ever
        // constructing a struct, and the Generate runs only over the
        // failing sliver. Result-identical: a row passing every check
        // contributes zero violation rows either way.
        val anyFail = suite.rowChecks
          .map(c => !F.coalesce(c.pred, F.lit(false)))
          .reduce(_ || _)
        // Explode ALL structs and drop passing ones with a plain Filter
        // AFTER the Generate: a higher-order `filter(structs, !ok)`
        // lambda reads nicer but ArrayFilter is CodegenFallback, which
        // drags the entire struct construction — every predicate,
        // observed rendering and instance-path CASE — into interpreted
        // eval() per row. This shape keeps construction, explode and
        // drop inside whole-stage codegen; the extra per-row structs
        // exist only inside the stage, never shuffle.
        df.filter(anyFail)
          .select(
            F.col(idCol).cast("string").as("doc_id"),
            F.explode(structs).as("_v"))
          .filter(!F.col("_v.ok"))
          .select(
            F.col("doc_id"),
            F.col("_v.constraint_id").as("constraint_id"),
            F.col("_v.observed").as("observed"),
            F.col("_v.expected").as("expected"),
            F.col("_v.instance_path").as("instance_path"))
      }

    val dsDf = globalDf.getOrElse(df)
    val dsViolations = suite.datasetChecks.map(c =>
      c.violations(if (c.needsGlobalScope) dsDf else df,
        idCol, partitionCols, dims))
    val violations = (rowViolations +: dsViolations).reduce(_ unionAll _)

    val verdicts = validate(df, suite, partitionCols, idCol, dims, globalDf)
    ValidationReport(verdicts, violations)
  }

  /** Per-partition verdict aggregate: every(pred), row + bad-row counts —
    * partial+final hash aggregate, so the shuffle carries one row per
    * (input-partition × verdict-partition).
    *
    * The predicate is evaluated ONCE into a projected boolean column and
    * the aggregates consume that column. Inlining `ok` into both `sum` and
    * `every` duplicates the whole predicate tree in the generated
    * aggregate function — double the work, and (pre-freshName) the trigger
    * for the Janino local-redefinition fallback. */
  private def aggVerdict(
      df: DataFrame, ok: Column, partitionCols: Seq[String]): DataFrame = {
    val okCol = "_graft_ok"
    // coalesce BEFORE aggregating: a NULL predicate result must read as
    // one consistent answer (bad) across all three aggregates — raw
    // nulls are counted by sum's otherwise-branch but SKIPPED by
    // every(), which would report valid=true with n_bad_rows > 0
    val projected = df
      .select(partitionCols.map(F.col) :+
        F.coalesce(ok, F.lit(false)).as(okCol): _*)
    val okc = F.col(okCol)
    val aggs = Seq(
      F.count(F.lit(1)).as("n_rows"),
      F.sum(F.when(okc, 0L).otherwise(1L)).as("n_bad_rows"),
      F.coalesce(F.every(okc), F.lit(true)).as("rows_ok"))
    if (partitionCols.isEmpty)
      projected.agg(aggs.head, aggs.tail: _*)
    else
      projected.groupBy(partitionCols.map(F.col): _*)
        .agg(aggs.head, aggs.tail: _*)
  }

  /** Dataset-check outcomes folded into the verdict rows.
    *
    * Partition-attributable checks (referential integrity, drift) count
    * per partition and join onto the matching verdict row; table-scope
    * checks (uniqueness — a duplicate key can span partitions) count
    * globally and apply to every row. A partition is `valid` iff its
    * rows pass, it has no attributable violations, and no table-scope
    * check failed anywhere — the per-partition pass/fail the north rule
    * asks for, without pretending cross-partition facts are local. */
  private def attachDatasetCounts(
      verdicts: DataFrame,
      localDf: DataFrame,
      globalDf: DataFrame,
      suite: CompiledSuite,
      idCol: String,
      partitionCols: Seq[String],
      dims: Map[String, DataFrame]): DataFrame = {
    if (suite.datasetChecks.isEmpty)
      return verdicts
        .withColumn("n_partition_violations", F.lit(0L))
        .withColumn("n_global_violations", F.lit(0L))
        .withColumn("valid", F.col("rows_ok"))

    // Build each check's per-partition-count plan ONCE: re-invoking the
    // method would construct (and for drift, re-derive) the whole subplan
    // a second time for the same logical question. Each check sees the
    // scope it needs — local-scope checks (RI) must not re-scan the
    // whole table on a partial run.
    def frameFor(c: graft.checks.DatasetCheck): DataFrame =
      if (c.needsGlobalScope) globalDf else localDf
    val countPlans = suite.datasetChecks.map(c =>
      c -> (if (partitionCols.isEmpty) None
            else c.violationCountsByPartition(
              frameFor(c), idCol, partitionCols, dims)))
    val attributableCounts = countPlans.collect { case (_, Some(p)) => p }
    val global = countPlans.collect { case (c, None) => c }

    val withPart = attributableCounts
      .reduceOption(_ unionAll _)
      .map(_.groupBy(partitionCols.map(F.col): _*)
        .agg(F.sum("_n_ds_viol").as("n_partition_violations")))
    val v1 = withPart match {
      case Some(counts) =>
        verdicts.join(counts, partitionCols, "left")
          .withColumn("n_partition_violations",
            F.coalesce(F.col("n_partition_violations"), F.lit(0L)))
      case None =>
        verdicts.withColumn("n_partition_violations", F.lit(0L))
    }

    val v2 =
      if (global.isEmpty) v1.withColumn("n_global_violations", F.lit(0L))
      else {
        val total = global
          .map(c => c.violations(frameFor(c), idCol, partitionCols, dims))
          .reduce(_ unionAll _)
          .agg(F.count(F.lit(1)).as("n_global_violations"))
        v1.crossJoin(F.broadcast(total))
      }
    v2.withColumn("valid",
      F.col("rows_ok") && F.col("n_partition_violations") === 0L &&
        F.col("n_global_violations") === 0L)
  }

  private def emptyViolations(df: DataFrame): DataFrame = {
    import df.sparkSession.implicits._
    df.sparkSession.emptyDataset[Violation].toDF()
  }
}
