package graft.checkpoint

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.compile.CompiledSuite
import graft.exec.Validator
import graft.table.TableProvider

/** One line of per-partition lineage — the north rule's
  * `(snapshot-id, partition spec, constraint-set hash)` plus metrics, so
  * a killed job can prove which partitions were already validated against
  * exactly this data and exactly this suite. */
final case class CheckpointEntry(
    partition: String,
    snapshot_id: String,
    constraint_hash: String,
    valid: Boolean,
    n_rows: Long,
    n_bad_rows: Long,
    run_id: String)

/**
 * Append-only checkpoint table (Parquet). A partition is "done" iff an
 * entry matches its CURRENT snapshot id and the CURRENT constraint hash —
 * so editing the suite or rewriting a partition's files automatically
 * re-queues it, while a plain re-run skips it. Appends are atomic at the
 * file level (each append writes new files), matching how an Iceberg
 * append would behave.
 */
final class CheckpointStore(spark: SparkSession, path: String) {
  import spark.implicits._

  def load(): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(p)) spark.read.parquet(path)
    else spark.emptyDataset[CheckpointEntry].toDF()
  }

  def append(entries: Seq[CheckpointEntry]): Unit =
    entries.toDS().toDF().write.mode(SaveMode.Append).parquet(path)

  /** Partitions still needing validation: current (partition, snapshot,
    * hash) tuples EXCEPT already-checkpointed ones. The partition list is
    * tiny relative to the data (thousands of entries for a 100 TB table),
    * so the anti-join runs as a local/broadcast plan. */
  def pending(table: TableProvider, constraintHash: String): Seq[String] = {
    val current = table.partitions()
      .map(p => (p, table.snapshotId(p), constraintHash))
      .toDF("partition", "snapshot_id", "constraint_hash")
    current
      .join(load().select("partition", "snapshot_id", "constraint_hash"),
        Seq("partition", "snapshot_id", "constraint_hash"), "left_anti")
      .select("partition").as[String].collect().toSeq.sorted
  }
}

/** Result of one (possibly partial) validation run. */
final case class RunResult(
    runId: String,
    processed: Seq[String],
    skipped: Seq[String],
    verdicts: DataFrame,
    violations: DataFrame)

/**
 * The resumable whole-table validation driver (north rule C7): plan =
 * pending partitions (checkpoint anti-join) → ONE partition-pruned scan
 * validates all of them in a single job → violations land per partition →
 * checkpoint entries appended with metrics. Kill it anywhere; the next
 * run picks up exactly the unvalidated partitions.
 */
object PartitionedRunner {

  def run(
      table: TableProvider,
      suite: CompiledSuite,
      checkpoint: CheckpointStore,
      runId: String,
      idCol: String = "doc_id",
      dims: Map[String, DataFrame] = Map.empty,
      violationsOut: Option[String] = None,
      maxPartitions: Int = Int.MaxValue): RunResult = {

    val spark = checkpoint.load().sparkSession
    val pendingAll = checkpoint.pending(table, suite.constraintHash)
    val pending = pendingAll.take(maxPartitions)
    val skipped = table.partitions().diff(pendingAll)

    if (pending.isEmpty) {
      import spark.implicits._
      return RunResult(runId, Seq.empty, skipped,
        spark.emptyDataFrame,
        spark.emptyDataset[graft.exec.Violation].toDF())
    }

    val df = table.scan(pending)
    // Dataset-level checks (uniqueness, drift baseline) evaluate over the
    // WHOLE table, not the pending subset: a duplicate key can span
    // partitions validated in different runs, and the drift baseline must
    // not depend on which partitions happened to share a run. Row-local
    // checks and verdict rows stay restricted to the pending scan.
    val report = Validator.validateWithDetails(
      df, suite, table.partitionCols, idCol, dims,
      globalDf = Some(table.scanAll()))

    violationsOut.foreach { out =>
      report.violations.write.mode(SaveMode.Append).parquet(out)
    }

    checkpoint.append(checkpointEntries(
      table, report.verdicts, suite.constraintHash, runId, pending))
    RunResult(runId, pending, skipped, report.verdicts, report.violations)
  }

  /**
   * Resumable validation of a partitioned RAW-JSON corpus — the
   * reference's literal instance shape (a JSON string per row) under
   * the north rule's checkpoint/lineage contract. The suite compiles
   * for the DOCUMENT engine once on the driver; each pending partition
   * is scanned once, every row gets a doc-engine verdict (malformed →
   * invalid, never a crash), verdicts aggregate per partition and land
   * in the same checkpoint table `run` uses. The constraint hash is
   * prefixed (`docjson:`) so the same suite validated through the
   * typed-column engine and through this path keep distinct lineages.
   */
  def runJson(
      table: TableProvider,
      suite: graft.dsl.ConstraintSuite,
      checkpoint: CheckpointStore,
      runId: String,
      jsonCol: String = "js",
      registry: graft.registry.ConstraintRegistry =
        graft.registry.ConstraintRegistry.empty,
      idCol: String = "doc_id",
      violationsOut: Option[String] = None,
      maxPartitions: Int = Int.MaxValue): RunResult = {
    val spark = checkpoint.load().sparkSession
    val compiled = graft.exec.JsonValidator.compile(suite, registry)
    val chash = "docjson:" + graft.compile.ConstraintCompiler.hashOf(
      graft.compile.ConstraintCompiler.resolve(suite, registry))

    val pendingAll = checkpoint.pending(table, chash)
    val pending = pendingAll.take(maxPartitions)
    val skipped = table.partitions().diff(pendingAll)
    if (pending.isEmpty) {
      import spark.implicits._
      return RunResult(runId, Seq.empty, skipped,
        spark.emptyDataFrame,
        Seq.empty[(String, String, String)]
          .toDF("doc_id", "constraint_id", "expected"))
    }

    val df = table.scan(pending)
    // per-row doc-engine verdict with the partition columns carried
    // through (JsonValidator.verdicts projects them away)
    val okSchema = df.schema.add("_ok",
      org.apache.spark.sql.types.BooleanType, nullable = false)
    val withOk = df.mapPartitions { it =>
      it.map(r => org.apache.spark.sql.Row.fromSeq(r.toSeq :+
        graft.exec.JsonValidator.check(
          compiled, r.getAs[String](jsonCol))))
    }(org.apache.spark.sql.Encoders.row(okSchema))
    val verdicts = withOk
      .groupBy(table.partitionCols.map(F.col): _*)
      .agg(F.count(F.lit(1)).as("n_rows"),
        F.sum(F.when(!F.col("_ok"), 1L).otherwise(0L)).as("n_bad_rows"))
      .withColumn("valid", F.col("n_bad_rows") === 0L)

    val violations = graft.exec.JsonValidator
      .violations(df, idCol, jsonCol, compiled)
    violationsOut.foreach { out =>
      violations.write.mode(SaveMode.Append).parquet(out)
    }

    checkpoint.append(
      checkpointEntries(table, verdicts, chash, runId, pending))
    RunResult(runId, pending, skipped, verdicts, violations)
  }

  /** Collect per-partition verdict rows into checkpoint entries, plus
    * vacuous entries for pending partitions whose scan produced zero
    * rows (they emit no verdict row and would otherwise be re-queued
    * and re-scanned on every run forever). */
  private def checkpointEntries(table: TableProvider, verdicts: DataFrame,
      constraintHash: String, runId: String,
      pending: Seq[String]): Seq[CheckpointEntry] = {
    // Verdicts are small (one row per partition) — collect for checkpoint.
    val entries = verdicts.collect().map { r =>
      // multi-column partition specs render as col1=v1/col2=v2 — the same
      // form TableProvider.partitions() emits. The verdict carries
      // DECODED values while directory names are Hive-ESCAPED
      // ('us west' ↔ 'us%20west', null ↔ __HIVE_DEFAULT_PARTITION__),
      // so re-escape before snapshot lookup or special-char partitions
      // would miss the checkpoint forever (or crash listStatus).
      import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
      val pname = table.partitionCols.map { c =>
        val v = r.getAs[Any](c)
        val enc =
          if (v == null) ExternalCatalogUtils.DEFAULT_PARTITION_NAME
          else ExternalCatalogUtils.escapePathName(v.toString)
        s"$c=$enc"
      }.mkString("/")
      CheckpointEntry(
        partition = pname,
        snapshot_id = table.snapshotId(pname),
        constraint_hash = constraintHash,
        valid = r.getAs[Boolean]("valid"),
        n_rows = r.getAs[Long]("n_rows"),
        n_bad_rows = r.getAs[Long]("n_bad_rows"),
        run_id = runId)
    }
    val seen = entries.map(_.partition).toSet
    val empties = pending.filterNot(seen).map(p => CheckpointEntry(
      p, table.snapshotId(p), constraintHash,
      valid = true, n_rows = 0L, n_bad_rows = 0L, run_id = runId))
    entries.toSeq ++ empties
  }
}
