package graft.table

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

/**
 * Abstraction over the partitioned fact table being validated — the slot
 * Iceberg occupies on a real cluster (north rule). No Iceberg runtime jar
 * is resolvable in this sandbox (SURVEY.md §7.5), so the shipped
 * implementation is Hive-partitioned Parquet with `snapshotId` derived
 * from the partition's file listing; an Iceberg implementation is a
 * drop-in for this trait (partitions → `table.partitions()`, snapshotId →
 * the Iceberg snapshot id, scan → `spark.read.format("iceberg")` with the
 * same partition filter).
 */
trait TableProvider {
  /** The partition column names (verdict granularity). */
  def partitionCols: Seq[String]

  /** Distinct partition key tuples, rendered `col=value/...`. */
  def partitions(): Seq[String]

  /** Lineage identity of one partition's current data — changes iff the
    * partition's files change (Iceberg: snapshot id; Parquet fallback:
    * stable hash of sorted (name, length) of the partition's files). */
  def snapshotId(partition: String): String

  /** Scan restricted to the given partitions — MUST push the filter down
    * to partition pruning (one pruned scan for all pending partitions,
    * not a scan per partition). */
  def scan(parts: Seq[String]): DataFrame

  def scanAll(): DataFrame
}

/**
 * Hive-layout partitioned Parquet: `root/<col>=<value>/...parquet`,
 * single partition column (the `input_hint` table partitions by
 * `source`).
 */
final class ParquetPartitionedTable(
    spark: SparkSession,
    root: String,
    partitionCol: String)
    extends TableProvider {

  override def partitionCols: Seq[String] = Seq(partitionCol)

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def partitions(): Seq[String] = {
    val prefix = partitionCol + "="
    fs.listStatus(new Path(root)).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
      .map(_.getPath.getName)
      .sorted
  }

  override def snapshotId(partition: String): String = {
    val dir = new Path(root, partition)
    val files = fs.listStatus(dir).toSeq
      .filter(_.isFile)
      .map(s => s"${s.getPath.getName}:${s.getLen}")
      .sorted
    val md = java.security.MessageDigest.getInstance("SHA-256")
    md.digest(files.mkString("\n").getBytes("UTF-8"))
      .take(16).map("%02x".format(_)).mkString
  }

  override def scan(parts: Seq[String]): DataFrame = {
    val values = parts.map(_.stripPrefix(partitionCol + "="))
    // isin on the partition column compiles to a static partition-pruning
    // predicate — only the pending partitions' files are listed/read.
    scanAll().filter(F.col(partitionCol).isin(values: _*))
  }

  override def scanAll(): DataFrame =
    spark.read
      .option("basePath", root)
      .parquet(root)
}
