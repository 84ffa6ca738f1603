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
 * Hive-layout partitioned Parquet: `root/<c1>=<v1>/<c2>=<v2>/...parquet`
 * for any number of partition columns; partition names render
 * `c1=v1/c2=v2` (the `input_hint` table partitions by `source` alone).
 */
final class ParquetPartitionedTable(
    spark: SparkSession,
    root: String,
    cols: Seq[String])
    extends TableProvider {
  require(cols.nonEmpty, "need at least one partition column")

  def this(spark: SparkSession, root: String, partitionCol: String) =
    this(spark, root, Seq(partitionCol))

  override def partitionCols: Seq[String] = cols

  private def fs = new Path(root)
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  override def partitions(): Seq[String] = {
    def walk(dir: Path, depth: Int): Seq[String] = {
      val prefix = cols(depth) + "="
      fs.listStatus(dir).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(prefix))
        .flatMap { s =>
          val name = s.getPath.getName
          if (depth == cols.size - 1) Seq(name)
          else walk(s.getPath, depth + 1).map(sub => s"$name/$sub")
        }
    }
    walk(new Path(root), 0).sorted
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
    // each partition name is c1=v1/c2=v2/...; the disjunction of
    // per-partition conjunctions compiles to a static partition-pruning
    // predicate — only the pending partitions' files are listed/read.
    // Directory names carry Hive-ESCAPED values while the reader
    // surfaces DECODED column values ('a%3Ab' on disk, 'a:b' in the
    // column; __HIVE_DEFAULT_PARTITION__ reads back as NULL) — compare
    // against the decoded form or affected partitions silently scan
    // zero rows and checkpoint a PASS for data never checked.
    import org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    val pred = parts.map { p =>
      p.split("/").toSeq.map { seg =>
        val Array(c, v) = seg.split("=", 2)
        if (v == ExternalCatalogUtils.DEFAULT_PARTITION_NAME)
          F.col(c).isNull
        else F.col(c) === F.lit(ExternalCatalogUtils.unescapePathName(v))
      }.reduce(_ && _)
    }.reduceOption(_ || _).getOrElse(F.lit(false))
    scanAll().filter(pred)
  }

  override def scanAll(): DataFrame =
    spark.read
      .option("basePath", root)
      .parquet(root)
}
