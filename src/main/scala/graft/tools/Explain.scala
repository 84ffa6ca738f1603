package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.compile.ConstraintCompiler
import graft.exec.Validator
import graft.gen.SequenceGen
import graft.table.ParquetPartitionedTable

/**
 * Plan inspector: prints the physical plans of the engine's key flows so
 * pushdown / pruning / codegen spans can be eyeballed after every change
 * (`sbt "runMain graft.tools.Explain"`). The things to look for:
 * partition-pruned scans (`PartitionFilters`), column pruning
 * (`ReadSchema` containing only referenced columns), WholeStageCodegen
 * spans around the validation predicates, broadcast joins for dims.
 */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]").appName("graft-explain")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // `Explain queries q1,q2,...` — audit the join/exchange skeleton of
    // SparkEntry queries (cartesian products and unexpected join
    // strategies are scale bugs; catch them here, not at 100 TB)
    if (args.headOption.contains("queries")) {
      val names = args.lift(1).map(_.split(",").toSeq)
        .getOrElse(graft.SparkEntry.queries.keys.toSeq.sorted)
      names.foreach { q =>
        println(s"==== $q ====")
        val plan = graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.001")
          .queryExecution.executedPlan.toString
        plan.linesIterator
          .filter(l => l.contains("Join") || l.contains("Cartesian") ||
            l.contains("Exchange"))
          .foreach(l => println("  " + l.trim.replaceAll("^[:+\\- ]*", "")
            .take(140)))
      }
      spark.stop()
      return
    }

    val base = Files.createTempDirectory("graft-explain").toString
    SequenceGen.generate(spark, 5000L, nSources = 4, numPartitions = 4)
      .write.partitionBy("source").parquet(s"$base/data")
    val table = new ParquetPartitionedTable(spark, s"$base/data", "source")
    val suite = ConstraintCompiler.compileJson(Demo.suiteJson)
    val dims = Map("sources" -> SequenceGen.sourcesDim(spark))

    println("==== pruned scan (2 of 5 partitions) ====")
    table.scan(Seq("source=src0", "source=src2"))
      .queryExecution.executedPlan.toString.linesIterator
      .filter(l => l.contains("PartitionFilters") ||
        l.contains("PartitionCount") || l.contains("FileScan"))
      .foreach(l => println(l.trim.take(240)))

    println("==== fast validate path ====")
    Validator.validate(table.scanAll(), suite, Seq("source"),
        dims = dims)
      .explain("formatted")

    println("==== detail path (violations) ====")
    Validator.validateWithDetails(table.scanAll(), suite, Seq("source"),
        dims = dims)
      .violations.explain("formatted")

    println("==== runtime AQE plan (after execution): exchange reuse ====")
    val v = Validator.validate(table.scanAll(), suite, Seq("source"),
      dims = dims)
    v.collect()
    val finalPlan = v.queryExecution.executedPlan.toString
    val reused = finalPlan.linesIterator.count(_.contains("ReusedExchange"))
    val stages = finalPlan.linesIterator.count(_.contains("ShuffleQueryStage"))
    val scans = finalPlan.linesIterator.count(_.contains("Scan parquet"))
    println(s"ReusedExchange nodes: $reused; ShuffleQueryStages: $stages; " +
      s"parquet scans: $scans")
    finalPlan.linesIterator.filter(_.contains("ReadSchema"))
      .foreach(l => println("  scan: " + l.trim.take(160)))

    spark.stop()
  }
}
