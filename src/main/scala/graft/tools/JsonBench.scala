package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

import graft.dsl.Constraint._
import graft.dsl.ConstraintSuite
import graft.exec.JsonValidator

/**
 * Raw-JSON-document validation throughput: a parquet-materialized
 * corpus of JSON strings (the JSONL shape) timed through all THREE
 * execution paths — the schema-free document engine in a distributed
 * map, the from_json + Catalyst lowering, and the Spark 4 variant
 * lowering. Prints one JSON line.
 * Run: `sbt "runMain graft.tools.JsonBench [nDocs] [cpus]"`.
 */
object JsonBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-json-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
      .config("spark.local.dir", graft.Scaling.localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // 1-min load at start/end goes into the artifact: this box has
    // noisy-neighbor windows that swing identical jobs 4-8x (measured
    // round 5: the same verdicts action 0.97 s and 31.1 s in one JVM),
    // and a throughput line without load context can't be interpreted
    def load(): Double = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    val loadStart = load()

    // deterministic corpus: 16-token sequences rendered to JSON, with
    // ~1% planted violations (token out of range / bad source)
    val dir = s"/tmp/graft_json_bench/docs=$nDocs"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(dir, "_SUCCESS"))) {
      spark.range(0L, nDocs, 1L, 64)
        .select(F.col("id").cast("string").as("id"),
          F.to_json(F.struct(
            F.concat(F.lit("seq-"), F.col("id")).as("doc_id"),
            F.transform(F.sequence(F.lit(1), F.lit(16)),
              i => F.pmod(F.col("id") * i, F.lit(50257))
                + F.when(F.col("id") % 101 === 0, 100000).otherwise(0))
              .as("tokens"),
            F.lit(16).as("n_tok"),
            F.when(F.col("id") % 97 === 0, F.lit("unknown"))
              .otherwise(F.lit("web")).as("source"))).as("js"))
        .write.mode("overwrite").parquet(dir)
    }
    val docs = spark.read.parquet(dir)

    val suite = ConstraintSuite("json-hot", Seq(
      NotNull("id_req", "doc_id"),
      Matches("id_shape", "doc_id", "^seq-[0-9]+$"),
      Bounds("n_range", "n_tok", Some(BigDecimal(1)),
        Some(BigDecimal(8192))),
      EachElement("tok_range", "tokens",
        Bounds("t", "$", Some(BigDecimal(0)), Some(BigDecimal(50256)))),
      IsIn("src", "source", Seq("web", "books", "code"))))
    val compiled = JsonValidator.compile(suite)
    val docSchema = StructType(Seq(
      StructField("doc_id", StringType),
      StructField("tokens", ArrayType(IntegerType)),
      StructField("n_tok", IntegerType),
      StructField("source", StringType)))

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def time(reps: Int)(body: => Long): (Double, Long) = {
      var n = 0L
      val ts = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        n = body
        (System.nanoTime() - t0) / 1e9
      }
      (median(ts), n)
    }

    // warm both paths (JIT, codegen, parquet footer cache)
    JsonValidator.verdicts(docs.limit(10000), "id", "js", compiled)
      .filter(!F.col("ok")).count()
    JsonValidator.violationsTyped(docs.limit(10000), "id", "js",
      docSchema, suite).count()
    JsonValidator.violationsVariant(docs.limit(10000), "id", "js",
      docSchema, suite).count()

    val (docSec, docBad) = time(3) {
      JsonValidator.verdicts(docs, "id", "js", compiled)
        .filter(!F.col("ok")).count()
    }
    val (detailSec, detailRows) = time(3) {
      JsonValidator.violations(docs, "id", "js", compiled).count()
    }
    val (typedSec, typedRows) = time(3) {
      JsonValidator.violationsTyped(docs, "id", "js", docSchema, suite)
        .count()
    }
    val (varSec, varRows) = time(3) {
      JsonValidator.violationsVariant(docs, "id", "js", docSchema, suite)
        .count()
    }

    // ---- pre-stored VARIANT column (the lakehouse storage shape):
    // parse once at write time, then validate off the stored binary —
    // no parse_json in the read plan
    val vdir = s"/tmp/graft_json_bench/var_docs=$nDocs"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(vdir, "_SUCCESS"))) {
      docs.select(F.col("id"), F.try_parse_json(F.col("js")).as("v"))
        .write.mode("overwrite").parquet(vdir)
    }
    val stored = spark.read.parquet(vdir)
    JsonValidator.violationsVariantColumn(stored.limit(10000), "id", "v",
      docSchema, suite).count() // warm
    val (vcolSec, vcolRows) = time(3) {
      JsonValidator.violationsVariantColumn(stored, "id", "v",
        docSchema, suite).count()
    }

    // ---- resumable runner over a PARTITIONED corpus — the 10^12
    // operational shape: checkpointed partition batches, violations
    // accumulated, kill + resume. Single-pass doc engine per run.
    val pdir = s"/tmp/graft_json_bench/part_docs=$nDocs"
    if (!java.nio.file.Files.exists(
        java.nio.file.Paths.get(pdir, "_SUCCESS"))) {
      docs.withColumn("part",
          F.concat(F.lit("p"), F.lpad(
            F.pmod(F.col("id").cast("long"), F.lit(16)).cast("string"),
            2, "0")))
        .write.mode("overwrite").partitionBy("part").parquet(pdir)
    }
    val stamp = System.nanoTime()
    val table = new graft.table.ParquetPartitionedTable(spark, pdir, "part")
    val cp = new graft.checkpoint.CheckpointStore(spark,
      s"/tmp/graft_json_bench/cp_$stamp")
    val violOut = s"/tmp/graft_json_bench/viol_$stamp"
    val tR0 = System.nanoTime()
    val r1 = graft.checkpoint.PartitionedRunner.runJson(table, suite, cp,
      "b1", jsonCol = "js", idCol = "id",
      violationsOut = Some(violOut), maxPartitions = 8)
    val runHalfSec = (System.nanoTime() - tR0) / 1e9
    val tR1 = System.nanoTime()
    val r2 = graft.checkpoint.PartitionedRunner.runJson(table, suite, cp,
      "b2", jsonCol = "js", idCol = "id",
      violationsOut = Some(violOut))
    val resumeSec = (System.nanoTime() - tR1) / 1e9
    require(r1.processed.size == 8 && r2.processed.size == 8 &&
      r2.skipped.toSet == r1.processed.toSet,
      s"resume contract broke: ${r1.processed.size}/${r2.processed.size}")
    val runJsonSec = runHalfSec + resumeSec

    println(f"""{"json_bench":{"n_docs":$nDocs,"cpus":$cpus,"doc_engine":{"sec":$docSec%.2f,"docs_per_sec":${nDocs / docSec}%.0f,"bad_docs":$docBad},"doc_engine_details":{"sec":$detailSec%.2f,"docs_per_sec":${nDocs / detailSec}%.0f,"violations":$detailRows},"typed_from_json":{"sec":$typedSec%.2f,"docs_per_sec":${nDocs / typedSec}%.0f,"violations":$typedRows},"variant":{"sec":$varSec%.2f,"docs_per_sec":${nDocs / varSec}%.0f,"violations":$varRows},"variant_stored":{"sec":$vcolSec%.2f,"docs_per_sec":${nDocs / vcolSec}%.0f,"violations":$vcolRows},"run_json":{"sec":$runJsonSec%.2f,"sec_first_half":$runHalfSec%.2f,"sec_resume":$resumeSec%.2f,"docs_per_sec":${nDocs / runJsonSec}%.0f,"partitions":16,"kill_resume_ok":true},"load_start":$loadStart%.2f,"load_end":${load()}%.2f}}""")
    spark.stop()
  }
}
