package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.compile.{CompiledSuite, ConstraintCompiler}
import graft.dsl.{Constraint => C, ConstraintSuite}
import graft.exec.Validator
import graft.gen.SequenceGen

/**
 * Scaling-evidence harness (north rule, sandbox form — SURVEY.md §7.6):
 * the same fast-path validation job over the same parquet-materialized
 * seeded table at two parallelism levels (local[8] vs local[32],
 * substituting for N vs 4N executors), reporting sequences/sec at both
 * and efficiency = T(8-core)·? → throughput(32)/(4·throughput(8)).
 * Writes `BENCH/BASELINE.md`. Run: `sbt "runMain graft.Scaling [nRows]"`.
 */
object Scaling {

  val DataDir = "/tmp/graft_bench_data"
  val DefaultRows = 8000000L

  /** The FULL suite of the north star — row-local keyword checks plus
    * the dataset-level checks (uniqueness shuffle, broadcast-anti RI,
    * drift histogram agg). Throughput is measured over this whole
    * pipeline, not a scan microbench. */
  val benchSuite: ConstraintSuite = ConstraintSuite("bench-v1", Seq(
    C.NotNull("doc_id_present", "doc_id"),
    C.Matches("doc_id_shape", "doc_id", "^seq-[a-z0-9-]+$"),
    C.Bounds("n_tok_range", "n_tok", Some(1), Some(8192)),
    C.SizeConsistency("n_tok_consistent", "n_tok", "tokens"),
    C.EachElement("token_range", "tokens",
      C.Bounds("tok", "$", Some(0), Some(50256))),
    C.Unique("doc_id_unique", "doc_id"),
    C.RefIntegrity("source_known", "source", "sources", "source"),
    C.NoDrift("n_tok_stable", "n_tok", 0, 2048, 32, "psi", 0.4)))

  /** Materialize the seeded table once (reused across runs/sessions). */
  def ensureData(spark: SparkSession, nRows: Long): String = {
    val dir = s"$DataDir/rows=$nRows"
    if (!Files.exists(Paths.get(dir, "_SUCCESS"))) {
      SequenceGen.generate(spark, nRows, nSources = 8, numPartitions = 64)
        .write.mode("overwrite").partitionBy("source").parquet(dir)
    }
    dir
  }

  /** Median of a non-empty sequence (even n → mean of middle two). */
  def median(xs: Seq[Double]): Double = {
    val s = xs.sorted
    val n = s.length
    if (n % 2 == 1) s(n / 2) else (s(n / 2 - 1) + s(n / 2)) / 2.0
  }

  /** One timed fast-path validation pass (scan → predicates → verdict
    * aggregate); returns (median seq/sec, rows, per-rep seconds).
    * MEDIAN, not best-of: the round-2 driver run showed a 3.2× rep
    * spread on a loaded box, and best-of under that variance is a
    * lottery (VERDICT r2 What's-wrong #1). */
  def validationThroughput(
      spark: SparkSession, cpus: Int,
      nRows: Long = DefaultRows, reps: Int = 2): (Double, Long, Seq[Double]) = {
    val dir = ensureData(spark, nRows)
    // GRAFT_BENCH_SUITE: "rowlocal" = scan+predicate path alone (no
    // dataset-check shuffles); "drop:unique,drift,ri" = full suite minus
    // the named checks (per-check cost attribution). The two regimes
    // scale differently on one box and the report presents both.
    val mode = sys.env.getOrElse("GRAFT_BENCH_SUITE", "full")
    val dropped: C => Boolean = mode match {
      case "rowlocal" => c =>
        c.isInstanceOf[C.Unique] || c.isInstanceOf[C.RefIntegrity] ||
          c.isInstanceOf[C.NoDrift]
      case m if m.startsWith("drop:") =>
        val names = m.stripPrefix("drop:").split(",").toSet
        c => (names.contains("unique") && c.isInstanceOf[C.Unique]) ||
          (names.contains("ri") && c.isInstanceOf[C.RefIntegrity]) ||
          (names.contains("drift") && c.isInstanceOf[C.NoDrift])
      case _ => _ => false
    }
    // "withtokens": the full suite PLUS token-histogram drift — priced
    // separately because exploding every token dominates the pass.
    // "colocated": the full suite against a doc_id-BUCKETED copy of the
    // table with Unique(colocated = true) — the 10^12 deployment shape
    // where the uniqueness exchange disappears entirely.
    val constraints0 =
      (if (mode == "withtokens")
         benchSuite.constraints :+ C.NoArrayDrift("token_hist_stable",
           "tokens", 64, "psi", 0.2, 1000L)
       else benchSuite.constraints).filterNot(dropped)
    val constraints =
      if (mode == "colocated")
        constraints0.map {
          case u: C.Unique => u.copy(colocated = true)
          case c           => c
        }
      else constraints0
    val suite = ConstraintCompiler.compile(
      ConstraintSuite(benchSuite.id, constraints))
    // DataFrame (and its file index) built once, outside the timed loop —
    // the validate-many analogue of the reference's reusable compiled
    // template; file listing is a constant driver cost at any cluster
    // size and would otherwise drown the scalable portion at this SF.
    val df =
      if (mode == "colocated") bucketedTable(spark, dir, nRows)
      else spark.read.parquet(dir)
    // warm-up passes (JIT + codegen: steady state arrives after ~2)
    runOnce(spark, df, suite); runOnce(spark, df, suite)
    val times = (1 to reps).map { _ => runOnce(spark, df, suite) }
    System.err.println(
      f"[scaling] times=${times.map(t => f"$t%.2f").mkString(",")}s")
    (nRows / median(times), nRows, times)
  }

  /** A doc_id-bucketed copy of the bench table (the storage layout the
    * colocated uniqueness path presumes). Bucket metadata lives in the
    * session catalog, so the table is (re)registered per JVM — a
    * one-time cost outside the timed loop, the local stand-in for an
    * Iceberg `bucket(doc_id)` partition transform. Bucket count is
    * FIXED (32) across parallelism levels: layout is a property of the
    * table, not of the reader. */
  private def bucketedTable(spark: SparkSession, parquetDir: String,
      nRows: Long): org.apache.spark.sql.DataFrame = {
    val name = s"graft_bucketed_$nRows"
    // the exists-guard only spans THIS JVM (in-memory catalog): each
    // `measure` run starts fresh, so a regenerated parquet source can't
    // be shadowed by a stale bucketed copy across runs; within a JVM the
    // source is immutable (ensureData writes once)
    if (!spark.catalog.tableExists(name)) {
      // repartition by the SAME hash the bucketing applies so each
      // writer task holds exactly one bucket → one file per bucket
      // (bucketBy alone writes files-per-input-task × buckets — 2048
      // shards whose open/rowgroup overhead dominates the scan)
      spark.read.parquet(parquetDir)
        .repartition(32, org.apache.spark.sql.functions.col("doc_id"))
        .write.bucketBy(32, "doc_id").mode("overwrite").saveAsTable(name)
    }
    spark.table(name)
  }

  private def runOnce(spark: SparkSession,
      df: org.apache.spark.sql.DataFrame, suite: CompiledSuite): Double = {
    val dims = Map("sources" -> SequenceGen.sourcesDim(spark))
    val t0 = System.nanoTime()
    Validator.validate(df, suite, Seq("source"), dims = dims).collect()
    (System.nanoTime() - t0) / 1e9
  }

  private def session(cpus: Int): SparkSession = {
    // default: one shuffle partition per core (measured best here — a
    // 2-wave layout added ~20% wall clock at local[32]); override for
    // experiments via GRAFT_SHUFFLE_PARTITIONS
    val shufflePartitions = sys.env.getOrElse(
      "GRAFT_SHUFFLE_PARTITIONS", cpus.toString)
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName(s"graft-scaling-$cpus")
      .config("spark.sql.shuffle.partitions", shufflePartitions)
      .config("spark.sql.adaptive.enabled", "true")
      // Split the scan fine enough that the WIDEST level gets multiple
      // task waves: the default 128 MB packs this ~0.9 GB input into ~8
      // scan partitions, capping parallelism at 8 regardless of cores
      // (observed: local[32] ran at ~580% CPU). 8 MB → ~114 splits →
      // ≥3 waves at 32 threads. At 100 TB the file count dwarfs the
      // cores and the default is fine; this knob matters exactly when
      // input-bytes/cores < maxPartitionBytes.
      .config("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
      // Shuffle spill dir on tmpfs when available: this box funnels every
      // thread's shuffle files through ONE virtual disk, which a real
      // cluster does not (each executor has its own local disks) — the
      // single-disk artifact otherwise dominates the shuffle-heavy suite
      // at high thread counts and understates cluster scaling.
      .config("spark.local.dir", localDir)
      .config("spark.sql.warehouse.dir", s"$DataDir/warehouse")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private[graft] def localDir: String =
    sys.env.get("GRAFT_LOCAL_DIR") match {
      // tmpfs shuffle is RAM: a spill-heavy run (e.g. DedupBench at
      // 10^7 docs) can fill /dev/shm and get the JVM OOM-killed by the
      // OS — point GRAFT_LOCAL_DIR at real disk for those
      case Some(d) => d
      case None =>
        val shm = new java.io.File("/dev/shm")
        if (shm.isDirectory && shm.canWrite) {
          val d = new java.io.File(shm, "graft-shuffle")
          d.mkdirs()
          d.getAbsolutePath
        } else System.getProperty("java.io.tmpdir")
    }

  /**
   * Modes:
   *  - `measure <cpus> [nRows]` — ONE parallelism level in THIS JVM,
   *    prints a JSON line. Each level must run in a fresh JVM: a single
   *    JVM measuring both levels hands the second session the first's
   *    JIT-compiled code and skews efficiency (observed 3.9 "efficiency"
   *    when 8 ran cold first).
   *  - `report <thr8> <thr32> [nRows]` — write BENCH/BASELINE.md.
   * Orchestration (documented in BENCH/BASELINE.md):
   *   sbt "runMain graft.Scaling measure 8"  → thr8
   *   sbt "runMain graft.Scaling measure 32" → thr32
   *   sbt "runMain graft.Scaling report <thr8> <thr32>"
   */
  def main(args: Array[String]): Unit = args.toList match {
    case "measure" :: cpus :: rest =>
      val nRows = rest.headOption.map(_.toLong).getOrElse(DefaultRows)
      val reps = rest.drop(1).headOption.map(_.toInt).getOrElse(8)
      val s = session(cpus.toInt)
      ensureData(s, nRows)
      val (thr, _, times) = validationThroughput(s, cpus.toInt, nRows, reps = reps)
      val ts = times.map(t => f"$t%.3f").mkString("[", ",", "]")
      println(f"""{"scaling_measure":{"cpus":$cpus,"rows":$nRows,"seq_per_sec":$thr%.0f,"rep_sec":$ts}}""")
      s.stop()
    case "report" :: lo :: hi :: tLo :: tHi :: rest =>
      val nRows = rest.headOption.map(_.toLong).getOrElse(DefaultRows)
      writeReport(lo.toInt, hi.toInt, tLo.toDouble, tHi.toDouble, nRows)
    case _ =>
      System.err.println(
        "usage: graft.Scaling measure <cpus> [nRows] | " +
          "report <loCpus> <hiCpus> <thrLo> <thrHi> [nRows]")
      sys.exit(2)
  }

  private def writeReport(
      lo: Int, hi: Int, thrLo: Double, thrHi: Double, nRows: Long): Unit = {
    val results = Map(lo -> thrLo, hi -> thrHi)
    val eff = results(hi) / (4.0 * results(lo))
    val md =
      f"""# BENCH — scaling evidence (sandbox form of the north rule)
         |
         |North rule: validation throughput over the tokenized-sequence
         |table must scale with efficiency ≥ 0.8 from N to 4N executors.
         |No multi-node cluster exists in this sandbox, so the evidence is
         |the same job at two parallelism levels in local mode (SURVEY.md
         |§7.6): one JVM, 8 vs 32 executor threads, same seeded input.
         |
         || quantity | value |
         || --- | --- |
         || input | `input_hint` table, $nRows rows, 64 files, partitioned by `source` (8 sources + planted) |
         || suite | FULL north-star suite: 5 row-local constraints (notNull, pattern, bounds, size-consistency, per-token range via the codegen ArrayAllBetween) + uniqueness (salted two-phase agg) + referential integrity (broadcast anti) + PSI drift |
         || job | one validate() action: pruned parquet scan → codegen predicate conjunction → per-partition verdict aggregate, fused with the three dataset-check subplans |
         || throughput @ local[$lo] | ${results(lo)}%.0f seq/s |
         || throughput @ local[$hi] | ${results(hi)}%.0f seq/s |
         || scaling efficiency $lo→$hi | ${eff}%.3f (target ≥ 0.8) |
         |
         |Method: table materialized to parquet once (seed 42); ONE fresh
         |JVM per parallelism level (`sbt "runMain graft.Scaling measure
         |<cpus> <rows> <reps>"`) so neither level inherits the other's
         |JIT-compiled code; per level 2 warm-up passes then best of the
         |timed passes (scan + validate + collect; DataFrame/file-index
         |built once — the validate-many analogue of the reference's
         |reusable compiled template); shuffle dirs on tmpfs when
         |available (one shared virtual disk is the box's artifact, not
         |the engine's); normalize against the pure-CPU control
         |(`runMain graft.tools.CpuControl <cpus>`) at the SAME levels;
         |report assembled via `runMain graft.Scaling report $lo $hi ...`.
         |Real-cluster reproduction: `spark-submit --class graft.Scaling
         |--num-executors {N,4N} ...` against the same generator output on
         |shared storage.
         |""".stripMargin
    // BENCH/BASELINE.md is the curated report (incl. the CPU-control
    // machine-ceiling calibration); raw re-runs land beside it.
    Files.createDirectories(Paths.get("BENCH"))
    Files.writeString(Paths.get("BENCH/SCALING_RUN.md"), md)
    println(md)
    println(f"""{"local[$lo]":${results(lo)}%.0f,"local[$hi]":${results(hi)}%.0f,"efficiency":$eff%.3f}""")
  }
}
