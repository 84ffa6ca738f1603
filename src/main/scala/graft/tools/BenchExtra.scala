package graft.tools

import org.apache.spark.sql.SparkSession

/** Per-query timing for a SUBSET of `SparkEntry.queries`, with exactly
  * the frozen Bench methodology (same session config, same warm-up
  * query, same `df.count()` action, 3-rep median via
  * `Bench.measureQueries`) — the iteration loop for optimization rounds
  * without paying for the headline + full 41-query sweep. The guide's
  * §1.4 noop-sink isolation lives in [[QueryTime]] (`toRdd.count()`);
  * this tool exists to predict the DRIVER's numbers, so it keeps the
  * driver's action.
  *
  * Run: `sbt "runMain graft.tools.BenchExtra q1,q2,... [reps] [sfDir]"`.
  */
object BenchExtra {
  def main(args: Array[String]): Unit = {
    val names = args.headOption match {
      case Some("all") | None => graft.SparkEntry.queries.keys.toSeq.sorted
      case Some(csv)          => csv.split(",").toSeq
    }
    val reps = args.lift(1).map(_.toInt).getOrElse(3)
    val sfDir = args.lift(2).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
      .config("spark.local.dir", graft.Scaling.localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val load0 = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    try graft.SparkEntry.queries("t_tokens")(spark, sfDir).count()
    catch { case _: Throwable => () }
    val subset = names.map(n => n -> graft.SparkEntry.queries(n)).toMap
    val results = graft.Bench.measureQueries(spark, sfDir, subset, reps)
    results.foreach {
      case (n, _, _, Some(e)) => println(s"[benchextra] $n ERROR $e")
      case (n, med, ts, None) =>
        println(f"[benchextra] $n reps=${
          ts.map(t => f"$t%.3f").mkString(",")} median=$med%.3f s")
    }
    val total = results.collect { case (_, v, _, None) => v }.sum
    val load1 = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean.getSystemLoadAverage
    println(f"[benchextra] total=$total%.3f s load_1m=$load0%.2f->$load1%.2f")
    spark.stop()
  }
}
