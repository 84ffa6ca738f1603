package graft.tools

import org.apache.spark.sql.SparkSession

/** Time a single `SparkEntry.queries` entry without paying for the full
  * Bench sweep — the per-operator iteration loop ("did that plan change
  * help?"). Runs `reps` timed passes after one warm-up and prints every
  * rep plus the median.
  *
  * Run: `sbt "runMain graft.tools.QueryTime <name> [reps] [sfDir]"`.
  */
object QueryTime {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse(
      sys.error("usage: QueryTime <queryName> [reps] [sfDir]"))
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val sfDir = args.drop(2).headOption.getOrElse("/root/testdata/sf0.1")
    val q = graft.SparkEntry.queries.getOrElse(name,
      sys.error(s"unknown query '$name'; known: " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", ")))
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
      .config("spark.local.dir", graft.Scaling.localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(): Double = {
      val t0 = System.nanoTime()
      q(spark, sfDir).queryExecution.toRdd.count()
      (System.nanoTime() - t0) / 1e9
    }
    if (sys.env.contains("GRAFT_QT_EXPLAIN"))
      q(spark, sfDir).explain("formatted")
    once() // warm-up: JIT + codegen + file-index caches
    val times = (1 to reps).map(_ => once())
    val med = times.sorted.apply(times.size / 2)
    println(f"[querytime] $name reps=${times.map(t => f"$t%.3f").mkString(",")} median=$med%.3f s")
    spark.stop()
  }
}
