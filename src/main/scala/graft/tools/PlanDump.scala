package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dump `.explain("formatted")` for named `SparkEntry.queries` entries
  * to `<outDir>/<query>_<tag>.txt` — the before/after plan evidence an
  * optimization round commits alongside its bench numbers. Uses the
  * Bench session config so the plans (AQE, shuffle partitions, split
  * sizes) are the ones the driver's bench actually runs.
  *
  * Run: `sbt "runMain graft.tools.PlanDump q1,q2,... <tag> [outDir] [sfDir]"`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args.headOption match {
      case Some("all") | None => graft.SparkEntry.queries.keys.toSeq.sorted
      case Some(csv)          => csv.split(",").toSeq
    }
    val tag = args.lift(1).getOrElse("before")
    val outDir = args.lift(2).getOrElse("plans/r06")
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
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
    Files.createDirectories(Paths.get(outDir))
    names.foreach { n =>
      val df = graft.SparkEntry.queries(n)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(outDir, s"${n}_$tag.txt"), txt)
      println(s"[plandump] wrote $outDir/${n}_$tag.txt")
    }
    spark.stop()
  }
}
