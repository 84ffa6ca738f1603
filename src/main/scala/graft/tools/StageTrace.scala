package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.ops.Dedup

/** Per-stage wall/task-time trace of the d_groups body (scratch). */
object StageTrace {
  def main(args: Array[String]): Unit = {
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
    val sfDir = "/root/testdata/sf0.1"
    @volatile var trace = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        if (trace) {
          val si = sc.stageInfo
          val wall = for {
            s <- si.submissionTime; c <- si.completionTime
          } yield c - s
          println(f"[stage] id=${si.stageId} tasks=${si.numTasks} " +
            f"wall=${wall.getOrElse(-1L)}ms name=${si.name.take(60)}")
        }
    })
    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def corpus: DataFrame = {
      val d = docs.select(F.col("doc_id"), F.col("text"))
      val near = d.unionAll(d.select((F.col("doc_id") + 1000000).as("doc_id"),
        F.concat(F.col("text"), F.lit(" graft variant suffix")).as("text")))
      near.unionAll(d.select(
        (F.col("doc_id") + 3000000).as("doc_id"),
        F.concat(F.col("text"),
          F.lit(" graft variant suffix extra trailing words")).as("text")))
    }
    def body(): Long = {
      val in = if (args.contains("spread"))
        corpus.repartition(spark.sparkContext.defaultParallelism,
          F.col("doc_id")) else corpus
      val sg = Dedup.minhashSignaturesWithGrams(in, "doc_id", "text",
        numHashes = 64, shingleK = 5).localCheckpoint()
      val cands = Dedup.minhashBandPairs(sg, numHashes = 64, bands = 32)
      val pairs = Dedup.ngramJaccardFromGrams(cands, sg)
        .filter(F.col("jaccard") >= 0.8)
      graft.ops.ConnectedComponents.groups(pairs).count()
    }
    body(); body() // warm
    trace = true
    val t0 = System.nanoTime()
    body()
    println(f"[total] ${(System.nanoTime() - t0) / 1e9}%.3f s")
    spark.stop()
  }
}
