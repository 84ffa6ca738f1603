package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.ops.Dedup

/** Interleaved A/B of query-body variants under the Bench action
  * (`df.count()`), same JVM, alternating so ambient drift hits both
  * arms equally. Scratch harness for optimization decisions.
  *
  * Run: `sbt "runMain graft.tools.AB [reps] [sfDir]"`. */
object AB {
  def main(args: Array[String]): Unit = {
    val reps = args.headOption.map(_.toInt).getOrElse(4)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
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
    val spreadN = spark.sparkContext.defaultParallelism

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def nearDup: DataFrame = {
      val d = docs.select(F.col("doc_id"), F.col("text"))
      d.unionAll(d.select((F.col("doc_id") + 1000000).as("doc_id"),
        F.concat(F.col("text"), F.lit(" graft variant suffix")).as("text")))
    }
    // d_minhash body, signature input selectable
    def minhashQ(sigInput: DataFrame): DataFrame = {
      val corpus = nearDup
      val sigs = Dedup.minhashSignatures(sigInput, "doc_id", "text",
        numHashes = 64).localCheckpoint()
      val cands = Dedup.minhashBandPairs(sigs, numHashes = 64, bands = 32)
      Dedup.ngramJaccard(cands, corpus, "doc_id", "text", k = 5)
        .filter(F.col("jaccard") >= 0.8)
        .select("id_a", "id_b", "jaccard")
        .orderBy("id_a", "id_b")
    }
    def armB(): DataFrame = minhashQ(nearDup)
    def armC(): DataFrame =
      minhashQ(nearDup.repartition(spreadN, F.col("doc_id")))
    def time(mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      mk().count()
      (System.nanoTime() - t0) / 1e9
    }
    time(armB); time(armC) // warm both
    val bs = Seq.newBuilder[Double]; val cs = Seq.newBuilder[Double]
    (1 to reps).foreach { _ => bs += time(armB); cs += time(armC) }
    val b = bs.result(); val c = cs.result()
    println(f"[ab] B(plain sigs)  reps=${b.map(t => f"$t%.3f").mkString(",")} median=${graft.Scaling.median(b)}%.3f")
    println(f"[ab] C(spread sigs) reps=${c.map(t => f"$t%.3f").mkString(",")} median=${graft.Scaling.median(c)}%.3f")
    spark.stop()
  }
}
