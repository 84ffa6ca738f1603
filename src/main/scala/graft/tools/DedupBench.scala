package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.ops.{Dedup, TextAnalysis}

/**
 * Dedup-pipeline throughput probe: a seeded synthetic text corpus with
 * planted near-duplicates, timed through exact / MinHash+LSH / SimHash
 * dedup end-to-end. Prints one JSON line (docs/sec per stage).
 * Run: `sbt "runMain graft.tools.DedupBench [nDocs] [cpus]"`.
 *
 * Corpus shape: ~120-word documents from a 50k-word synthetic
 * vocabulary; every 10th document is a near-duplicate of its
 * predecessor (3 words appended) — so candidate volume stays realistic
 * (~10% dup rate) rather than degenerate.
 */
object DedupBench {
  def main(args: Array[String]): Unit = {
    val nDocs = args.headOption.map(_.toLong).getOrElse(200000L)
    val cpus = args.lift(1).getOrElse("32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-dedup-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", (8L << 20).toString)
      .config("spark.local.dir", graft.Scaling.localDir)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    // deterministic corpus, materialized to parquet so the timings
    // measure the dedup pipelines, not the generator
    val dir = s"/tmp/graft_dedup_bench/docs=$nDocs"
    if (!java.nio.file.Files.exists(java.nio.file.Paths.get(dir, "_SUCCESS"))) {
      spark.range(0L, nDocs, 1L, 64).map { boxed =>
        val i: Long = boxed
        val base: Long = if (i % 10 == 1) i - 1 else i // every 10th ~= predecessor
        val rnd = new scala.util.Random(base * 2654435761L)
        val words = Seq.fill(120)("w" + rnd.nextInt(50000))
        val text =
          if (i % 10 == 1) (words ++ Seq("near", "dup", "tail")).mkString(" ")
          else words.mkString(" ")
        (i.toString, text)
      }.toDF("doc_id", "text")
        .write.mode("overwrite").parquet(dir)
    }
    val docs = spark.read.parquet(dir)

    def time(what: String)(body: => Long): (String, Double, Long) = {
      val t0 = System.nanoTime()
      val n = body
      (what, (System.nanoTime() - t0) / 1e9, n)
    }

    // warm-up (JIT + codegen)
    Dedup.exactGroups(docs, "doc_id", "text").filter($"n_dups" > 1).count()

    var substrPairs: DataFrame = null
    var ccRounds = 0

    // scale knobs, printed with the results (no silent caps):
    //  - the ONE-SHOT minhash recomputes signatures for its verify join
    //    (the documented small-corpus convenience) — at ≥ 5M docs only
    //    the staged path (the 10^12 shape) is timed;
    //  - simhash 16-bit bands hold ~n/65536 CHANCE collisions each, so
    //    past ~3M docs the cap drops to 64 → strangers star-pair
    //    (linear) while true clusters stay fully paired (see
    //    Dedup.simhashCandidates scaladoc)
    val runOneShot = nDocs < 5000000L
    val simhashCap = if (nDocs >= 3000000L) 64 else 4096

    val results = Seq(
      time("exact") {
        Dedup.exactGroups(docs, "doc_id", "text")
          .filter($"n_dups" > 1).count()
      },
      time("minhash_lsh") {
        if (runOneShot)
          Dedup.minhashCandidates(docs, "doc_id", "text",
            numHashes = 64, bands = 16, minJaccard = 0.7).count()
        else -1L // skipped: staged path is the at-scale shape
      },
      // the 10^12-scale shape measured as the 10^12-scale shape:
      // signatures computed ONCE and materialized to a parquet staging
      // table; banding AND the verify join then read the staging table —
      // no signature recompute (vs the one-shot path above, which
      // rebuilds the signature plan for its verify join)
      time("minhash_staged") {
        val sigDir = s"/tmp/graft_dedup_bench/sigs=$nDocs"
        Dedup.minhashSignatures(docs, "doc_id", "text", numHashes = 64)
          .write.mode("overwrite").parquet(sigDir)
        val sigs = spark.read.parquet(sigDir)
        Dedup.minhashCandidatesFromSigs(sigs,
          numHashes = 64, bands = 16, minJaccard = 0.7).count()
      },
      // group assembly over the staged candidates: pairs → components
      time("cc_groups") {
        val sigs = spark.read.parquet(s"/tmp/graft_dedup_bench/sigs=$nDocs")
        val pairs = Dedup.minhashCandidatesFromSigs(sigs,
          numHashes = 64, bands = 16, minJaccard = 0.7)
        val (g, rounds) =
          graft.ops.ConnectedComponents.groupsWithRounds(pairs)
        ccRounds = rounds
        g.count()
      },
      time("simhash") {
        Dedup.simhashCandidates(docs, "doc_id", "text", maxHamming = 3,
          maxBucket = simhashCap).count()
      },
      // exact substring (shared 16-word-run) dedup: winnowed
      // fingerprints → capped pairing → exact run-hash intersect;
      // planted near-dups share their whole 120-word prefix, so each
      // planted pair must surface here too
      time("substr") {
        substrPairs = Dedup.substringPairs(docs, "doc_id", "text",
          runWords = 16, shingleK = 8).localCheckpoint()
        substrPairs.count()
      },
      // staged variant: gram artifacts materialized once to parquet,
      // pair detection reads the stage (no re-tokenization per branch)
      time("substr_staged") {
        val gramDir = s"/tmp/graft_dedup_bench/grams=$nDocs"
        Dedup.substringGrams(docs, "doc_id", "text",
          runWords = 16, shingleK = 8)
          .write.mode("overwrite").parquet(gramDir)
        Dedup.substringPairsFromGrams(
          spark.read.parquet(gramDir)).count()
      },
      time("decontam") {
        graft.ops.Decontaminate.contaminationHits(
          docs, "doc_id", "text",
          docs.filter(F.col("doc_id").cast("long") < 100).select("text"),
          "text", k = 8).count()
      },
      time("fingerprint_scan") {
        docs.select(TextAnalysis.fingerprint($"text").as("fp"))
          .agg(F.count(F.lit(1))).head(); nDocs
      })

    // planted-pair recall of the staged path: every i ≡ 1 (mod 10)
    // plants the pair (i-1, i); recall must be 1.0 on this corpus
    val expected = (nDocs - 2) / 10 + 1
    val plantedFound = {
      val sigs = spark.read.parquet(s"/tmp/graft_dedup_bench/sigs=$nDocs")
      val planted = spark.range(0L, nDocs).filter($"id" % 10 === 1)
        .select(($"id" - 1).cast("string").as("id_a"),
          $"id".cast("string").as("id_b"))
      Dedup.minhashCandidatesFromSigs(sigs,
          numHashes = 64, bands = 16, minJaccard = 0.7)
        .join(planted, Seq("id_a", "id_b"), "left_semi").count()
    }
    val recall = plantedFound.toDouble / expected

    // substring-dedup recall on the same planted pairs (each shares its
    // predecessor's full 120-word prefix, far beyond the 16-word run)
    val substrRecall = {
      val planted = spark.range(0L, nDocs).filter($"id" % 10 === 1)
        .select(($"id" - 1).cast("string").as("id_a"),
          $"id".cast("string").as("id_b"))
      substrPairs.join(planted, Seq("id_a", "id_b"), "left_semi")
        .count().toDouble / expected
    }

    val fields = results.map {
      // a skipped stage must not print a fabricated rate — the same
      // plausible-number-for-a-dead-stage defect Bench.measureQueries
      // fixed this round
      case (w, _, -1L) => s""""$w":{"skipped":true}"""
      case (w, secs, found) =>
        f""""$w":{"sec":$secs%.2f,"docs_per_sec":${nDocs / secs}%.0f,"found":$found}"""
    }.mkString(",")
    println(f"""{"dedup_bench":{"n_docs":$nDocs,"cpus":$cpus,$fields,"planted_recall":$recall%.4f,"substr_recall":$substrRecall%.4f,"cc_rounds":$ccRounds,"one_shot_skipped":${!runOneShot},"simhash_bucket_cap":$simhashCap}}""")
    spark.stop()
  }
}
