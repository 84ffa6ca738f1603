package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.{functions => F}

import graft.ops.Dedup

/** Stage-by-stage decomposition of the expensive dedup queries (guide
  * §1.4: noop-sink isolation, labelled jobs): times each pipeline piece
  * of d_groups / d_simhash separately so the optimization target is a
  * measurement, not a guess.
  *
  * Run: `sbt "runMain graft.tools.Probe [sfDir]"`.
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
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

    def docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def nearDup: DataFrame = {
      val d = docs.select(F.col("doc_id"), F.col("text"))
      d.unionAll(d.select((F.col("doc_id") + 1000000).as("doc_id"),
        F.concat(F.col("text"), F.lit(" graft variant suffix")).as("text")))
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    def t[A](label: String)(body: => A): A = {
      spark.sparkContext.setJobDescription(label)
      val t0 = System.nanoTime()
      val r = body
      println(f"[probe] $label: ${(System.nanoTime() - t0) / 1e9}%.3f s")
      spark.sparkContext.setJobDescription(null)
      r
    }

    // warm-up
    noop(docs)

    (1 to 2).foreach { rep =>
      println(s"== bandPairs internals rep $rep ==")
      val d0w = docs.select(F.col("doc_id"), F.col("text"))
      val corpusW = nearDup.unionAll(d0w.select(
        (F.col("doc_id") + 3000000).as("doc_id"),
        F.concat(F.col("text"),
          F.lit(" graft variant suffix extra trailing words")).as("text")))
      val sigsW = Dedup.minhashSignatures(corpusW, "doc_id", "text", 64)
        .localCheckpoint()
      val bands = 32; val rows = 2
      val banded = sigsW.select(
        F.col("doc_id"),
        F.explode(F.array((0 until bands).map { b =>
          F.struct(F.lit(b).as("band"),
            F.xxhash64(F.slice(F.col("sig"), b * rows + 1, rows))
              .as("bhash"))
        }: _*)).as("bk"))
        .select(F.col("doc_id"),
          F.col("bk.band").as("band"), F.col("bk.bhash").as("bhash"))
      t("b1 banded noop") { noop(banded) }
      val sizes = banded.groupBy("band", "bhash").agg(
        F.count(F.lit(1)).as("_n"), F.min(F.col("doc_id")).as("_rep"))
        .filter(F.col("_n") >= 2)
      t("b2 sizes noop") { noop(sizes) }
      val dfn = banded.join(sizes, Seq("band", "bhash"))
      t("b3 dfn join noop") { noop(dfn) }
      t("b4 full bandPairs noop") {
        noop(Dedup.minhashBandPairs(sigsW, 64, 32))
      }

      println(s"== simhashCandidates internals rep $rep ==")
      val copiesW = d0w.select((F.col("doc_id") + 2000000).as("doc_id"),
        F.regexp_replace(F.col("text"), " ", "  ").as("text"))
      val scorpusW = nearDup.unionAll(copiesW)
      val hashed = t("sh1 simhash64+checkpoint") {
        scorpusW.select(F.col("doc_id").cast("string").as("doc_id"),
          Dedup.simhash64(F.col("text")).as("sh")).localCheckpoint()
      }
      val sbanded = hashed.select(
        F.col("doc_id"), F.col("sh"),
        F.explode(F.array((0 until 4).map { b =>
          F.struct(F.lit(b).as("band"),
            F.shiftright(F.col("sh"), b * 16).bitwiseAND(0xFFFFL)
              .as("chunk"))
        }: _*)).as("bk"))
        .select(F.col("doc_id"), F.col("sh"),
          F.col("bk.band").as("band"), F.col("bk.chunk").as("chunk"))
      t("sh2 bucketedPairs(sh) noop") {
        noop(Dedup.bucketedPairs(sbanded, Seq("band", "chunk"), "doc_id",
          Seq("sh"), 4096))
      }
      t("sh3 full candidates noop") {
        noop(Dedup.bucketedPairs(sbanded, Seq("band", "chunk"), "doc_id",
          Seq("sh"), 4096)
          .select(F.col("id_a"), F.col("id_b"),
            F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
              .as("hamming"))
          .groupBy("id_a", "id_b").agg(F.min("hamming").as("hamming"))
          .filter(F.col("hamming") <= 3))
      }

      println(s"== d_groups decomposition rep $rep ==")
      val d0 = docs.select(F.col("doc_id"), F.col("text"))
      val corpus = nearDup.unionAll(d0.select(
        (F.col("doc_id") + 3000000).as("doc_id"),
        F.concat(F.col("text"),
          F.lit(" graft variant suffix extra trailing words")).as("text")))
      val sigs = t("g1 signatures+checkpoint") {
        Dedup.minhashSignatures(corpus, "doc_id", "text", numHashes = 64)
          .localCheckpoint()
      }
      val cands = t("g2 bandPairs") {
        Dedup.minhashBandPairs(sigs, numHashes = 64, bands = 32)
          .localCheckpoint()
      }
      val pairs = t("g3 ngramJaccard verify") {
        Dedup.ngramJaccard(cands, corpus, "doc_id", "text", k = 5)
          .filter(F.col("jaccard") >= 0.8).localCheckpoint()
      }
      val (g, rounds) = t("g4 connected components") {
        val r = graft.ops.ConnectedComponents.groupsWithRounds(pairs)
        noop(r._1)
        r
      }
      println(s"[probe] cc rounds=$rounds pairs=${pairs.count()} " +
        s"groups=${g.count()}")
      // CC internals: replicate roots() with per-phase timing
      t("g4a cc total (replica)") {
        var edges = pairs
          .select(F.col("id_a").cast("string").as("u"),
            F.col("id_b").cast("string").as("v"))
          .filter(F.col("u") =!= F.col("v"))
          .select(F.greatest("u", "v").as("u"), F.least("u", "v").as("v"))
          .distinct()
          .localCheckpoint(eager = false)
        def fingerprint(e: DataFrame): (Long, Long) = {
          val r = e.select(F.xxhash64(F.col("u"), F.col("v")).as("_h"))
            .agg(F.count(F.lit(1)),
              F.coalesce(F.expr("bit_xor(_h)"), F.lit(0L))).head()
          (r.getLong(0), r.getLong(1))
        }
        def largeStar(e: DataFrame): DataFrame = {
          val bidir = e.select("u", "v")
            .unionByName(e.select(F.col("v").as("u"), F.col("u").as("v")))
            .repartition(F.col("u"))
          val mins = bidir.groupBy("u").agg(F.min("v").as("_mv"))
          bidir.join(mins, Seq("u"))
            .withColumn("m", F.least(F.col("_mv"), F.col("u")))
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").as("u"), F.col("m").as("v"))
            .filter(F.col("u") =!= F.col("v"))
        }
        def smallStar(e0: DataFrame): DataFrame = {
          val e = e0.repartition(F.col("u"))
          val mins = e.groupBy("u").agg(F.min("v").as("m"))
          val center = mins.select(F.col("u"), F.col("m").as("v"))
          val others = e.join(mins, Seq("u"))
            .filter(F.col("v") =!= F.col("m"))
            .select(F.col("v").as("u"), F.col("m").as("v"))
          center.unionByName(others)
            .filter(F.col("u") =!= F.col("v"))
            .distinct()
        }
        var fp = t("g4b initial distinct+fp")(fingerprint(edges))
        var converged = false
        var iter = 0
        while (!converged && iter < 10) {
          val next = smallStar(largeStar(edges))
            .localCheckpoint(eager = false)
          val nfp = t(s"g4c round ${iter + 1}")(fingerprint(next))
          converged = nfp == fp &&
            t("g4d exceptAll confirm")(next.exceptAll(edges).isEmpty)
          fp = nfp
          edges = next
          iter += 1
        }
        val assignment = edges.select(F.col("u").as("doc_id"),
          F.col("v").as("group_id"))
        t("g4e output assembly") {
          noop(assignment
            .unionByName(assignment.select(F.col("group_id").as("doc_id"),
              F.col("group_id")).distinct())
            .select(F.col("doc_id"), F.col("group_id"),
              (F.col("doc_id") === F.col("group_id")).as("keep")))
        }
      }

      println(s"== d_simhash decomposition rep $rep ==")
      val copies = d0.select((F.col("doc_id") + 2000000).as("doc_id"),
        F.regexp_replace(F.col("text"), " ", "  ").as("text"))
      val scorpus = nearDup.unionAll(copies)
      val scands = t("s1 simhashCandidates") {
        Dedup.simhashCandidates(scorpus, "doc_id", "text", maxHamming = 3)
          .localCheckpoint()
      }
      t("s2 fp verify (pruned)") {
        val candIds = scands.select(F.col("id_a").as("_cid"))
          .unionAll(scands.select(F.col("id_b").as("_cid"))).distinct()
        val fp = scorpus
          .join(F.broadcast(candIds),
            F.col("doc_id").cast("string") === F.col("_cid"), "left_semi")
          .select(F.col("doc_id").cast("string").as("_id"),
            F.md5(F.encode(F.regexp_replace(
              F.trim(F.lower(F.col("text"))), "\\s+", " "), "UTF-8"))
              .as("_fp"))
        noop(scands
          .join(fp.withColumnRenamed("_id", "id_a")
            .withColumnRenamed("_fp", "fp_a"), Seq("id_a"))
          .join(fp.withColumnRenamed("_id", "id_b")
            .withColumnRenamed("_fp", "fp_b"), Seq("id_b"))
          .filter(F.col("fp_a") === F.col("fp_b")))
      }
    }
    spark.stop()
  }
}
