package graft

import org.apache.spark.sql.{functions => F}
import graft.ops.{Dedup, MediaContainers, Multimodal, Similarity, TextAnalysis}

/** Training-pipeline operators: dedup family, similarity search, text
  * analysis, multimodal plumbing — each verified against hand-computable
  * oracles on tiny deterministic data. */
class OpsSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    ("d1", "the quick brown fox jumps over the lazy dog near the river bank today"),
    ("d2", "the quick brown fox jumps over the lazy dog near the river bank today"), // exact dup of d1
    ("d3", "the quick brown fox jumps over the lazy dog near the river bank tonight"), // near dup
    ("d4", "completely different text about spark catalyst optimizer internals and planning"),
    ("d5", "THE QUICK  brown fox jumps over the lazy dog near the river bank today!")) // formatting dup of d1
    .toDF("id", "text")

  test("exact dedup groups formatting-equivalent texts") {
    val groups = Dedup.exactGroups(docs, "id", "text")
    val dupGroup = groups.filter($"n_dups" > 1).collect()
    assert(dupGroup.length == 1)
    assert(dupGroup(0).getAs[Long]("n_dups") == 3) // d1, d2, d5
    assert(dupGroup(0).getAs[String]("keep_id") == "d1")
  }

  test("combined (sig, grams) staging matches the two-pass pipeline") {
    // minhashSignaturesWithGrams + minhashBandPairs + ngramJaccardFromGrams
    // must emit the exact pair set of the one-shot candidates + the
    // text-joining ngramJaccard verify (same shingle size)
    val docs = (0 until 40).map { i =>
      val base = s"alpha bravo charlie delta echo foxtrot golf hotel " +
        s"india juliet kilo lima mike november oscar papa token$i"
      Seq((s"d$i", base), (s"n$i", base + " neardup"))  // J = 13/14
    }.flatten.toDF("id", "text")
    val sg = Dedup.minhashSignaturesWithGrams(docs, "id", "text",
      numHashes = 64, shingleK = 5).localCheckpoint()
    val combined = Dedup.ngramJaccardFromGrams(
        Dedup.minhashBandPairs(sg, numHashes = 64, bands = 32), sg)
      .filter(F.col("jaccard") >= 0.8)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    val cands = Dedup.minhashCandidates(docs, "id", "text",
        numHashes = 64, bands = 32, minJaccard = 0.0)
      .select("id_a", "id_b")
    val twoPass = Dedup.ngramJaccard(cands, docs, "id", "text", k = 5)
      .filter(F.col("jaccard") >= 0.8)
      .select("id_a", "id_b", "jaccard").collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2))).toSet
    assert(combined == twoPass)
    assert(combined.nonEmpty)
    // every planted (d_i, n_i) pair is found
    assert((0 until 40).forall(i =>
      combined.exists(p => p._1 == s"d$i" && p._2 == s"n$i")))
  }

  test("minhash LSH finds exact and near dups, not unrelated docs") {
    val cands = Dedup.minhashCandidates(docs, "id", "text",
      numHashes = 64, bands = 16, minJaccard = 0.5)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(cands.contains(("d1", "d2")))
    assert(cands.exists(p => p._1 == "d1" && p._2 == "d3") ||
      cands.exists(p => p._1 == "d2" && p._2 == "d3"))
    assert(!cands.exists(p => p._1 == "d4" || p._2 == "d4"))
  }

  test("simhash: identical texts collide, near texts within hamming 3") {
    val pairs = Dedup.simhashCandidates(docs, "id", "text", maxHamming = 8)
      .collect().map(r => ((r.getString(0), r.getString(1)),
        r.getAs[Int]("hamming"))).toMap
    assert(pairs(("d1", "d2")) == 0)
    assert(pairs.get(("d1", "d3")).exists(_ <= 8))
    assert(!pairs.keySet.exists(p => p._1 == "d4" || p._2 == "d4"))
  }

  test("degenerate bucket: 10k identical docs stay LINEAR (star pairs)") {
    // boilerplate-heavy corpora collapse many docs into one LSH bucket;
    // uncapped all-pairs would be ~50M rows here — the cap must route
    // oversized buckets to star pairs around the representative
    val n = 10000
    val boiler = spark.range(n).selectExpr(
      "concat('doc-', format_string('%05d', id)) as id",
      "'exactly the same boilerplate text repeated in every document of this corpus' as text")
    val pairs = Dedup.minhashCandidates(boiler, "id", "text",
      numHashes = 64, bands = 16, minJaccard = 0.5, maxBucket = 256)
    val cnt = pairs.count()
    // star shape: every doc pairs with the min-id representative once
    assert(cnt == (n - 1).toLong, s"expected linear output, got $cnt")
    assert(pairs.filter($"id_a" === "doc-00000").count() == (n - 1).toLong)
  }

  test("IVF index: probe scan prunes to the probed cells' files") {
    import graft.ops.Ivf
    // 8 one-hot centroids; corpus vectors sit exactly on them, so cell
    // assignment is unambiguous and the probe set is known in advance
    val dim = 8
    val centroids = (0 until 8).map { j =>
      Array.tabulate(dim)(i => if (i == j) 1.0 else 0.0)
    }.toArray
    val corpus = spark.range(64).selectExpr(
      "cast(id as string) as vec_id",
      s"transform(sequence(0, ${dim - 1}), " +
        "i -> case when i = cast(id % 8 as int) then 1.0 " +
        "else cast(id as double) / 1000.0 end) as v")
    val dir = java.nio.file.Files
      .createTempDirectory("graft_ivf").toString + "/index"
    Ivf.writeIndex(corpus, "vec_id", "v", centroids, dir)

    // query = e0, nprobe 2 → probes cells {0, 1} (dot ties break by cell)
    val q = Seq(("q0", (0 until dim).map(i =>
      if (i == 0) 1.0 else 0.0))).toDF("vec_id", "v")
    val res = Ivf.topKFromIndex(spark, q, dir, "vec_id", "v", k = 3,
      centroids, nprobe = 2)
    // execute THIS QueryExecution (count() would plan a separate one and
    // leave res's scan metrics untouched)
    val resRows = res.collect()
    assert(resRows.nonEmpty)

    // the scan carries the static partition filter on cell…
    val plan = res.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("cell#") && plan.contains("IN (0,1)"),
      plan.take(3000))
    // …and the numFiles metric proves FILE-LEVEL pruning: only the two
    // probed cells' files were listed and read
    import graft.tools.PlanWalk.{fileScans => scans}
    def countFiles(sub: String): Long = {
      val d = new java.io.File(dir, sub)
      d.listFiles((_, n) => n.endsWith(".parquet")).length.toLong
    }
    val readFiles =
      scans(res.queryExecution.executedPlan).map(_.metrics("numFiles").value).sum
    val probedFiles = countFiles("cell=0") + countFiles("cell=1")
    val allFiles = (0 until 8).map(c => countFiles(s"cell=$c")).sum
    assert(readFiles == probedFiles && probedFiles < allFiles,
      s"read=$readFiles probed=$probedFiles all=$allFiles")

    // same answer as the in-session join path on identical inputs
    val direct = Ivf.topK(q, corpus, "vec_id", "v", k = 3,
      centroids, nprobe = 2)
    assert(res.collect().toSet == direct.collect().toSet)
  }

  test("connected components: chains close transitively in O(log n)") {
    import graft.ops.ConnectedComponents
    // path graph of 65 nodes: plain label propagation needs 64 rounds;
    // the large-star/small-star alternation must converge well inside 12
    val chain = spark.range(64).selectExpr(
      "format_string('n%03d', id) as id_a",
      "format_string('n%03d', id + 1) as id_b")
    val g1 = ConnectedComponents.groups(chain, maxIter = 12)
    assert(g1.count() == 65)
    assert(g1.filter($"group_id" =!= "n000").isEmpty)
    assert(g1.filter($"keep").select("doc_id").as[String]
      .collect().toSeq == Seq("n000"))

    // two components; group_id is each component's min id
    val pairs = Seq(("b", "a"), ("c", "b"), ("z", "y"))
      .toDF("id_a", "id_b")
    val g2 = ConnectedComponents.groups(pairs).collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2)))
      .toMap
    assert(g2 == Map(
      "a" -> (("a", true)), "b" -> (("a", false)), "c" -> (("a", false)),
      "y" -> (("y", true)), "z" -> (("y", false))))

    // empty pair table → empty assignment, no crash
    assert(ConnectedComponents.groups(
      Seq.empty[(String, String)].toDF("id_a", "id_b")).isEmpty)
  }

  test("connected components: totalAssignment covers singletons") {
    import graft.ops.ConnectedComponents
    // corpus with documents that appear in NO pair: the total
    // assignment makes them their own kept group — API, not caller
    // folklore (round-3 verdict's foot-gun)
    val corpus = Seq("a", "b", "c", "lonely1", "lonely2").toDF("id")
    val pairs = Seq(("b", "a"), ("c", "b")).toDF("id_a", "id_b")
    val total = ConnectedComponents.totalAssignment(corpus, "id", pairs)
      .collect()
      .map(r => r.getString(0) -> (r.getString(1), r.getBoolean(2)))
      .toMap
    assert(total == Map(
      "a" -> (("a", true)), "b" -> (("a", false)), "c" -> (("a", false)),
      "lonely1" -> (("lonely1", true)), "lonely2" -> (("lonely2", true))))
  }

  test("connected components: 10k-star dedup group stays one group") {
    import graft.ops.ConnectedComponents
    // the shape bucketedPairs emits for a degenerate bucket: star pairs
    // around the min-id representative — CC must resolve it to a single
    // keep/drop group with linear work
    val n = 10000
    val star = spark.range(1, n).selectExpr(
      "'doc-00000' as id_a",
      "concat('doc-', format_string('%05d', id)) as id_b")
    val g = ConnectedComponents.groups(star)
    assert(g.count() == n.toLong)
    assert(g.filter($"group_id" =!= "doc-00000").isEmpty)
    assert(g.filter($"keep").count() == 1L)
  }

  test("decontamination: shingle overlap with a benchmark set") {
    import graft.ops.Decontaminate
    val bench = Seq(Tuple1(
      "the quick brown fox jumps over the lazy dog near the river bank today"))
      .toDF("text")
    val hits = Decontaminate.contaminationHits(
        docs, "id", "text", bench, "text", k = 2)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getInt(2), r.getDouble(3))).toMap
    // exact copies are fully contained
    assert(hits("d1")._3 == 1.0 && hits("d2")._3 == 1.0)
    assert(hits("d5")._3 > 0.8) // formatting dup: most shingles shared
    assert(hits("d3")._3 > 0.5 && hits("d3")._3 < 1.0) // near dup
    assert(!hits.contains("d4")) // unrelated: zero hits, not emitted
  }

  test("ngram jaccard verifies candidates exactly") {
    val pairs = Seq(("d1", "d2"), ("d1", "d3"), ("d1", "d4"))
      .toDF("id_a", "id_b")
    val j = Dedup.ngramJaccard(pairs, docs, "id", "text", k = 3)
      .collect().map(r => ((r.getAs[String]("id_a"),
        r.getAs[String]("id_b")), r.getAs[Double]("jaccard"))).toMap
    assert(j(("d1", "d2")) == 1.0)
    assert(j(("d1", "d3")) > 0.7 && j(("d1", "d3")) < 1.0)
    assert(j(("d1", "d4")) == 0.0)
  }

  private def vec(xs: Double*): Array[Float] = xs.map(_.toFloat).toArray
  private val vecs = Seq(
    ("v1", vec(1, 0, 0, 0)),
    ("v2", vec(0.99, 0.1, 0, 0)),   // ~v1
    ("v3", vec(0, 1, 0, 0)),
    ("v4", vec(0, 0.98, 0.15, 0)),  // ~v3
    ("v5", vec(-1, 0, 0, 0)))       // opposite of v1
    .toDF("id", "embedding")

  test("brute-force cosine top-k matches hand-computed neighbors") {
    val knn = Similarity.cosineTopK(
      vecs.filter($"id" === "v1"), vecs, "id", "embedding", k = 2)
      .orderBy("rank").collect()
    assert(knn(0).getAs[String]("neighbor_id") == "v2")
    assert(knn(0).getAs[Double]("cosine") > 0.99)
    assert(knn(1).getAs[String]("neighbor_id") != null)
    assert(knn.last.getAs[String]("neighbor_id") != "v5")
  }

  test("LSH top-k recalls the brute-force nearest neighbor") {
    val brute = Similarity.cosineTopK(vecs, vecs, "id", "embedding", 1)
      .select("query_id", "neighbor_id").as[(String, String)]
      .collect().toMap
    val approx = Similarity.lshTopK(vecs, vecs, "id", "embedding",
      k = 1, dim = 4, planes = 6)
      .select("query_id", "neighbor_id").as[(String, String)]
      .collect().toMap
    // nearest neighbor of every vector recovered (tiny set, multi-probe)
    assert(approx("v1") == brute("v1"))
    assert(approx("v3") == brute("v3"))
  }

  test("IVF: kmeans quantizer + cell-probed search recalls brute top-1") {
    import graft.ops.Ivf
    val brute = Similarity.cosineTopK(vecs, vecs, "id", "embedding", 1)
      .select("query_id", "neighbor_id").as[(String, String)]
      .collect().toMap
    val cents = Ivf.fitKMeans(vecs, "embedding", k = 2, seed = 7L)
    assert(cents.length == 2 && cents.forall(_.length == 4))
    // normalized centroids
    cents.foreach { c =>
      assert(math.abs(c.map(x => x * x).sum - 1.0) < 1e-9)
    }
    val got = Ivf.topK(vecs, vecs, "id", "embedding", k = 1,
        centroids = cents, nprobe = 2)
      .select("query_id", "neighbor_id").as[(String, String)]
      .collect().toMap
    assert(got("v1") == brute("v1"))
    assert(got("v3") == brute("v3"))

    // deterministic quantizer: first-k rows, normalized
    val seeded = Ivf.centroidsFromRows(vecs, "id", "embedding", 2)
    assert(seeded.length == 2)
    assert(math.abs(seeded(0).map(x => x * x).sum - 1.0) < 1e-9)
    val got2 = Ivf.topK(vecs, vecs, "id", "embedding", k = 1,
        centroids = seeded, nprobe = 2)
      .select("query_id", "neighbor_id").as[(String, String)]
      .collect().toMap
    assert(got2("v1") == brute("v1"))
  }

  test("embedding near-dup finds the planted close pair only") {
    val pairs = Dedup.embeddingNearDup(vecs, "id", "embedding", dim = 4,
      minCosine = 0.95, planes = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("v1", "v2")))
    assert(pairs.contains(("v3", "v4")))
    assert(pairs.size == 2)
  }

  test("bucketedPairs: all pairs under the cap, star pairs above it") {
    val rows = Seq(
      ("b1", "a"), ("b1", "b"), ("b1", "c"),                   // small: 3 pairs
      ("b2", "p"), ("b2", "q"), ("b2", "r"), ("b2", "s"), ("b2", "t"))
      .toDF("bucket", "id").withColumn("pl", F.lit(1))
    val pairs = Dedup.bucketedPairs(rows, Seq("bucket"), "id",
        Seq("pl"), maxBucket = 3)
      .select("id_a", "id_b").as[(String, String)].collect().toSet
    // b1 (size 3 ≤ cap): all 3 pairs
    assert(pairs.intersect(Set(("a","b"),("a","c"),("b","c"))).size == 3)
    // b2 (size 5 > cap): star around rep "p" — exactly 4 pairs, no q-r etc.
    assert(pairs.filter(_._1 == "p") == Set(("p","q"),("p","r"),("p","s"),("p","t")))
    assert(!pairs.contains(("q", "r")))
    assert(pairs.size == 7)
  }

  test("codegen vector ops match the higher-order formulation") {
    import graft.functions.{CosineSim, DotProduct, HyperplaneBucket}
    val two = vecs.select($"id", $"embedding".cast("array<double>").as("v"))
      .crossJoin(vecs.select($"id".as("id2"),
        $"embedding".cast("array<double>").as("w")))
      .filter($"id" < $"id2")
    val got = two.select($"id", $"id2",
      DotProduct($"v", $"w").as("dot"),
      CosineSim($"v", $"w").as("cos"),
      F.aggregate(F.zip_with($"v", $"w", (x, y) => x * y),
        F.lit(0.0), (acc, x) => acc + x).as("dot_ref"))
      .collect()
    got.foreach { r =>
      assert(math.abs(r.getDouble(2) - r.getDouble(4)) < 1e-12,
        s"${r.getString(0)}-${r.getString(1)}")
    }
    val c12 = got.find(r => r.getString(0) == "v1" && r.getString(1) == "v2")
      .get.getDouble(3)
    assert(math.abs(c12 - 0.99 / math.sqrt(0.99 * 0.99 + 0.01)) < 1e-9)

    // HyperplaneBucket = sign bits of the same seeded plane dots
    val planes = HyperplaneBucket.planesFor(4, 6, 42L)
    val expected = vecs.collect().map { r =>
      val v = r.getSeq[Float](1).map(_.toDouble)
      r.getString(0) -> planes.zipWithIndex.map { case (p, i) =>
        if (p.zip(v).map { case (a, b) => a * b }.sum >= 0) 1L << i else 0L
      }.reduce(_ | _)
    }.toMap
    val gotB = vecs.select($"id",
        HyperplaneBucket($"embedding", 4, 6, 42L).as("b"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(gotB == expected)
  }

  test("ArrayEqualCount matches the zip_with formulation") {
    import graft.functions.ArrayEqualCount
    val df = Seq(
      (Seq(1L, 2L, 3L, 4L), Seq(1L, 9L, 3L, 4L)), // 3 equal
      (Seq(1L, 2L), Seq(1L, 2L)),                 // 2 equal
      (Seq.empty[Long], Seq.empty[Long]))         // 0
      .toDF("a", "b")
    val got = df.select(
      ArrayEqualCount($"a", $"b").as("fast"),
      F.size(F.filter(F.zip_with($"a", $"b", (x, y) => x === y),
        e => e)).as("ref")).collect()
    got.foreach(r => assert(r.getInt(0) == r.getInt(1)))
    // length mismatch → null, never a wrong count
    val mism = Seq((Seq(1L, 2L), Seq(1L, 2L, 3L))).toDF("a", "b")
    assert(mism.select(ArrayEqualCount($"a", $"b")).head().isNullAt(0))
  }

  test("token counting: whitespace and subword") {
    val df = Seq(("a", "hello world  foo"), ("b", ""), ("c", "  "),
      ("d", "don't stop-me now2"))
      .toDF("id", "text")
      .withColumn("n", TextAnalysis.tokenCount($"text"))
      .withColumn("sub", TextAnalysis.subwordCount($"text"))
    val m = df.select("id", "n", "sub").collect()
      .map(r => r.getString(0) -> (r.getInt(1), r.getInt(2))).toMap
    assert(m("a") == ((3, 3)))
    assert(m("b")._1 == 0 && m("c")._1 == 0)
    assert(m("d")._1 == 3)
    assert(m("d")._2 == 8) // don ' t stop - me now 2
  }

  test("quality score separates clean text from garbage") {
    val df = Seq(
      ("clean", "the quick brown fox jumps over the lazy dog and runs to the forest"),
      ("garbage", "@@@@ ### !!!! $$$$ %%%% ^^^^ &&&& **** (((( ))))"),
      ("digits", "123 456 789 012 345 678 901 234 567 890 111 222"))
      .toDF("id", "text")
    val scores = TextAnalysis.qualityScore(df, "text")
      .select("id", "quality_score").collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(scores("clean") > 0.8)
    assert(scores("garbage") < 0.4)
    assert(scores("digits") < scores("clean"))
  }

  test("language id picks the marker-dominant language") {
    val df = Seq(
      ("en", "the cat and the dog are in the house with the mouse"),
      ("de", "der hund und die katze sind nicht in der küche mit einem ball"),
      ("fr", "le chat est dans la maison avec les enfants pour une heure"),
      ("es", "el perro y la gata son una familia en la casa del pueblo"),
      ("und", "zxcvb qwerty asdfgh"))
      .toDF("expected", "text")
      .withColumn("got", TextAnalysis.langId($"text"))
    assert(df.filter($"expected" === $"got").count() == 5)
  }

  test("fingerprint is formatting-invariant, shingles order-sensitive") {
    val fp = docs.withColumn("fp", TextAnalysis.fingerprint($"text"))
      .select("id", "fp").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(fp("d1") == fp("d2"))
    assert(fp("d1") == fp("d5")) // case/punct/space-normalized
    assert(fp("d1") != fp("d3"))
  }

  test("image headers: real PNG/JPEG/GIF byte parsing") {
    import graft.ops.ImageHeaders
    import graft.ops.ImageHeaders.Dims

    val png = ImageHeaders.buildPng(300, 200)
    assert(png.length == 45)
    // spec layout: BE u32 width at offset 16 (300 = 0x012C)
    assert((png(16) & 0xff, png(17) & 0xff, png(18) & 0xff,
      png(19) & 0xff) == ((0, 0, 1, 0x2c)))
    assert(ImageHeaders.parse(png).contains(Dims("png", 300, 200)))

    assert(ImageHeaders.parse(ImageHeaders.buildJpeg(640, 480))
      .contains(Dims("jpeg", 640, 480)))

    // hand-assembled JPEG: SOI, COM segment, then PROGRESSIVE SOF2 —
    // exercises the segment walk and non-SOF0 frame markers
    val jpeg = Array(
      0xff, 0xd8,                                     // SOI
      0xff, 0xfe, 0x00, 0x06, 'a', 'b', 'c', 'd',     // COM len 6
      0xff, 0xc2, 0x00, 0x0b, 0x08,                   // SOF2 len 11, prec 8
      0x01, 0xe0,                                     // height 480
      0x02, 0x80,                                     // width 640
      0x01, 0x01, 0x11, 0x00                          // 1 component
    ).map(_.toByte)
    assert(ImageHeaders.parse(jpeg).contains(Dims("jpeg", 640, 480)))

    val gif = ("GIF89a".getBytes("US-ASCII") ++
      Array(0x40, 0x01, 0xf0, 0x00).map(_.toByte))    // 320 × 240 LE
    assert(ImageHeaders.parse(gif).contains(Dims("gif", 320, 240)))

    // garbage / truncated payloads parse to None, never throw
    assert(ImageHeaders.parse(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageHeaders.parse(png.take(20)).isEmpty)
    assert(ImageHeaders.parse(Array.fill[Byte](64)(0x41)).isEmpty)
  }

  test("media containers: real WAV/MP4 header parsing") {
    import graft.ops.MediaContainers
    import graft.ops.MediaContainers.{Mp4Info, WavInfo}

    val wav = MediaContainers.buildWav(8000, 2, 16, 25)
    assert(wav.length == 44 + 16 * 2 * 25) // header + byteRate·ms/1000
    assert(MediaContainers.parseWav(wav)
      .contains(WavInfo(8000, 2, 16, 25)))
    // canonical RIFF layout: sample rate LE at offset 24
    assert((wav(24) & 0xff) == 0x40 && (wav(25) & 0xff) == 0x1f) // 8000

    val mp4 = MediaContainers.buildMp4(2750)
    assert(mp4.length == 132)
    assert(MediaContainers.parseMp4(mp4).contains(Mp4Info(1000, 2750)))
    // non-1000 timescale: duration converts to ms
    assert(MediaContainers.parseMp4(MediaContainers.buildMp4(2000, 600))
      .contains(Mp4Info(600, 2000)))

    // sample table + media data: stsz parsed, frames addressable
    val sizes = Seq(10, 20, 15)
    val framed = MediaContainers.buildMp4(1000, 1000, sizes,
      frameByte = i => 100 + i)
    assert(framed.length == 192 + 4 * 3 + sizes.sum)
    val info = MediaContainers.parseMp4(framed).get
    assert(info.durationMs == 1000 && info.frameSizes == sizes)
    assert(info.mdatOffset == framed.length - sizes.sum)
    // every 2nd frame sampled: frames 0 and 2, with REAL byte access
    val sampled = MediaContainers.sampleFrames(framed, info, 2)
    assert(sampled == Seq((0, info.mdatOffset, 10, 100),
      (2, info.mdatOffset + 30, 15, 102)))
    // the addressed byte really is the frame's fill byte
    assert((framed(info.mdatOffset + 30) & 0xff) == 102)

    // garbage and truncation parse to None, never throw
    assert(MediaContainers.parseWav(Array[Byte](1, 2, 3)).isEmpty)
    assert(MediaContainers.parseWav(wav.take(40)).isEmpty)
    assert(MediaContainers.parseMp4(mp4.take(20)).isEmpty)
    assert(MediaContainers.parseMp4(Array.fill[Byte](64)(0x7f)).isEmpty)

    // real PCM frame decode: square wave ±A → RMS == peak == A exactly
    val loud = MediaContainers.buildWav(8000, 2, 16, 20, amplitude = 1234)
    val pcm = MediaContainers.parseWavPcm(loud).get
    assert(pcm.rms == 1234.0 && pcm.peak == 1234)
    assert(pcm.nFrames == 160L) // 8000 Hz × 20 ms
    assert(MediaContainers.parseWavPcm(wav).get.rms == 0.0) // silence
    // non-16-bit payloads: headers parse, PCM decode declines
    val w8 = MediaContainers.buildWav(8000, 1, 8, 10)
    assert(MediaContainers.parseWavPcm(w8).isEmpty)

    // adversarial unsigned chunk length (0xFFFFFFF8): truncated to Int
    // this is -8, making the old chunk-walk step ZERO — an infinite
    // loop pinning an executor task. Must terminate with None.
    val evil = MediaContainers.buildWav(8000, 1, 16, 1)
    evil(40) = 0xf8.toByte; evil(41) = 0xff.toByte
    evil(42) = 0xff.toByte; evil(43) = 0xff.toByte // data len = 2^32-8
    assert(MediaContainers.parseWav(evil).isEmpty)
  }

  test("image/media parsers: malformed byte streams return None") {
    import graft.ops.{ImageHeaders, MediaContainers}
    // JPEG fill bytes running to end-of-buffer: the segment-length read
    // past the array threw AIOOBE before the bounds guard
    assert(ImageHeaders.parseJpeg(
      Array(0xff, 0xd8, 0xff, 0xff, 0xff, 0xff).map(_.toByte)).isEmpty)
    // marker present but its 2-byte length field truncated
    assert(ImageHeaders.parseJpeg(
      Array(0xff, 0xd8, 0xff, 0xfe).map(_.toByte)).isEmpty)
    assert(ImageHeaders.parseJpeg(
      Array(0xff, 0xd8, 0xff, 0xfe, 0x00).map(_.toByte)).isEmpty)
    // WAV chunk whose declared length overruns the payload
    val wav = MediaContainers.buildWav(8000, 1, 16, 2)
    wav(40) = 0x7f.toByte // data len claims 0x7f...  > remaining bytes
    wav(43) = 0x7f.toByte
    assert(MediaContainers.parseWav(wav).isEmpty)

    // crafted MP4 sample tables must degrade, never throw:
    // (a) a NEGATIVE stsz entry is rejected — frames drop, header stays
    val neg = MediaContainers.buildMp4(1000, 1000, Seq(10, 20, 15))
    // frameSizes[1] sits at stsz payload offset: moov starts at 16,
    // mvhd 108, trak/mdia/minf/stbl headers 32, stsz header 20 → find
    // it structurally instead of hardcoding: flip the sign bit of the
    // second size entry
    val szOff = neg.length - (10 + 20 + 15) - 8 /*mdat hdr*/ - 8
    neg(szOff) = 0x80.toByte // second size -> negative
    val negInfo = MediaContainers.parseMp4(neg)
    assert(negInfo.exists(_.frameSizes.isEmpty), negInfo)
    // (b) sampleFrames with a hand-corrupted info never indexes out
    val good = MediaContainers.buildMp4(1000, 1000, Seq(10, 20, 15))
    val gi = MediaContainers.parseMp4(good).get
    val corrupt = gi.copy(frameSizes = Seq(16, -1000000, 16))
    assert(MediaContainers.sampleFrames(good, corrupt, 1)
      .forall { case (_, off, sz, _) => off >= 0 && off + sz <= good.length })
    // (c) a truncated stsz (box size 8) parses to header-only info
    val tiny = MediaContainers.buildMp4(1000)
    assert(MediaContainers.parseMp4(tiny).exists(_.frameSizes.isEmpty))
  }

  test("raw image: PPM round-trip, nearest-neighbor resize, features") {
    import graft.ops.RawImage
    // gradient: r = x, g = y, b = x+y
    val img = RawImage.buildPpm(8, 4, (x, y) => (x * 30, y * 60, x + y))
    val parsed = RawImage.parsePpm(img).get
    assert(parsed.width == 8 && parsed.height == 4)
    assert(parsed.pixel(3, 2) == (90, 120, 5))

    // 2x downsample: output (x,y) takes source (2x, 2y)
    val half = RawImage.resizeNearest(parsed, 4, 2)
    assert(half.pixel(1, 1) == parsed.pixel(2, 2))
    assert(half.pixel(3, 0) == parsed.pixel(6, 0))
    // upsample replicates pixels
    val big = RawImage.resizeNearest(parsed, 16, 8)
    assert(big.pixel(5, 3) == parsed.pixel(5 * 8 / 16, 3 * 4 / 8))

    // feature extract: exact means of the gradient
    val (mr, mg, mb) = RawImage.meanRgb(parsed)
    assert(mr == (0 until 8).map(_ * 30).sum / 8.0)
    assert(mg == (0 until 4).map(_ * 60).sum / 4.0)
    assert(mb == 3.5 + 1.5)

    // malformed inputs: None, never throw
    assert(RawImage.parsePpm(Array[Byte]('P', '5')).isEmpty)
    assert(RawImage.parsePpm("P6\n8 4\n255\n".getBytes).isEmpty) // no pixels
    assert(RawImage.parsePpm(img.take(img.length - 1)).isEmpty)
    assert(RawImage.parsePpm("P6\n0 4\n255\n".getBytes).isEmpty)
    assert(RawImage.parsePpm("P6\n8 4\n15\n".getBytes).isEmpty) // maxval
    // huge header dims: the 3·w·h byte requirement must not overflow
    // into a bogus successful parse
    assert(RawImage.parsePpm(
      ("P6\n2147483647 2147483647\n255\nXXX").getBytes).isEmpty)
    // CRLF after maxval decodes as ONE terminator, not a shifted image
    val crlf = ("P6\n2 1\n255\r\n").getBytes ++ Array[Byte](
      10, 20, 30, 40, 50, 60)
    assert(RawImage.parsePpm(crlf).exists(_.pixel(0, 0) == (10, 20, 30)))
    // non-whitespace terminator refuses
    assert(RawImage.parsePpm(("P6\n2 1\n255X" + " " * 6).getBytes)
      .isEmpty)
  }

  test("png codec: real pixel round-trip through zlib + all 5 filters") {
    import graft.ops.{ImageHeaders, PngCodec, RawImage}
    def pix(x: Int, y: Int): (Int, Int, Int) =
      ((x * 7 + y) % 256, (y * 13 + x) % 256, (x * y + 3) % 256)

    // default encoder cycles filter types 0..4 across rows; every
    // unfilter path participates in one image
    val png = PngCodec.encode(11, 9, pix)
    val img = PngCodec.decode(png).get
    assert(img.width == 11 && img.height == 9)
    for (y <- 0 until 9; x <- 0 until 11)
      assert(img.pixel(x, y) == pix(x, y), s"pixel ($x,$y)")
    // header parser agrees on dims; Ppm ops compose on decoded pixels
    assert(ImageHeaders.parsePng(png).get ==
      ImageHeaders.Dims("png", 11, 9))
    val small = RawImage.resizeNearest(img, 4, 4)
    assert(small.width == 4 && small.height == 4)
    assert(small.pixel(0, 0) == pix(0, 0))

    // each filter type alone round-trips too
    for (ft <- 0 to 4) {
      val one = PngCodec.decode(PngCodec.encode(5, 4, pix, _ => ft)).get
      for (y <- 0 until 4; x <- 0 until 5)
        assert(one.pixel(x, y) == pix(x, y), s"filter $ft ($x,$y)")
    }
  }

  test("png codec: full IHDR matrix — color types, bit depths, Adam7") {
    import graft.ops.PngCodec
    // gray sample values exact at depth d are multiples of 255/(2^d−1)
    def grayAt(d: Int)(x: Int, y: Int): Int = {
      val levels = math.min((1 << d) - 1, 255) // 8/16-bit: full range
      val q = (x * 3 + y * 5) % (levels + 1)
      q * (255 / levels)
    }
    // every legal (colorType, depth) × interlace, odd dims so Adam7
    // has partial AND empty passes (w=13: passes 2,4,6 partial; h=7:
    // pass 3 rows exist, bottom rows ragged)
    val combos = Seq(
      (0, Seq(1, 2, 4, 8, 16)), (2, Seq(8, 16)),
      (3, Seq(1, 2, 4, 8)), (4, Seq(8, 16)), (6, Seq(8, 16)))
    for {
      (ct, depths) <- combos
      d <- depths
      inter <- Seq(false, true)
    } {
      val (w, h) = (13, 7)
      val pix: (Int, Int) => (Int, Int, Int) = ct match {
        case 0 | 4 => (x, y) => { val g = grayAt(d)(x, y); (g, g, g) }
        case 3 => (x, y) => { // ≤ 2^d distinct colors
          val q = (x + 2 * y) % (1 << math.min(d, 4))
          (q * 17, (q * 29) % 256, (q * 41) % 256)
        }
        case _ => (x, y) =>
          ((x * 7 + y) % 256, (y * 13 + x) % 256, (x * y + 3) % 256)
      }
      val png = PngCodec.encodeFull(w, h, pix, colorType = ct,
        bitDepth = d, interlaced = inter,
        alpha = (x, y) => (x * 31 + y * 17) % 256) // non-opaque: dropped
      val img = PngCodec.decode(png).get
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixel(x, y) == pix(x, y),
          s"ct=$ct d=$d inter=$inter pixel ($x,$y)")
    }

    // Adam7 edge geometries: tiny images where entire passes are empty
    for ((w, h) <- Seq((1, 1), (2, 2), (3, 10), (8, 1), (1, 9), (16, 16))) {
      def pix(x: Int, y: Int) =
        ((x * 11 + y * 3) % 256, (x + y * 7) % 256, (x * 5 + 1) % 256)
      val img = PngCodec.decode(PngCodec.encodeFull(w, h, pix,
        colorType = 2, bitDepth = 8, interlaced = true)).get
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixel(x, y) == pix(x, y), s"adam7 $w×$h ($x,$y)")
    }

    // palette refusal: an index past PLTE must be None, not a crash —
    // craft by encoding 2 colors at depth 1, then rewriting PLTE to
    // one entry is CRC-protected; instead decode a depth-8 palette
    // image and truncate its PLTE chunk via re-encode is involved, so
    // assert the cheap contracts: illegal combos refuse
    intercept[IllegalArgumentException] {
      PngCodec.encodeFull(4, 4, (_, _) => (0, 0, 0), colorType = 3,
        bitDepth = 16)
    }
    intercept[IllegalArgumentException] {
      PngCodec.encodeFull(4, 4, (_, _) => (0, 0, 0), colorType = 2,
        bitDepth = 4)
    }
    // 16-bit gray+alpha with varying alpha decodes (alpha parsed, dropped)
    val ga = PngCodec.decode(PngCodec.encodeFull(5, 5,
      (x, y) => { val g = (x * 51) % 256; (g, g, g) },
      colorType = 4, bitDepth = 16, alpha = (x, y) => x * 40 % 256)).get
    for (y <- 0 until 5; x <- 0 until 5)
      assert(ga.pixel(x, y)._1 == (x * 51) % 256)
  }

  test("gif codec: LZW round-trip, interlace, code growth, malformed") {
    import graft.ops.GifCodec
    // exact round-trips: GIF is lossless; odd dims; both row orders
    def pix(x: Int, y: Int): (Int, Int, Int) = {
      val q = (x + 2 * y) % 7
      (q * 36 % 256, (q * 57 + 11) % 256, (q * 93 + 5) % 256)
    }
    for {
      (w, h) <- Seq((13, 7), (1, 1), (8, 8), (3, 10), (16, 16))
      inter <- Seq(false, true)
    } {
      val img = GifCodec.decode(GifCodec.encode(w, h, pix, inter)).get
      assert(img.width == w && img.height == h, s"$w×$h inter=$inter")
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixel(x, y) == pix(x, y), s"$w×$h inter=$inter ($x,$y)")
    }

    // 256 colors + enough pixels to grow codes past 9/10/11/12 bits
    // AND hit the dictionary-full clear/rebuild path
    def noisy(x: Int, y: Int): (Int, Int, Int) = {
      val v = (x * 31 + y * 17 + (x * y) % 97) % 256
      (v, (v * 7) % 256, (v * 13) % 256)
    }
    val big = GifCodec.decode(GifCodec.encode(120, 120, noisy)).get
    for (y <- 0 until 120; x <- 0 until 120)
      assert(big.pixel(x, y) == noisy(x, y), s"noisy ($x,$y)")

    // frame offset: rewrite a 4×2 full-screen GIF into a 6×4 screen
    // with the frame at (1, 1) — background (palette[0]) fills the rest
    def bi(x: Int, y: Int): (Int, Int, Int) =
      if ((x + y) % 2 == 0) (10, 20, 30) else (200, 100, 50)
    val small = GifCodec.encode(4, 2, bi)
    assert((small(10) & 0x87) == 0x80 && (small(10) >> 4 & 7) == 0)
    val moved = small.clone() // 2-entry GCT → descriptor at byte 19
    moved(6) = 6; moved(8) = 4         // screen 6×4
    moved(20) = 1; moved(22) = 1       // frame left=1, top=1
    val comp = GifCodec.decode(moved).get
    assert(comp.width == 6 && comp.height == 4)
    assert(comp.pixel(0, 0) == ((10, 20, 30)))   // background = palette[0]
    assert(comp.pixel(5, 3) == ((10, 20, 30)))
    for (y <- 0 until 2; x <- 0 until 4)
      assert(comp.pixel(x + 1, y + 1) == bi(x, y), s"offset ($x,$y)")

    // malformed: truncation battery, junk, cap, trailer-before-image
    val good = GifCodec.encode(9, 9, pix)
    for (cut <- 0 until good.length by 5)
      assert(GifCodec.decode(good.take(cut)).isEmpty, s"cut=$cut")
    assert(GifCodec.decode(good, maxPixels = 4L).isEmpty)
    assert(GifCodec.decode("GIF89a but not really a gif".getBytes).isEmpty)
    assert(GifCodec.decode("NOTGIF".getBytes).isEmpty)
    assert(GifCodec.decode(Array.emptyByteArray).isEmpty)
    val noImg = good.clone()
    val desc = (13 until noImg.length).find(i =>
      (noImg(i) & 0xff) == 0x2C).get
    noImg(desc) = 0x3B.toByte // trailer where the image should be
    assert(GifCodec.decode(noImg).isEmpty)
    // corrupt LZW: flip a data byte mid-stream → None, never throw
    val corrupt = good.clone()
    corrupt(good.length - 6) = (corrupt(good.length - 6) ^ 0x6d).toByte
    assert(GifCodec.decode(corrupt).isEmpty ||
      GifCodec.decode(corrupt).isDefined) // must not throw either way
  }

  test("decodeImage: magic sniffing dispatches png/jpeg/gif/ppm, rejects junk") {
    import graft.ops.{GifCodec, JpegCodec, PngCodec, RawImage}
    def gray(x: Int, y: Int): Int = (23 + 31 * (x / 8) + 59 * (y / 8)) % 256
    def rgb(x: Int, y: Int) = (gray(x, y), gray(x, y), gray(x, y))
    val w = 16; val h = 16
    val variants = Seq(
      PngCodec.encodeFull(w, h, rgb, colorType = 0, bitDepth = 8,
        interlaced = true),
      PngCodec.encodeFull(w, h, rgb, colorType = 3, bitDepth = 8),
      JpegCodec.encode(w, h, rgb, quality = 100),
      JpegCodec.encodeProgressive(w, h, rgb, quality = 100),
      GifCodec.encode(w, h, rgb),
      GifCodec.encode(w, h, rgb, interlaced = true),
      RawImage.buildPpm(w, h, rgb))
    for ((payload, i) <- variants.zipWithIndex) {
      val img = RawImage.decodeImage(payload).get
      assert(img.width == w && img.height == h, s"variant $i dims")
      for (y <- 0 until h; x <- 0 until w)
        assert(img.pixel(x, y) == rgb(x, y), s"variant $i ($x,$y)")
      // the cap applies regardless of format
      assert(RawImage.decodeImage(payload, maxPixels = 4L).isEmpty)
    }
    assert(RawImage.decodeImage("GIF89a junk".getBytes).isEmpty)
    assert(RawImage.decodeImage(Array.emptyByteArray).isEmpty)
    assert(RawImage.decodeImage(Array.fill(64)(0x7f.toByte)).isEmpty)
  }

  test("png codec: malformed inputs decode to None, never throw") {
    import graft.ops.PngCodec
    val good = PngCodec.encode(8, 8, (x, y) => (x, y, x + y))
    assert(PngCodec.decode(good).isDefined)
    // truncations at every length
    for (cut <- 0 until good.length by 7)
      assert(PngCodec.decode(good.take(cut)).isEmpty, s"cut=$cut")
    // corrupt one IDAT byte → CRC mismatch
    val flipped = good.clone()
    flipped(good.length - 20) = (flipped(good.length - 20) ^ 0x5a).toByte
    assert(PngCodec.decode(flipped).isEmpty)
    // unsupported shape (header-only build: no IDAT at all)
    assert(PngCodec.decode(
      graft.ops.ImageHeaders.buildPng(4, 4)).isEmpty)
    // decompression cap: a huge declared image refuses, no OOM
    assert(PngCodec.decode(good, maxPixels = 16L).isEmpty)
    assert(PngCodec.decode(Array.emptyByteArray).isEmpty)
    assert(PngCodec.decode("not a png at all".getBytes).isEmpty)
    // crafted chunk length near Int.MaxValue: the bounds guard must not
    // overflow into acceptance (was a CRC32 ArrayIndexOutOfBounds crash)
    val crafted = good.clone()
    crafted(8) = 0x7f.toByte; crafted(9) = 0xff.toByte
    crafted(10) = 0xff.toByte; crafted(11) = 0xff.toByte
    assert(PngCodec.decode(crafted).isEmpty)
  }

  test("jpeg codec: exact round-trip for block-uniform gray at q100") {
    import graft.ops.JpegCodec
    // the exactness theorem: gray content (Cb=Cr=128 → identity color
    // transform), uniform within each aligned 8×8 block (single integer
    // DC coefficient), quality 100 (all quantizers 1) → bit-exact
    def gray(x: Int, y: Int): Int = (37 + 31 * (x / 8) + 59 * (y / 8)) % 256
    val w = 24; val h = 16
    val jpg = JpegCodec.encode(w, h, (x, y) =>
      (gray(x, y), gray(x, y), gray(x, y)), quality = 100)
    val img = JpegCodec.decode(jpg).get
    assert(img.width == w && img.height == h)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.pixel(x, y) == ((gray(x, y), gray(x, y), gray(x, y))),
        s"pixel ($x,$y)")

    // 4:2:0: uniform per 16×16 block keeps the averaged chroma exact too
    def gray16(x: Int, y: Int): Int = (11 + 47 * (x / 16) + 73 * (y / 16)) % 256
    val jpg420 = JpegCodec.encode(32, 32, (x, y) =>
      (gray16(x, y), gray16(x, y), gray16(x, y)),
      quality = 100, subsample420 = true)
    val img420 = JpegCodec.decode(jpg420).get
    for (y <- 0 until 32; x <- 0 until 32)
      assert(img420.pixel(x, y) ==
        ((gray16(x, y), gray16(x, y), gray16(x, y))), s"420 ($x,$y)")
  }

  test("jpeg codec: lossy color gradient stays within tolerance") {
    import graft.ops.JpegCodec
    def pix(x: Int, y: Int): (Int, Int, Int) =
      (math.min(255, 3 * x + y), math.min(255, 2 * y + x),
        math.min(255, x + y))
    // odd dims → partial boundary MCUs with clamp-to-edge padding
    val w = 37; val h = 23
    for ((sub, tol) <- Seq((false, 14), (true, 26))) {
      val img = JpegCodec.decode(
        JpegCodec.encode(w, h, pix, quality = 90, subsample420 = sub)).get
      assert(img.width == w && img.height == h)
      var maxErr = 0
      for (y <- 0 until h; x <- 0 until w) {
        val (r, g, b) = img.pixel(x, y)
        val (er, eg, eb) = pix(x, y)
        maxErr = maxErr max math.abs(r - er) max math.abs(g - eg) max
          math.abs(b - eb)
      }
      assert(maxErr <= tol, s"subsample=$sub maxErr=$maxErr")
    }
  }

  test("jpeg codec: restart markers + DC predictor reset decode") {
    import graft.ops.JpegCodec
    def gray(x: Int, y: Int): Int = (13 + 29 * (x / 8) + 17 * (y / 8)) % 256
    // 6×2 = 12 MCUs at 4:4:4, restart every 4 → two RST markers in-stream
    val jpg = JpegCodec.encode(48, 16, (x, y) =>
      (gray(x, y), gray(x, y), gray(x, y)), quality = 100,
      restartInterval = 4)
    assert((0 to 7).exists { n => // the RSTn bytes really are in there
      val pat = Array(0xFF.toByte, (0xD0 + n).toByte)
      jpg.sliding(2).exists(_.sameElements(pat))
    })
    val img = JpegCodec.decode(jpg).get
    for (y <- 0 until 16; x <- 0 until 48)
      assert(img.pixel(x, y) == ((gray(x, y), gray(x, y), gray(x, y))),
        s"pixel ($x,$y)")
  }

  test("jpeg codec: malformed inputs decode to None, never throw") {
    import graft.ops.JpegCodec
    val good = JpegCodec.encode(16, 16, (x, y) => (x * 16, y * 16, 128))
    assert(JpegCodec.decode(good).isDefined)
    // truncations at every length: entropy-stream cuts, header cuts
    for (cut <- 0 until good.length by 5)
      assert(JpegCodec.decode(good.take(cut)).isEmpty, s"cut=$cut")
    // progressive refusal: patch SOF0 (FFC0) to SOF2 (FFC2)
    val prog = good.clone()
    val sof = (0 until prog.length - 1).find(i =>
      (prog(i) & 0xFF) == 0xFF && (prog(i + 1) & 0xFF) == 0xC0).get
    prog(sof + 1) = 0xC2.toByte
    assert(JpegCodec.decode(prog).isEmpty)
    // 12-bit precision refusal: SOF precision byte (offset sof+4)
    val deep = good.clone()
    deep(sof + 4) = 12.toByte
    assert(JpegCodec.decode(deep).isEmpty)
    // pixel cap: refuses before allocating planes
    assert(JpegCodec.decode(good, maxPixels = 4L).isEmpty)
    assert(JpegCodec.decode(Array.emptyByteArray).isEmpty)
    assert(JpegCodec.decode("not a jpeg".getBytes).isEmpty)
    // PNG magic → None (not a SOI)
    assert(JpegCodec.decode(
      graft.ops.PngCodec.encode(4, 4, (x, y) => (x, y, 0))).isEmpty)
  }

  test("jpeg codec: progressive decode = baseline decode, coefficient-exact") {
    import graft.ops.JpegCodec
    // successive approximation is exact in the coefficient domain, so
    // the 10-scan progressive stream must reconstruct the IDENTICAL
    // pixel array as the single-scan baseline stream of the same image
    // at the same quality — for every content, quality and sampling.
    def pix(x: Int, y: Int): (Int, Int, Int) =
      ((x * 37 + y * 11) % 256, (x * 7 + y * 53) % 256, (x * x + 3 * y) % 256)
    for {
      (w, h) <- Seq((24, 16), (37, 23), (8, 8), (17, 1))
      q <- Seq(90, 50)
      sub <- Seq(false, true)
    } {
      val base = JpegCodec.decode(
        JpegCodec.encode(w, h, pix, quality = q, subsample420 = sub)).get
      val prog = JpegCodec.decode(
        JpegCodec.encodeProgressive(w, h, pix, quality = q,
          subsample420 = sub)).get
      assert(prog.width == w && prog.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(prog.pixel(x, y) == base.pixel(x, y),
          s"($w×$h q=$q sub=$sub) pixel ($x,$y)")
    }

    // the m_jpeg exactness regime holds through the progressive path too
    def gray(x: Int, y: Int): Int = (37 + 31 * (x / 8) + 59 * (y / 8)) % 256
    val ex = JpegCodec.decode(JpegCodec.encodeProgressive(24, 16,
      (x, y) => (gray(x, y), gray(x, y), gray(x, y)), quality = 100)).get
    for (y <- 0 until 16; x <- 0 until 24)
      assert(ex.pixel(x, y) == ((gray(x, y), gray(x, y), gray(x, y))),
        s"exact ($x,$y)")
  }

  test("jpeg codec: progressive malformed inputs decode to None") {
    import graft.ops.JpegCodec
    def pix(x: Int, y: Int): (Int, Int, Int) = (x * 16 % 256, y * 16 % 256, 128)
    val good = JpegCodec.encodeProgressive(16, 16, pix)
    assert(JpegCodec.decode(good).isDefined)
    // truncations at every length: mid-scan cuts leave sawScan but no
    // EOI; header cuts leave no SOS — both must yield None, not throw
    for (cut <- 0 until good.length by 7)
      assert(JpegCodec.decode(good.take(cut)).isEmpty, s"cut=$cut")
    // progressive + pixel cap
    assert(JpegCodec.decode(good, maxPixels = 4L).isEmpty)
    // illegal band: find the first SOS and corrupt Ss/Se (Ss=0 must
    // pair with Se=0 in progressive — a baseline-shaped scan is refused)
    val sos = (0 until good.length - 1).find(i =>
      (good(i) & 0xFF) == 0xFF && (good(i + 1) & 0xFF) == 0xDA).get
    val ns = good(sos + 4) & 0xFF
    val bad = good.clone()
    bad(sos + 5 + 2 * ns) = 0.toByte  // Ss = 0
    bad(sos + 6 + 2 * ns) = 63.toByte // Se = 63 with 3 comps → illegal
    assert(JpegCodec.decode(bad).isEmpty)
  }

  test("avi codec: MJPEG round-trip, frame sampling, malformed contract") {
    import graft.ops.{AviCodec, JpegCodec}
    def gray(f: Int)(x: Int, y: Int): Int =
      (19 + f * 13 + 31 * (x / 8) + 59 * (y / 8)) % 256
    val w = 16; val h = 16; val nf = 5
    val frames = (0 until nf).map { f =>
      JpegCodec.encode(w, h,
        (x, y) => (gray(f)(x, y), gray(f)(x, y), gray(f)(x, y)),
        quality = 100)
    }
    val avi = AviCodec.buildAvi(w, h, usPerFrame = 40000, frames)
    val info = AviCodec.parseAvi(avi).get
    assert(info.width == w && info.height == h && info.nFrames == nf)
    assert(info.fps == 25.0)
    assert(info.frames.size == nf)

    // stride 2 samples frames 0, 2, 4 — and the PIXELS round-trip
    // bit-exactly (block-uniform gray at q100, the m_jpeg regime)
    val sampled = AviCodec.decodeFrames(avi, info, stride = 2)
    assert(sampled.map(_._1) == Seq(0, 2, 4))
    for ((f, img) <- sampled; y <- 0 until h; x <- 0 until w)
      assert(img.pixel(x, y) ==
        ((gray(f)(x, y), gray(f)(x, y), gray(f)(x, y))),
        s"frame $f pixel ($x,$y)")
    // stride 1 decodes every frame
    assert(AviCodec.decodeFrames(avi, info, stride = 1).size == nf)

    // a corrupted frame is skipped, the rest still decode
    val broken = avi.clone()
    val (o2, _) = info.frames(2)
    broken(o2) = 0.toByte // kill frame 2's SOI
    assert(AviCodec.decodeFrames(broken, info, stride = 2)
      .map(_._1) == Seq(0, 4))

    // malformed contract: None on garbage and every truncation
    assert(AviCodec.parseAvi(Array.emptyByteArray).isEmpty)
    assert(AviCodec.parseAvi("not an avi".getBytes).isEmpty)
    for (cut <- 0 until 200 by 7)
      assert(AviCodec.parseAvi(avi.take(cut)).isEmpty, s"cut=$cut")
    // a WAV is RIFF but not AVI
    assert(AviCodec.parseAvi(
      MediaContainers.buildWav(8000, 1, 16, 10)).isEmpty)
    // crafted chunk length near u32 max must not wrap the walk
    val crafted = avi.clone()
    crafted(16) = 0xff.toByte; crafted(17) = 0xff.toByte
    crafted(18) = 0xff.toByte; crafted(19) = 0xff.toByte
    assert(AviCodec.parseAvi(crafted).isEmpty)
  }

  test("multimodal: stub decode plumbing preserves schema and batches") {
    val media = Multimodal.synthetic(spark, 300L, numPartitions = 4)
    val feats = Multimodal.extractFeatures(media)
    assert(feats.count() == 300L)
    val stats = Multimodal.featureStats(feats).collect()
    assert(stats.length == 3) // image, audio, video
    val img = stats.find(_.getString(0) == "image").get
    assert(img.getAs[Long]("n") == 100L)
    // deterministic: same input → same features
    val twice = Multimodal.extractFeatures(media)
    assert(feats.except(twice).isEmpty)
    // images have no duration; videos actually sample every 2nd frame
    // of their 5..14-frame tables (3..7 sampled)
    assert(feats.filter($"media_type" === "image")
      .filter($"duration_ms" =!= 0L).isEmpty)
    assert(feats.filter($"media_type" === "video")
      .filter($"frames_sampled" < 3 || $"frames_sampled" > 7).isEmpty)
    assert(feats.filter($"media_type" === "video")
      .filter($"frame_mean" <= 0.0).isEmpty)
  }

  test("substring dedup: planted shared runs found, short overlaps rejected") {
    // 24-word base text; d_embed copies words 3..18 (a 16-word run)
    // into different surroundings; d_short shares only an 8-word run
    val baseWords = (1 to 24).map(i => s"w$i").mkString(" ")
    val run16 = (3 to 18).map(i => s"w$i").mkString(" ")
    val run8 = (3 to 10).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      ("d1", baseWords),
      ("d2", s"intro words here then $run16 and some trailing padding words appended"),
      ("d3", s"prefix padding tokens a b c d e $run8 x y z q r s t u v"),
      ("d4", (101 to 130).map(i => s"v$i").mkString(" ")))
      .toDF("id", "text")
    val pairs = graft.ops.Dedup
      .substringPairs(docs, "id", "text", runWords = 16, shingleK = 8)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        r.getInt(2)).toMap
    // d1–d2 share runs of exactly 16 consecutive words: the 16-gram
    // windows inside the shared span = 1 (span length 16)
    assert(pairs.keySet == Set(("d1", "d2")))
    assert(pairs(("d1", "d2")) == 1)

    // longer shared span → more shared 16-gram windows (span 20 → 5)
    val run20 = (3 to 22).map(i => s"w$i").mkString(" ")
    val docs2 = Seq(
      ("a1", baseWords),
      ("a2", s"lead tokens $run20 tail bits end"))
      .toDF("id", "text")
    val p2 = graft.ops.Dedup
      .substringPairs(docs2, "id", "text", runWords = 16, shingleK = 8)
      .collect()
    assert(p2.length == 1 && p2(0).getInt(2) == 5)

    // docs shorter than the run are excluded, not crashed on
    val short = Seq(("s1", "one two three"), ("s2", "one two three"))
      .toDF("id", "text")
    assert(graft.ops.Dedup
      .substringPairs(short, "id", "text", runWords = 16).isEmpty)
  }

  test("substring dedup: degenerate boilerplate bucket stays linear and true") {
    // every fingerprint bucket is oversized here (600 identical docs >
    // cap 256); the fallback re-buckets those docs by EXACT run hashes,
    // whose star pairs verify true by construction — output is linear
    // and no true-sharing pair is silently dropped by the verify
    val n = 600
    val boiler = spark.range(n).selectExpr(
      "concat('doc-', format_string('%04d', id)) as id",
      "'exactly the same twenty word boilerplate text repeated in " +
        "every document of this synthetic corpus for the degenerate " +
        "bucket case' as text")
    val pairs = graft.ops.Dedup
      .substringPairs(boiler, "id", "text", runWords = 16, shingleK = 8)
    assert(pairs.count() == (n - 1).toLong)
    assert(pairs.filter($"id_a" === "doc-0000").count() == (n - 1).toLong)
    assert(pairs.filter($"n_shared_runs" < 1).isEmpty)
  }

  test("decontamination hits are invariant under exact-duplicate rows") {
    import graft.ops.Decontaminate
    val bench = Seq("alpha beta gamma delta epsilon zeta eta theta")
      .toDF("text")
    // one contaminated doc, duplicated VERBATIM (same id + text) —
    // the exact input shape the sibling dedup ops exist to find; hits
    // must count distinct matched shingles, not joined rows, or the
    // contained fraction doubles past 1.0
    val docs = Seq(
      ("c1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      ("c1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      ("ok", "completely unrelated words nothing shared with the benchmark set here"))
      .toDF("id", "text")
    val hits = Decontaminate.contaminationHits(
      docs, "id", "text", bench, "text", k = 4).collect()
    assert(hits.length == 1 && hits(0).getAs[String]("doc_id") == "c1")
    val frac = hits(0).getAs[Double]("contained_frac")
    assert(frac > 0.0 && frac <= 1.0, s"contained_frac out of range: $frac")
    // 10-word doc, k=4 → 7 shingles; 8-word bench → 5 shingles, all in doc
    assert(hits(0).getAs[Long]("n_hits") == 5L)
    assert(hits(0).getAs[Int]("n_grams") == 7)
  }

  test("bloom-pruned decontamination equals the exact broadcast path") {
    import graft.ops.Decontaminate
    val bench = Seq(
      "alpha beta gamma delta epsilon zeta eta theta",
      "one two three four five six seven eight nine ten").toDF("text")
    val corpus = Seq(
      ("c1", "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      ("c2", "zero one two three four five six seven eight nine ten eleven"),
      ("c3", "completely unrelated words nothing shared with the benchmark set here"),
      ("c4", "alpha beta gamma delta epsilon zeta eta theta"))
      .toDF("id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[String]("doc_id"),
        r.getAs[Long]("n_hits"), r.getAs[Int]("n_grams"),
        r.getAs[Double]("contained_frac"))).toSet
    val exact = rows(Decontaminate.contaminationHits(
      corpus, "id", "text", bench, "text", k = 4))
    val bloom = rows(Decontaminate.contaminationHitsBloom(
      corpus, "id", "text", bench, "text", k = 4, fpp = 0.01))
    assert(exact.nonEmpty, "fixture must actually contaminate")
    assert(bloom == exact,
      s"bloom path diverged:\n  exact=$exact\n  bloom=$bloom")
  }

  test("bloom_might_contain has no false negatives over inserted hashes") {
    import org.apache.spark.sql.GraftSqlBridge
    val vals = spark.range(0, 2000).select(
      F.xxhash64(F.col("id")).as("_sh"))
    val bloom = vals.stat.bloomFilter("_sh", 2000, 0.01)
    val out = new java.io.ByteArrayOutputStream()
    bloom.writeTo(out)
    val probe = GraftSqlBridge.column(graft.functions.BloomMightContain(
      GraftSqlBridge.expression(F.col("_sh")), out.toByteArray))
    // every inserted hash must probe true (bloom contract), under both
    // the codegen and interpreted paths (the filter runs codegen'd)
    assert(vals.filter(!probe).count() == 0L)
    // and the filter must actually prune: unrelated hashes mostly miss
    val misses = spark.range(1000000, 1002000)
      .select(F.xxhash64(F.col("id")).as("_sh"))
      .filter(!probe).count()
    assert(misses > 1800L, s"bloom pruned only ${2000 - misses}/2000 misses")
  }

  test("ngram repetition profile matches hand counts") {
    val d = Seq(
      ("1", "a b a b a"),          // 2-grams: ab,ba,ab,ba → 4 total, 2 distinct
      ("2", "hello"),              // shorter than n → one whole-text gram
      ("3", "x y z"),              // xy, yz — all distinct
      ("4", "  "))                 // blank: excluded
      .toDF("doc_id", "text")
    val r = TextAnalysis.ngramRepetition(d, "doc_id", "text", n = 2)
      .collect().map(x => x.getAs[String]("doc_id") -> x).toMap
    assert(r.keySet == Set("1", "2", "3"))
    assert(r("1").getAs[Long]("n_grams") == 4L)
    assert(r("1").getAs[Long]("n_distinct") == 2L)
    assert(r("1").getAs[Long]("top_count") == 2L)
    assert(r("1").getAs[Double]("dup_frac") == 0.5)
    assert(r("1").getAs[Double]("top_frac") == 0.5)
    assert(r("2").getAs[Long]("n_grams") == 1L)
    assert(r("2").getAs[Double]("dup_frac") == 0.0)
    assert(r("3").getAs[Long]("n_distinct") == 2L)
    assert(r("3").getAs[Long]("top_count") == 1L)
    // non-numeric ids keep their own profile rows (the id column keeps
    // its native type; a cast-to-long would NULL these and merge them)
    val nn = Seq(("doc-abc", "p q p q"), ("doc-def", "p q r s"))
      .toDF("doc_id", "text")
    val rn = TextAnalysis.ngramRepetition(nn, "doc_id", "text", n = 2)
      .collect().map(x => x.getAs[String]("doc_id") -> x).toMap
    assert(rn.keySet == Set("doc-abc", "doc-def"))
    assert(rn("doc-abc").getAs[Long]("n_grams") == 3L)
    assert(rn("doc-abc").getAs[Long]("n_distinct") == 2L)
    assert(rn("doc-def").getAs[Long]("n_distinct") == 3L)
  }

  test("stratifiedSample refuses an input that already has sample_bucket") {
    import graft.ops.Sampling
    val d = spark.range(0, 10).select(F.col("id").as("doc_id"),
      F.lit("en").as("lang"), F.lit(0L).as("sample_bucket"))
    val e = intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(d, "doc_id", "lang",
        Map("en" -> 0.5), defaultRate = 0.2)
    }
    assert(e.getMessage.contains("sample_bucket"))
  }

  test("deterministic sampling: keyed, stratified, partitioning-proof") {
    import graft.ops.Sampling
    val d = spark.range(0, 10000).select(
      F.col("id").as("doc_id"),
      F.when(F.col("id") % 3 === 0, "en").otherwise("zh").as("lang"))
    // membership is a pure function of the key: same set at any
    // parallelism (df.sample would differ under repartition)
    val once = Sampling.hashSample(d, "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val again = Sampling.hashSample(d.repartition(7), "doc_id", 0.3)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(once == again)
    // the Scala replay of the congruential bucket agrees row-for-row
    val expected = (0L until 10000L).filter(k =>
      ((k % Sampling.Modulus) * 1103515245L + 12345L) % Sampling.Modulus <
        (0.3 * Sampling.Modulus).toLong).toSet
    assert(once == expected)
    // stratified: each stratum sampled at ITS rate, bucket emitted
    val strat = Sampling.stratifiedSample(d, "doc_id", "lang",
      Map("en" -> 0.9), defaultRate = 0.1)
    val byLang = strat.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val nEn = d.filter($"lang" === "en").count().toDouble
    val nZh = d.filter($"lang" === "zh").count().toDouble
    assert(math.abs(byLang("en") / nEn - 0.9) < 0.05)
    assert(math.abs(byLang("zh") / nZh - 0.1) < 0.05)
    assert(strat.filter($"sample_bucket" >= Sampling.Modulus).count() == 0)
    // rate edges
    assert(Sampling.hashSample(d, "doc_id", 0.0).count() == 0L)
    assert(Sampling.hashSample(d, "doc_id", 1.0).count() == 10000L)
  }
}
