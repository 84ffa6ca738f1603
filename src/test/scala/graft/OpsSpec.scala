package graft

import org.apache.spark.sql.{functions => F}
import graft.ops.{Dedup, Multimodal, Similarity, TextAnalysis}

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

  test("embedding near-dup finds the planted close pair only") {
    val pairs = Dedup.embeddingNearDup(vecs, "id", "embedding",
      minCosine = 0.95, planes = 4)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(pairs.contains(("v1", "v2")))
    assert(pairs.contains(("v3", "v4")))
    assert(pairs.size == 2)
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
    // images have no duration; videos sample frames
    assert(feats.filter($"media_type" === "image")
      .filter($"duration_ms" =!= 0L).isEmpty)
    assert(feats.filter($"media_type" === "video")
      .filter($"frames_sampled" =!= 8).isEmpty)
  }
}
