package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.sketch.{TDigest, TDigestQuantiles}

/** t-digest correctness: quantile accuracy vs exact, merge-associativity
  * under partial aggregation (the property that makes it valid as a
  * distributed aggregate). */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  test("quantiles within rank-epsilon of exact on skewed data") {
    val n = 50000
    val rnd = new java.util.Random(7)
    val data = Array.fill(n)(math.exp(5.0 + 0.8 * rnd.nextGaussian()))
    val sorted = data.sorted
    var st = TDigest.empty(200.0)
    data.foreach(v => st = TDigest.insert(st, v))
    for (q <- Seq(0.01, 0.25, 0.5, 0.75, 0.95, 0.99)) {
      val est = TDigest.quantile(st, q)
      // rank error: position of estimate in sorted data close to q*n
      val rank = sorted.count(_ <= est).toDouble / n
      assert(math.abs(rank - q) < 0.01,
        s"q=$q est=$est rank=$rank")
    }
  }

  test("merge of split digests ≈ single digest (partial agg soundness)") {
    val rnd = new java.util.Random(11)
    val data = Array.fill(20000)(rnd.nextDouble() * 1000)
    val whole = data.foldLeft(TDigest.empty(200.0))(TDigest.insert)
    val parts = data.grouped(3000).map(
      _.foldLeft(TDigest.empty(200.0))(TDigest.insert)).toSeq
    val merged = parts.reduce(TDigest.merge)
    for (q <- Seq(0.1, 0.5, 0.9, 0.99)) {
      val a = TDigest.quantile(whole, q)
      val b = TDigest.quantile(merged, q)
      assert(math.abs(a - b) / 1000.0 < 0.01, s"q=$q whole=$a merged=$b")
    }
    assert(merged.total == 20000L)
  }

  test("as a Spark aggregate: matches exact percentile within 1% rank") {
    val df = spark.range(0L, 100000L, 1L, 16)
      .selectExpr("cast(pmod(id * 2654435761, 10000) as double) as v")
    val td = TDigestQuantiles(Seq(0.5, 0.95))
    val got = df.agg(td.column($"v")).as[Seq[Double]].head()
    val exact = df.selectExpr("percentile(v, array(0.5, 0.95)) as p")
      .as[Seq[Double]].head()
    assert(math.abs(got(0) - exact.head) / 10000.0 < 0.01)
    assert(math.abs(got(1) - exact(1)) / 10000.0 < 0.01)
  }

  test("profileWithQuantiles: sketches fused into the single stats pass") {
    import org.apache.spark.sql.{functions => F}
    val ds = graft.gen.SequenceGen.generate(spark, 20000L, nSources = 4,
      numPartitions = 8).toDF()
    val prof = graft.checks.ColumnStats.profileWithQuantiles(
      ds, Seq("source"), Seq("n_tok"))
    val rows = prof.select("source", "n_rows", "n_tok_q").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val qs = r.getSeq[Double](2)
      assert(qs.length == 5)
      assert(qs == qs.sorted) // monotone in q
    }
    // per-partition median tracks the exact one within 5%
    val exact = ds.groupBy("source")
      .agg(F.expr("percentile(CAST(n_tok AS DOUBLE), 0.5)").as("m"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    rows.filter(_.getLong(1) > 1000).foreach { r =>
      val med = r.getSeq[Double](2)(1)
      val ex = exact(r.getString(0))
      assert(math.abs(med - ex) <= math.max(0.05 * ex, 2.0),
        s"source=${r.getString(0)} med=$med exact=$ex")
    }
  }

  test("null inputs are skipped, not counted as zeros") {
    // 50% nulls alongside values centered at 100: a primitive-Double
    // input encoder decoded nulls as 0.0 and dragged the median to ~50
    val df = spark.range(0L, 20000L, 1L, 8)
      .selectExpr(
        "CASE WHEN id % 2 = 0 THEN CAST(90 + id % 21 AS DOUBLE) " +
          "ELSE CAST(NULL AS DOUBLE) END AS v")
    val td = TDigestQuantiles(Seq(0.5))
    val got = df.agg(td.column($"v")).as[Seq[Double]].head()
    assert(math.abs(got.head - 100.0) <= 2.0, s"median=${got.head}")
  }

  test("property: quantile estimates are monotone in q and within range") {
    val gen = Gen.listOfN(500, Gen.chooseNum(-1e6, 1e6))
    (1L to 20L).foreach { s =>
      val xs = gen.apply(Gen.Parameters.default, Seed(s)).get
      val st = xs.foldLeft(TDigest.empty(100.0))(TDigest.insert)
      val qs = Seq(0.0, 0.25, 0.5, 0.75, 1.0).map(TDigest.quantile(st, _))
      assert(qs == qs.sorted, s"seed=$s not monotone: $qs")
      assert(qs.head >= xs.min - 1e-9 && qs.last <= xs.max + 1e-9,
        s"seed=$s out of range")
    }
  }
}
