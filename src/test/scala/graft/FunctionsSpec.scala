package graft

import org.apache.spark.sql.{functions => F}

import graft.functions.ArrayAllBetween

/** Custom codegen expression: parity with forall semantics, null
  * handling, both codegen and interpreted paths, and that the compiler
  * actually routes the hot constraint shape through it. */
class FunctionsSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    ("in", Seq(1, 2, 3)),
    ("edge", Seq(0, 50256)),
    ("below", Seq(-1, 5)),
    ("above", Seq(5, 50257)),
    ("empty", Seq.empty[Int]))
    .toDF("id", "arr")

  test("matches forall semantics on int arrays (codegen path)") {
    val got = df.select($"id",
      ArrayAllBetween($"arr", 0L, 50256L).as("fast"),
      F.forall($"arr", x => x >= 0 && x <= 50256).as("ref"))
      .collect()
    got.foreach { r =>
      assert(r.getBoolean(1) == r.getBoolean(2), s"id=${r.getString(0)}")
    }
    assert(got.count(_.getBoolean(1)) == 3) // in, edge, empty
  }

  test("interpreted path agrees (eval without codegen)") {
    // force interpreted evaluation via filter on a tiny in-memory frame
    // with codegen disabled
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val got = df.select($"id", ArrayAllBetween($"arr", 0L, 50256L))
        .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
      assert(got("in") && got("edge") && got("empty"))
      assert(!got("below") && !got("above"))
    }
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val conf = spark.conf
    val olds = pairs.map { case (k, _) => k -> conf.getOption(k) }
    pairs.foreach { case (k, v) => conf.set(k, v) }
    try f finally olds.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None)    => conf.unset(k)
    }
  }

  test("null array is null (wrapped to pass by the compiler)") {
    val withNull = Seq(("a", Seq(1)), ("b", null)).toDF("id", "arr")
    val got = withNull.select($"id",
      ArrayAllBetween($"arr", 0L, 10L).as("v")).collect()
    assert(got.find(_.getString(0) == "b").get.isNullAt(1))
  }

  test("null elements pass (applicability semantics)") {
    val withNullElems = Seq(("a", Seq[Integer](1, null, 3)))
      .toDF("id", "arr")
    val got = withNullElems
      .select(ArrayAllBetween($"arr", 0L, 10L)).head().getBoolean(0)
    assert(got)
  }

  test("long and double arrays supported") {
    val longs = Seq(Tuple1(Seq(1L, 99999999999L))).toDF("arr")
    assert(!longs.select(ArrayAllBetween($"arr", 0L, 100L))
      .head().getBoolean(0))
    val doubles = Seq(Tuple1(Seq(0.5, 1.5))).toDF("arr")
    assert(doubles.select(ArrayAllBetween($"arr", 0L, 2L))
      .head().getBoolean(0))
    assert(!doubles.select(ArrayAllBetween($"arr", 1L, 2L))
      .head().getBoolean(0))
  }

  test("duplicate emission in one codegen function compiles (freshName)") {
    // Round-1 regression: every custom expression hardcoded Java locals
    // (i, n, counters, mins) in doGenCode; two copies of the body in ONE
    // generated function made Janino throw "Redefinition of local
    // variable" and Spark silently fell back to interpreted execution.
    // codegen.fallback=false turns that silent fallback into a test
    // failure; each expression is referenced twice in a single projection
    // / aggregate so the collision would fire deterministically.
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      // parquet-backed input: a local Seq relation is constant-folded by
      // ConvertToLocalRelation and the expressions never reach codegen
      val dir = java.nio.file.Files
        .createTempDirectory("graft-cg").toString + "/docs"
      Seq(("a", Seq(1, 2, 3), "one two three four five six"),
        ("b", Seq(4, 5), "seven eight nine ten eleven twelve"))
        .toDF("id", "arr", "text")
        .write.mode("overwrite").parquet(dir)
      val docs = spark.read.parquet(dir)
      val words = F.split(F.lower($"text"), "\\s+")
      val twice = docs.select(
        ArrayAllBetween($"arr", 0L, 10L).as("p1"),
        ArrayAllBetween($"arr", 1L, 9L).as("p2"),
        graft.functions.SimHash64(words).as("s1"),
        graft.functions.SimHash64(F.slice(words, 1, 3)).as("s2"),
        graft.functions.MinHashSig(
          graft.functions.ShingleHashes(words, 2), 16, 42L).as("m1"),
        graft.functions.MinHashSig(
          graft.functions.ShingleHashes(words, 3), 16, 7L).as("m2"),
        graft.functions.DotProduct(
          F.transform($"arr", x => x.cast("double")),
          F.transform($"arr", x => x.cast("double") * 2)).as("dp1"),
        graft.functions.DotProduct(
          F.transform($"arr", x => x.cast("double")),
          F.transform($"arr", x => x.cast("double") + 1)).as("dp2"),
        graft.functions.CosineSim(
          F.transform($"arr", x => x.cast("double")),
          F.transform($"arr", x => x.cast("double"))).as("cs1"),
        graft.functions.CosineSim(
          F.transform($"arr", x => x.cast("double") * 3),
          F.transform($"arr", x => x.cast("double"))).as("cs2"),
        graft.functions.HyperplaneBucket(
          F.transform($"arr", x => x.cast("double")), 3, 4, 42L).as("hb1"),
        graft.functions.HyperplaneBucket(
          F.transform($"arr", x => x.cast("double")), 3, 4, 7L).as("hb2"),
        graft.functions.WinnowedMins(
          graft.functions.ShingleHashes(words, 2), 3).as("wm1"),
        graft.functions.WinnowedMins(
          graft.functions.ShingleHashes(words, 2), 2).as("wm2"))
      assert(twice.collect().length == 2)

      // the original trigger: the same predicate under sum(when) AND
      // every() in the verdict aggregate
      import graft.dsl.Constraint._
      import graft.dsl.ConstraintSuite
      val suite = graft.compile.ConstraintCompiler.compile(
        ConstraintSuite("cg", Seq(
          EachElement("e1", "arr", Bounds("b1", "$", Some(0), Some(10))),
          EachElement("e2", "arr", Bounds("b2", "$", Some(1), Some(9))))))
      val verdict = graft.exec.Validator
        .validate(docs.withColumn("doc_id", $"id"), suite, Seq.empty)
      assert(verdict.collect().length == 1)
      // and the executed plan really is whole-stage-codegen'd (printed as
      // the `*(n)` prefix on codegen'd spans)
      val executed = verdict.queryExecution.executedPlan.toString
      assert(executed.contains("*("), executed)
    }
  }

  test("decimal bounds: every type branch, codegen'd, doc-engine parity") {
    import graft.functions.DecimalBounds
    def db(c: org.apache.spark.sql.Column, lo: Option[BigDecimal],
        hi: Option[BigDecimal], sLo: Boolean = false,
        sHi: Boolean = false) = DecimalBounds(c, lo, hi, sLo, sHi)
    withSQLConf("spark.sql.codegen.fallback" -> "false") {
      val dir = java.nio.file.Files
        .createTempDirectory("graft-db").toString + "/vals"
      Seq(
        ("in", 5L, 0.05, "0.5", BigDecimal("5.00")),
        ("edge", 10L, 0.1, "0.9999999999999999999999999999999999999999",
          BigDecimal("10.00")),
        ("out", 11L, 0.2, "abc", BigDecimal("10.01")))
        .toDF("id", "l", "d", "s", "dec")
        .write.mode("overwrite").parquet(dir)
      val t = spark.read.parquet(dir)
      val got = t.select($"id",
        // long fast path (whole-long bounds) + slow (fractional bound)
        db($"l", Some(BigDecimal(1)), Some(BigDecimal(10))).as("lf"),
        db($"l", Some(BigDecimal("0.5")), Some(BigDecimal("10.5"))).as("ls"),
        // double fast path (0.1 round-trips Double.toString) + slow
        db($"d", None, Some(BigDecimal("0.1"))).as("df"),
        db($"d", None,
          Some(BigDecimal("0.1000000000000000000000001"))).as("ds"),
        // string: unbounded exact compare (40 fraction digits) vs a
        // strict bound — the branch the old decimal(38,37) route
        // couldn't hold; non-numeric content fails, never throws
        db($"s", None, Some(BigDecimal(1)), sHi = true).as("sx"),
        // decimal child: direct BigDecimal compare
        db($"dec", None, Some(BigDecimal(10))).as("dc"))
        .collect().map(r => r.getString(0) ->
          (1 to 6).map(i => Option(r.get(i)).map(_ == true))).toMap
      assert(got("in") == Seq(Some(true), Some(true), Some(true),
        Some(true), Some(true), Some(true)))
      // edge: l=10 passes <=10 and <=10.5; d=0.1 passes <=0.1 and the
      // 25-digit bound; the 40-digit string is < 1 strictly; dec 10.00
      // <= 10 passes
      assert(got("edge") == Seq(Some(true), Some(true), Some(true),
        Some(true), Some(true), Some(true)))
      // out: 11 > 10 and > 10.5; 0.2 > both double bounds; "abc" is
      // non-numeric → false; dec 10.01 > 10
      assert(got("out") == Seq(Some(false), Some(false), Some(false),
        Some(false), Some(false), Some(false)))

      // doc-engine parity on the same values, same suite
      import graft.dsl.Constraint._
      import graft.dsl.ConstraintSuite
      val suite = ConstraintSuite("p", Seq(
        Bounds("b", "v", None, Some(BigDecimal(1)), exclusiveMax = true)))
      val compiled = graft.compile.ConstraintCompiler.compile(suite)
      val doc = graft.exec.DocValidator.compile(suite)
      for (v <- Seq("0.9999999999999999999999999999999999999999",
          "abc", "1", "0.5", "1e-40")) {
        // Catalyst over a string-typed column vs the doc engine over
        // the equivalent string-typed JSON value — the content-typing
        // contract both engines share
        val catalyst = Seq(Tuple1(v)).toDF("v")
          .select(compiled.rowPredicate).collect()(0).getBoolean(0)
        assert(catalyst ==
          graft.exec.DocValidator.validate(doc, s"""{"v": "$v"}"""),
          s"parity break on $v")
      }
      val executed = t.select(db($"l", Some(BigDecimal(1)), None))
        .queryExecution.executedPlan.toString
      assert(executed.contains("*("), executed)
    }
  }

  test("winnowed mins: sliding-window minima, distinct, guarantee holds") {
    import graft.functions.WinnowedMins
    val arrs = Seq(
      ("a", Seq(5L, 3L, 8L, 1L, 9L, 2L)),
      ("short", Seq(7L, 4L)),   // shorter than w → single global min
      ("empty", Seq.empty[Long]))
      .toDF("id", "h")
    val got = arrs.select($"id", WinnowedMins($"h", 3).as("m"))
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    // windows of 3 over (5,3,8,1,9,2): mins 3,1,1,1 → distinct {1,3}
    assert(got("a") == Seq(1L, 3L))
    assert(got("short") == Seq(4L))
    assert(got("empty") == Seq.empty)

    // the winnowing guarantee, end to end: equal runs of w+k-1 tokens
    // share a selected fingerprint whatever surrounds them
    val k = 2; val w = 3
    val shared = "alpha beta gamma delta epsilon" // 5 words = w+k-1+1
    val docs = Seq(
      ("x", s"one two three $shared xx yy"),
      ("y", s"$shared completely different tail here"))
      .toDF("id", "text")
    val words = F.split(F.lower($"text"), "\\s+")
    val fps = docs.select($"id", F.explode(WinnowedMins(
      graft.functions.ShingleHashes(words, k), w)).as("fp"))
    val common = fps.groupBy("fp").count().filter($"count" > 1)
    assert(common.count() >= 1)
  }

  test("compiler routes EachElement+Bounds through the fast path") {
    import graft.dsl.Constraint._
    import graft.dsl.ConstraintSuite
    val suite = graft.compile.ConstraintCompiler.compile(
      ConstraintSuite("f", Seq(EachElement("e", "arr",
        Bounds("b", "$", Some(0), Some(50256))))))
    val plan = df.select(suite.rowPredicate.as("ok"))
      .queryExecution.analyzed.toString
    assert(plan.contains("arrayallbetween") ||
      plan.contains("ArrayAllBetween"), plan)
    // and fractional bounds fall back to forall
    val frac = graft.compile.ConstraintCompiler.compile(
      ConstraintSuite("f2", Seq(EachElement("e", "arr",
        Bounds("b", "$", Some(BigDecimal("0.5")), None)))))
    val plan2 = df.select(frac.rowPredicate.as("ok"))
      .queryExecution.analyzed.toString
    assert(plan2.contains("forall"), plan2)
  }
}
