package graft

import org.apache.spark.sql.{functions => F}

import graft.compile.ConstraintCompiler
import graft.dsl.Constraint._
import graft.dsl.ConstraintSuite
import graft.exec.Validator
import graft.gen.SequenceGen

/** Invariants from BASELINE.json's input_hint: token-array equality
  * through the engine, generator determinism across parallelism. */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  test("token-array equality: validation never perturbs the data") {
    val ds = SequenceGen.generate(spark, 5000L, nSources = 4,
      numPartitions = 8)
    val suite = ConstraintCompiler.compile(ConstraintSuite("p", Seq(
      EachElement("t", "tokens", Bounds("b", "$", Some(0), Some(50256))),
      SizeConsistency("sc", "n_tok", "tokens"))))
    val df = ds.toDF()
    // run the detail path, then re-derive (doc_id, tokens) from the SAME
    // source and diff against the input — must be byte-identical
    Validator.validateWithDetails(df, suite, Seq("source")).violations
      .count()
    val before = df.select($"doc_id", $"tokens")
    val after = SequenceGen.generate(spark, 5000L, nSources = 4,
      numPartitions = 8).toDF().select($"doc_id", $"tokens")
    assert(before.exceptAll(after).isEmpty)
    assert(after.exceptAll(before).isEmpty)
  }

  test("generator determinism across partition counts") {
    val a = SequenceGen.generate(spark, 3000L, 4, 42L, true, 2)
      .toDF().selectExpr("doc_id", "xxhash64(doc_id, tokens, n_tok, source) as h")
    val b = SequenceGen.generate(spark, 3000L, 4, 42L, true, 16)
      .toDF().selectExpr("doc_id", "xxhash64(doc_id, tokens, n_tok, source) as h")
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("fast path and detail path agree on validity") {
    val ds = SequenceGen.generate(spark, 30000L, nSources = 4,
      numPartitions = 8).toDF()
    val suite = ConstraintCompiler.compile(ConstraintSuite("agree", Seq(
      SizeConsistency("sc", "n_tok", "tokens"),
      EachElement("tr", "tokens", Bounds("b", "$", Some(0), Some(50256))),
      Matches("m", "doc_id", "^seq-"))))
    val fast = Validator.validate(ds, suite, Seq("source"))
      .select("source", "n_bad_rows").as[(String, Long)].collect().toMap
    val detail = Validator.validateWithDetails(ds, suite, Seq("source"))
    // distinct bad doc_ids per source from violations == n_bad_rows
    val bad = detail.violations
      .join(ds.select($"doc_id".cast("string").as("doc_id"), $"source"),
        Seq("doc_id"))
      .groupBy("source").agg(F.countDistinct("doc_id").as("n"))
      .as[(String, Long)].collect().toMap
    fast.foreach { case (src, n) =>
      assert(bad.getOrElse(src, 0L) == n, s"source=$src")
    }
  }
}
