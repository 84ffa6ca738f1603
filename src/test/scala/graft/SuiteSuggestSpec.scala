package graft

import org.apache.spark.sql.{functions => F}

import graft.compile.{ConstraintCompiler, SuiteSuggest}
import graft.dsl.Constraint._
import graft.dsl.ConstraintJson
import graft.exec.Validator
import graft.gen.SequenceGen

/** Constraint-suite bootstrapping: profile → suggested suite. The core
  * invariant is self-consistency — a suite derived from a table's own
  * observed statistics validates that table with zero violations. */
class SuiteSuggestSpec extends SparkSpec {
  import spark.implicits._

  test("suggested suite validates its own source table cleanly") {
    val df = SequenceGen.generate(spark, 20000L, nSources = 4,
      plantViolations = true).toDF()
    val suite = SuiteSuggest.suggest(df, "boot")
    // shape: the sequence table should yield enum(source), bounds on
    // n_tok, size+element bounds on tokens, length bounds on doc_id
    val byId = suite.constraints.map(c => c.id -> c).toMap
    assert(byId.contains("source.enum"),
      s"expected a source enum, got: ${suite.constraints.map(_.id)}")
    assert(byId.contains("n_tok.bounds"))
    assert(byId.contains("tokens.size"))
    assert(byId.contains("tokens.items"))
    assert(byId.contains("doc_id.length"))
    // self-consistency: every observed row satisfies observed stats
    val res = Validator.validate(df, ConstraintCompiler.compile(suite),
      Seq.empty)
    assert(res.select("rows_ok").head().getBoolean(0),
      "suggested suite must accept the table it was derived from")
    // and it round-trips through the JSON serialization
    val back = ConstraintJson.parseSuite(ConstraintJson.renderSuite(suite))
    assert(back == suite)
  }

  test("suggested suite rejects data outside the observed envelope") {
    val df = SequenceGen.generate(spark, 5000L, nSources = 4,
      plantViolations = false).toDF()
    val suite = ConstraintCompiler.compile(SuiteSuggest.suggest(df, "boot"))
    val bad = df.limit(10).withColumn("source", F.lit("src_never_seen"))
    val v = Validator.validateWithDetails(bad, suite, Seq.empty).violations
    assert(v.filter(F.col("constraint_id") === "source.enum").count() == 10L)
  }

  test("enum candidacy: comma-carrying values are dropped, not broken") {
    val df = Seq(("a,b", 1), ("c", 2), ("a,b", 3))
      .toDF("tag", "n")
    val prof = SuiteSuggest.profile(df).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    // tag has n_distinct=2 <= 16 but a value contains the separator
    assert(prof("tag").getAs[String]("enum_vals") == null)
    val suite = SuiteSuggest.suggest(df, "s")
    assert(!suite.constraints.exists(_.id == "tag.enum"))
    assert(suite.constraints.exists(_.id == "tag.length"))
    // n IS a clean enum candidate
    assert(suite.constraints.collectFirst {
      case IsIn("n.enum", "n", vs) => vs
    }.contains(Seq("1", "2", "3")))
  }

  test("profile statistics are exact on a hand-computed frame") {
    val df = Seq(
      (Some(5), Some("ab"), Seq(1, 9)),
      (None, Some("abcd"), Seq(3)),
      (Some(-2), None, Seq(7, 7, 7)))
      .toDF("num", "s", "arr")
    val p = SuiteSuggest.profile(df).collect()
      .map(r => r.getAs[String]("column") -> r).toMap
    assert(p("num").getAs[Long]("n_rows") == 3L)
    assert(p("num").getAs[Long]("null_count") == 1L)
    assert(p("num").getAs[Long]("n_distinct") == 2L)
    assert(p("num").getAs[Double]("min_num") == -2.0)
    assert(p("num").getAs[Double]("max_num") == 5.0)
    assert(p("s").getAs[Long]("len_min") == 2L)
    assert(p("s").getAs[Long]("len_max") == 4L)
    assert(p("arr").getAs[Double]("elem_min") == 1.0)
    assert(p("arr").getAs[Double]("elem_max") == 9.0)
    assert(p("arr").getAs[Long]("len_min") == 1L)
    assert(p("arr").getAs[Long]("len_max") == 3L)
    // arrays carry no distinct count (not an atomic column)
    assert(p("arr").isNullAt(p("arr").fieldIndex("n_distinct")))
  }
}
