package graft

import org.apache.spark.sql.{functions => F}
import org.apache.spark.sql.types._

import graft.dsl.Constraint._
import graft.dsl.ConstraintSuite
import graft.exec.JsonValidator

/** Distributed raw-JSON-document validation: the reference's literal
  * instance shape (a JSON string) at table scale — schema-free doc
  * engine in a distributed map, and the from_json + Catalyst lowering,
  * pinned to each other. */
class JsonValidatorSpec extends SparkSpec {
  import spark.implicits._

  private val suite = ConstraintSuite("js", Seq(
    NotNull("id_req", "doc_id"),
    Bounds("n_max", "n_tok", None, Some(BigDecimal(100))),
    IsIn("src", "source", Seq("web", "books")),
    EachElement("toks", "tokens",
      Bounds("t", "$", Some(BigDecimal(0)), Some(BigDecimal(9))))))

  private val docs = Seq(
    ("r1", """{"doc_id":"a","n_tok":5,"tokens":[1,2],"source":"web"}"""),
    ("r2", """{"doc_id":"b","n_tok":500,"tokens":[1],"source":"web"}"""),
    ("r3", """{"n_tok":5,"tokens":[1],"source":"books"}"""),
    ("r4", """{"doc_id":"d","n_tok":5,"tokens":[1,99],"source":"mars"}"""),
    ("r5", """this is not json at {{{"""),
    ("r6", null.asInstanceOf[String]))
    .toDF("id", "js").repartition(3)

  test("schema-free path: verdicts and violations over raw JSON strings") {
    val compiled = JsonValidator.compile(suite)
    val v = JsonValidator.verdicts(docs, "id", "js", compiled)
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(v == Map("r1" -> true, "r2" -> false, "r3" -> false,
      "r4" -> false, "r5" -> false, "r6" -> false))

    val viol = JsonValidator.violations(docs, "id", "js", compiled)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viol == Set(
      ("r2", "n_max"), ("r3", "id_req"), ("r4", "src"), ("r4", "toks"),
      ("r5", JsonValidator.DocumentConstraint),
      ("r6", JsonValidator.DocumentConstraint)))
  }

  test("typed lowering agrees with the doc engine; malformed rows flagged") {
    val schema = StructType(Seq(
      StructField("doc_id", StringType),
      StructField("n_tok", IntegerType),
      StructField("tokens", ArrayType(IntegerType)),
      StructField("source", StringType)))
    // FULL four-field parity (incl. observed/expected rendering) — the
    // shared-oracle contract is that the engines emit identical rows
    val typed = JsonValidator
      .violationsTyped(docs, "id", "js", schema, suite)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    val docEngine = JsonValidator
      .violations(docs, "id", "js", JsonValidator.compile(suite))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(typed == docEngine)
  }

  test("typed path requires objects — the documented divergence") {
    // a bare array / scalar / null literal is a VALID JSON document: the
    // schema-free engine applies pass-on-null semantics, while the
    // struct-schema'd typed path charges _document (its contract)
    val nonObj = Seq(("n1", "[1,2]"), ("n2", "7"), ("n3", "null"))
      .toDF("id", "js")
    val relaxed = ConstraintSuite("r", Seq(
      Bounds("n_max", "n_tok", None, Some(BigDecimal(100)))))
    val free = JsonValidator
      .verdicts(nonObj, "id", "js", JsonValidator.compile(relaxed))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(free == Map("n1" -> true, "n2" -> true, "n3" -> true))
    val schema = StructType(Seq(StructField("n_tok", IntegerType)))
    val typed = JsonValidator
      .violationsTyped(nonObj, "id", "js", schema, relaxed)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(typed == Set(("n1", JsonValidator.DocumentConstraint),
      ("n2", JsonValidator.DocumentConstraint),
      ("n3", JsonValidator.DocumentConstraint)))
  }

  test("variant path: agrees with the doc engine incl. non-objects") {
    val schema = StructType(Seq(
      StructField("doc_id", StringType),
      StructField("n_tok", IntegerType),
      StructField("tokens", ArrayType(IntegerType)),
      StructField("source", StringType)))
    val variant = JsonValidator
      .violationsVariant(docs, "id", "js", schema, suite)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    val docEngine = JsonValidator
      .violations(docs, "id", "js", JsonValidator.compile(suite))
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2),
        r.getString(3))).toSet
    assert(variant == docEngine)

    // valid NON-OBJECT documents: variant extracts null per column →
    // pass-on-null, matching the schema-free engine (not from_json)
    val nonObj = Seq(("n1", "[1,2]"), ("n2", "7"), ("n3", "null"))
      .toDF("id", "js")
    val relaxed = ConstraintSuite("r", Seq(
      Bounds("n_max", "n_tok", None, Some(BigDecimal(100)))))
    assert(JsonValidator
      .violationsVariant(nonObj, "id", "js",
        StructType(Seq(StructField("n_tok", IntegerType))), relaxed)
      .isEmpty)

    // duplicate-key contract: parse_json rejects duplicates by default
    // (→ _document), while the sibling engines apply last-key-wins;
    // the documented conf restores last-key-wins on this path
    val dup = Seq(("d1", """{"n_tok":1,"n_tok":500}""")).toDF("id", "js")
    val viaVariant = JsonValidator.violationsVariant(dup, "id", "js",
      StructType(Seq(StructField("n_tok", IntegerType))), relaxed)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(viaVariant == Set(("d1", JsonValidator.DocumentConstraint)))
    assert(JsonValidator
      .violations(dup, "id", "js", JsonValidator.compile(relaxed))
      .collect().map(_.getString(1)).toSet == Set("n_max")) // last wins
    val conf = spark.conf
    conf.set("spark.sql.variant.allowDuplicateKeys", "true")
    try {
      val lenient = JsonValidator.violationsVariant(dup, "id", "js",
        StructType(Seq(StructField("n_tok", IntegerType))), relaxed)
        .collect().map(_.getString(1)).toSet
      assert(lenient == Set("n_max"))
    } finally conf.unset("spark.sql.variant.allowDuplicateKeys")

    // quote/backslash field names refuse loudly (variant path syntax)
    assert(intercept[IllegalArgumentException] {
      JsonValidator.violationsVariant(nonObj, "id", "js",
        StructType(Seq(StructField("it's", IntegerType))), relaxed)
    }.getMessage.contains("violationsTyped"))
  }

  test("stored-variant column: no parse step, agrees with doc engine") {
    val schema = StructType(Seq(
      StructField("doc_id", StringType),
      StructField("n_tok", IntegerType),
      StructField("tokens", ArrayType(IntegerType)),
      StructField("source", StringType)))
    // the lakehouse shape: parse ONCE at write time, persist the binary
    val dir = java.nio.file.Files
      .createTempDirectory("graft-varcol").toString
    docs.select($"id", F.try_parse_json($"js").as("v"))
      .write.mode("overwrite").parquet(dir)
    val out = JsonValidator.violationsVariantColumn(
      spark.read.parquet(dir), "id", "v", schema, suite)
    // read-side plan has NO parse: extractions run off the stored binary
    assert(!out.queryExecution.optimizedPlan.toString
      .toLowerCase.contains("parse_json"))

    val tup = (r: org.apache.spark.sql.Row) =>
      (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
    val varcol = out.collect().map(tup).toSet
    val docEngine = JsonValidator
      .violations(docs, "id", "js", JsonValidator.compile(suite))
      .collect().map(tup).toSet
    // full parity except _document `observed`: the raw text is not
    // stored on this path (the writer persisted a NULL variant), so it
    // renders "null" while the string paths carry the truncated text
    def mask(s: Set[(String, String, String, String)]) = s.map(t =>
      if (t._2 == JsonValidator.DocumentConstraint) t.copy(_3 = "?")
      else t)
    assert(mask(varcol) == mask(docEngine))
    assert(varcol.filter(_._2 == JsonValidator.DocumentConstraint)
      .forall(_._3 == "null"))
    assert(varcol.exists(_._2 == JsonValidator.DocumentConstraint))
  }

  test("round-trip: to_json of a typed table validates like the table") {
    val base = Seq(
      ("a", Seq(1, 2, 3), 3, "web"),
      ("b", Seq(1, 2), 5, "web"),     // n_tok inconsistent but in range
      ("c", Seq(120), 1, "books"))    // token out of range
      .toDF("doc_id", "tokens", "n_tok", "source")
    val js = base.select(F.col("doc_id").as("id"),
      F.to_json(F.struct(F.col("doc_id"), F.col("tokens"),
        F.col("n_tok"), F.col("source"))).as("js"))
    val v = JsonValidator
      .verdicts(js, "id", "js", JsonValidator.compile(suite))
      .collect().map(r => r.getString(0) -> r.getBoolean(1)).toMap
    assert(v == Map("a" -> true, "b" -> true, "c" -> false))
  }
}
