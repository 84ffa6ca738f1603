package graft

import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

import graft.compile.{ConstraintCompiler, JsonSchemaImport}
import graft.exec.Validator

/** End-to-end conformance in the official suite's LITERAL case shape —
  * `{description, schema, tests: [{row(data), valid}]}` with `schema`
  * being an actual JSON Schema document (the reference runner's exact
  * input format, Draft2020Runner.java:166-258): schema → importer →
  * DSL → Catalyst → verdict, asserted against the golden boolean. */
class SchemaConformanceSpec extends SparkSpec {
  import ConformanceRows.{rowSchema, rowFrom}

  test("schema corpus: imported JSON Schemas match their golden verdicts") {
    val in = getClass.getClassLoader
      .getResourceAsStream("conformance/schema_corpus.json")
    assert(in != null, "schema corpus resource missing")
    val corpus = new ObjectMapper().readTree(in)
    var passed, failed = 0
    val failures = Seq.newBuilder[String]
    corpus.elements().asScala
      // recursive-schema groups bind to nested instances the flat test
      // row cannot carry — the document engine replays them instead
      .filter(c => !c.path("docOnly").asBoolean(false))
      .foreach { c =>
      val desc = c.get("description").asText()
      // optional per-case remote documents — the official suite's
      // remotes/ registry, keyed by absolute URI
      val remotes = Option(c.get("remotes")).map(_.properties().asScala
        .map(e => e.getKey -> e.getValue.toString).toMap)
        .getOrElse(Map.empty[String, String])
      val suite = ConstraintCompiler.compile(
        JsonSchemaImport.translate(c.get("schema").toString, desc,
          remotes = remotes))
      c.get("tests").elements().asScala.foreach { t =>
        val tdesc = t.get("description").asText()
        val expected = t.get("valid").asBoolean()
        val df = spark.createDataFrame(
          java.util.List.of(rowFrom(t.get("row"))), rowSchema)
        val got = Validator.validate(df, suite, Seq.empty)
          .select("rows_ok").head().getBoolean(0)
        if (got == expected) passed += 1
        else {
          failed += 1
          failures += s"$desc :: $tdesc (expected $expected, got $got)"
        }
      }
    }
    info(s"schema conformance: $passed passed, $failed failed")
    assert(failed == 0, failures.result().mkString("\n"))
    assert(passed >= 520, "schema corpus unexpectedly small")
  }
}
