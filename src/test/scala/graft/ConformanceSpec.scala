package graft

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import scala.jdk.CollectionConverters._

import graft.compile.ConstraintCompiler
import graft.dsl.{ConstraintJson, ConstraintSuite}
import graft.exec.Validator

/**
 * Golden-output conformance runner — the structural mirror of the
 * reference's JSON-Schema-Test-Suite runners
 * (`Draft2020Runner.java:166-258`): load a corpus of
 * `{description, constraints, tests:[{row, valid}]}` cases, compile each
 * constraint set once, validate each row, assert the golden boolean.
 * Pass/fail/skip counters reported like `Draft2020Runner.java:260-273`.
 */
class ConformanceSpec extends SparkSpec {
  import ConformanceRows.{rowSchema, rowFrom}

  test("conformance corpus: every case matches its golden verdict") {
    val in = getClass.getClassLoader
      .getResourceAsStream("conformance/corpus.json")
    assert(in != null, "corpus resource missing")
    val corpus = new ObjectMapper().readTree(in)
    var passed, failed = 0
    val failures = Seq.newBuilder[String]

    corpus.elements().asScala
      // the "SKIP-LIST" entry documents non-portable official-suite
      // groups (dynamicRef, value-type type.json cases, …) and carries
      // no tests
      .filter(c => c.path("tests").size() > 0) // path(): doc-only entries without a tests key stay skippable, not an NPE
      // `docOnly` cases (recursive refs → nested instances) have no
      // expressible binding onto this runner's FLAT row schema; the
      // document engine replays them in DocValidatorSpec
      .filter(c => !c.path("docOnly").asBoolean(false))
      .foreach { c =>
      val desc = c.get("description").asText()
      val constraints = c.get("constraints").elements().asScala
        .map(ConstraintJson.parseConstraint).toSeq
      // optional cross-suite context: a per-case registry of referenced
      // suites plus the case's own $dynamicAnchor declarations — the
      // corpus form of the official suite's `$defs`/remote-schema blocks
      val registry = graft.registry.ConstraintRegistry.empty
      Option(c.get("registry")).foreach(_.elements().asScala.foreach { s =>
        val st = ConstraintJson.suiteFromNode(s)
        registry.register(st.id, st)
      })
      val anchors = Option(c.get("dynamicAnchors"))
        .map(_.elements().asScala.map(_.asText()).toSeq).getOrElse(Nil)
      val suite = ConstraintCompiler.compile(
        ConstraintSuite(desc, constraints, anchors), registry)
      c.get("tests").elements().asScala.foreach { t =>
        val tdesc = t.get("description").asText()
        val expected = t.get("valid").asBoolean()
        val df = spark.createDataFrame(
          java.util.List.of(rowFrom(t.get("row"))), rowSchema)
        val got = Validator.validate(df, suite, Seq.empty)
          .select("rows_ok").head().getBoolean(0)
        if (got == expected) passed += 1
        else { failed += 1; failures += s"$desc :: $tdesc (expected $expected, got $got)" }
      }
    }
    info(s"conformance: $passed passed, $failed failed " +
      f"(${100.0 * passed / (passed + failed)}%.1f%% pass rate)")
    assert(failed == 0, failures.result().mkString("\n"))
    assert(passed >= 820, "corpus unexpectedly small")
  }
}
