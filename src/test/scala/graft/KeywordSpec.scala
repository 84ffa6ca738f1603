package graft

import org.apache.spark.sql.{functions => F}

import graft.compile.ConstraintCompiler
import graft.dsl.Constraint._
import graft.dsl.ConstraintSuite
import graft.exec.Validator
import graft.registry.ConstraintRegistry

/** Round-2 keyword coverage: patternProperties / properties value
  * subschemas on map columns, unevaluatedItems/unevaluatedProperties
  * static coverage analysis, ref fragments + anchors, and the
  * instance_path violation field. */
class KeywordSpec extends SparkSpec {
  import spark.implicits._

  private val maps = Seq(
    ("m1", Map("x-a" -> "1", "x-b" -> "2", "note" -> "ok")),
    ("m2", Map("x-a" -> "oops", "note" -> "ok")),
    ("m3", Map("note" -> "this-note-is-rather-long")),
    ("m4", Map.empty[String, String]))
    .toDF("doc_id", "attrs")

  private def failures(suite: ConstraintSuite,
      df: org.apache.spark.sql.DataFrame = maps): Set[(String, String)] =
    Validator.validateWithDetails(
        df, ConstraintCompiler.compile(suite), Seq.empty)
      .violations.select("doc_id", "constraint_id")
      .as[(String, String)].collect().toSet

  test("patternValues: value subschema for regex-matched keys") {
    val suite = ConstraintSuite("pv", Seq(
      PatternValues("xs_numeric", "attrs", "^x-",
        TypeIs("t", "$", "integer"))))
    assert(failures(suite) == Set("m2" -> "xs_numeric"))
  }

  test("propertyValues: subschema for one key; absent key passes") {
    val suite = ConstraintSuite("p", Seq(
      PropertyValues("note_len", "attrs", "note",
        LengthBounds("l", "$", None, Some(10)))))
    assert(failures(suite) == Set("m3" -> "note_len"))
  }

  test("unevaluatedProperties: only uncovered keys are checked") {
    // x-* covered by patternValues, note covered by propertyValues —
    // nothing uncovered, so even m3's long note passes the unevaluated
    // check (it is evaluated by note_len, which itself fails)
    val covered = ConstraintSuite("u1", Seq(
      PatternValues("xs", "attrs", "^x-", TypeIs("t", "$", "integer")),
      PropertyValues("note_len", "attrs", "note",
        LengthBounds("l", "$", None, Some(10))),
      UnevaluatedProperties("no_extra", "attrs", BoolSchema("f", false))))
    val f1 = failures(covered)
    assert(!f1.exists(_._2 == "no_extra"), f1)

    // drop the note coverage: 'note' becomes unevaluated and the
    // false-schema flags every row that HAS a note key
    val uncovered = ConstraintSuite("u2", Seq(
      PatternValues("xs", "attrs", "^x-", TypeIs("t", "$", "integer")),
      UnevaluatedProperties("no_extra", "attrs", BoolSchema("f", false))))
    val f2 = failures(uncovered)
    assert(f2.filter(_._2 == "no_extra").map(_._1) == Set("m1", "m2", "m3"))
  }

  test("unevaluatedProperties: KeysIn (additionalProperties) covers all") {
    val suite = ConstraintSuite("u3", Seq(
      KeysIn("allow", "attrs", Seq("x-a", "x-b", "note")),
      UnevaluatedProperties("no_extra", "attrs", BoolSchema("f", false))))
    assert(!failures(suite).exists(_._2 == "no_extra"))
  }

  test("unevaluatedItems: prefix coverage leaves the tail checked") {
    val arrs = Seq(
      ("a1", Seq(1, 2, 3)),   // tail (3) violates <= 2
      ("a2", Seq(1, 2)),      // fully covered by prefix
      ("a3", Seq(9, 9, 1)))   // prefix exempt, tail 1 passes
      .toDF("doc_id", "xs")
    val suite = ConstraintSuite("ui", Seq(
      PrefixItems("prefix", "xs", Seq(
        Bounds("p0", "$", None, Some(9)), Bounds("p1", "$", None, Some(9)))),
      UnevaluatedItems("tail_small", "xs",
        Bounds("b", "$", None, Some(2)))))
    val f = failures(suite, arrs)
    assert(f.filter(_._2 == "tail_small").map(_._1) == Set("a1"))

    // eachElement on the same column covers everything → no failures
    val full = ConstraintSuite("ui2", Seq(
      EachElement("all", "xs", Bounds("b0", "$", None, Some(9))),
      UnevaluatedItems("tail_small", "xs", BoolSchema("f", false))))
    assert(!failures(full, arrs).exists(_._2 == "tail_small"))

    // prefixItems + items-after-prefix together also cover everything
    val pfxTail = ConstraintSuite("ui3", Seq(
      PrefixItems("prefix", "xs", Seq(Bounds("p0", "$", None, Some(9)))),
      EachElementFrom("rest", "xs", 1, Bounds("b1", "$", None, Some(9))),
      UnevaluatedItems("tail_small", "xs", BoolSchema("f", false))))
    assert(!failures(pfxTail, arrs).exists(_._2 == "tail_small"))
  }

  test("unevaluatedItems: coverage GAP between prefix and items-after") {
    import spark.implicits._
    // PrefixItems covers [0,1); EachElementFrom covers [2,∞) — only
    // position 1 is unevaluated. 2020-12 annotation semantics: the
    // unevaluated schema must NOT re-apply to the evaluated tail.
    val arrs = Seq(
      ("g1", Seq(9, 999, 5)),   // gap position 1 violates <= 100
      ("g2", Seq(9, 5, 999)),   // 999 at pos 2 IS evaluated → no flag
      ("g3", Seq(9)))           // no gap element present → passes
      .toDF("doc_id", "xs")
    val suite = ConstraintSuite("gap", Seq(
      PrefixItems("prefix", "xs", Seq(Bounds("p0", "$", None, Some(9)))),
      EachElementFrom("tail", "xs", 2, Bounds("b1", "$", None, Some(1000))),
      UnevaluatedItems("gap_small", "xs",
        Bounds("b", "$", None, Some(100)))))
    val f = failures(suite, arrs)
    assert(f.filter(_._2 == "gap_small").map(_._1) == Set("g1"), f)
  }

  test("map violations: observed stays narrow on a 100-key map") {
    import spark.implicits._
    val wide = Seq(
      ("w1", (1 to 100).map(i => s"key-$i" -> s"v$i").toMap))
      .toDF("doc_id", "attrs")
    // separate suites: KeysIn/PatternValues would otherwise COVER the
    // map and rewrite unevaluatedProperties away
    val suites = Seq(
      ConstraintSuite("w_keys", Seq(
        KeysIn("allow", "attrs", Seq("key-1")))),
      ConstraintSuite("w_pat", Seq(
        PatternValues("pv", "attrs", "^key-", BoolSchema("f", false)))),
      ConstraintSuite("w_unev", Seq(
        PropertyValues("p1", "attrs", "key-1",
          TypeIs("t", "$", "string")),
        UnevaluatedProperties("no_extra", "attrs",
          BoolSchema("f", false)))))
    val obs = suites.flatMap { s =>
      Validator.validateWithDetails(
          wide, ConstraintCompiler.compile(s), Seq.empty)
        .violations.select("constraint_id", "observed")
        .as[(String, String)].collect()
    }.toMap
    assert(obs.keySet == Set("allow", "pv", "no_extra"), obs)
    obs.foreach { case (cid, o) =>
      assert(o.length < 160, s"$cid observed too wide: $o")
      assert(o.contains("more"), s"$cid not truncated: $o")
    }
  }

  test("ref fragments and anchors: suite#cid, #cid, errors") {
    val reg = ConstraintRegistry.empty
    reg.register("common", ConstraintSuite("common", Seq(
      AllOf("grp", Seq(
        Bounds("positive", "n", Some(0), None),
        Bounds("small", "n", None, Some(10)))))))
    val df = Seq(("r1", 5), ("r2", 50), ("r3", -1)).toDF("doc_id", "n")

    // fragment: only the 'small' constraint is inlined, not 'positive'
    val frag = ConstraintCompiler.compile(ConstraintSuite("s", Seq(
      Ref("use_small", "common#small"))), reg)
    val bad = df.withColumn("ok", frag.rowPredicate)
      .filter(!F.col("ok")).select("doc_id").as[String].collect().toSet
    assert(bad == Set("r2")) // r3 (-1) passes: 'positive' NOT referenced

    // self-fragment: #cid resolves inside the suite being compiled
    val self = ConstraintCompiler.compile(ConstraintSuite("s2", Seq(
      Bounds("lo", "n", Some(0), None),
      IfThen("cond", ExprIs("always", "true"), Ref("again", "#lo")))), reg)
    val bad2 = df.withColumn("ok", self.rowPredicate)
      .filter(!F.col("ok")).select("doc_id").as[String].collect().toSet
    assert(bad2 == Set("r3"))

    // nested refs across suites: mid → base, compiled transitively
    reg.register("base", ConstraintSuite("base", Seq(
      Bounds("nonneg", "n", Some(0), None))))
    reg.register("mid", ConstraintSuite("mid", Seq(
      Ref("useBase", "base"),
      Bounds("cap", "n", None, Some(10)))))
    val nested = ConstraintCompiler.compile(ConstraintSuite("s5", Seq(
      Ref("useMid", "mid"))), reg)
    val bad3 = df.withColumn("ok", nested.rowPredicate)
      .filter(!F.col("ok")).select("doc_id").as[String].collect().toSet
    assert(bad3 == Set("r2", "r3")) // both suites' constraints apply

    // unresolved fragment → descriptive compile error
    val e = intercept[ConstraintCompiler.CompileException] {
      ConstraintCompiler.compile(ConstraintSuite("s3", Seq(
        Ref("r", "common#nope"))), reg)
    }
    assert(e.getMessage.contains("unresolved fragment"))

    // fragment cycles still detected
    reg.register("loop", ConstraintSuite("loop", Seq(
      AllOf("a", Seq(Ref("b", "loop#a"))))))
    val e2 = intercept[ConstraintCompiler.CompileException] {
      ConstraintCompiler.compile(ConstraintSuite("s4", Seq(
        Ref("r", "loop#a"))), reg)
    }
    assert(e2.getMessage.contains("cyclic"))
  }

  test("instance_path: column paths and first failing element index") {
    val df = Seq(
      ("d1", 500, Seq(1, 2, 3)),
      ("d2", 5, Seq(1, 999, 3, 999)))
      .toDF("doc_id", "n_chars", "tokens")
    val suite = ConstraintCompiler.compile(ConstraintSuite("ip", Seq(
      Bounds("nc", "n_chars", None, Some(400)),
      EachElement("tok", "tokens", Bounds("b", "$", None, Some(100))))))
    val got = Validator.validateWithDetails(df, suite, Seq.empty)
      .violations.select("doc_id", "constraint_id", "instance_path")
      .as[(String, String, String)].collect().toSet
    assert(got == Set(
      ("d1", "nc", "/n_chars"),
      ("d2", "tok", "/tokens/1"))) // FIRST failing index (0-based)
  }

  test("strict formats: ipv6 / hostname / time / json-pointer / duration") {
    def ok(fmt: String, value: String): Boolean = {
      val df = Seq(Tuple1(value)).toDF("v")
      val suite = ConstraintCompiler.compile(ConstraintSuite("f", Seq(
        FormatIs("fc", "v", fmt, strict = true))))
      df.select(suite.rowPredicate.as("ok")).head().getBoolean(0)
    }
    assert(ok("ipv6", "2001:db8:85a3:0:0:8a2e:370:7334"))
    assert(ok("ipv6", "::1") && ok("ipv6", "fe80::1"))
    assert(!ok("ipv6", "2001:db8::85a3::1") && !ok("ipv6", "12345::"))
    // group-count bounds: "::" stands for >= 1 zero group, so a
    // compressed form never totals more than 8 groups
    assert(!ok("ipv6", "1:2:3:4:5:6:7:8::"))
    assert(!ok("ipv6", "::1:2:3:4:5:6:7:8:9"))
    assert(!ok("ipv6", "1:2:3:4:5:6:7:8:9"))
    assert(ok("ipv6", "1:2:3:4:5:6:7::") && ok("ipv6", "::2:3:4:5:6:7:8"))
    assert(ok("ipv6", "::") && ok("ipv6", "1::8"))
    assert(ok("hostname", "example.com") && ok("hostname", "a-b.c2"))
    assert(!ok("hostname", "-bad.com") && !ok("hostname", "a..b"))
    assert(ok("time", "23:59:60Z") && ok("time", "08:30:06.283185+05:00"))
    assert(!ok("time", "24:00:00Z") && !ok("time", "08:30:06"))
    assert(ok("json-pointer", "") && ok("json-pointer", "/foo/0/~0~1"))
    assert(!ok("json-pointer", "foo") && !ok("json-pointer", "/foo/~2"))
    assert(ok("duration", "P1Y2M3DT4H5M6S") && ok("duration", "PT0.5S"))
    assert(!ok("duration", "P") && !ok("duration", "PT") &&
      !ok("duration", "1D"))
  }

  test("new keywords round-trip through JSON") {
    val suite = ConstraintSuite("rt", Seq(
      PropertyValues("pv", "attrs", "note",
        LengthBounds("l", "$", None, Some(10))),
      PatternValues("pat", "attrs", "^x-", TypeIs("t", "$", "integer")),
      UnevaluatedItems("ui", "xs", Bounds("b", "$", None, Some(2))),
      UnevaluatedProperties("up", "attrs", BoolSchema("f", false)),
      Defs("d", Seq(Matches("digits", "$", "^[0-9]+$"))),
      DynamicRef("dr", "#digits")),
      dynamicAnchors = Seq("digits"))
    val json = graft.dsl.ConstraintJson.renderSuite(suite)
    assert(graft.dsl.ConstraintJson.parseSuite(json) == suite)
  }

  // --------------------------------------------------------------
  // $dynamicRef / $dynamicAnchor (official-suite shapes:
  // dynamicRef.json, run by the reference at Draft2020Runner.java:62)
  // --------------------------------------------------------------

  /** The generic "list of itemT" suite: element type is a $dynamicAnchor
    * with a number default, the classic extensible-list shape. */
  private def listSuite(id: String, dynamic: Boolean) = ConstraintSuite(
    id,
    Seq(
      Defs(s"$id.defs", Seq(TypeIs("itemT", "$", "number"))),
      EachElement("elems", "xs", DynamicRef("itemRef", "#itemT"))),
    dynamicAnchors = if (dynamic) Seq("itemT") else Nil)

  private val listRows = Seq(
    ("ok_int", Seq("1", "22")),     // digits: valid under both
    ("ok_frac", Seq("3.5")),        // number but NOT digits-only
    ("bad", Seq("1", "oops")))      // not even a number
    .toDF("doc_id", "xs")

  private def validOn(suite: ConstraintSuite,
      reg: ConstraintRegistry): Map[String, Boolean] = {
    val compiled = ConstraintCompiler.compile(suite, reg)
    listRows.withColumn("ok", compiled.rowPredicate)
      .select("doc_id", "ok").as[(String, Boolean)].collect().toMap
  }

  test("dynamicRef: same-resource anchor behaves like a plain ref") {
    val got = validOn(listSuite("list", dynamic = true),
      ConstraintRegistry.empty)
    assert(got == Map("ok_int" -> true, "ok_frac" -> true, "bad" -> false))
  }

  test("dynamicRef: first dynamicAnchor in the dynamic scope wins") {
    val reg = ConstraintRegistry.empty
    reg.register("list", listSuite("list", dynamic = true))
    // strictList re-declares itemT (digits only) and refs list: the
    // OUTERMOST declaration must win over list's own default
    val strict = ConstraintSuite("strictList", Seq(
      Defs("strict.defs", Seq(Matches("itemT", "$", "^[0-9]+$"))),
      Ref("useList", "list")),
      dynamicAnchors = Seq("itemT"))
    val got = validOn(strict, reg)
    assert(got == Map("ok_int" -> true, "ok_frac" -> false, "bad" -> false))
  }

  test("dynamicRef: no dynamicAnchor at the lexical target → plain ref " +
      "(bookending)") {
    val reg = ConstraintRegistry.empty
    // list's anchor is NOT declared dynamic: the override must NOT apply
    reg.register("plainList", listSuite("plainList", dynamic = false))
    val strict = ConstraintSuite("strictPlain", Seq(
      Defs("strict.defs", Seq(Matches("itemT", "$", "^[0-9]+$"))),
      Ref("useList", "plainList")),
      dynamicAnchors = Seq("itemT"))
    val got = validOn(strict, reg)
    assert(got == Map("ok_int" -> true, "ok_frac" -> true, "bad" -> false))
  }

  test("dynamicRef: intermediate scopes without the anchor don't matter") {
    val reg = ConstraintRegistry.empty
    reg.register("list", listSuite("list", dynamic = true))
    reg.register("mid", ConstraintSuite("mid", Seq(
      Ref("useList", "list")))) // declares no anchors
    val strictTop = ConstraintSuite("strictTop", Seq(
      Defs("strict.defs", Seq(Matches("itemT", "$", "^[0-9]+$"))),
      Ref("useMid", "mid")),
      dynamicAnchors = Seq("itemT"))
    val got = validOn(strictTop, reg)
    assert(got == Map("ok_int" -> true, "ok_frac" -> false, "bad" -> false))
  }

  test("dynamicRef: recursion raises the descriptive cycle error") {
    val recur = ConstraintSuite("recur", Seq(
      Defs("d", Seq(AllOf("node", Seq(DynamicRef("again", "#node"))))),
      DynamicRef("start", "#node")),
      dynamicAnchors = Seq("node"))
    val e = intercept[ConstraintCompiler.CompileException] {
      ConstraintCompiler.compile(recur)
    }
    assert(e.getMessage.contains("cyclic"))
    // and a dynamicRef without a fragment is a descriptive error too
    val e2 = intercept[ConstraintCompiler.CompileException] {
      ConstraintCompiler.compile(ConstraintSuite("nf", Seq(
        DynamicRef("r", "recur"))))
    }
    assert(e2.getMessage.contains("fragment"))
  }

  test("defs: definitions container asserts nothing on its own") {
    // a Defs whose body would reject every row must not fire unless
    // referenced — top-level Defs are dropped, nested ones lower to true
    val suite = ConstraintSuite("defsOnly", Seq(
      Defs("d", Seq(BoolSchema("never", false))),
      AllOf("grp", Seq(Defs("d2", Seq(BoolSchema("never2", false)))))))
    val got = validOn(suite, ConstraintRegistry.empty)
    assert(got.values.forall(identity))
  }
}
