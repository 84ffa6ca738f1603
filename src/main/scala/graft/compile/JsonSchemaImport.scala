package graft.compile

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import scala.jdk.CollectionConverters._

import graft.dsl.Constraint._
import graft.dsl.{Constraint, ConstraintSuite}

/**
 * Import an actual JSON Schema document into a [[ConstraintSuite]] — the
 * bridge that lets a user of the reference validator run their EXISTING
 * schema documents against tables: the reference's compile() input is a
 * JSON Schema string (SchemaCompiler.java:38-40), and this translates
 * the table-expressible subset of that language onto the DSL, mapping
 * the schema's top-level `properties` onto columns.
 *
 * Path model: a root schema must describe a record (`type: "object"`
 * with `properties`); property `p` maps to column `p`, nested fixed
 * objects map to struct paths `p.q`, array element subschemas map to
 * the element scope `$` (fields of record elements: `$.q`). An object
 * subschema whose keywords imply OPEN keys (`patternProperties`,
 * `propertyNames`, `additionalProperties`, `minProperties`,
 * `maxProperties`) targets a `map<string,string>` column and lowers to
 * the map-flavored operators; otherwise it is struct-flavored and
 * recurses into fixed paths.
 *
 * Dialect interop (the translation concern the compiler scaladoc
 * assigns here): draft-4's BOOLEAN `exclusiveMinimum`/`exclusiveMaximum`
 * modifying `minimum`/`maximum`, draft-7's array-form `items` +
 * `additionalItems`, and 2020-12's `prefixItems` + schema-form `items`
 * all lower to the same `PrefixItems`/`EachElement`/`EachElementFrom`
 * trio. `$ref`/`$defs`(/legacy `definitions`)/`$anchor` are resolved by
 * INLINING at the reference site — JSON Schema definitions are
 * location-independent, so the same def lands on whatever path the ref
 * site sits at. RECURSIVE refs that consume instance nesting (the ref
 * re-enters below a container/property boundary) unroll to `maxUnroll`
 * levels and then cut FAIL-CLOSED (deeper instances are invalid, never
 * silently accepted); a ref re-entered at the same instance depth
 * cannot terminate and raises a descriptive error. `$dynamicRef`
 * resolves like `$ref` here (a single imported document has the trivial
 * dynamic scope; cross-suite override chains use the DSL's DynamicRef
 * directly). Annotation keywords are ignored; any UNRECOGNIZED
 * assertion keyword raises ImportException naming it — silent partial
 * enforcement is how validators lie.
 */
object JsonSchemaImport {

  final class ImportException(msg: String) extends RuntimeException(msg)

  private val mapper = new ObjectMapper()

  /** Keywords that are annotations / structure we already consumed /
    * intentionally out of assertion scope for a table importer. */
  private val Ignored = Set(
    "$schema", "$id", "$comment", "$vocabulary", "title", "description",
    "default", "examples", "deprecated", "readOnly", "writeOnly",
    "contentMediaType", "contentEncoding", "contentSchema",
    "$defs", "definitions", "$anchor", "$dynamicAnchor")

  private val Handled = Set(
    "type", "enum", "const", "minimum", "maximum", "exclusiveMinimum",
    "exclusiveMaximum", "multipleOf", "minLength", "maxLength", "pattern",
    "format", "items", "prefixItems", "additionalItems", "minItems",
    "maxItems", "uniqueItems", "contains", "minContains", "maxContains",
    "properties", "required", "patternProperties", "propertyNames",
    "additionalProperties", "minProperties", "maxProperties",
    "dependentRequired", "dependentSchemas", "allOf", "anyOf", "oneOf",
    "not", "if", "then", "else", "$ref", "$dynamicRef",
    "unevaluatedItems", "unevaluatedProperties")

  /** `typedColumns = true` (default): columns are statically typed, so
    * numeric keywords sit on numeric columns and lower to plain
    * comparisons (the hot-path shape). `false`: emit full JSON-value
    * applicability semantics — numeric keywords wrap in a content-is-
    * number guard so non-numeric values PASS them (2020-12: `minimum`
    * does not constrain a string instance) instead of raising an ANSI
    * cast error on string columns. */
  def translate(schemaJson: String, suiteId: String = null,
      typedColumns: Boolean = true,
      maxUnroll: Int = ConstraintCompiler.DefaultMaxUnroll): ConstraintSuite = {
    val root =
      try mapper.readTree(schemaJson)
      catch {
        case e: Exception =>
          throw new ImportException(s"invalid JSON: ${e.getMessage}")
      }
    if (!root.isObject)
      throw new ImportException(
        "root schema must be an object describing a record")
    val id = Option(suiteId)
      .orElse(Option(root.get("$id")).map(_.asText()))
      .getOrElse("imported")

    // --- reference targets: $defs / definitions by name, $anchor by name
    val defs = scala.collection.mutable.Map[String, JsonNode]()
    Seq("$defs", "definitions").foreach { k =>
      Option(root.get(k)).filter(_.isObject).foreach(
        _.properties().asScala.foreach(e => defs(e.getKey) = e.getValue))
    }
    val anchors = scala.collection.mutable.Map[String, JsonNode]()
    def findAnchors(n: JsonNode): Unit = if (n.isObject) {
      Seq("$anchor", "$dynamicAnchor").foreach(k =>
        Option(n.get(k)).foreach(a => anchors(a.asText()) = n))
      n.properties().asScala.foreach(e => findAnchors(e.getValue))
    } else if (n.isArray) n.elements().asScala.foreach(findAnchors)
    findAnchors(root)

    def resolveRef(ref: String): JsonNode = {
      val target =
        if (ref.startsWith("#/$defs/")) defs.get(ref.drop(8))
        else if (ref.startsWith("#/definitions/")) defs.get(ref.drop(14))
        else if (ref.startsWith("#") && !ref.contains('/'))
          anchors.get(ref.drop(1))
        else None
      target.getOrElse(throw new ImportException(
        s"unresolvable ref '$ref' (supported: #/\\$$defs/name, " +
          "#/definitions/name, #anchor within this document)"))
    }

    var n = 0
    def fresh(path: String, kw: String): String = {
      n += 1; s"${if (path.isEmpty) "row" else path}.$kw.$n"
    }

    def num(node: JsonNode, f: String): Option[BigDecimal] =
      Option(node.get(f)).filter(_.isNumber)
        .map(v => BigDecimal(v.decimalValue()))
    def int(node: JsonNode, f: String): Option[Int] =
      Option(node.get(f)).filterNot(_.isNull).map(_.asInt())

    /** True when the object subschema's keywords imply open keys — the
      * map<string,string>-column flavor. `properties` +
      * `additionalProperties` alone is the standard CLOSED-struct idiom
      * and stays struct-flavored (a fixed struct cannot carry
      * additional fields, so the keyword is structural there). */
    def mapFlavored(s: JsonNode): Boolean =
      Seq("patternProperties", "propertyNames",
        "minProperties", "maxProperties").exists(s.has) ||
        (s.has("additionalProperties") && !s.has("properties"))

    def allOfWrap(path: String, cs: Seq[Constraint]): Constraint = cs match {
      case Seq(one) => one
      case many     => AllOf(fresh(path, "group"), many)
    }

    /** Lower subschema `s` applied at column path `path` ("" = the row:
      * only object-with-properties is meaningful there). `refs` tracks
      * in-flight `$ref` inlining as name → (instance depth at last
      * entry, entries so far); `depth` counts instance-nesting
      * boundaries crossed (element scopes and struct property drills).
      * Re-entering a ref at the SAME depth consumes no instance nesting
      * — genuinely unbounded, refused; re-entry deeper UNROLLS up to
      * `maxUnroll`, then cuts to a fail-closed `false` schema (data
      * nested past the budget is invalid, never silently accepted). */
    def lower(s: JsonNode, path: String,
        refs: Map[String, (Int, Int)], depth: Int,
        pol: Int): Seq[Constraint] = {
      if (s.isBoolean)
        return if (s.asBoolean()) Nil
        else Seq(BoolSchema(fresh(path, "false"), value = false))
      if (!s.isObject)
        throw new ImportException(s"schema at '$path' must be an object " +
          s"or boolean, got: $s")

      s.fieldNames().asScala.foreach { k =>
        if (!Handled.contains(k) && !Ignored.contains(k))
          throw new ImportException(
            s"unsupported keyword '$k' at '$path' — refusing to " +
              "silently under-enforce the schema")
      }
      val out = Seq.newBuilder[Constraint]

      // ---- $ref / $dynamicRef: inline at this path ------------------
      Seq("$ref", "$dynamicRef").foreach { kw =>
        Option(s.get(kw)).foreach { r =>
          val ref = r.asText()
          refs.get(ref) match {
            case Some((d, _)) if d == depth =>
              throw new ImportException(s"cyclic ref '$ref' with no " +
                "container boundary between entries — consumes no " +
                "instance nesting, cannot terminate")
            case Some((_, n)) if n >= maxUnroll => pol match {
              // fail-closed AND presence-guarded: reject exactly the
              // instances that reach this depth (a bare false would
              // also fail shallow documents whose path never gets
              // here); under negation the identity `true` keeps deep
              // matches true so the enclosing not rejects them
              case 1 =>
                out += IfThen(fresh(path, "depthCut"),
                  NotNull(fresh(path, "depthCutPresent"), path),
                  BoolSchema(fresh(path, "depthCutFail"), value = false))
              case -1 =>
                out += BoolSchema(fresh(path, "depthCut"), value = true)
              case _ => throw new ImportException(
                s"recursive ref '$ref' exceeds the unroll budget " +
                  s"($maxUnroll) inside a non-monotone context " +
                  "(oneOf/if-condition/bounded contains) — no " +
                  "fail-closed cut exists there; raise maxUnroll")
            }
            case prior =>
              val n = prior.map(_._2).getOrElse(0)
              out += allOfWrap(path, lower(resolveRef(ref), path,
                refs + (ref -> (depth, n + 1)), depth, pol))
          }
        }
      }

      // ---- type -----------------------------------------------------
      Option(s.get("type")).foreach { t =>
        val names =
          if (t.isArray) t.elements().asScala.map(_.asText()).toSeq
          else Seq(t.asText())
        val content = names.filter(
          Set("integer", "number", "boolean", "string"))
        // array/object/null are structural: the Spark column type (and
        // NotNull for required) already pins them
        if (content.nonEmpty && path.nonEmpty) {
          val ts = content.map(t2 => TypeIs(fresh(path, s"type_$t2"), path, t2))
          out += (if (ts.sizeIs == 1) ts.head
                  else AnyOf(fresh(path, "type"), ts))
        }
      }

      // ---- scalar assertions ---------------------------------------
      // JSON Schema compares enum/const numerics by VALUE, not lexeme
      // ("1.0" must match enum member 1, content-typed like typeIs):
      // numeric members lower to a content-is-number guard around a
      // point Bounds — via IfThen (CaseWhen), whose branch-evaluation
      // order Spark DOES guarantee (a plain And conjunction may be
      // split/reordered by the optimizer, re-exposing the ANSI
      // string-cast task failure on non-numeric content). else-false:
      // non-numeric content is a clean non-match. Non-scalar members
      // cannot be expressed against scalar columns and must refuse, not
      // silently become asText() === "".
      def memberEq(v: JsonNode, kw: String): Constraint =
        if (v.isNumber)
          IfThen(fresh(path, s"${kw}_num"),
            TypeIs(fresh(path, s"${kw}_isnum"), path, "number"),
            Bounds(fresh(path, s"${kw}_eq"), path,
              Some(BigDecimal(v.decimalValue())),
              Some(BigDecimal(v.decimalValue()))),
            Some(BoolSchema(fresh(path, s"${kw}_nonnum"), value = false)))
        else if (v.isTextual || v.isBoolean || v.isNull)
          ConstEq(fresh(path, kw), path, v.asText())
        else throw new ImportException(
          s"$kw member $v at '$path' is not scalar — object/array " +
            "values cannot be compared against a scalar column")

      // full applicability semantics (typedColumns = false): a numeric
      // keyword simply does not apply to non-numeric content
      def numGuard(c: Constraint): Constraint =
        if (typedColumns) c
        else IfThen(s"${c.id}.applies",
          TypeIs(s"${c.id}.isnum", path, "number"), c)
      Option(s.get("enum")).foreach { e =>
        val members = e.elements().asScala.toSeq
        if (members.forall(m => m.isTextual || m.isBoolean))
          out += IsIn(fresh(path, "enum"), path, members.map(_.asText()))
        else
          out += AnyOf(fresh(path, "enum"),
            members.map(memberEq(_, "enum")))
      }
      Option(s.get("const")).foreach(c => out += memberEq(c, "const"))

      // minimum/maximum and NUMERIC exclusiveMinimum/Maximum are
      // independent assertions in 2020-12 (both can appear and both
      // bind); only the draft-4 BOOLEAN form modifies minimum/maximum
      val exMinB = Option(s.get("exclusiveMinimum")).exists(_.isBoolean)
      val exMaxB = Option(s.get("exclusiveMaximum")).exists(_.isBoolean)
      val mn = num(s, "minimum")
      val mx = num(s, "maximum")
      if (mn.isDefined || mx.isDefined)
        out += numGuard(Bounds(fresh(path, "bounds"), path, mn, mx,
          exMinB && s.get("exclusiveMinimum").asBoolean(),
          exMaxB && s.get("exclusiveMaximum").asBoolean()))
      if (!exMinB || !exMaxB) {
        val emn = if (exMinB) None else num(s, "exclusiveMinimum")
        val emx = if (exMaxB) None else num(s, "exclusiveMaximum")
        if (emn.isDefined || emx.isDefined)
          out += numGuard(Bounds(fresh(path, "xbounds"), path, emn, emx,
            emn.isDefined, emx.isDefined))
      }
      num(s, "multipleOf").foreach(k =>
        out += numGuard(MultipleOf(fresh(path, "multipleOf"), path, k)))

      if (s.has("minLength") || s.has("maxLength"))
        out += LengthBounds(fresh(path, "length"), path,
          int(s, "minLength"), int(s, "maxLength"))
      Option(s.get("pattern")).foreach(p =>
        out += Matches(fresh(path, "pattern"), path, p.asText()))
      Option(s.get("format")).foreach(f =>
        // 2020-12 default: format is an ANNOTATION; strict mode is the
        // DSL's opt-in (FormatIs(strict = true))
        out += FormatIs(fresh(path, "format"), path, f.asText(),
          strict = false))

      // ---- arrays ---------------------------------------------------
      if (s.has("minItems") || s.has("maxItems"))
        out += SizeBounds(fresh(path, "size"), path,
          int(s, "minItems"), int(s, "maxItems"))
      if (Option(s.get("uniqueItems")).exists(_.asBoolean(false)))
        out += UniqueItems(fresh(path, "unique"), path)

      val prefix: Seq[JsonNode] =
        Option(s.get("prefixItems")).filter(_.isArray)
          .orElse(Option(s.get("items")).filter(_.isArray)) // draft-7 form
          .map(_.elements().asScala.toSeq).getOrElse(Nil)
      if (prefix.nonEmpty)
        out += PrefixItems(fresh(path, "prefix"), path,
          prefix.map(p => allOfWrap("$", lower(p, "$", refs, depth + 1, pol))))
      val tailSchema: Option[JsonNode] =
        Option(s.get("items")).filterNot(_.isArray)
          // draft-7 form: additionalItems binds ONLY alongside
          // array-form items (ignored otherwise, per the official suite)
          .orElse(Option(s.get("additionalItems"))
            .filter(_ => Option(s.get("items")).exists(_.isArray)))
      tailSchema.foreach { it =>
        val elem = allOfWrap("$", lower(it, "$", refs, depth + 1, pol))
        out += (if (prefix.isEmpty) EachElement(fresh(path, "items"), path, elem)
                else EachElementFrom(fresh(path, "items"), path,
                  prefix.size, elem))
      }
      Option(s.get("contains")).foreach { c =>
        // a max-bounded contains is non-monotone in its element schema
        val elemPol = if (s.has("maxContains")) 0 else pol
        out += ContainsCount(fresh(path, "contains"), path,
          allOfWrap("$", lower(c, "$", refs, depth + 1, elemPol)),
          int(s, "minContains").getOrElse(1), int(s, "maxContains"))
      }
      Option(s.get("unevaluatedItems")).foreach(u =>
        out += UnevaluatedItems(fresh(path, "unevalItems"), path,
          allOfWrap("$", lower(u, "$", refs, depth + 1, pol))))

      // ---- objects --------------------------------------------------
      val props = Option(s.get("properties")).filter(_.isObject)
      if (path.isEmpty && mapFlavored(s))
        throw new ImportException(
          "patternProperties/propertyNames/additionalProperties-" +
            "without-properties/minProperties/maxProperties at the ROW " +
            "level are not meaningful for a fixed table schema — " +
            "columns ARE the schema")
      val isMap = path.nonEmpty && mapFlavored(s)
      if (isMap) {
        props.foreach(_.properties().asScala.foreach { e =>
          out += PropertyValues(fresh(path, s"prop_${e.getKey}"), path,
            e.getKey, allOfWrap("$", lower(e.getValue, "$", refs, depth + 1, pol)))
        })
        Option(s.get("patternProperties")).foreach(
          _.properties().asScala.foreach { e =>
            out += PatternValues(fresh(path, "patternProps"), path,
              e.getKey, allOfWrap("$", lower(e.getValue, "$", refs, depth + 1, pol)))
          })
        Option(s.get("propertyNames")).foreach { pn =>
          out += EachKey(fresh(path, "propNames"), path,
            allOfWrap("$", lower(pn, "$", refs, depth + 1, pol)))
        }
        Option(s.get("additionalProperties")).foreach { ap =>
          val covered = props.map(
            _.fieldNames().asScala.toSeq).getOrElse(Nil)
          val coveredPats = Option(s.get("patternProperties")).map(
            _.fieldNames().asScala.toSeq).getOrElse(Nil)
          if (ap.isBoolean && !ap.asBoolean()) {
            // keys matched by patternProperties are NOT "additional":
            // a plain allow-list only works when there are no patterns
            if (coveredPats.isEmpty)
              out += KeysIn(fresh(path, "keys"), path, covered)
            else
              out += UnevaluatedProperties(fresh(path, "keys"), path,
                BoolSchema(fresh(path, "never"), value = false),
                covered, coveredPats)
          } else if (!ap.isBoolean)
            out += UnevaluatedProperties(fresh(path, "addlProps"), path,
              allOfWrap("$", lower(ap, "$", refs, depth + 1, pol)), covered, coveredPats)
        }
        if (s.has("minProperties") || s.has("maxProperties"))
          out += KeyCountBounds(fresh(path, "keyCount"), path,
            int(s, "minProperties"), int(s, "maxProperties"))
        Option(s.get("required")).foreach(_.elements().asScala.foreach { r =>
          out += PropertyValues(fresh(path, s"req_${r.asText()}"), path,
            r.asText(), NotNull(fresh(path, "reqNN"), "$"))
        })
        // dependent*/unevaluatedProperties in the MAP flavor: these are
        // in Handled, so dropping them here would silently under-enforce
        // (the module's stated refuse-don't-lie contract). Presence of a
        // key = PropertyValues(key, NotNull($)) — for a map column a
        // null value IS the representation of an absent field.
        def presence(k: String): Constraint =
          PropertyValues(fresh(path, s"has_$k"), path, k,
            NotNull(fresh(path, "presNN"), "$"))
        Option(s.get("dependentRequired")).foreach(
          _.properties().asScala.foreach { e =>
            val needed = e.getValue.elements().asScala
              .map(x => presence(x.asText())).toSeq
            out += IfThen(fresh(path, s"depReq_${e.getKey}"),
              presence(e.getKey), allOfWrap(path, needed))
          })
        Option(s.get("dependentSchemas")).foreach(
          _.properties().asScala.foreach { e =>
            out += IfThen(fresh(path, s"depSchema_${e.getKey}"),
              presence(e.getKey),
              allOfWrap(path, lower(e.getValue, path, refs, depth, pol)))
          })
        Option(s.get("unevaluatedProperties")).foreach { u =>
          // declared coverage is computed by the compiler's
          // resolveUnevaluated pass from sibling PropertyValues/
          // PatternValues/KeysIn on the same column
          out += UnevaluatedProperties(fresh(path, "unevalProps"), path,
            allOfWrap("$", lower(u, "$", refs, depth + 1, pol)))
        }
      } else {
        def childPath(p: String): String =
          if (path.isEmpty) p else s"$path.$p"
        props.foreach(_.properties().asScala.foreach { e =>
          out ++= lower(e.getValue, childPath(e.getKey), refs, depth + 1, pol)
        })
        // struct-flavor additionalProperties (alongside properties) is
        // structural: a fixed struct has no additional fields to reject
        Option(s.get("required")).foreach(_.elements().asScala.foreach { r =>
          val child = childPath(r.asText())
          // nested required applies only when the parent object is
          // PRESENT (JSON Schema applicability: a subschema does not
          // constrain an absent instance)
          out += (if (path.isEmpty)
            NotNull(fresh(child, "required"), child)
          else IfThen(fresh(child, "required"),
            NotNull(fresh(path, "present"), path),
            NotNull(fresh(child, "requiredNN"), child)))
        })
        Option(s.get("dependentRequired")).foreach(
          _.properties().asScala.foreach { e =>
            val needed = e.getValue.elements().asScala.map(x =>
              NotNull(fresh(childPath(x.asText()), "depReq"),
                childPath(x.asText()))).toSeq
            out += IfThen(fresh(path, s"depReq_${e.getKey}"),
              NotNull(fresh(path, "depCond"), childPath(e.getKey)),
              allOfWrap(path, needed))
          })
        Option(s.get("dependentSchemas")).foreach(
          _.properties().asScala.foreach { e =>
            out += IfThen(fresh(path, s"depSchema_${e.getKey}"),
              NotNull(fresh(path, "depCond"), childPath(e.getKey)),
              allOfWrap(path, lower(e.getValue, path, refs, depth, pol)))
          })
        Option(s.get("unevaluatedProperties")).foreach { u =>
          if (path.isEmpty) throw new ImportException(
            "unevaluatedProperties at the ROW level is not meaningful " +
              "for a fixed table schema")
          out += UnevaluatedProperties(fresh(path, "unevalProps"), path,
            allOfWrap("$", lower(u, "$", refs, depth + 1, pol)))
        }
      }

      // ---- combinators ---------------------------------------------
      Option(s.get("allOf")).foreach(_.elements().asScala.foreach(sub =>
        out ++= lower(sub, path, refs, depth, pol)))
      Option(s.get("anyOf")).foreach { a =>
        out += AnyOf(fresh(path, "anyOf"), a.elements().asScala.map(sub =>
          allOfWrap(path, lower(sub, path, refs, depth, pol))).toSeq)
      }
      Option(s.get("oneOf")).foreach { o =>
        // exactly-one is non-monotone: a branch's truth can invalidate
        out += OneOf(fresh(path, "oneOf"), o.elements().asScala.map(sub =>
          allOfWrap(path, lower(sub, path, refs, depth, 0))).toSeq)
      }
      Option(s.get("not")).foreach(sub =>
        out += Not(fresh(path, "not"),
          allOfWrap(path, lower(sub, path, refs, depth, -pol))))
      Option(s.get("if")).foreach { i =>
        val thenC = Option(s.get("then"))
          .map(t => allOfWrap(path, lower(t, path, refs, depth, pol)))
          .getOrElse(BoolSchema(fresh(path, "thenTrue"), value = true))
        val elseC = Option(s.get("else"))
          .map(e => allOfWrap(path, lower(e, path, refs, depth, pol)))
        out += IfThen(fresh(path, "ifThen"),
          allOfWrap(path, lower(i, path, refs, depth, 0)), thenC, elseC)
      }

      out.result()
    }

    val cs = lower(root, "", Map.empty, 0, 1)
    if (cs.isEmpty)
      throw new ImportException(
        "schema asserts nothing a table validator can enforce " +
          "(no properties/combinators found at the root)")
    ConstraintSuite(id, cs)
  }
}
