package graft.compile

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.{functions => F}

import graft.dsl.{Constraint, ConstraintSuite, ConstraintJson}
import graft.dsl.Constraint._
import graft.registry.ConstraintRegistry
import graft.checks.{DatasetCheck, UniqueCheck, RefIntegrityCheck, DriftCheck}

/** One compiled row-local constraint: a boolean Catalyst predicate plus the
  * expressions that populate a violation row — the analogue of one compiled
  * Blaze instruction with its error metadata
  * (`blaze_wrapper.cpp:179-205` collects (message, instance_location,
  * evaluate_path) per failed instruction). */
final case class CompiledRowCheck(
    id: String,
    pred: Column,
    observed: Column,
    expected: String)

/**
 * The compile-once artifact — analogue of the reference's immutable,
 * reusable `CompiledSchema` template (`CompiledSchema.java:8-20`,
 * `blaze_wrapper.cpp:87-99`). Holds Catalyst `Column` trees (row-local
 * predicates) and dataset-level check plans; immutable, thread-safe,
 * reusable across any number of validation jobs. `constraintHash`
 * identifies the suite in checkpoint lineage (north rule).
 */
final case class CompiledSuite(
    suiteId: String,
    rowChecks: Seq[CompiledRowCheck],
    datasetChecks: Seq[DatasetCheck],
    constraintHash: String) {

  /** Conjunction of every row-local predicate — the FastValidation path
    * (`blaze_wrapper.cpp:92`): short-circuit AND inside whole-stage
    * codegen, no violation materialization. */
  def rowPredicate: Column =
    rowChecks.map(_.pred).reduceOption(_ && _).getOrElse(F.lit(true))
}

/**
 * Compiles a [[ConstraintSuite]] into a [[CompiledSuite]] — the analogue of
 * `SchemaCompiler.compile` + `blaze_compile`
 * (`SchemaCompiler.java:38-75`, `blaze_wrapper.cpp:39-114`): resolves
 * `Ref`s through the registry with cycle detection, then lowers every
 * constraint to Catalyst expressions. Driver-side, once per suite; the
 * resulting `Column` trees are serialized into tasks by Spark exactly once
 * per job (replacing the reference's per-call JNI hop).
 *
 * Null semantics: like JSON Schema keyword applicability, every leaf
 * check PASSES on a null value except [[Constraint.NotNull]] — a missing
 * value is `required`'s job, not `maximum`'s.
 */
object ConstraintCompiler {

  final class CompileException(msg: String) extends RuntimeException(msg)

  def compileJson(json: String,
      registry: ConstraintRegistry = ConstraintRegistry.empty): CompiledSuite =
    compile(ConstraintJson.parseSuite(json), registry)

  def compile(suite: ConstraintSuite,
      registry: ConstraintRegistry = ConstraintRegistry.empty): CompiledSuite = {
    val resolved = resolveRefs(suite, registry)
    val (rowCs, dsCs) = resolved.constraints.partition(isRowLocal)
    val rowChecks = rowCs.map(c => CompiledRowCheck(
      c.id, lowerPred(c, None), observedOf(c), expectedOf(c)))
    val datasetChecks = dsCs.map(lowerDataset)
    CompiledSuite(resolved.id, rowChecks, datasetChecks, hashOf(resolved))
  }

  // ------------------------------------------------------------------
  // $ref resolution with cycle detection (BlazeWrapper.java:253-281;
  // cycle evidence: infinite-loop-detection.json, Draft2020Runner.java:80)
  // ------------------------------------------------------------------

  private def resolveRefs(
      suite: ConstraintSuite, reg: ConstraintRegistry): ConstraintSuite = {

    def go(c: Constraint, visiting: Set[String]): Constraint = c match {
      case Ref(id, name) =>
        if (visiting.contains(name))
          throw new CompileException(
            s"Schema compilation failed: cyclic ref '$name'")
        val target = reg.resolve(name).getOrElse(throw new CompileException(
          s"Schema compilation failed: unresolved ref '$name'"))
        // A referenced suite inlines as the conjunction of its constraints,
        // re-rooted under the Ref's own id.
        AllOf(id, target.constraints.map(go(_, visiting + name)))
      case AllOf(id, cs)   => AllOf(id, cs.map(go(_, visiting)))
      case AnyOf(id, cs)   => AnyOf(id, cs.map(go(_, visiting)))
      case OneOf(id, cs)   => OneOf(id, cs.map(go(_, visiting)))
      case Not(id, c0)     => Not(id, go(c0, visiting))
      case IfThen(id, i, t, e) =>
        IfThen(id, go(i, visiting), go(t, visiting), e.map(go(_, visiting)))
      case EachElement(id, col, e) => EachElement(id, col, go(e, visiting))
      case EachElementFrom(id, col, st, e) =>
        EachElementFrom(id, col, st, go(e, visiting))
      case EachKey(id, col, e) => EachKey(id, col, go(e, visiting))
      case ContainsCount(id, col, e, mn, mx) =>
        ContainsCount(id, col, go(e, visiting), mn, mx)
      case PrefixItems(id, col, es) =>
        PrefixItems(id, col, es.map(go(_, visiting)))
      case other => other
    }
    ConstraintSuite(suite.id,
      suite.constraints.map(go(_, Set(suite.id))))
  }

  private def isRowLocal(c: Constraint): Boolean = c match {
    case _: Unique | _: RefIntegrity | _: NoDrift => false
    case _                                        => true
  }

  // ------------------------------------------------------------------
  // Row-local lowering: Constraint → Catalyst boolean Column
  // ------------------------------------------------------------------

  /** Resolve a column path in the current scope. `"$"` refers to the
    * array element bound by the nearest EachElement/ContainsCount/
    * PrefixItems. */
  private def res(col: String, scope: Option[Column]): Column =
    if (col == "$")
      scope.getOrElse(throw new CompileException(
        "'$' used outside an array-element scope"))
    else F.col(col)

  /** Pass-on-null wrapper: JSON Schema applicability semantics. */
  private def nullPasses(c: Column, raw: Column): Column =
    c.isNull || F.coalesce(raw, F.lit(false))

  private[compile] def lowerPred(
      c: Constraint, scope: Option[Column]): Column = c match {
    case NotNull(_, col) => res(col, scope).isNotNull

    case IsIn(_, col, values) =>
      val v = res(col, scope)
      nullPasses(v, v.cast("string").isin(values: _*))

    case ConstEq(_, col, value) =>
      val v = res(col, scope)
      nullPasses(v, v.cast("string") === F.lit(value))

    case Bounds(_, col, mn, mx, emn, emx) =>
      val v = res(col, scope)
      val lo = mn.map(b => if (emn) v > F.lit(b.bigDecimal)
                           else v >= F.lit(b.bigDecimal))
      val hi = mx.map(b => if (emx) v < F.lit(b.bigDecimal)
                           else v <= F.lit(b.bigDecimal))
      nullPasses(v, (lo.toSeq ++ hi.toSeq).reduceOption(_ && _)
        .getOrElse(F.lit(true)))

    case MultipleOf(_, col, k) =>
      // Exact decimal remainder — avoids the float-tolerance trap on
      // cases like 0.0075 % 0.0001 (cf. multipleOf.json in the suite).
      val v = res(col, scope)
      nullPasses(v,
        F.pmod(v.cast("decimal(38,12)"), F.lit(k.bigDecimal)) === F.lit(0))

    case LengthBounds(_, col, mn, mx) =>
      val v = res(col, scope)
      val len = F.length(v) // codepoint semantics for BMP; suite cases pass
      val lo = mn.map(len >= _)
      val hi = mx.map(len <= _)
      nullPasses(v, (lo.toSeq ++ hi.toSeq).reduceOption(_ && _)
        .getOrElse(F.lit(true)))

    case Matches(_, col, pattern) =>
      val v = res(col, scope)
      nullPasses(v, v.rlike(pattern)) // unanchored, per spec

    case FormatIs(_, col, format, strict) =>
      if (!strict) F.lit(true) // annotation-only, matching reference default
      else {
        val v = res(col, scope)
        nullPasses(v, formatPred(v, format))
      }

    case SizeBounds(_, col, mn, mx) =>
      val v = res(col, scope)
      val sz = F.size(v)
      val lo = mn.map(sz >= _)
      val hi = mx.map(sz <= _)
      nullPasses(v, (lo.toSeq ++ hi.toSeq).reduceOption(_ && _)
        .getOrElse(F.lit(true)))

    case UniqueItems(_, col) =>
      val v = res(col, scope)
      nullPasses(v, F.size(F.array_distinct(v)) === F.size(v))

    // Fast path for the hottest constraint shape (every token in
    // [lo, hi]): a custom codegen Expression with a primitive early-exit
    // loop — Spark's `forall` evaluates its lambda interpreted
    // (ArrayForAll is CodegenFallback), which costs ~3× on 10^9-token
    // scans. Whole-number bounds only (fractional bounds fall through).
    // Whole-number INCLUSIVE bounds only: a ±1 exclusive adjustment
    // would be wrong for fractional element types, which we can't see
    // until analysis. Everything else falls through to `forall`.
    case EachElement(_, col, Bounds(_, "$", mn, mx, false, false))
        if mn.forall(_.isWhole) && mx.forall(_.isWhole) &&
          (mn.nonEmpty || mx.nonEmpty) =>
      val v = res(col, scope)
      val lo = mn.map(_.toLong).getOrElse(Long.MinValue)
      val hi = mx.map(_.toLong).getOrElse(Long.MaxValue)
      nullPasses(v, graft.functions.ArrayAllBetween(v, lo, hi))

    case EachElement(_, col, elem) =>
      val v = res(col, scope)
      nullPasses(v, F.forall(v, x => lowerPred(elem, Some(x))))

    case ContainsCount(_, col, elem, minC, maxC) =>
      val v = res(col, scope)
      val n = F.size(F.filter(v, x => lowerPred(elem, Some(x))))
      val hi = maxC.map(n <= _)
      nullPasses(v, (Seq(n >= minC) ++ hi.toSeq).reduce(_ && _))

    case PrefixItems(_, col, elems) =>
      val v = res(col, scope)
      val checks = elems.zipWithIndex.map { case (e, i) =>
        // absent positions pass, per spec; F.get is 0-based + null-safe
        val x = F.get(v, F.lit(i))
        F.when(F.size(v) > i, lowerPred(e, Some(x))).otherwise(F.lit(true))
      }
      nullPasses(v, checks.reduceOption(_ && _).getOrElse(F.lit(true)))

    case EachElementFrom(_, col, start, elem) =>
      val v = res(col, scope)
      // slice is 1-based; elements before startIdx are exempt
      val rest = F.slice(v, F.lit(start + 1),
        F.greatest(F.size(v) - start, F.lit(0)))
      nullPasses(v, F.forall(rest, x => lowerPred(elem, Some(x))))

    case KeysIn(_, col, allowed) =>
      val v = res(col, scope)
      nullPasses(v,
        F.forall(F.map_keys(v), k => k.isin(allowed: _*)))

    case KeyCountBounds(_, col, mn, mx) =>
      val v = res(col, scope)
      val n = F.size(F.map_keys(v))
      val lo = mn.map(n >= _)
      val hi = mx.map(n <= _)
      nullPasses(v, (lo.toSeq ++ hi.toSeq).reduceOption(_ && _)
        .getOrElse(F.lit(true)))

    case EachKey(_, col, elem) =>
      val v = res(col, scope)
      nullPasses(v, F.forall(F.map_keys(v), k => lowerPred(elem, Some(k))))

    case TypeIs(_, col, tpe) =>
      val v = res(col, scope)
      val s = v.cast("string")
      val numeric = "^[+-]?(\\d+\\.?\\d*|\\.\\d+)([eE][+-]?\\d+)?$"
      val isNum = s.rlike(numeric)
      val raw = tpe match {
        // integer ⊂ number: integer-valued floats count as integer
        // (suite type.json semantics); cast guarded by the regex so ANSI
        // never throws
        case "integer" =>
          F.when(isNum,
            F.pmod(s.cast("decimal(38,10)"), F.lit(1)) === F.lit(0))
            .otherwise(F.lit(false))
        case "number"  => isNum
        case "boolean" => F.lower(s).isin("true", "false")
        case "string"  => F.lit(true)
        case other =>
          throw new CompileException(s"unsupported typeIs: $other")
      }
      nullPasses(v, raw)

    case SizeConsistency(_, intCol, arrCol) =>
      val i = res(intCol, scope)
      val a = res(arrCol, scope)
      i.isNull || a.isNull || (i === F.size(a))

    case ExprIs(_, predicateSql, _, _) =>
      F.coalesce(F.expr(predicateSql), F.lit(true))

    case AllOf(_, cs) =>
      cs.map(lowerPred(_, scope)).reduceOption(_ && _).getOrElse(F.lit(true))
    case AnyOf(_, cs) =>
      cs.map(lowerPred(_, scope)).reduceOption(_ || _).getOrElse(F.lit(false))
    case OneOf(_, cs) =>
      cs.map(c0 => lowerPred(c0, scope).cast("int"))
        .reduceOption(_ + _).map(_ === 1).getOrElse(F.lit(false))
    case Not(_, c0)   => !lowerPred(c0, scope)
    case IfThen(_, i, t, e) =>
      F.when(lowerPred(i, scope), lowerPred(t, scope))
        .otherwise(e.map(lowerPred(_, scope)).getOrElse(F.lit(true)))
    case BoolSchema(_, v) => F.lit(v)

    case _: Ref =>
      throw new CompileException("unresolved Ref survived resolution")
    case _: Unique | _: RefIntegrity | _: NoDrift =>
      throw new CompileException(
        s"dataset-level constraint '${c.id}' cannot be row-lowered")
  }

  private def formatPred(v: Column, format: String): Column = format match {
    case "date" =>
      v.rlike("^\\d{4}-(0[1-9]|1[0-2])-(0[1-9]|[12]\\d|3[01])$")
    case "date-time" =>
      v.rlike("^\\d{4}-\\d{2}-\\d{2}[Tt ]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?" +
        "([Zz]|[+-]\\d{2}:\\d{2})?$")
    case "email" =>
      v.rlike("^[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}$")
    case "uuid" =>
      v.rlike("^[0-9a-fA-F]{8}-[0-9a-fA-F]{4}-[0-9a-fA-F]{4}-" +
        "[0-9a-fA-F]{4}-[0-9a-fA-F]{12}$")
    case "uri"  => v.rlike("^[A-Za-z][A-Za-z0-9+.-]*:\\S*$")
    case "ipv4" =>
      v.rlike("^((25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)\\.){3}" +
        "(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)$")
    case other =>
      throw new CompileException(s"unsupported strict format: $other")
  }

  // ------------------------------------------------------------------
  // Violation metadata (observed / expected) per top-level constraint
  // ------------------------------------------------------------------

  /** Column paths a constraint reads (element scope excluded). */
  private def refCols(c: Constraint): Seq[String] = {
    val buf = scala.collection.mutable.LinkedHashSet[String]()
    Constraint.walk(c) {
      case NotNull(_, col)            => if (col != "$") buf += col
      case IsIn(_, col, _)            => if (col != "$") buf += col
      case ConstEq(_, col, _)         => if (col != "$") buf += col
      case Bounds(_, col, _, _, _, _) => if (col != "$") buf += col
      case MultipleOf(_, col, _)      => if (col != "$") buf += col
      case LengthBounds(_, col, _, _) => if (col != "$") buf += col
      case Matches(_, col, _)         => if (col != "$") buf += col
      case FormatIs(_, col, _, _)     => if (col != "$") buf += col
      case SizeBounds(_, col, _, _)   => if (col != "$") buf += col
      case UniqueItems(_, col)        => if (col != "$") buf += col
      case EachElement(_, col, _)     => if (col != "$") buf += col
      case EachElementFrom(_, col, _, _) => if (col != "$") buf += col
      case ContainsCount(_, col, _, _, _) => if (col != "$") buf += col
      case PrefixItems(_, col, _)     => if (col != "$") buf += col
      case KeysIn(_, col, _)          => if (col != "$") buf += col
      case KeyCountBounds(_, col, _, _) => if (col != "$") buf += col
      case EachKey(_, col, _)         => if (col != "$") buf += col
      case TypeIs(_, col, _)          => if (col != "$") buf += col
      case SizeConsistency(_, i, a)   => buf += i; buf += a
      case _                          => ()
    }
    buf.toSeq
  }

  /** Expression for the violation row's `observed` field. Arrays are
    * summarized by size, not dumped — violation rows must stay narrow at
    * 10^12-row scale. */
  private[compile] def observedOf(c: Constraint): Column = c match {
    case SizeBounds(_, col, _, _) =>
      F.concat(F.lit("size="), F.size(F.col(col)).cast("string"))
    case UniqueItems(_, col) =>
      F.concat(F.lit("distinct="),
        F.size(F.array_distinct(F.col(col))).cast("string"),
        F.lit("/"), F.size(F.col(col)).cast("string"))
    case EachElement(_, col, _) =>
      F.concat(F.lit("size="), F.size(F.col(col)).cast("string"))
    case ContainsCount(_, col, _, _, _) =>
      F.concat(F.lit("size="), F.size(F.col(col)).cast("string"))
    case PrefixItems(_, col, _) =>
      F.concat(F.lit("size="), F.size(F.col(col)).cast("string"))
    case EachElementFrom(_, col, _, _) =>
      F.concat(F.lit("size="), F.size(F.col(col)).cast("string"))
    case KeysIn(_, col, _) =>
      F.to_json(F.map_keys(F.col(col)))
    case KeyCountBounds(_, col, _, _) =>
      F.concat(F.lit("n_keys="),
        F.size(F.map_keys(F.col(col))).cast("string"))
    case EachKey(_, col, _) =>
      F.to_json(F.map_keys(F.col(col)))
    case SizeConsistency(_, i, a) =>
      F.concat(F.col(i).cast("string"), F.lit("!=size:"),
        F.size(F.col(a)).cast("string"))
    case LengthBounds(_, col, _, _) =>
      F.concat(F.lit("len="), F.length(F.col(col)).cast("string"))
    case ExprIs(_, p, obs, _) =>
      F.coalesce(F.expr(obs.getOrElse(s"'${p.replace("'", "")}'"))
        .cast("string"), F.lit("null"))
    case other =>
      val cols = refCols(other)
      if (cols.isEmpty) F.lit("")
      else if (cols.sizeIs == 1)
        F.coalesce(F.col(cols.head).cast("string"), F.lit("null"))
      else
        F.to_json(F.struct(cols.map(F.col): _*))
  }

  /** Human-readable `expected` text (plays the reference's error-message
    * role, `blaze_wrapper.cpp:186`). Static per constraint. */
  private[compile] def expectedOf(c: Constraint): String = c match {
    case NotNull(_, col)    => s"$col not null"
    case IsIn(_, col, vs)   =>
      val shown = if (vs.sizeIs > 8) vs.take(8).mkString(", ") + ", …"
                  else vs.mkString(", ")
      s"$col in {$shown}"
    case ConstEq(_, col, v) => s"$col == $v"
    case Bounds(_, col, mn, mx, emn, emx) =>
      val lo = mn.map(b => s"${if (emn) ">" else ">="} $b")
      val hi = mx.map(b => s"${if (emx) "<" else "<="} $b")
      s"$col ${(lo.toSeq ++ hi.toSeq).mkString(" and ")}"
    case MultipleOf(_, col, k)  => s"$col multipleOf $k"
    case LengthBounds(_, col, mn, mx) =>
      s"length($col) in [${mn.getOrElse(0)}, ${mx.map(_.toString).getOrElse("∞")}]"
    case Matches(_, col, p)     => s"$col matches /$p/"
    case FormatIs(_, col, f, _) => s"$col has format $f"
    case SizeBounds(_, col, mn, mx) =>
      s"size($col) in [${mn.getOrElse(0)}, ${mx.map(_.toString).getOrElse("∞")}]"
    case UniqueItems(_, col)    => s"$col elements unique"
    case EachElement(_, col, e) => s"every element of $col: ${expectedOf(e)}"
    case ContainsCount(_, col, e, mn, mx) =>
      s"count of elements of $col where (${expectedOf(e)}) in " +
        s"[$mn, ${mx.map(_.toString).getOrElse("∞")}]"
    case PrefixItems(_, col, es) => s"prefix of $col: ${es.size} schemas"
    case EachElementFrom(_, col, start, e) =>
      s"every element of $col from index $start: ${expectedOf(e)}"
    case KeysIn(_, col, allowed) =>
      s"keys of $col in {${allowed.mkString(", ")}}"
    case KeyCountBounds(_, col, mn, mx) =>
      s"key count of $col in [${mn.getOrElse(0)}, " +
        s"${mx.map(_.toString).getOrElse("∞")}]"
    case EachKey(_, col, e) => s"every key of $col: ${expectedOf(e)}"
    case TypeIs(_, col, t)  => s"$col is of type $t"
    case SizeConsistency(_, i, a) => s"$i == size($a)"
    case ExprIs(_, p, _, exp)   => if (exp.nonEmpty) exp else p
    case AllOf(_, cs)  => cs.map(expectedOf).mkString("(", ") and (", ")")
    case AnyOf(_, cs)  => cs.map(expectedOf).mkString("(", ") or (", ")")
    case OneOf(_, cs)  => "exactly one of: " +
      cs.map(expectedOf).mkString("(", "); (", ")")
    case Not(_, c0)    => s"not (${expectedOf(c0)})"
    case IfThen(_, i, t, e) =>
      s"if (${expectedOf(i)}) then (${expectedOf(t)})" +
        e.map(x => s" else (${expectedOf(x)})").getOrElse("")
    case BoolSchema(_, v) => if (v) "true" else "false"
    case Ref(_, name)     => s"ref $name"
    case Unique(_, col)   => s"$col unique across dataset"
    case RefIntegrity(_, col, dn, dc) => s"$col exists in $dn.$dc"
    case NoDrift(_, col, _, _, _, m, t, _) => s"$m($col) <= $t"
  }

  // ------------------------------------------------------------------
  // Dataset-level lowering (SURVEY.md §2.C)
  // ------------------------------------------------------------------

  private def lowerDataset(c: Constraint): DatasetCheck = c match {
    case u: Unique       => UniqueCheck(u.id, u.col, expectedOf(u))
    case r: RefIntegrity =>
      RefIntegrityCheck(r.id, r.col, r.dimName, r.dimCol, expectedOf(r))
    case d: NoDrift =>
      DriftCheck(d.id, d.col, d.lo, d.hi, d.buckets, d.metric, d.threshold,
        expectedOf(d), d.minRows)
    case other =>
      throw new CompileException(s"not a dataset-level constraint: $other")
  }

  /** Stable identity of the compiled suite for checkpoint lineage. */
  private def hashOf(suite: ConstraintSuite): String = {
    val canon = ConstraintJson.renderSuite(suite)
    val md = MessageDigest.getInstance("SHA-256")
    md.digest(canon.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString
  }
}
