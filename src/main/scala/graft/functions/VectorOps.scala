package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * Codegen vector arithmetic for the similarity/ANN paths.
 *
 * Why custom Expressions (SURVEY.md preference (b)): the higher-order
 * formulation (`aggregate` × `zip_with` × `transform`) evaluates its
 * lambdas INTERPRETED — fine at 500 vectors, dominant at 10^9 ×
 * O(planes + candidates) evaluations. Each of these generates one flat
 * primitive loop inside whole-stage codegen.
 *
 * Numeric contract (oracle determinism): every element is widened to
 * double BEFORE arithmetic and accumulation runs left-to-right in
 * double — the same order DuckDB's `list_dot_product` uses, so results
 * are value-exact against the SQL oracle.
 */
private[functions] trait VectorExprHelpers { self: Expression =>
  protected def checkVec(dt: DataType, what: String): TypeCheckResult =
    dt match {
      case ArrayType(FloatType | DoubleType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"$what requires array<float|double>, got $other")
    }

  /** Java accessor returning the element at index `i` widened to double. */
  protected def getD(arr: String, dt: DataType, i: String): String =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => s"(double) $arr.getFloat($i)"
      case _         => s"$arr.getDouble($i)"
    }

  protected def evalD(arr: ArrayData, dt: DataType, i: Int): Double =
    dt.asInstanceOf[ArrayType].elementType match {
      case FloatType => arr.getFloat(i).toDouble
      case _         => arr.getDouble(i)
    }

  protected def anyElementNullable(dts: DataType*): Boolean =
    dts.exists(_.asInstanceOf[ArrayType].containsNull)
}

/**
 * `dot_product(a, b)` — Σ (double)a[i]·(double)b[i]. Null if either
 * array is null, lengths differ, or a summed element is null (the same
 * outcomes the `aggregate`×`zip_with` formulation produced).
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression with VectorExprHelpers {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVec(left.dataType, "dot_product")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkVec(right.dataType, "dot_product")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var s = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      s += evalD(x, left.dataType, i) * evalD(y, right.dataType, i)
      i += 1
    }
    s
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val s = ctx.freshName("s")
      val nullCheck =
        if (anyElementNullable(left.dataType, right.dataType))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $s = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    $s += ${getD(a, left.dataType, i)} * ${getD(b, right.dataType, i)};
         |  }
         |  ${ev.value} = $s;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/**
 * `cosine_sim(a, b)` — dot(a,b) / (sqrt(dot(a,a)) · sqrt(dot(b,b))),
 * all three sums in ONE pass over the arrays. Arithmetic is identical
 * (term order and widening) to computing the three dot products
 * separately, so results match the SQL-oracle formula exactly.
 */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression with VectorExprHelpers {

  override def checkInputDataTypes(): TypeCheckResult = {
    val l = checkVec(left.dataType, "cosine_sim")
    if (l != TypeCheckResult.TypeCheckSuccess) l
    else checkVec(right.dataType, "cosine_sim")
  }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) return null
    var sab = 0.0; var saa = 0.0; var sbb = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xa = evalD(x, left.dataType, i)
      val yb = evalD(y, right.dataType, i)
      sab += xa * yb; saa += xa * xa; sbb += yb * yb
      i += 1
    }
    // zero-norm guard: 0/0 = NaN, and Spark ORDERS NaN as the largest
    // double — a zero vector would outrank every real neighbor in a
    // cosine-desc top-k and satisfy any >= threshold filter. Similarity
    // to a zero vector is defined as 0.
    if (saa == 0.0 || sbb == 0.0) 0.0
    else sab / (math.sqrt(saa) * math.sqrt(sbb))
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val sab = ctx.freshName("sab")
      val saa = ctx.freshName("saa")
      val sbb = ctx.freshName("sbb")
      val xa = ctx.freshName("xa")
      val yb = ctx.freshName("yb")
      val nullCheck =
        if (anyElementNullable(left.dataType, right.dataType))
          s"if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; break; }"
        else ""
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sab = 0.0; double $saa = 0.0; double $sbb = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullCheck
         |    double $xa = ${getD(a, left.dataType, i)};
         |    double $yb = ${getD(b, right.dataType, i)};
         |    $sab += $xa * $yb; $saa += $xa * $xa; $sbb += $yb * $yb;
         |  }
         |  ${ev.value} = ($saa == 0.0 || $sbb == 0.0) ? 0.0
         |    : $sab / (java.lang.Math.sqrt($saa) * java.lang.Math.sqrt($sbb));
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      l: Expression, r: Expression): Expression = copy(left = l, right = r)
}

/**
 * `hyperplane_bucket(vec)` — random-hyperplane LSH bucket: bit p of the
 * result is 1 iff vec · plane_p ≥ 0, all `planes` dot products in ONE
 * pass (plane matrix attached as a codegen reference, row-major
 * `planes × dim`). Replaces `planes` separate interpreted
 * aggregate×zip_with dots. Vectors whose length ≠ dim bucket to null.
 *
 * The plane matrix is deterministic from (dim, planes, seed) via
 * [[HyperplaneBucket.planesFor]] — exposed so an independent SQL oracle
 * can embed the identical literals and reproduce the bucketing.
 */
case class HyperplaneBucket(child: Expression, dim: Int, planes: Int,
    seed: Long)
    extends UnaryExpression with VectorExprHelpers {
  require(planes >= 1 && planes <= 63, "planes must be in [1, 63]")

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, "hyperplane_bucket")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  @transient private lazy val mat: Array[Double] =
    HyperplaneBucket.flatPlanes(dim, planes, seed)

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var bucket = 0L
    var p = 0
    while (p < planes) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return null
        s += evalD(v, child.dataType, i) * mat(p * dim + i)
        i += 1
      }
      if (s >= 0) bucket |= (1L << p)
      p += 1
    }
    bucket
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("hyperplanes", mat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val bucket = ctx.freshName("bucket")
      val p = ctx.freshName("p")
      val s = ctx.freshName("s")
      val i = ctx.freshName("i")
      val bad = ctx.freshName("bad")
      val nullCheck =
        if (anyElementNullable(child.dataType))
          s"if ($v.isNullAt($i)) { $bad = true; break; }"
        else ""
      s"""
         |if ($v.numElements() != $dim) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $bucket = 0L;
         |  boolean $bad = false;
         |  for (int $p = 0; $p < $planes && !$bad; $p++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $nullCheck
         |      $s += ${getD(v, child.dataType, i)} * $matRef[$p * $dim + $i];
         |    }
         |    if ($s >= 0) $bucket |= (1L << $p);
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $bucket; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object DotProduct {
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(DotProduct(
      org.apache.spark.sql.GraftSqlBridge.expression(a),
      org.apache.spark.sql.GraftSqlBridge.expression(b)))
}

object CosineSim {
  def apply(a: Column, b: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(CosineSim(
      org.apache.spark.sql.GraftSqlBridge.expression(a),
      org.apache.spark.sql.GraftSqlBridge.expression(b)))
}

object HyperplaneBucket {
  /** Seeded Gaussian plane matrix, `planes` rows × `dim` columns —
    * the same derivation the previous column-expression formulation
    * used, so buckets are reproducible across releases. */
  def planesFor(dim: Int, planes: Int, seed: Long): Array[Array[Double]] = {
    val rnd = new java.util.Random(seed)
    Array.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))
  }

  private[functions] def flatPlanes(
      dim: Int, planes: Int, seed: Long): Array[Double] =
    planesFor(dim, planes, seed).flatten

  def apply(vec: Column, dim: Int, planes: Int, seed: Long): Column =
    org.apache.spark.sql.GraftSqlBridge.column(HyperplaneBucket(
      org.apache.spark.sql.GraftSqlBridge.expression(vec),
      dim, planes, seed))
}
