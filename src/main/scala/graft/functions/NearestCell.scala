package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/**
 * `nearest_cell(vec)` — IVF cell assignment: the index of the centroid
 * with the LARGEST dot product against the vector (centroids are
 * expected L2-normalized, so argmax-dot == cosine-nearest, independent
 * of the vector's own norm). Ties break to the lowest index; vectors
 * whose length ≠ dim assign to null.
 *
 * One codegen pass over `k × dim` (matrix attached as a flat row-major
 * reference) — the join-against-centroid-table formulation shuffles and
 * ranks `k` rows per input row; this is a projection.
 */
case class NearestCell(child: Expression, centroids: Array[Array[Double]])
    extends UnaryExpression with VectorExprHelpers {
  require(centroids.nonEmpty, "need at least one centroid")
  private val k = centroids.length
  private val dim = centroids(0).length
  require(centroids.forall(_.length == dim), "ragged centroid matrix")

  override def checkInputDataTypes(): TypeCheckResult =
    checkVec(child.dataType, "nearest_cell")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  @transient private lazy val flat: Array[Double] = centroids.flatten

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    if (v.numElements() != dim) return null
    var best = 0
    var bestDot = Double.NegativeInfinity
    var j = 0
    while (j < k) {
      var s = 0.0
      var i = 0
      while (i < dim) {
        if (v.isNullAt(i)) return null
        s += evalD(v, child.dataType, i) * flat(j * dim + i)
        i += 1
      }
      if (s > bestDot) { bestDot = s; best = j }
      j += 1
    }
    best
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val matRef = ctx.addReferenceObj("centroids", flat, "double[]")
    nullSafeCodeGen(ctx, ev, v => {
      val best = ctx.freshName("best")
      val bestDot = ctx.freshName("bestDot")
      val j = ctx.freshName("j")
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
         |  int $best = 0;
         |  double $bestDot = Double.NEGATIVE_INFINITY;
         |  boolean $bad = false;
         |  for (int $j = 0; $j < $k && !$bad; $j++) {
         |    double $s = 0.0;
         |    for (int $i = 0; $i < $dim; $i++) {
         |      $nullCheck
         |      $s += ${getD(v, child.dataType, i)} * $matRef[$j * $dim + $i];
         |    }
         |    if ($s > $bestDot) { $bestDot = $s; $best = $j; }
         |  }
         |  if ($bad) { ${ev.isNull} = true; } else { ${ev.value} = $best; }
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NearestCell {
  def apply(vec: Column, centroids: Array[Array[Double]]): Column =
    org.apache.spark.sql.GraftSqlBridge.column(NearestCell(
      org.apache.spark.sql.GraftSqlBridge.expression(vec), centroids))
}
