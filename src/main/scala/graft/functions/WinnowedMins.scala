package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * `winnowed_mins(hashes, w)` — the winnowing fingerprint selection of
 * Schleimer–Wilkerson–Aiken (SIGMOD'03, the MOSS algorithm; public
 * literature): the minimum hash of every window of `w` consecutive
 * positions, deduplicated. Content-defined selection keeps ~2/(w+1) of
 * the positions with the GUARANTEE that any substring long enough to
 * contain a full window (k-grams: any shared run of ≥ w+k−1 tokens)
 * contributes at least one selected value common to both documents —
 * the recall-lossless sparsification under exact substring dedup.
 *
 * Arrays shorter than `w` yield the single min of the whole array;
 * empty arrays yield an empty selection. Output values are distinct and
 * sorted (selection is a SET of fingerprints — position is not needed
 * for pair detection, and distinctness keeps the downstream explode
 * minimal).
 *
 * Why a custom Expression: the sliding-window minimum is a monotonic-
 * deque O(n) loop — per-window `slice`+`array_min` lambdas are
 * interpreted (CodegenFallback) and O(n·w).
 */
case class WinnowedMins(child: Expression, w: Int)
    extends UnaryExpression {
  require(w >= 1, "winnow window w must be >= 1")

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnowed_mins requires array<bigint>, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(
      WinnowedMins.minsAll(input.asInstanceOf[ArrayData], w))

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      s"""
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.WinnowedMins.minsAll($arr, $w));
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WinnowedMins {

  /** Distinct sorted window minima: monotonic-deque sliding min (O(n)),
    * then sort + unique. Null elements are skipped (ShingleHashes emits
    * none, but the contract must not NPE on a hand-built array). */
  def minsAll(hashes: ArrayData, w: Int): Array[Long] = {
    val n = hashes.numElements()
    if (n == 0) return Array.emptyLongArray
    val ww = math.min(w, n)
    val sel = new Array[Long](n - ww + 1)
    var m = 0
    // deque of candidate indices with increasing hash values
    val dq = new Array[Int](n)
    var head = 0
    var tail = 0
    var i = 0
    while (i < n) {
      if (!hashes.isNullAt(i)) {
        val v = hashes.getLong(i)
        while (tail > head && hashes.getLong(dq(tail - 1)) >= v) tail -= 1
        dq(tail) = i; tail += 1
      }
      if (tail > head && dq(head) <= i - ww) head += 1
      if (i >= ww - 1 && tail > head) {
        sel(m) = hashes.getLong(dq(head)); m += 1
      }
      i += 1
    }
    if (m == 0) return Array.emptyLongArray
    java.util.Arrays.sort(sel, 0, m)
    var uniq = 1
    var j = 1
    while (j < m) {
      if (sel(j) != sel(j - 1)) { sel(uniq) = sel(j); uniq += 1 }
      j += 1
    }
    java.util.Arrays.copyOf(sel, uniq)
  }

  def apply(hashes: Column, w: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(WinnowedMins(
      org.apache.spark.sql.GraftSqlBridge.expression(hashes), w))
}
