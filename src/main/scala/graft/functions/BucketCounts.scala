package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * `bucket_counts(arr)` — per-row histogram of an integral array:
 * element i of the result is the count of array elements with
 * `pmod(elem, buckets) == i`. Null elements are skipped; a null array
 * yields null.
 *
 * Why a custom Expression: the element-histogram alternative
 * (`explode` every element, then aggregate) materializes one ROW per
 * array element — at 10^12 rows × ~512 tokens that is allocation/GC
 * bound and stops scaling with cores (observed: 8→32 threads gained
 * nothing). This collapses the per-row work into one tight primitive
 * loop; the downstream explode emits `buckets` rows per input row
 * (~8× fewer at 512 tokens / 64 buckets) and the aggregate's map-side
 * combine still bounds the shuffle at partitions × buckets.
 */
case class BucketCounts(child: Expression, buckets: Int)
    extends UnaryExpression {
  require(buckets >= 1, "buckets must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(IntegerType | LongType | ShortType | ByteType, _) =>
        TypeCheckResult.TypeCheckSuccess
      case other =>
        TypeCheckResult.TypeCheckFailure(
          s"bucket_counts requires array<integral>, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  private def elementNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  // extractor resolved ONCE per expression, not per element — the
  // interpreted path would otherwise pay an ArrayType cast + type
  // dispatch for every element of every row
  @transient private lazy val getLong: (ArrayData, Int) => Long =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case IntegerType => (arr, i) => arr.getInt(i).toLong
      case LongType    => (arr, i) => arr.getLong(i)
      case ShortType   => (arr, i) => arr.getShort(i).toLong
      case ByteType    => (arr, i) => arr.getByte(i).toLong
    }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counts = new Array[Long](buckets)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val m = (getLong(arr, i) % buckets).toInt
        counts(if (m < 0) m + buckets else m) += 1
      }
      i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      val counts = ctx.freshName("counts")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val get = child.dataType.asInstanceOf[ArrayType].elementType match {
        case IntegerType => s"(long) $arr.getInt($i)"
        case LongType    => s"$arr.getLong($i)"
        case ShortType   => s"(long) $arr.getShort($i)"
        case ByteType    => s"(long) $arr.getByte($i)"
      }
      val nullGuard =
        if (elementNullable) s"if ($arr.isNullAt($i)) continue;" else ""
      s"""
         |long[] $counts = new long[$buckets];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  int $m = (int) (($get) % $buckets);
         |  $counts[$m < 0 ? $m + $buckets : $m]++;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($counts);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object BucketCounts {
  def apply(arr: Column, buckets: Int): Column =
    org.apache.spark.sql.GraftSqlBridge.column(BucketCounts(
      org.apache.spark.sql.GraftSqlBridge.expression(arr), buckets))
}
