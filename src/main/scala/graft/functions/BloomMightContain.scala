package graft.functions

import java.io.ByteArrayInputStream

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/**
 * `bloom_might_contain(hash)` — probe a serialized Bloom filter with a
 * 64-bit hash. False means DEFINITELY absent (no false negatives); true
 * means "verify exactly downstream". The pre-shuffle pruning primitive
 * for decontamination / membership checks whose reference set is too
 * large to broadcast as an exact hash table: the filter is a few MB of
 * bits where the exact set is GBs, and the surviving fraction (hits +
 * fpp of the scan) is what actually enters the join.
 *
 * Why a custom Expression (SURVEY.md preference (b)): Spark's own
 * BloomFilterMightContain is internal (runtime-filter rule only, not
 * registered for users), and the public `DataFrameStatFunctions
 * .bloomFilter` result is a driver-side object with no column-level
 * probe. This carries the filter as serialized bytes (so the expression
 * tree ships to executors regardless of the sketch's own Java
 * serializability), deserializes once per executor lazily, and probes
 * inside whole-stage codegen — one monomorphic call per row, no boxing.
 */
case class BloomMightContain(child: Expression, bits: Array[Byte])
    extends UnaryExpression {

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bits))

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType | IntegerType | ShortType | ByteType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain requires an integral hash column, got $other")
    }

  override def dataType: DataType = BooleanType

  override protected def nullSafeEval(input: Any): Any = {
    val v: Long = input match {
      case l: java.lang.Long    => l.longValue()
      case i: java.lang.Integer => i.longValue()
      case s: java.lang.Short   => s.longValue()
      case b: java.lang.Byte    => b.longValue()
    }
    bloom.mightContainLong(v)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the LIVE deserialized filter: ctx.references are handed
    // to the generated class at runtime on each executor, after this
    // expression (with its byte payload) has already been shipped
    val ref = ctx.addReferenceObj("bloomFilter", bloom,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = $ref.mightContainLong((long) $v);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
