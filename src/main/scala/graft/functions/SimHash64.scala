package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.types._

/**
 * `simhash64(words)` — 64-bit SimHash over a string array: bit i of the
 * result is 1 iff Σ over words of sign(bit i of xxhash64(word)) > 0.
 *
 * Why a custom Expression: the built-in formulation needs `aggregate`
 * over the words with a `zip_with` over 64 counters per word — two
 * nested interpreted lambdas allocating a 64-slot array per word
 * (~6 ms/doc observed). This generates one flat loop with a local
 * long[64], no per-word allocation, inside whole-stage codegen. Word
 * hashing uses the same XXH64/seed-42 as `F.xxhash64`, so results are
 * bit-identical to the built-in formulation. Empty strings are skipped
 * (split artifacts); a null array yields null.
 */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 requires array<string>, got $other")
    }

  override def dataType: DataType = LongType

  private def elementNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val counters = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val w = arr.getUTF8String(i)
        if (w.numBytes() > 0) {
          val h = SimHash64.hashWord(w)
          var b = 0
          while (b < 64) {
            counters(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counters(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr => {
      // Locals via ctx.freshName — fixed names collide (Janino
      // "Redefinition of local variable") when the body is emitted twice
      // in one generated function, killing whole-stage codegen.
      val counters = ctx.freshName("counters")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val w = ctx.freshName("w")
      val h = ctx.freshName("h")
      val b = ctx.freshName("b")
      val b2 = ctx.freshName("b")
      val nullGuard =
        if (elementNullable) s"if ($arr.isNullAt($i)) continue;" else ""
      s"""
         |int[] $counters = new int[64];
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  org.apache.spark.unsafe.types.UTF8String $w = $arr.getUTF8String($i);
         |  if ($w.numBytes() == 0) continue;
         |  long $h = graft.functions.SimHash64.hashWord($w);
         |  for (int $b = 0; $b < 64; $b++) {
         |    $counters[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |${ev.value} = 0L;
         |for (int $b2 = 0; $b2 < 64; $b2++) {
         |  if ($counters[$b2] > 0) ${ev.value} |= (1L << $b2);
         |}
       """.stripMargin
    })

  // NOTE: no instance-level `hashWord` helper — a same-named (even
  // private) member on the case class suppresses scalac's static
  // forwarder for the companion's method, and the generated Java calls
  // `graft.functions.SimHash64.hashWord(...)` as a static.
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object SimHash64 {
  /** Same hash and seed as `F.xxhash64(col)` — results stay identical
    * to the higher-order-function formulation. */
  def hashWord(w: UTF8String): Long =
    XXH64.hashUTF8String(w, 42L)

  def apply(words: Column): Column =
    org.apache.spark.sql.GraftSqlBridge.column(
      SimHash64(org.apache.spark.sql.GraftSqlBridge.expression(words)))
}
