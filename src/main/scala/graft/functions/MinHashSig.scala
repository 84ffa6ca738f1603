package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/**
 * `minhash_sig(shingleHashes)` — MinHash signature from an array of
 * 64-bit shingle hashes: component i is
 * `min over shingles of (a_i·(h mod P) + b_i) mod P`, the Carter-Wegman
 * family with seeded per-component coefficients (MLlib's MinHashLSH
 * construction, prime P = 2038074743 < 2^31 so no long overflow).
 *
 * Why a custom Expression: the higher-order formulation updates the
 * 64 minima via `aggregate` × `zip_with` — interpreted lambdas at
 * ~160 µs/shingle. This generates one flat loop (numHashes
 * multiply-add-mods per shingle) with coefficient arrays attached as
 * codegen references. Null/absent shingles are skipped; an empty array
 * yields the all-MaxValue signature (no shingles ⇒ no evidence).
 */
case class MinHashSig(child: Expression, numHashes: Int, seed: Long)
    extends UnaryExpression {

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig requires array<long>, got $other")
    }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  @transient private lazy val coefs: (Array[Long], Array[Long]) =
    MinHashSig.coefficients(numHashes, seed)

  private def elementNullable: Boolean =
    child.dataType.asInstanceOf[ArrayType].containsNull

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val (a, b) = coefs
    val mins = Array.fill(numHashes)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val hm = MinHashSig.posMod(arr.getLong(i))
        var j = 0
        while (j < numHashes) {
          val v = MinHashSig.posMod(a(j) * hm + b(j))
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(
      ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashA", coefs._1, "long[]")
    val bRef = ctx.addReferenceObj("minhashB", coefs._2, "long[]")
    nullSafeCodeGen(ctx, ev, arr => {
      // Locals via ctx.freshName — fixed names collide (Janino
      // "Redefinition of local variable") when the body is emitted twice
      // in one generated function, killing whole-stage codegen.
      val mins = ctx.freshName("mins")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val hm = ctx.freshName("hm")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val nullGuard =
        if (elementNullable) s"if ($arr.isNullAt($i)) continue;" else ""
      s"""
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |int $n = $arr.numElements();
         |for (int $i = 0; $i < $n; $i++) {
         |  $nullGuard
         |  long $hm = graft.functions.MinHashSig.posMod($arr.getLong($i));
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = graft.functions.MinHashSig.posMod(
         |      $aRef[$j] * $hm + $bRef[$j]);
         |    if ($v < $mins[$j]) $mins[$j] = $v;
         |  }
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object MinHashSig {
  val Prime = 2038074743L

  def posMod(x: Long): Long = {
    val m = x % Prime
    if (m < 0) m + Prime else m
  }

  /** Seeded coefficient arrays — same derivation as the previous
    * column-expression formulation, so signatures are reproducible. */
  def coefficients(numHashes: Int, seed: Long): (Array[Long], Array[Long]) = {
    val rnd = new java.util.Random(seed)
    def coef() = 1L + math.floorMod(rnd.nextLong(), Prime - 1)
    val pairs = Array.fill(numHashes)((coef(), coef()))
    (pairs.map(_._1), pairs.map(_._2))
  }

  def apply(shingleHashes: Column, numHashes: Int, seed: Long): Column =
    org.apache.spark.sql.GraftSqlBridge.column(MinHashSig(
      org.apache.spark.sql.GraftSqlBridge.expression(shingleHashes),
      numHashes, seed))
}
