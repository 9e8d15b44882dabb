package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: 64-bit SimHash of a token array,
  * returned as a 64-char bitstring (msb first).
  *
  * Per-token hash = xxhash64(token, seed=42) — bit-identical to
  * `functions.xxhash64(col)`, so results match the higher-order-
  * function formulation this replaces (asserted in SimHash64Spec).
  * A single pass over the tokens with a 64-int accumulator; the HOF
  * version re-walked the array once per bit (64 interpreted passes).
  *
  * `doGenCode` emits a static call, keeping the surrounding projection
  * inside whole-stage codegen (no CodegenFallback row boxing).
  */
case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 expects array<string>, got ${other.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)

  override def prettyName: String = "simhash64"
}

object SimHash64 {
  private val Seed = 42L // functions.xxhash64's fixed seed

  /** static so generated code can call it directly */
  def compute(arr: ArrayData): UTF8String = {
    val counts = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, Seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    val out = new Array[Byte](64)
    var b = 63
    var j = 0
    while (b >= 0) {
      out(j) = if (counts(b) > 0) '1'.toByte else '0'.toByte
      b -= 1; j += 1
    }
    UTF8String.fromBytes(out)
  }
}
