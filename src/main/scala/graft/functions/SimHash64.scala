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

/** md5-token-hash variant of [[SimHash64]] — same single-pass
  * accumulator, same bitstring output, but the per-token 64-bit hash
  * is the FIRST 8 BYTES OF MD5 read big-endian. md5 is the one 64+-bit
  * hash both Spark and DuckDB expose over identical bytes, which makes
  * this variant mirror-oracle-able (q28): the DuckDB twin reads the
  * same bits straight out of `md5(token)`'s hex. Costs ~2-3× the
  * xxh64 variant per token — keep [[SimHash64]] for production paths
  * that don't need a cross-engine witness.
  */
case class SimHash64Md5(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64_md5 expects array<string>, got ${other.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any =
    SimHash64.computeMd5(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.computeMd5($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Md5 =
    copy(child = newChild)

  override def prettyName: String = "simhash64_md5"
}

object SimHash64 {
  private val Seed = 42L // functions.xxhash64's fixed seed

  // MessageDigest is stateful — one per executor thread
  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** static so generated code can call it directly */
  def computeMd5(arr: ArrayData): UTF8String = {
    val counts = new Array[Int](64)
    val md = Md5.get()
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        // first 8 digest bytes big-endian == first 16 hex chars of
        // md5's text form, msb first — the exact bits the SQL twin
        // extracts digit-by-digit
        var h = 0L
        var k = 0
        while (k < 8) { h = (h << 8) | (digest(k) & 0xffL); k += 1 }
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    emit(counts)
  }

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
    emit(counts)
  }

  /** shared counts → 64-char msb-first bitstring */
  private def emit(counts: Array[Int]): UTF8String = {
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
