package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the PORTABLE md5-hex48 minhash family
  * (q133/q192/q200) in one pass — for each hash index p in
  * [0, numHashes), the minimum over the input string shingles of
  *
  *   conv(substring(md5('mh' || p || ':' || g), 1, 12), 16, 10)
  *
  * i.e. the first 48 bits (6 digest bytes, big-endian) of
  * md5("mh" + p + ":" + g) — BIT-IDENTICAL to the Catalyst HOF
  * spelling `transform(sequence(0, n-1), p -> array_min(transform(
  * sh, g -> conv(substring(md5(concat(...)),1,12),16,10))))` it
  * replaces (asserted in PortableMinHashSpec), and therefore to the
  * DuckDB `OracleSql.hex48` twin — swapping it in changes NOTHING the
  * oracle sees. The HOF form walks the shingle array once per hash
  * function in the INTERPRETED evaluator and re-encodes the
  * concatenation per element; this computes all minima in one tight
  * loop, reusing one digest instance and one prefix buffer per call
  * (the r12 blowup run measured the interpreted form as q192/q200's
  * dominant cost — a single 10× signature task ran >100 s).
  *
  * `doGenCode` emits a static call, keeping the projection inside
  * whole-stage codegen (no CodegenFallback row boxing) — the
  * [[SimHash64]] discipline.
  */
case class PortableMinHash(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) if numHashes > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"portable_minhash expects array<string> with a positive hash " +
          s"count, got ${other.simpleString(10)} numHashes=$numHashes")
    }

  override protected def nullSafeEval(input: Any): Any =
    PortableMinHash.compute(input.asInstanceOf[ArrayData], numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.PortableMinHash.compute($c, $numHashes)")

  override protected def withNewChildInternal(
      newChild: Expression): PortableMinHash = copy(child = newChild)

  override def prettyName: String = "portable_minhash"
}

object PortableMinHash {
  // MessageDigest is stateful — one per executor thread
  private val Md5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** static so generated code can call it directly */
  def compute(arr: ArrayData, numHashes: Int): ArrayData = {
    val minima = new Array[Long](numHashes)
    java.util.Arrays.fill(minima, Long.MaxValue)
    val md = Md5.get()
    val n = arr.numElements()
    var p = 0
    while (p < numHashes) {
      // "mh" + p + ":" — ASCII, identical to the UTF-8 bytes Spark's
      // concat(lit("mh"), p, lit(":"), g) feeds md5
      val prefix = ("mh" + p + ":").getBytes("US-ASCII")
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          md.reset()
          md.update(prefix)
          val digest = md.digest(arr.getUTF8String(i).getBytes)
          // first 6 digest bytes big-endian == first 12 hex chars of
          // md5's text form == conv(substring(md5(x),1,12),16,10)
          var h = 0L
          var k = 0
          while (k < 6) { h = (h << 8) | (digest(k) & 0xffL); k += 1 }
          if (h < minima(p)) minima(p) = h
        }
        i += 1
      }
      p += 1
    }
    new GenericArrayData(minima)
  }
}
