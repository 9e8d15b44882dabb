package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunking fingerprints: split a document at
  * rolling-hash boundaries and return xxhash64 of each chunk.
  *
  * Unlike fixed-size chunking, boundaries are chosen by CONTENT (a
  * Rabin-style rolling hash hitting a mask), so inserting or deleting a
  * prefix only perturbs the chunks it touches — the suffix fingerprints
  * survive, which is what makes chunk-overlap a robust near-dup signal
  * for long documents at scale (shuffle 8-byte chunk hashes, join on
  * them, count overlap).
  *
  * Geometry: 16-byte rolling window, boundary when (hash & 0x3F) == 0
  * (expected chunk ≈ 64 bytes), min 16 / max 256 bytes.
  * Native expression with `doGenCode` — stays in whole-stage codegen.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"cdc_chunks expects string, got ${other.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CdcChunks.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)

  override def prettyName: String = "cdc_chunks"
}

object CdcChunks {
  private val BoundaryMask = 0x3fL // avg chunk ~64 bytes
  private val MinChunk = 16
  private val MaxChunk = 256
  private val Seed = 42L

  /** Gear table: 256 deterministic pseudo-random longs. The rolling
    * hash `h = (h << 1) + Gear(b)` forgets bytes after ~64 shifts, so
    * boundaries resynchronize shortly after any edit — the property
    * that makes chunk overlap robust to insertions/deletions.
    */
  private val Gear: Array[Long] =
    Array.tabulate(256)(i => XXH64.hashLong(i.toLong, 0x9e3779b97f4a7c15L))

  /** The gear constants as unsigned decimals — the q50 oracle mirror
    * inlines these as HUGEINT literals so the DuckDB twin replays the
    * exact boundary walk without emulating XXH64 (the table is 256
    * CONSTANTS; only its generation needed the hash).
    */
  private[graft] def gearUnsigned: IndexedSeq[BigInt] = {
    val mask = (BigInt(1) << 64) - 1
    Gear.map(g => BigInt(g) & mask).toIndexedSeq
  }

  /** static so generated code can call it directly */
  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var start = 0
    var h = 0L
    var i = 0
    while (i < n) {
      h = (h << 1) + Gear(bytes(i) & 0xff)
      val len = i - start + 1
      if (len >= MinChunk && ((h & BoundaryMask) == 0L || len >= MaxChunk)) {
        out += XXH64.hashUnsafeBytes(
          bytes, Platform.BYTE_ARRAY_OFFSET + start, len, Seed)
        start = i + 1
      }
      i += 1
    }
    if (start < n)
      out += XXH64.hashUnsafeBytes(
        bytes, Platform.BYTE_ARRAY_OFFSET + start, n - start, Seed)
    new GenericArrayData(out.toArray)
  }

  private object Platform {
    val BYTE_ARRAY_OFFSET: Long = org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET
  }
}
