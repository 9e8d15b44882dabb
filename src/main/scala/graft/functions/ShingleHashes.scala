package graft.functions

import java.util.Arrays

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: distinct n-word-shingle hashes of a
  * (pre-lowered) text, as `array<long>` — the posting keys under the
  * q26/q27 near-dup family.
  *
  * Hash-compatible with the Catalyst formulation it replaces:
  * each value is `xxhash64(array_join(slice(split(s," "),i,n), " "))`
  * (seed 42). That equality is structural, not approximate: splitting
  * on a single space and re-joining with a single space reconstructs
  * the exact original byte span (consecutive spaces become empty
  * tokens and re-join to the same bytes), so the kernel hashes the
  * span in place — one scan, zero token/shingle string allocation,
  * instead of split + transform + array_join + array_distinct
  * interpreted walks materializing every shingle string.
  *
  * Distinctness is on the 64-bit hash (sorted ascending); the string
  * formulation dedups on shingle text. They differ only on an xxhash64
  * collision inside one document — ~2^-64 per pair, and the downstream
  * jaccard is bimodal around the threshold, so this is the same
  * trade the round-1 posting join already made.
  */
case class ShingleHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType if n > 0 => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects (string, n > 0), got ${other.simpleString(10)} n=$n")
    }

  override protected def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.ShingleHashes.compute($c, $n)")

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)

  override def prettyName: String = "shingle_hashes"
}

object ShingleHashes {
  private val Seed = 42L // functions.xxhash64's fixed seed

  /** static so generated code can call it directly */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val bytes = s.getBytes
    val len = bytes.length
    // token start offsets (single-space split; empties included)
    var tokens = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') tokens += 1; i += 1 }
    if (tokens < n) return new GenericArrayData(Array.empty[Long])
    val starts = new Array[Int](tokens + 1)
    var t = 1
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(tokens) = len + 1 // sentinel: token k spans [starts(k), starts(k+1)-2]
    val k = tokens - n + 1
    val hashes = new Array[Long](k)
    i = 0
    while (i < k) {
      val from = starts(i)
      val until = starts(i + n) - 1 // end of token i+n-1
      hashes(i) = XXH64.hashUnsafeBytes(
        bytes, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET + from,
        until - from, Seed)
      i += 1
    }
    // distinct via sort + squash (no boxing, no hash-set allocation)
    Arrays.sort(hashes)
    var out = 0
    i = 0
    while (i < k) {
      if (i == 0 || hashes(i) != hashes(i - 1)) { hashes(out) = hashes(i); out += 1 }
      i += 1
    }
    new GenericArrayData(Arrays.copyOf(hashes, out))
  }
}
