package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: all three q35 token statistics from ONE
  * scan of the (pre-lowered) text —
  *
  *   ws_tokens       ≡ size(split(s, " "))            (split limit -1:
  *                     consecutive/trailing separators keep empties)
  *   bpeish_tokens   ≡ size(regexp_extract_all(s,
  *                     "[a-z]+|[0-9]+|[^a-z0-9\\s]")) (\s is ASCII-only
  *                     in Java's default regex mode)
  *   distinct_tokens ≡ size(array_distinct(split(s, " ")))
  *
  * The regex formulation is correct and one-scan too, but generic NFA
  * matching over full documents measured ~10× the cost of its q34/q36
  * siblings; this replaces it with two byte-level passes (no token
  * array materialization, no regex). Byte-level is UTF-8-safe: ' ' and
  * the ASCII token classes never occur inside multibyte sequences, and
  * non-ASCII code points are counted via their leading byte exactly as
  * the regex counts them via `[^a-z0-9\s]`.
  *
  * Callers pass `lower(text)` so lowercase semantics stay Spark's own.
  */
case class TokenStats(child: Expression) extends UnaryExpression {

  override def dataType: DataType = TokenStats.schema

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"token_stats expects string, got ${other.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any =
    TokenStats.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TokenStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)

  override def prettyName: String = "token_stats"
}

object TokenStats {

  val schema: StructType = StructType(Seq(
    StructField("ws_tokens", LongType, nullable = false),
    StructField("bpeish_tokens", LongType, nullable = false),
    StructField("distinct_tokens", LongType, nullable = false)))

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  /** static so generated code can call it directly */
  def compute(s: UTF8String): InternalRow = {
    val bytes = s.getBytes
    val n = bytes.length

    // pass 1: single-space split — part count and distinct part count
    val seen = new java.util.HashSet[UTF8String]()
    var ws = 0L
    var start = 0
    var i = 0
    while (i <= n) {
      if (i == n || bytes(i) == ' ') {
        ws += 1
        seen.add(UTF8String.fromBytes(bytes, start, i - start))
        start = i + 1
      }
      i += 1
    }

    // pass 2: BPE-ish token runs — letter runs, digit runs, and every
    // other non-whitespace code point (continuation bytes 10xxxxxx
    // are skipped so a multibyte char counts once)
    var bpeish = 0L
    var cls = 0 // 0 = boundary, 1 = letter run, 2 = digit run
    i = 0
    while (i < n) {
      val b = bytes(i)
      if (b >= 'a' && b <= 'z') {
        if (cls != 1) { bpeish += 1; cls = 1 }
      } else if (b >= '0' && b <= '9') {
        if (cls != 2) { bpeish += 1; cls = 2 }
      } else {
        cls = 0
        if (!isWs(b) && (b & 0xc0) != 0x80) bpeish += 1
      }
      i += 1
    }

    new GenericInternalRow(Array[Any](ws, bpeish, seen.size.toLong))
  }
}
