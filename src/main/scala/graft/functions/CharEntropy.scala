package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: q162's character-bigram Shannon
  * entropy in ONE pass of the (pre-lowered) text —
  *
  *   n_bigrams  ≡ length(t) − 1                 (code points)
  *   n_distinct ≡ count(DISTINCT substr(t,i,2))
  *   entropy    ≡ −Σ (c/n)·ln(c/n)              (raw; caller rounds)
  *
  * The declarative formulation (explode code-point bigrams → two-level
  * groupBy) shuffles O(corpus chars) rows and measured 5.7 s at sf0.1;
  * this computes the identical statistics row-locally, so q162 becomes
  * a pure map over the scan (the q35 TokenStats precedent). Bigrams
  * are CODE-POINT pairs, matching substr semantics in both engines
  * (Spark substr and DuckDB substr index characters, not bytes). The
  * ln-sum iterates distinct bigrams in sorted key order — a fixed,
  * input-determined order, with the cross-engine low-bit skew absorbed
  * by the caller's round(,6) exactly as the shuffled formulation's
  * partition-order skew was.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CharEntropy.schema

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"char_entropy expects string, got ${other.simpleString(10)}")
    }

  override protected def nullSafeEval(input: Any): Any =
    CharEntropy.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.CharEntropy.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): CharEntropy =
    copy(child = newChild)

  override def prettyName: String = "char_entropy"
}

object CharEntropy {

  val schema: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("entropy", DoubleType, nullable = false)))

  /** static so generated code can call it directly */
  def compute(s: UTF8String): InternalRow = {
    // code points, matching substr/length character semantics
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = (cps.length - 1).toLong
    if (n <= 0)
      return new GenericInternalRow(Array[Any](0L, 0L, 0.0))
    val counts = new java.util.HashMap[Long, Long]()
    var i = 0
    while (i < cps.length - 1) {
      val key = (cps(i).toLong << 32) | (cps(i + 1).toLong & 0xffffffffL)
      counts.merge(key, 1L, (a, b) => a + b)
      i += 1
    }
    val keys = new Array[Long](counts.size)
    val it = counts.keySet().iterator()
    var k = 0
    while (it.hasNext) { keys(k) = it.next(); k += 1 }
    java.util.Arrays.sort(keys)
    var acc = 0.0
    val nd = n.toDouble
    k = 0
    while (k < keys.length) {
      val p = counts.get(keys(k)) / nd
      acc += p * math.log(p)
      k += 1
    }
    // 0.0 - acc, not -acc: a zero-entropy doc (single repeated bigram)
    // has acc = 0.0 and unary minus would emit -0.0, whose full-
    // precision repr ("-0.0") hash-splits from the oracle's "0.0"
    new GenericInternalRow(Array[Any](n, counts.size.toLong, 0.0 - acc))
  }
}
