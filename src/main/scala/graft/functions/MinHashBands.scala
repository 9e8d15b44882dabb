package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: MinHash banding of a shingle-hash set —
  * `bands` bucket keys from `bands × rowsPerBand` min-hash functions,
  * all computed in ONE pass over the input (SURVEY.md §2B E12).
  *
  * hash_p(h) = XXH64.hashLong(h, p); band key = the iterative XXH64
  * combine of its rowsPerBand minima (the same fold Spark's multi-arg
  * `xxhash64` performs). The round-1 Catalyst formulation evaluated
  * `array_min(transform(...))` per hash function — numHashes
  * interpreted walks per document, the dominant q27 cost; here the
  * minima accumulate in one tight loop.
  *
  * Candidate semantics are unchanged — P(candidate | j) =
  * 1-(1-j^rowsPerBand)^bands over the distinct shingle set — and the
  * verify stage makes emitted pairs exact, so the band hash only needs
  * determinism, not compatibility with any prior spelling.
  */
case class MinHashBands(child: Expression, bands: Int, rowsPerBand: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) if bands > 0 && rowsPerBand > 0 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_bands expects array<long> with positive geometry, got " +
          s"${other.simpleString(10)} bands=$bands rowsPerBand=$rowsPerBand")
    }

  override protected def nullSafeEval(input: Any): Any =
    MinHashBands.compute(input.asInstanceOf[ArrayData], bands, rowsPerBand)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.MinHashBands.compute($c, $bands, $rowsPerBand)")

  override protected def withNewChildInternal(newChild: Expression): MinHashBands =
    copy(child = newChild)

  override def prettyName: String = "minhash_bands"
}

object MinHashBands {
  private val Seed = 42L

  /** static so generated code can call it directly */
  def compute(sh: ArrayData, bands: Int, rowsPerBand: Int): ArrayData = {
    val numHashes = bands * rowsPerBand
    val minima = new Array[Long](numHashes)
    java.util.Arrays.fill(minima, Long.MaxValue)
    val n = sh.numElements()
    var i = 0
    while (i < n) {
      val h = sh.getLong(i)
      var p = 0
      while (p < numHashes) {
        val hp = XXH64.hashLong(h, p.toLong)
        if (hp < minima(p)) minima(p) = hp
        p += 1
      }
      i += 1
    }
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = Seed
      var r = 0
      while (r < rowsPerBand) {
        acc = XXH64.hashLong(minima(b * rowsPerBand + r), acc)
        r += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }
}
