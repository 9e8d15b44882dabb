package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native Catalyst expression: hyperplane-LSH bucket signatures of an
  * `array<double>` vector — one long per table, bit r set when the
  * vector's dot product with plane `t*bits+r` is positive.
  *
  * Replaces the interpreted formulation (48 `aggregate(zip_with(...))`
  * dot products per row, re-inlined per consumer by CollapseProject —
  * the round-1 q49 scale-killer) with ONE pass: all `tables × bits`
  * planes in a tight JVM loop, `doGenCode` emitting a static call so
  * the projection stays in whole-stage codegen.
  *
  * Plane components are ±1 derived from MurmurHash3 of "plane:p:c" —
  * deterministic (no RNG state: survives task retry/resume) and cheap
  * to mirror as literal DOUBLE[] lists in DuckDB oracle SQL, which is
  * how q49's algorithm-level oracle is built (the oracle computes the
  * SAME signatures, so the comparison verifies bucketing semantics,
  * not just high-recall pairs).
  */
case class LshSigs(child: Expression, tables: Int, bits: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) if tables > 0 && bits > 0 && bits <= 63 =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"lsh_sigs expects array<double> with 0 < bits <= 63, got " +
          s"${other.simpleString(10)} tables=$tables bits=$bits")
    }

  override protected def nullSafeEval(input: Any): Any =
    LshSigs.compute(input.asInstanceOf[ArrayData], tables, bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.LshSigs.compute($c, $tables, $bits)")

  override protected def withNewChildInternal(newChild: Expression): LshSigs =
    copy(child = newChild)

  override def prettyName: String = "lsh_sigs"
}

object LshSigs {

  /** deterministic ±1 plane component — the single source of truth
    * shared by the JVM kernel and the DuckDB oracle-SQL literals
    */
  def planeSign(p: Int, c: Int): Double =
    if ((scala.util.hashing.MurmurHash3.stringHash(s"plane:$p:$c") & 1) == 1) 1.0
    else -1.0

  // flattened plane matrix [numPlanes * dim], cached per geometry —
  // computing MurmurHash3 per component per ROW would dominate the scan
  private val cache = new ConcurrentHashMap[(Int, Int), Array[Double]]()

  private def planes(numPlanes: Int, dim: Int): Array[Double] =
    cache.computeIfAbsent((numPlanes, dim), { case (np, d) =>
      val m = new Array[Double](np * d)
      var p = 0
      while (p < np) {
        var c = 0
        while (c < d) { m(p * d + c) = planeSign(p, c); c += 1 }
        p += 1
      }
      m
    })

  /** static so generated code can call it directly */
  def compute(v: ArrayData, tables: Int, bits: Int): ArrayData = {
    val dim = v.numElements()
    val m = planes(tables * bits, dim)
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var sig = 0L
      var r = 0
      while (r < bits) {
        val off = (t * bits + r) * dim
        var dot = 0.0
        var c = 0
        while (c < dim) { dot += v.getDouble(c) * m(off + c); c += 1 }
        if (dot > 0) sig |= (1L << r)
        r += 1
      }
      out(t) = sig
      t += 1
    }
    new GenericArrayData(out)
  }
}
