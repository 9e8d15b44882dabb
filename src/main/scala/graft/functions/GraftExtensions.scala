package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SparkSessionExtensions entry point — registers graft's native
  * expressions into the session function registry (so they resolve in
  * SQL text and via `call_function`) and the optimizer rules that
  * rewrite interpreted idioms onto them.
  *
  * Enable with:
  *   .config("spark.sql.extensions", "graft.functions.GraftExtensions")
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => graft.plans.VecDotRewrite)
    // whole-operator extension route: AsOfJoinPlan → AsOfJoinExec
    ext.injectPlannerStrategy(_ => graft.plans.GraftStrategy)
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => children match {
        case Seq(tokens) => SimHash64(tokens)
        case _ => throw new IllegalArgumentException(
          s"simhash64(tokens) takes exactly 1 argument, got ${children.size}")
      }))
    ext.injectFunction((
      FunctionIdentifier("simhash64_md5"),
      new ExpressionInfo(classOf[SimHash64Md5].getName, "simhash64_md5"),
      (children: Seq[Expression]) => children match {
        case Seq(tokens) => SimHash64Md5(tokens)
        case _ => throw new IllegalArgumentException(
          s"simhash64_md5(tokens) takes exactly 1 argument, got ${children.size}")
      }))
    ext.injectFunction((
      FunctionIdentifier("cdc_chunks"),
      new ExpressionInfo(classOf[CdcChunks].getName, "cdc_chunks"),
      (children: Seq[Expression]) => children match {
        case Seq(text) => CdcChunks(text)
        case _ => throw new IllegalArgumentException(
          s"cdc_chunks(text) takes exactly 1 argument, got ${children.size}")
      }))
    ext.injectFunction((
      FunctionIdentifier("shingle_hashes"),
      new ExpressionInfo(classOf[ShingleHashes].getName, "shingle_hashes"),
      (children: Seq[Expression]) => children match {
        case Seq(s, org.apache.spark.sql.catalyst.expressions.IntegerLiteral(n)) =>
          ShingleHashes(s, n)
        case _ => throw new IllegalArgumentException(
          "shingle_hashes(text, n) requires an integer-literal n")
      }))
    ext.injectFunction((
      FunctionIdentifier("minhash_bands"),
      new ExpressionInfo(classOf[MinHashBands].getName, "minhash_bands"),
      (children: Seq[Expression]) => children match {
        case Seq(s,
            org.apache.spark.sql.catalyst.expressions.IntegerLiteral(b),
            org.apache.spark.sql.catalyst.expressions.IntegerLiteral(r)) =>
          MinHashBands(s, b, r)
        case _ => throw new IllegalArgumentException(
          "minhash_bands(hashes, bands, rowsPerBand) requires integer-literal geometry")
      }))
    ext.injectFunction((
      FunctionIdentifier("portable_minhash"),
      new ExpressionInfo(classOf[PortableMinHash].getName, "portable_minhash"),
      (children: Seq[Expression]) => children match {
        case Seq(s,
            org.apache.spark.sql.catalyst.expressions.IntegerLiteral(n)) =>
          PortableMinHash(s, n)
        case _ => throw new IllegalArgumentException(
          "portable_minhash(shingles, numHashes) requires an integer-literal count")
      }))
    ext.injectFunction((
      FunctionIdentifier("token_stats"),
      new ExpressionInfo(classOf[TokenStats].getName, "token_stats"),
      (children: Seq[Expression]) => children match {
        case Seq(s) => TokenStats(s)
        case _ => throw new IllegalArgumentException(
          s"token_stats(text) takes exactly 1 argument, got ${children.size}")
      }))
    ext.injectFunction((
      FunctionIdentifier("char_entropy"),
      new ExpressionInfo(classOf[CharEntropy].getName, "char_entropy"),
      (children: Seq[Expression]) => children match {
        case Seq(s) => CharEntropy(s)
        case _ => throw new IllegalArgumentException(
          s"char_entropy(text) takes exactly 1 argument, got ${children.size}")
      }))
    ext.injectFunction((
      FunctionIdentifier("nfc_normalize"),
      new ExpressionInfo(classOf[NfcNormalize].getName, "nfc_normalize"),
      (children: Seq[Expression]) => children match {
        case Seq(s) => NfcNormalize(s)
        case _ => throw new IllegalArgumentException(
          s"nfc_normalize(text) takes exactly 1 argument, got ${children.size}")
      }))
    ext.injectFunction((
      FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (children: Seq[Expression]) => children match {
        case Seq(a, b) => VecDot(a, b)
        case _ => throw new IllegalArgumentException(
          s"vec_dot(a, b) takes exactly 2 arguments, got ${children.size}")
      }))
    ext.injectFunction((
      FunctionIdentifier("lsh_sigs"),
      new ExpressionInfo(classOf[LshSigs].getName, "lsh_sigs"),
      (children: Seq[Expression]) => children match {
        case Seq(v,
            org.apache.spark.sql.catalyst.expressions.IntegerLiteral(t),
            org.apache.spark.sql.catalyst.expressions.IntegerLiteral(b)) =>
          LshSigs(v, t, b)
        case _ => throw new IllegalArgumentException(
          "lsh_sigs(vector, tables, bits) requires integer-literal geometry")
      }))
    ()
  }
}
