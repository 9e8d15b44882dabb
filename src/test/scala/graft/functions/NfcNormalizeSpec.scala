package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native NFC expression must agree with java.text.Normalizer
  * (both implement UAX#15) and behave as a canonical-form operator:
  * idempotent, identity on ASCII, composing decomposed sequences,
  * leaving compatibility characters alone.
  */
class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def norm(s: String): String =
    Seq(s).toDF("t")
      .select(call_function("nfc_normalize", col("t")))
      .as[String].head()

  test("composes decomposed sequences, maps singletons, keeps compatibility") {
    // e + combining acute -> precomposed e-acute
    assert(norm("cafe\u0301") == "caf\u00e9")
    // OHM SIGN is an NFC singleton -> GREEK CAPITAL OMEGA
    assert(norm("\u2126") == "\u03a9")
    // ffi ligature is compatibility-only: NFC must NOT expand it
    assert(norm("\ufb03") == "\ufb03")
    // ASCII is untouched
    assert(norm("plain ascii text 123") == "plain ascii text 123")
  }

  test("idempotent and equal to java.text.Normalizer on mixed samples") {
    val samples = Seq(
      "a\u030augst\u0301", "\u1e9b\u0323", "x\u2126y", "", "no change",
      "mix\u00e9d asc\u0301ii \ufb03 \u2126")
    for (s <- samples) {
      val want = Normalizer.normalize(s, Normalizer.Form.NFC)
      val got = norm(s)
      assert(got == want, s"'$s': got '$got' want '$want'")
      assert(norm(got) == got, s"must be idempotent on '$got'")
    }
  }

  test("null-safe and usable in SQL text") {
    val r = spark.sql("SELECT nfc_normalize(CAST(NULL AS STRING)) AS n")
      .collect()
    assert(r.head.isNullAt(0))
    assert(spark.sql("SELECT nfc_normalize('abc') AS n").as[String].head() == "abc")
  }

  test("stays inside whole-stage codegen (no CodegenFallback)") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(call_function("nfc_normalize", col("text")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*"), plan.take(500))
  }
}
