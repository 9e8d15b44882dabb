package graft.functions

import org.apache.spark.sql.functions._
import org.scalacheck.Gen

import graft.SparkSpec

/** Randomized parity for the native text kernels: on arbitrary
  * generated strings (unicode, whitespace runs, empty/degenerate
  * tokens), token_stats and shingle_hashes must equal the Catalyst
  * formulations they replaced — one DataFrame pass per property.
  */
class KernelPropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val piece: Gen[String] = Gen.oneOf(
    Gen.alphaNumStr.map(_.take(6)),
    Gen.const(" "), Gen.const("  "), Gen.const("\t"), Gen.const("\n"),
    Gen.const("héllo"), Gen.const("答え"), Gen.const("a1b2"),
    Gen.const("!?."), Gen.const(""), Gen.const("x y z"),
    Gen.const("the the the"))

  private val text: Gen[String] =
    Gen.chooseNum(0, 12).flatMap(n => Gen.listOfN(n, piece).map(_.mkString))

  private def sample(n: Int): Seq[String] = {
    val seed = org.scalacheck.rng.Seed(20260812L)
    Iterator.iterate((seed, List.empty[String])) { case (s, acc) =>
      val r = text.pureApply(Gen.Parameters.default, s)
      (s.next, r :: acc)
    }.drop(n).next()._2
  }

  test("property: token_stats == regex/array formulation on random text") {
    val df = sample(300).toDF("text").filter(length(col("text")) > 0)
    val words = split(lower(col("text")), " ")
    val bad = df.select(
      call_function("token_stats", lower(col("text"))).as("t"),
      size(words).cast("long").as("ws"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("bpe"),
      size(array_distinct(words)).cast("long").as("dst"),
      col("text"))
      .filter(col("t.ws_tokens") =!= col("ws") ||
        col("t.bpeish_tokens") =!= col("bpe") ||
        col("t.distinct_tokens") =!= col("dst"))
      .collect()
    assert(bad.isEmpty, s"token_stats mismatches: ${bad.take(3).toSeq}")
  }

  test("property: shingle_hashes == xxhash64-of-string-shingles on random text") {
    val df = sample(300).toDF("text")
    val words = split(lower(col("text")), " ")
    val stringShingles =
      when(size(words) >= 3,
        array_distinct(transform(
          sequence(lit(1), size(words) - 2),
          i => array_join(slice(words, i, lit(3)), " "))))
        .otherwise(array().cast("array<string>"))
    val bad = df.select(
      call_function("shingle_hashes", lower(col("text")), lit(3)).as("native"),
      array_sort(array_distinct(transform(stringShingles, x => xxhash64(x))))
        .as("viaStrings"),
      col("text"))
      .filter(not(col("native") <=> col("viaStrings")))
      .collect()
    assert(bad.isEmpty, s"shingle_hashes mismatches: ${bad.take(3).toSeq}")
  }

  test("property: simhash64 of a permuted token array is permutation-invariant") {
    // simhash is a bag-of-tokens signature: counts per bit don't
    // depend on order — a regression guard on the accumulator
    val rows = sample(200)
      .map(_.split(" ").toSeq).filter(_.nonEmpty)
      .map(ws => (ws, scala.util.Random.shuffle(ws)))
    val df = rows.toDF("a", "b")
    val bad = df.select(
      call_function("simhash64", col("a")).as("ha"),
      call_function("simhash64", col("b")).as("hb"))
      .filter(col("ha") =!= col("hb")).count()
    assert(bad == 0)
  }
}
