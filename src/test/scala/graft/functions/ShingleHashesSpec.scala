package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** shingle_hashes must be hash-identical to the Catalyst string
  * formulation (xxhash64 of array_join'd slices) — the structural
  * claim that splitting on " " and re-joining with " " reconstructs
  * the original byte span, checked on the corpus and on edge cases.
  */
class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private def both(df: org.apache.spark.sql.DataFrame) = {
    val words = split(lower(col("text")), " ")
    val stringShingles =
      when(size(words) >= 3,
        array_distinct(transform(
          sequence(lit(1), size(words) - 2),
          i => array_join(slice(words, i, lit(3)), " "))))
        .otherwise(array().cast("array<string>"))
    df.select(
      call_function("shingle_hashes", lower(col("text")), lit(3)).as("native"),
      array_sort(array_distinct(transform(stringShingles, x => xxhash64(x))))
        .as("viaStrings"))
      .as[(Seq[Long], Seq[Long])].collect()
  }

  test("shingle_hashes equals xxhash64-of-string-shingles on the corpus") {
    val rows = both(spark.read.parquet(s"$sf0001/documents.parquet"))
    assert(rows.nonEmpty)
    rows.foreach { case (n, s) => assert(n == s) }
  }

  test("shingle_hashes edge cases: short docs, repeated shingles, multi-space") {
    val texts = Seq(
      "one two",                    // < n tokens → empty
      "a b c",                      // exactly one shingle
      "a b c a b c a b c",          // repeated shingles dedup
      "x  y z w",                   // double space → empty token in shingle
      " lead and trail ",           // boundary empties
      "ünï çödé päirs över bytes")  // multibyte spans
    val rows = both(texts.toDF("text"))
    rows.foreach { case (n, s) => assert(n == s) }
    assert(rows.head._1.isEmpty)
    assert(rows(1)._1.size == 1)
  }
}
