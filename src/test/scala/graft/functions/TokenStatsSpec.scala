package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TokenStats must be value-identical to the Catalyst formulation it
  * replaces (split/array_distinct/regexp_extract_all) — checked on the
  * real corpus and on adversarial edge cases.
  */
class TokenStatsSpec extends SparkSpec {
  import spark.implicits._

  private def both(df: org.apache.spark.sql.DataFrame) = {
    val words = split(lower(col("text")), " ")
    df.select(
      call_function("token_stats", lower(col("text"))).as("t"),
      size(words).cast("long").as("ws"),
      size(regexp_extract_all(lower(col("text")),
        lit("[a-z]+|[0-9]+|[^a-z0-9\\s]"), lit(0))).cast("long").as("bpe"),
      size(array_distinct(words)).cast("long").as("dst"))
      .select(col("t.ws_tokens"), col("ws"), col("t.bpeish_tokens"),
        col("bpe"), col("t.distinct_tokens"), col("dst"))
      .as[(Long, Long, Long, Long, Long, Long)].collect()
  }

  test("token_stats equals the regex/array formulation on the documents corpus") {
    val rows = both(spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(length(col("text")) > 0))
    assert(rows.nonEmpty)
    rows.foreach { case (a1, b1, a2, b2, a3, b3) =>
      assert(a1 == b1 && a2 == b2 && a3 == b3, s"$a1/$b1 $a2/$b2 $a3/$b3")
    }
  }

  test("token_stats edge cases: runs, unicode, tabs, repeated and empty parts") {
    val texts = Seq(
      "hello world hello",         // repeated token
      "a  b",                      // double space → empty part
      "trailing ",                 // trailing space → empty part
      "ab1cd 12x",                 // letter/digit run boundaries
      "héllo wörld — naïve",       // multibyte code points
      "tab\there new\nline",       // \s chars that are NOT the split char
      "!!! ...",                   // punctuation-only tokens
      "x")
    val rows = both(texts.toDF("text"))
    rows.foreach { case (a1, b1, a2, b2, a3, b3) =>
      assert(a1 == b1 && a2 == b2 && a3 == b3, s"$a1/$b1 $a2/$b2 $a3/$b3")
    }
  }
}
