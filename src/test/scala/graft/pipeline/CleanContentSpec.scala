package graft.pipeline

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Port of the reference's 16-case reasoning-removal suite
  * (spec/reasoning_removal_spec.rb:34-148) against the Catalyst
  * `cleanContent` column. Ruby `/m` ≡ Java `(?s)`.
  */
class CleanContentSpec extends SparkSpec {
  import spark.implicits._

  private def clean(s: String): String =
    Seq(s).toDF("c").select(EnrichJob.cleanContent(col("c"))).as[String].head()

  test("single think block removed") {
    assert(clean("<think>reasoning here</think>The answer is 42.") == "The answer is 42.")
  }
  test("think block with surrounding text") {
    assert(clean("Before <think>hmm</think> after") == "Before  after")
  }
  test("multiline think content") {
    assert(clean("<think>line1\nline2\nline3</think>result") == "result")
  }
  test("multiple think blocks all removed (non-greedy)") {
    assert(clean("<think>a</think>keep1<think>b</think>keep2") == "keep1keep2")
  }
  test("no think tags → trimmed passthrough") {
    assert(clean("  plain response  ") == "plain response")
  }
  test("empty think block") {
    assert(clean("<think></think>x") == "x")
  }
  test("unclosed think tag left intact") {
    assert(clean("<think>never closed... answer") == "<think>never closed... answer")
  }
  test("closing tag only left intact") {
    assert(clean("answer</think>") == "answer</think>")
  }
  test("<thinking> variant is NOT removed") {
    assert(clean("<thinking>keep me</thinking>x") == "<thinking>keep me</thinking>x")
  }
  test("nested-ish tags: inner close ends the match") {
    // non-greedy: matches up to the FIRST </think>
    assert(clean("<think>outer<think>inner</think>tail</think>x") == "tail</think>x")
  }
  test("japanese content inside and outside") {
    assert(clean("<think>これは思考です</think>答えは42です。") == "答えは42です。")
  }
  test("whole response is one think block → empty string") {
    assert(clean("<think>only thoughts</think>") == "")
  }
  test("whitespace-only outside think blocks → empty string") {
    assert(clean("  <think>a</think>  \n  <think>b</think>  ") == "")
  }
  test("think block mid-sentence") {
    assert(clean("The<think>…</think> answer") == "The answer")
  }
  test("angle brackets that are not think tags survive") {
    assert(clean("a < b and c > d") == "a < b and c > d")
  }
  test("multiline json with embedded think block") {
    assert(clean("<think>schema?</think>{\n  \"a\": 1\n}") == "{\n  \"a\": 1\n}")
  }
}
