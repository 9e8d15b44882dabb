package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class CdcChunksSpec extends SparkSpec {
  import spark.implicits._

  private def chunksOf(s: String): Seq[Long] =
    Seq(s).toDF("t").select(call_function("cdc_chunks", col("t")))
      .as[Seq[Long]].head()

  test("deterministic, covers the document, bounded chunk count") {
    val text = ("the quick brown fox jumps over the lazy dog " * 30).trim
    val c1 = chunksOf(text)
    val c2 = chunksOf(text)
    assert(c1 == c2)
    // avg ~64 bytes → a ~1300-byte doc lands in a sane chunk range
    assert(c1.length >= text.length / 256 && c1.length <= text.length / 8)
  }

  test("prefix edit leaves most suffix chunks intact (CDC resync)") {
    // aperiodic content (periodic text is CDC's pathological case:
    // offset boundary sequences can cycle without ever converging)
    val rnd = new scala.util.Random(7)
    val base = Seq.fill(400)(rnd.alphanumeric.take(1 + rnd.nextInt(9)).mkString)
      .mkString(" ")
    val edited = "INSERTED-PREFIX-BYTES " + base
    val a = chunksOf(base).toSet
    val b = chunksOf(edited).toSet
    val shared = a.intersect(b).size.toDouble / a.size
    assert(shared >= 0.7, s"only ${(shared * 100).round}% of chunks survived a prefix edit")
    // a fixed-size chunker would share ~0% here — that's the point
  }

  test("different documents share no chunks") {
    val a = chunksOf("alpha beta gamma delta " * 20).toSet
    val b = chunksOf("uno dos tres cuatro cinco " * 20).toSet
    assert(a.intersect(b).isEmpty)
  }

  test("empty and sub-min-chunk inputs") {
    assert(chunksOf("").isEmpty)
    assert(chunksOf("short").length == 1) // one tail chunk
  }

  test("usable from SQL text and stays in codegen") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(length(col("text")) > 0)
      .select(call_function("cdc_chunks", col("text")).as("c"))
    assert(df.queryExecution.executedPlan.toString.linesIterator.next().trim.startsWith("*"))
    assert(df.count() > 0)
  }
}
