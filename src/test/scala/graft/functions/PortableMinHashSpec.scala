package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native PortableMinHash expression must be bit-identical to the
  * Catalyst HOF spelling it replaced in q192/q200 — per hash index p,
  * min over shingles g of conv(substring(md5('mh'||p||':'||g),1,12),
  * 16,10) — because the DuckDB oracle (OracleSql.hex48) mirrors that
  * exact family and the swap must change NOTHING the gate hashes.
  */
class PortableMinHashSpec extends SparkSpec {
  import spark.implicits._

  private def shingles = {
    val ws = split(lower(col("text")), " ")
    array_distinct(transform(sequence(lit(1), size(ws) - 2),
      i => array_join(slice(ws, i, lit(3)), " ")))
  }

  private def hofMinhash(n: Int) =
    transform(sequence(lit(0), lit(n - 1)), p =>
      array_min(transform(col("sh"), g =>
        conv(substring(md5(
          concat(lit("mh"), p.cast("string"), lit(":"), g)), 1, 12),
          16, 10).cast("long"))))

  test("native expression matches the HOF md5-hex48 family on real docs") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(size(split(lower(col("text")), " ")) >= 3)
      .select(shingles.as("sh"))
      .filter(size(col("sh")) > 0).limit(120)
      .select(
        call_function("portable_minhash", col("sh"), lit(8)).as("native"),
        hofMinhash(8).as("hof"))
    assert(df.count() == 120)
    assert(df.filter(to_json(col("native")) =!= to_json(col("hof")))
      .count() == 0)
  }

  test("deterministic, usable in SQL text, and honest about empties") {
    spark.sql(
      "SELECT portable_minhash(array('a b c', 'b c d'), 4) AS m")
      .selectExpr("size(m) AS n").as[Int].collect().foreach(n => assert(n == 4))
    // an empty shingle set yields Long.MaxValue minima (callers filter
    // empties out; the contract is still total)
    val m = spark.sql(
      "SELECT portable_minhash(CAST(array() AS ARRAY<STRING>), 2) AS m")
      .as[Seq[Long]].head()
    assert(m == Seq(Long.MaxValue, Long.MaxValue))
    // 48-bit range: every value fits in 12 hex digits
    val vals = spark.sql(
      "SELECT portable_minhash(array('x y z'), 8) AS m").as[Seq[Long]].head()
    vals.foreach(v => assert(v >= 0L && v < (1L << 48)))
  }

  test("stays inside whole-stage codegen (no CodegenFallback)") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(call_function("portable_minhash",
        split(col("text"), " "), lit(8)).as("m"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*"), plan.take(500))
  }
}
