package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The native SimHash64 expression must be bit-identical to the
  * higher-order-function formulation it replaced (per-token
  * xxhash64(seed=42), ±1 vote per bit, >0 → '1', msb first).
  */
class SimHash64Spec extends SparkSpec {
  import spark.implicits._

  private def hofSimhash = {
    val words = split(lower(col("text")), " ")
    concat_ws("", transform(
      sequence(lit(63), lit(0), lit(-1)),
      b => when(
        aggregate(words, lit(0L),
          (acc, t) => acc +
            when(call_function("shiftright", xxhash64(t), b).bitwiseAND(1) === 1, 1L)
              .otherwise(-1L)) > 0, lit("1")).otherwise(lit("0"))))
  }

  test("native expression matches the HOF formulation on real docs") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(length(col("text")) > 0).limit(100)
      .select(
        call_function("simhash64", split(lower(col("text")), " ")).as("native"),
        hofSimhash.as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.count() == 100)
  }

  /** the md5 variant's reference bit-walk: token hash = first 16 hex
    * chars of md5 = first 8 digest bytes big-endian, split into two
    * 32-bit halves (conv of all 16 digits would overflow signed long)
    */
  private def hofSimhashMd5 = {
    val words = split(lower(col("text")), " ")
    concat_ws("", transform(
      sequence(lit(63), lit(0), lit(-1)),
      b => {
        def vote(t: org.apache.spark.sql.Column) = {
          val hi = conv(substring(md5(t), 1, 8), 16, 10).cast("long")
          val lo = conv(substring(md5(t), 9, 8), 16, 10).cast("long")
          val bit = when(b >= 32, call_function("shiftright", hi, b - 32))
            .otherwise(call_function("shiftright", lo, b))
            .bitwiseAND(1)
          when(bit === 1, 1L).otherwise(-1L)
        }
        when(aggregate(words, lit(0L), (acc, t) => acc + vote(t)) > 0,
          lit("1")).otherwise(lit("0"))
      }))
  }

  test("md5 variant matches its HOF bit-walk on real docs") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(length(col("text")) > 0).limit(100)
      .select(
        call_function("simhash64_md5", split(lower(col("text")), " ")).as("native"),
        hofSimhashMd5.as("hof"))
    assert(df.filter(col("native") =!= col("hof")).count() == 0)
    assert(df.count() == 100)
  }

  test("md5 and xxh64 variants agree on shape, not value") {
    val df = Seq("a few tokens here").toDF("text")
      .select(
        call_function("simhash64", split(col("text"), " ")).as("x"),
        call_function("simhash64_md5", split(col("text"), " ")).as("m"))
    val r = df.head()
    assert(r.getString(0).length == 64 && r.getString(1).length == 64)
    assert(r.getString(0) != r.getString(1), "different token hashes must differ")
  }

  test("output is a 64-char bitstring") {
    val v = Seq("hello world foo").toDF("text")
      .select(call_function("simhash64", split(col("text"), " ")))
      .as[String].head()
    assert(v.length == 64 && v.forall(c => c == '0' || c == '1'))
  }

  test("deterministic and usable in SQL text") {
    spark.read.parquet(s"$sf0001/documents.parquet").limit(5)
      .createOrReplaceTempView("sh_docs")
    val viaSql = spark.sql(
      "SELECT simhash64(split(lower(text), ' ')) AS h FROM sh_docs WHERE length(text) > 0")
    assert(viaSql.count() > 0)
  }

  test("stays inside whole-stage codegen (no CodegenFallback)") {
    val df = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(call_function("simhash64", split(col("text"), " ")).as("h"))
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.next().trim.startsWith("*"), plan.take(500))
  }

  test("weighted mean Aggregator matches closed form") {
    val df = Seq((10.0, 1.0), (20.0, 3.0)).toDF("v", "w")
    val got = df.agg(WeightedMean.column(col("v"), col("w"))).head.getDouble(0)
    assert(math.abs(got - 70.0 / 4.0) < 1e-12)
  }
}
