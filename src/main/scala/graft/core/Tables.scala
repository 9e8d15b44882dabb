package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Canonical access to the driver-provided test tables
  * (`/root/testdata/sf*` — see TESTDATA.md). All graft queries read
  * through here so that scale-sensitive read settings live in ONE
  * place. At 100 TB these parquet paths become directory trees; the
  * reader below is already directory-safe (`spark.read.parquet(dir)`).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Tables small enough to broadcast at ANY scale factor (TPC-H dims
    * region/nation are constant-size; at SF100k they are still tiny).
    */
  val broadcastable: Set[String] = Set("region", "nation")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS); Spark reads it only with
      // nanosAsLong (runtime conf), then we downscale to micros — the
      // same truncation DuckDB applies when casting ns→us, so oracle
      // comparisons agree.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val raw = spark.read.parquet(s"$sfDir/events.parquet")
      if (raw.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        // integer `div`, NOT `/`: float division of ~1.7e18 ns exceeds
        // double mantissa precision and yields off-by-one microseconds
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      else raw
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  def region(s: SparkSession, d: String): DataFrame = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = load(s, d, "lineitem")
  def events(s: SparkSession, d: String): DataFrame = load(s, d, "events")
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
