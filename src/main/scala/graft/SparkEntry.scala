package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries.{Analytics, Catalog, Curation, Dedup, Q, Relational, Similarity, Sources, Streaming, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All engine capabilities are registered here as named queries; the
  * driver verifies each against a DuckDB oracle (oracleSql) at sf0.01
  * and benchmarks them at sf0.1.
  */
object SparkEntry {

  /** every capability catalog in the engine, merged in order */
  private[graft] val catalogs: Seq[Catalog] =
    Seq(Relational, Analytics, Dedup, Similarity, TextAnalysis, Curation, Streaming, Sources)

  private lazy val all: Map[String, Q] =
    catalogs.flatMap(_.queries).toMap

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    all("q01_agg_pricing_summary").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, q) if q.sql.isDefined => k -> q.sql.get }
}
