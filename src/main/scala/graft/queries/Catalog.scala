package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One engine capability = one named query + (optionally) the ANSI-SQL
  * oracle the driver replays in DuckDB on the same parquet tables.
  * Column names/aliases MUST agree between `fn`'s output and `sql` —
  * the driver sorts columns by name before hashing.
  */
final case class Q(
    fn: (SparkSession, String) => DataFrame,
    sql: Option[String] = None,
    /** one-line note on the 100 TB execution strategy, surfaced in docs */
    scaleNote: String = "")

trait Catalog {
  def queries: Map[String, Q]
}
