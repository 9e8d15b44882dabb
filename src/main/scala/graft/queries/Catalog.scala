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

/** Shared oracle-SQL fragments (one definition — the q133/q143/q145/
  * q146 hash family must stay in lockstep).
  */
private[queries] object OracleSql {
  /** 12-hex-digit md5 prefix as a 48-bit integer: DuckDB has no
    * conv(), so expand digit-by-digit via strpos
    */
  def hex48(h: String): String =
    (0 until 12).map { i =>
      s"(strpos('0123456789abcdef', substr($h, ${i + 1}, 1)) - 1) * ${BigInt(16).pow(11 - i)}"
    }.mkString("(", " + ", ")")
}
