package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Tables

/** Relational operator catalog — SURVEY.md §2B E1–E16.
  *
  * Every entry is a declarative DataFrame plan: Catalyst gets predicate
  * pushdown, column pruning, partial aggregation and join-strategy
  * selection for free, so each of these plans survives a 100 TB input
  * as long as partitioning is respected (notes per query).
  *
  * Reference semantics: the reference engine
  * (keyasuda/llm-batch-processor) implements NO relational operators
  * (SURVEY.md §2A note, reference lib/job_processor.rb:15-53) — these
  * are the engine-extension set mandated for the DuckDB-oracle gate.
  */
object Relational extends Catalog {

  private def t(s: SparkSession, d: String, n: String): DataFrame =
    Tables.load(s, d, n)

  /** revenue expression used across TPC-H-ish queries */
  private val revenue: Column =
    col("l_extendedprice") * (lit(1.0) - col("l_discount"))

  override def queries: Map[String, Q] = Map(
    // E6: hash aggregate, multiple keys, sum/avg/count — TPC-H Q1 shape.
    // Scale: partial (map-side) + final agg; 6 groups → no skew concern.
    "q01_agg_pricing_summary" -> Q(
      fn = (s, d) =>
        t(s, d, "lineitem")
          .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(
            sum(col("l_quantity")).as("sum_qty"),
            sum(col("l_extendedprice")).as("sum_base_price"),
            sum(revenue).as("sum_disc_price"),
            avg(col("l_quantity")).as("avg_qty"),
            avg(col("l_discount")).as("avg_disc"),
            count(lit(1)).as("count_order"))
          .orderBy(col("l_returnflag"), col("l_linestatus")),
      sql = Some("""
        SELECT l_returnflag, l_linestatus,
               sum(l_quantity) AS sum_qty,
               sum(l_extendedprice) AS sum_base_price,
               sum(l_extendedprice * (1.0 - l_discount)) AS sum_disc_price,
               avg(l_quantity) AS avg_qty,
               avg(l_discount) AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      scaleNote = "map-side partial agg; 6 output groups; filter pushed to parquet scan")
  )
}
