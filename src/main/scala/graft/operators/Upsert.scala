package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch MERGE (upsert): apply a delta of changed/new rows to a
  * snapshot keyed by `keys` — the SCD-Type-1 maintenance primitive
  * behind dimension refresh and incremental snapshot rebuild. (The
  * reference pipeline has no mutation surface — engine extension,
  * SURVEY.md §2B.)
  *
  * Spark-first shape: ONE full-outer shuffle join on the key. Matched
  * keys take the delta row wholesale, unmatched keys keep the base
  * row, delta-only keys insert. At 100 TB both sides shuffle on the
  * same key — bucketed/pre-partitioned layouts co-locate it into a
  * zero-exchange sort-merge join; a full-outer join cannot broadcast,
  * so AQE handles the (typically tiny) delta side by coalescing its
  * partitions.
  *
  * Contract: `delta` has the same columns as `base`, its key columns
  * are non-null, and it holds at most one row per key (enforce
  * upstream with e.g. keep-last dedup — not silently here, because a
  * multi-row delta is a pipeline bug, not a merge semantics choice).
  */
object Upsert {

  def apply(base: DataFrame, delta: DataFrame, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "upsert needs at least one key column")
    require(base.columns.toSet == delta.columns.toSet,
      s"schema mismatch: base=${base.columns.mkString(",")} delta=${delta.columns.mkString(",")}")
    require(keys.forall(base.columns.contains),
      s"keys ${keys.mkString(",")} must exist in both frames")
    val b = base.as("b")
    val u = delta.as("u")
    // backtick-escape every column reference: an unquoted name with a
    // dot ("order.key") parses as a nested field path and resolves to
    // the wrong thing (or nothing) instead of the column itself
    def bq(side: String, c: String) =
      col(s"$side.`${c.replace("`", "``")}`")
    val cond = keys.map(k => bq("b", k) === bq("u", k)).reduce(_ && _)
    // key columns are non-null in delta (contract), so "any delta key
    // present" ⇔ the join matched / this is an insert row
    val matched = keys.map(k => bq("u", k).isNotNull).reduce(_ && _)
    val out = base.columns.toSeq.map { c =>
      if (keys.contains(c)) coalesce(bq("u", c), bq("b", c)).as(c)
      else when(matched, bq("u", c)).otherwise(bq("b", c)).as(c)
    }
    b.join(u, cond, "full_outer").select(out: _*)
  }
}
