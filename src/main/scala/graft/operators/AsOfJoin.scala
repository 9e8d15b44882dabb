package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join — for each left row, the latest right row with
  * `rightTime <= leftTime` within the same key (the canonical
  * time-series enrichment operator; Spark has no built-in).
  *
  * Implementation is the ONE-SHUFFLE union-window plan, not a range
  * join: tag both inputs, union them, and carry the last right payload
  * forward with `last(_, ignoreNulls) over (partition key order time)`.
  * A naive `l.ts >= r.ts` join explodes to the full per-key cross
  * product before aggregation; this stays O(n log n) per key and
  * shuffles each row exactly once — the property that survives 100 TB.
  */
object AsOfJoin {

  /** @param rightPayload right-side columns to carry (renamed as given)
    */
  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTime: String,
      rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val lCols = left.columns
    // side ordering at equal timestamps: right (0) sorts before left
    // (1), so a right row at exactly leftTime matches (<= semantics)
    val taggedLeft = left
      .withColumn("_ts", col(leftTime))
      .withColumn("_side", lit(1))
      .withColumns(rightPayload.map(c => c -> lit(null).cast(
        right.schema(c).dataType)).toMap)
    val taggedRight = right
      .select((key +: rightTime +: rightPayload).distinct.map(col): _*)
      .withColumn("_ts", col(rightTime))
      .withColumn("_side", lit(0))
      .withColumns(lCols.filterNot((key +: rightTime +: rightPayload).contains)
        .map(c => c -> lit(null).cast(left.schema(c).dataType)).toMap)

    val unioned = taggedLeft.unionByName(
      taggedRight, allowMissingColumns = true)

    val w = Window.partitionBy(col(key))
      .orderBy(col("_ts"), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightPayload.foldLeft(unioned) { (df, c) =>
      df.withColumn(s"asof_$c", last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col("_side") === 1)
      .select(lCols.map(col) ++ rightPayload.map(c => col(s"asof_$c")): _*)
  }
}
