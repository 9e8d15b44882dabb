package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** The write-layout I/O lever the other plan specs don't cover: parquet
  * min/max column statistics skip whole row groups when the data is
  * RANGE-CLUSTERED on the filter column, and skip nothing when it
  * isn't. At 100 TB "sort your fact table by its hottest predicate
  * column" is routinely a 100× scan-cost difference for selective
  * queries — same files, same bytes, same query; only the layout
  * changed. (Partition pruning: q72 spec. DPP: q83. Bucket pruning:
  * BucketingSpec. Bloom join pruning: q84. Stats-informed planning:
  * CboSpec. This closes the list with row-group skipping.)
  */
class LayoutSpec extends SparkSpec {

  test("range-clustered layout skips row groups; shuffled layout scans everything") {
    val events = Tables.load(spark, sf001, "events")
      .select(col("event_id"), col("user_id"), col("value"))
    val total = events.count()

    val root = Files.createTempDirectory("graft-layout").toString
    val clusteredDir = s"$root/clustered"
    val shuffledDir = s"$root/shuffled"
    // tiny row groups (64 KB) so the 10k-row fixture has MANY of them —
    // the unit min/max stats can skip. Range-cluster one copy on
    // user_id; key-shuffle the other (hash order ≈ every row group
    // spans the whole user_id domain, so min/max can exclude nothing).
    events.repartitionByRange(4, col("user_id"))
      .sortWithinPartitions(col("user_id"))
      .write.option("parquet.block.size", 64 * 1024).parquet(clusteredDir)
    events.repartition(4, col("event_id"))
      .write.option("parquet.block.size", 64 * 1024).parquet(shuffledDir)

    // a ~1%-selective range predicate on the cluster column
    val bounds = events.agg(
      expr("percentile(user_id, 0.50)"), expr("percentile(user_id, 0.51)"))
      .head()
    val (lo, hi) = (bounds.getDouble(0).toLong, bounds.getDouble(1).toLong)

    def scanned(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
        .filter(col("user_id") >= lo && col("user_id") <= hi)
      val kept = df.collect().length.toLong
      val plan = df.queryExecution.executedPlan
      val scan = plan.collectLeaves().head
      val pushed = plan.toString
      assert(pushed.contains("PushedFilters") &&
        pushed.contains("GreaterThanOrEqual(user_id"),
        s"range filter must reach the parquet reader:\n${pushed.take(600)}")
      (scan.metrics("numOutputRows").value, kept)
    }

    val (clusteredRows, kept1) = scanned(clusteredDir)
    val (shuffledRows, kept2) = scanned(shuffledDir)
    assert(kept1 == kept2, "same query, same answer, either layout")
    // clustered: only the row groups whose [min,max] overlaps [lo,hi]
    // decode — a small slice of the table. Shuffled: every row group
    // overlaps, nothing skips, the scan decodes the whole table.
    // granularity is the row group, so the scanned slice is bounded by
    // (overlapping groups) × (rows per group), not by the exact match
    // count — demand a 3× decode saving, not a precise figure
    assert(clusteredRows < shuffledRows / 3,
      s"clustered layout must skip most row groups: scanned $clusteredRows of $total")
    assert(shuffledRows > total * 9 / 10,
      s"shuffled layout has nothing to skip: scanned $shuffledRows of $total")
    assert(clusteredRows >= kept1, "skipping may only over-approximate")
  }
}
