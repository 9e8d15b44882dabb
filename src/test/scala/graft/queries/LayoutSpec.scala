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

  test("z-order layout skips row groups on the SECOND dimension; 1-D clustering cannot") {
    // the claim behind q124: sorting on the Morton interleave of two
    // quantized keys bounds every row group's min/max span on BOTH
    // raw columns, so a selective predicate on the dimension the 1-D
    // layout did NOT sort by still skips. Same files, same rows, same
    // query — only the layout differs.
    val li = Tables.load(spark, sf001, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"))
    val total = li.count()
    val m = li.agg(max(col("l_partkey")).as("mx"), max(col("l_suppkey")).as("my"))
    val quant = li.crossJoin(broadcast(m))
      .withColumn("zval", Sources.zInterleave(
        expr("(l_partkey * 256) div (mx + 1)"),
        expr("(l_suppkey * 256) div (my + 1)"), bits = 8))
      .drop("mx", "my")

    val root = Files.createTempDirectory("graft-zorder").toString
    val zDir = s"$root/zorder"
    val xDir = s"$root/xonly"
    quant.repartitionByRange(4, col("zval")).sortWithinPartitions(col("zval"))
      .drop("zval")
      .write.option("parquet.block.size", 64 * 1024).parquet(zDir)
    quant.drop("zval")
      .repartitionByRange(4, col("l_partkey")).sortWithinPartitions(col("l_partkey"))
      .write.option("parquet.block.size", 64 * 1024).parquet(xDir)

    // selective range on the SECOND dimension (suppkey — the one the
    // 1-D layout ignores): ~6% of its domain
    val my = m.head().getLong(1)
    val (lo, hi) = (my * 40 / 100, my * 45 / 100)

    def scanned(dir: String): (Long, Long) = {
      val df = spark.read.parquet(dir)
        .filter(col("l_suppkey") >= lo && col("l_suppkey") <= hi)
      val kept = df.collect().length.toLong
      val plan = df.queryExecution.executedPlan
      assert(plan.toString.contains("GreaterThanOrEqual(l_suppkey"),
        s"range filter must reach the parquet reader:\n${plan.toString.take(600)}")
      (plan.collectLeaves().head.metrics("numOutputRows").value, kept)
    }

    val (zRows, keptZ) = scanned(zDir)
    val (xRows, keptX) = scanned(xDir)
    assert(keptZ == keptX, "same query, same answer, either layout")
    // x-clustered: every row group spans the full suppkey domain —
    // nothing skips. z-ordered: each group's suppkey span is bounded
    // by its z-range (top interleaved bits pin a y slice), so groups
    // outside the predicate's slice never decode.
    assert(xRows > total * 9 / 10,
      s"1-D x-clustered layout has nothing to skip on y: scanned $xRows of $total")
    assert(zRows < xRows / 2,
      s"z-order must skip row groups on the second dimension: scanned $zRows vs $xRows")
    assert(zRows >= keptZ, "skipping may only over-approximate")
  }
}
