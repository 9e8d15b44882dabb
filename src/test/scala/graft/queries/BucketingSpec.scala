package graft.queries


import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** Co-located join via bucketed tables — the 100 TB answer to "this
  * fact table is joined on the same key by every query, why shuffle it
  * every time": bucket both sides on the join key at write time, and
  * the join plans with ZERO Exchange operators forever after. The
  * shuffle is paid once, at ingest.
  *
  * This is plain Spark surface (bucketBy + saveAsTable), demonstrated
  * and plan-asserted here so a regression in the no-shuffle property
  * fails CI like the other PlanSpec rules.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed fact-fact join plans with no Exchange (shuffle paid at write)") {
    val broadcastBefore = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // disable broadcast so the test proves co-location, not small-table luck
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables.load(spark, sf0001, "lineitem")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_lineitem")
      Tables.load(spark, sf0001, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("b_orders")

      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"), "l_orderkey")
        .groupBy("o_orderstatus")
        .agg(sum("l_quantity").as("qty"))
      val plan = joined.queryExecution.executedPlan.toString

      // the only shuffle is the final aggregation's (on o_orderstatus);
      // the JOIN consumes the bucket layout directly — no exchange on
      // the join key anywhere in the plan
      val exchanges = plan.linesIterator
        .filter(_.contains("Exchange hashpartitioning")).toSeq
      assert(exchanges.size == 1 && exchanges.head.contains("o_orderstatus"),
        s"bucketed join must not shuffle on the join key:\n${plan.take(1200)}")
      assert(!plan.contains("Exchange hashpartitioning(l_orderkey"))
      assert(plan.contains("SortMergeJoin"), plan.take(400))
      assert(plan.contains("Bucketed: true"), plan.take(800))

      // and it computes the same answer as the unbucketed plan
      val want = Tables.load(spark, sf0001, "lineitem")
        .join(Tables.load(spark, sf0001, "orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderstatus").agg(sum("l_quantity").as("qty"))
        .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      val got = joined.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
      assert(got == want)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", broadcastBefore)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }

  test("bucketed snapshot MERGE: the full-outer upsert join pays zero exchange") {
    // Upsert's scale story claims "bucketed layouts co-locate the
    // merge to zero exchange" — prove it: snapshot and delta both
    // bucketed on the key, the full-outer merge join consumes the
    // bucket layout directly. (Full outer can never broadcast, so at
    // 100 TB this IS the difference between shuffling the snapshot
    // every merge and shuffling nothing.)
    try {
      val base = Tables.load(spark, sf0001, "orders")
        .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
      base.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_snap")
      base.filter(col("o_orderkey") % 7 === 0)
        .withColumn("o_orderstatus", lit("U"))
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("b_delta")

      val merged = graft.operators.Upsert(
        spark.table("b_snap"), spark.table("b_delta"), Seq("o_orderkey"))
      val plan = merged.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange hashpartitioning"),
        s"bucketed merge must not shuffle either side:\n${plan.take(1200)}")
      assert(plan.contains("SortMergeJoin") && plan.contains("FullOuter"),
        plan.take(400))
      assert(plan.contains("Bucketed: true"), plan.take(800))

      // same answer as the unbucketed merge
      val want = graft.operators.Upsert(
        base, base.filter(col("o_orderkey") % 7 === 0)
          .withColumn("o_orderstatus", lit("U")), Seq("o_orderkey"))
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
      val got = merged
        .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
      assert(got == want)
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_snap")
      spark.sql("DROP TABLE IF EXISTS b_delta")
    }
  }

  test("partition pruning: a filter on the partition column skips other partitions") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    Tables.load(spark, sf0001, "orders")
      .withColumn("status", col("o_orderstatus"))
      .write.partitionBy("status").mode("overwrite").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("status") === "F")
    val plan = q.queryExecution.executedPlan.toString
    val scanLine = plan.linesIterator.find(_.contains("PartitionFilters"))
      .getOrElse("")
    assert(scanLine.contains("(status"), s"partition filter not applied: $scanLine")
    // pruning is observable at the file index: the scan's partition
    // filters select exactly one of the three status directories
    // (inputFiles would lie here — it lists pre-pruning)
    val scan = q.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.get
    val selected = scan.relation.location.listFiles(
      scan.partitionFilters, scan.dataFilters)
    assert(selected.size == 1, s"expected 1 pruned partition, got ${selected.size}")
    val all = spark.read.parquet(dir)
    assert(q.count() == all.filter(col("status") === "F").count())
  }

  test("bucket pruning: an equality filter on the bucket column reads one bucket") {
    Tables.load(spark, sf0001, "customer")
      .write.bucketBy(8, "c_custkey").mode("overwrite").saveAsTable("b_customer")
    // auto-bucketed-scan turns bucketed reading off when the planner
    // sees no interesting operator — disable it so the filter-only scan
    // keeps the bucket layout and prunes on it
    spark.conf.set("spark.sql.sources.bucketing.autoBucketedScan.enabled", "false")
    try {
      val q = spark.table("b_customer").filter(col("c_custkey") === 42L)
      val plan = q.queryExecution.executedPlan.toString
      // the datasource scan reports the selected-bucket count
      assert(plan.contains("Bucketed: true"), plan.take(800))
      assert(plan.contains("SelectedBucketsCount: 1 out of 8"), plan.take(800))
      assert(q.count() == 1)
    } finally {
      spark.conf.unset("spark.sql.sources.bucketing.autoBucketedScan.enabled")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }
}
