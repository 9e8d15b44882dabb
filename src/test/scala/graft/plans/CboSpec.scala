package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Cost-based-optimizer surface: ANALYZE-collected statistics change
  * the PHYSICAL plan. A selective equality filter on a dimension table
  * is estimated at full table size without column stats (the default
  * size-only visitor passes a Filter's child size through), so the
  * join shuffles; with `ANALYZE … FOR COLUMNS` + CBO on, the estimate
  * shrinks by 1/ndv and the same join broadcasts.
  *
  * At 100 TB this is the difference between shuffling a fact table
  * against a "big" dim that is actually tiny after its predicate, and
  * shipping a few MB to every executor — stats turn the right plan
  * from a lucky guess into an inference. (AQE can recover at RUNTIME
  * from the materialized shuffle size; CBO gets it right at PLAN time,
  * before the shuffle exists. The test disables AQE to isolate the
  * plan-time decision.)
  */
class CboSpec extends SparkSpec {
  import spark.implicits._

  private def withConf[A](pairs: (String, String)*)(body: => A): A = {
    val saved = pairs.map { case (k, _) =>
      k -> spark.conf.getOption(k)
    }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try body
    finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("ANALYZE column stats flip a shuffled join to a stats-informed broadcast") {
    val table = "graft_cbo_dim"
    spark.sql(s"DROP TABLE IF EXISTS $table")
    // dim: 60k rows, padded payload → raw size well above the 256 KB
    // broadcast threshold; the filter keeps 60 rows (~4 KB)
    spark.range(60000)
      .select(col("id").as("dk"),
        (col("id") % 1000).as("grp"),
        lpad(col("id").cast("string"), 64, "x").as("pad"))
      .write.format("parquet").saveAsTable(table)
    try {
      val fact = spark.range(500000).select((col("id") % 60000).as("dk"))
      def theJoin = fact.join(
        spark.table(table).filter(col("grp") === 7), "dk")
      withConf(
        "spark.sql.adaptive.enabled" -> "false",
        "spark.sql.autoBroadcastJoinThreshold" -> (256 * 1024).toString,
        "spark.sql.cbo.enabled" -> "true") {

        // without column stats the filtered dim is estimated at full
        // table size → no broadcast candidate → shuffled join
        val before = theJoin.queryExecution.executedPlan.toString
        assert(!before.contains("BroadcastHashJoin"),
          s"without stats the dim must not be estimated broadcastable:\n${before.take(600)}")
        assert(before.contains("SortMergeJoin") || before.contains("ShuffledHashJoin"),
          before.take(600))

        spark.sql(s"ANALYZE TABLE $table COMPUTE STATISTICS FOR COLUMNS grp")
        // same query, same confs — only the stats changed
        val after = theJoin.queryExecution.executedPlan.toString
        assert(after.contains("BroadcastHashJoin"),
          s"with ndv(grp) stats the 1/ndv estimate must broadcast the dim:\n${after.take(600)}")

        // and the broadcast plan returns the identical rows
        // 60 surviving dim keys; fact multiplicity of dk is 9 below
        // 20000 (500000 = 8*60000 + 20000) and 8 above → 20*9 + 40*8
        val rows = theJoin.count()
        assert(rows == 20 * 9 + 40 * 8,
          s"each surviving dim key matches fact rows: got $rows")
      }
    } finally spark.sql(s"DROP TABLE IF EXISTS $table")
  }
}
