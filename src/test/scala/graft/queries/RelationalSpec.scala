package graft.queries

import graft.SparkSpec

/** Smoke + shape checks per catalog query at sf0.001. Value-level
  * correctness is the DuckDB oracle gate (tools/check.py / driver);
  * these tests catch compile-time drift, schema breaks and empty
  * results early.
  */
class RelationalSpec extends SparkSpec {

  for ((name, q) <- Relational.queries) {
    test(s"$name runs and returns rows at sf0.001") {
      val df = q.fn(spark, sf0001)
      val n = df.count()
      assert(n > 0, s"$name returned no rows")
    }
  }

  test("q01 aggregates match hand computation") {
    import org.apache.spark.sql.functions._
    val df = Relational.queries("q01_agg_pricing_summary").fn(spark, sf0001)
    val total = df.agg(sum("count_order")).head.getLong(0)
    val raw = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .count()
    assert(total == raw)
  }

  test("q16 top10 is ordered by totalprice desc") {
    val rows = Relational.queries("q16_top10_orders").fn(spark, sf0001)
      .collect().map(_.getAs[Double]("o_totalprice"))
    assert(rows.length == 10)
    assert(rows.sliding(2).forall { case Array(a, b) => a >= b })
  }

  test("no duplicate or empty column names in any query output") {
    for ((name, q) <- Relational.queries) {
      val cols = q.fn(spark, sf0001).columns
      assert(cols.distinct.length == cols.length, s"$name: duplicate columns ${cols.mkString(",")}")
      assert(cols.forall(_.nonEmpty), s"$name: empty column name")
    }
  }

  test("q123's determinism precondition: (event_type, ts) is unique in events") {
    // q123's open/close use min_by/max_by ordered on the scalar ts (a
    // struct key would demote the agg to SortAggregate). That is only
    // deterministic — and only provably equal to the oracle's
    // row_number tie-break — while no two events of a type share a
    // timestamp. Microsecond timestamps make a collision vanishingly
    // rare, but if the driver's generator ever changes, THIS is the
    // test that must fail, not the correctness gate.
    import org.apache.spark.sql.functions._
    for (sf <- Seq(sf0001, sf001, sf01)) {
      val ev = graft.core.Tables.load(spark, sf, "events")
      val dups = ev.groupBy(col("event_type"), col("ts"))
        .count().filter(col("count") > 1).count()
      assert(dups == 0, s"$sf: $dups duplicate (event_type, ts) pairs — " +
        "switch q123's ordering key to a composite before trusting the oracle")
    }
  }
}
