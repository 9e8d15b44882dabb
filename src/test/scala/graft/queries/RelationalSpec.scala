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
}
