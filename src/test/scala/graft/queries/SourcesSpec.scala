package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Sources catalog contracts that the DuckDB gate can't check. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("q43: HLL approx distinct within the requested 2% of exact") {
    val approx = Sources.queries("q43_approx_distinct").fn(spark, sf001)
      .select("l_returnflag", "approx_parts").as[(String, Long)].collect().toMap
    val exact = spark.read.parquet(s"$sf001/lineitem.parquet")
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact_parts"))
      .as[(String, Long)].collect().toMap
    assert(approx.nonEmpty && approx.keySet == exact.keySet)
    approx.foreach { case (flag, a) =>
      val err = math.abs(a - exact(flag)).toDouble / exact(flag)
      assert(err <= 0.06, s"$flag approx=$a exact=${exact(flag)} err=$err") // 3σ of rsd=0.02
    }
  }

  test("q165: Count-Min never underestimates, is not vacuously exact, " +
    "and stays inside the 3eN/w tail bound") {
    val rows = Sources.queries("q165_countmin_sketch").fn(spark, sf001)
      .select("custkey", "exact", "est", "overest", "never_under")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // the structural guarantee, on EVERY key: collisions only add
    rows.foreach(r => assert(r._5 == 1L && r._3 >= r._2 && r._4 == r._3 - r._2,
      s"one-sided guarantee violated: $r"))
    // collisions must actually occur at this load factor (15k keys
    // into 1024 columns) or the sketch test is vacuous
    assert(rows.exists(_._4 > 0L), "no collisions — vacuous fixture")
    // Markov tail: P[overest > e*N/w] < e^-d per key; with d = 4 rows
    // a 3x-eN/w excess should be essentially absent
    val n = rows.map(_._2).sum
    val bound = 3.0 * math.E * n / 1024.0
    val worst = rows.map(_._4).max
    assert(worst <= bound, s"overest $worst exceeds 3eN/w = $bound")
  }

  test("q93: merged daily sketches equal the one-shot sketch and track exact counts") {
    val reagg = Sources.queries("q93_sketch_reaggregate").fn(spark, sf001)
      .as[(String, Long)].collect().toMap
    // mergeability: union of per-day sketches ≡ one sketch over all
    // rows — not approximately, identically (same sketch state)
    val oneShot = graft.core.Tables.load(spark, sf001, "events")
      .groupBy(col("event_type"))
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("est"))
      .as[(String, Long)].collect().toMap
    assert(reagg == oneShot,
      s"re-aggregated sketches must merge losslessly: $reagg vs $oneShot")
    val exact = graft.core.Tables.load(spark, sf001, "events")
      .groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    assert(reagg.keySet == exact.keySet)
    reagg.foreach { case (t, a) =>
      val err = math.abs(a - exact(t)).toDouble / exact(t)
      assert(err <= 0.06, s"$t approx=$a exact=${exact(t)} err=$err")
    }
  }

  test("CSV round-trip is lossless for part (quoting, ints, doubles)") {
    val direct = spark.read.parquet(s"$sf0001/part.parquet")
    val viaCsv = Sources.queries("q40_csv_scan").fn(spark, sf0001)
    val expected = direct.groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n"), sum(col("p_retailprice")).as("sum_price"),
        max(col("p_size")).cast("long").as("max_size"))
    assert(viaCsv.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(viaCsv).count() == 0)
  }

  test("JSON round-trip preserves double fidelity for customer") {
    val direct = spark.read.parquet(s"$sf0001/customer.parquet")
    val viaJson = Sources.queries("q41_json_scan").fn(spark, sf0001)
    val expected = direct.groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n"), sum(col("c_acctbal")).as("sum_bal"),
        avg(col("c_acctbal")).as("avg_bal"))
    assert(viaJson.exceptAll(expected).count() == 0)
  }

  test("q44: fake-LLM enrichment covers every document deterministically") {
    val a = Sources.queries("q44_llm_enrich_fake").fn(spark, sf0001)
      .as[(String, String)].collect().toMap
    val b = Sources.queries("q44_llm_enrich_fake").fn(spark, sf0001)
      .as[(String, String)].collect().toMap
    assert(a == b)
    assert(a.size == spark.read.parquet(s"$sf0001/documents.parquet").count())
    assert(a.values.forall(_.startsWith("FAKE[")))
  }
}
