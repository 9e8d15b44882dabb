package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Misra-Gries guarantees, asserted at SMALL capacity where pruning
  * actually fires (the oracle checks the no-prune exact regime).
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish skew: item i appears ~1000/i times — clear heavy hitters
  private lazy val skewed = {
    val rows = (1 to 40).flatMap { i =>
      Seq.fill(1000 / i)(s"item$i")
    }
    spark.createDataset(rows).toDF("x").repartition(8)
  }

  private def sketch(capacity: Int): Map[String, Long] =
    skewed.agg(HeavyHitters.column(col("x"), capacity).as("hh"))
      .select(explode(col("hh")))
      .select(col("col._1"), col("col._2"))
      .as[(String, Long)].collect().toMap

  private lazy val exact: Map[String, Long] =
    skewed.groupBy("x").count().as[(String, Long)].collect().toMap

  private lazy val n: Long = exact.values.sum

  test("estimates only ever underestimate, within the n/(capacity+1) bound") {
    val cap = 16
    val sk = sketch(cap)
    assert(sk.nonEmpty && sk.size <= cap)
    sk.foreach { case (k, est) =>
      val t = exact.getOrElse(k, 0L)
      assert(est <= t, s"$k: est=$est > true=$t (must underestimate)")
      assert(t - est <= n / (cap + 1), s"$k: error ${t - est} > ${n / (cap + 1)}")
    }
  }

  test("every item above the n/(capacity+1) frequency threshold is present") {
    val cap = 16
    val sk = sketch(cap)
    exact.filter(_._2 > n / (cap + 1)).keys.foreach { k =>
      assert(sk.contains(k), s"heavy hitter $k missing from sketch")
    }
  }

  test("at capacity >= distinct items the sketch is exactly the counts") {
    assert(sketch(64) == exact)
  }

  test("partition layout does not change the no-prune sketch (mergeability)") {
    val a = skewed.repartition(2)
      .agg(HeavyHitters.column(col("x"), 64)).as[Seq[(String, Long)]].head()
    val b = skewed.repartition(13)
      .agg(HeavyHitters.column(col("x"), 64)).as[Seq[(String, Long)]].head()
    assert(a == b && a.toMap == exact)
  }

  test("null inputs are skipped like built-in aggregates") {
    val df = Seq(Some("a"), None, Some("a"), None).toDF("x")
    val sk = df.agg(HeavyHitters.column(col("x"), 4))
      .as[Seq[(String, Long)]].head()
    assert(sk == Seq(("a", 2L)))
  }

  test("capacity contract is enforced") {
    intercept[IllegalArgumentException] {
      new HeavyHitters.MisraGries(0)
    }
  }
}
