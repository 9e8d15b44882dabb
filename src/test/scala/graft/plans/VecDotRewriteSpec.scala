package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The optimizer rewrite must fire on the exact dot-product idiom,
  * leave near-miss shapes alone, and preserve values bit-for-bit.
  */
class VecDotRewriteSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)
  private val df = (0 until 20)
    .map(_ => (Array.fill(32)(rnd.nextGaussian()), Array.fill(32)(rnd.nextGaussian())))
    .toDF("a", "b")

  private def hofDot = aggregate(
    zip_with(col("a"), col("b"), (x, y) => x * y),
    lit(0.0), (acc, v) => acc + v)

  test("the aggregate/zip_with dot idiom optimizes to the native vec_dot kernel") {
    // parquet-backed source: a local Seq would constant-fold into a
    // LocalRelation before the plan can be inspected
    val e = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("a"))
      .withColumn("b", col("a"))
    val q = e.select(aggregate(
      zip_with(col("a"), col("b"), (x, y) => x * y),
      lit(0.0), (acc, v) => acc + v).as("d"))
    val optimized = q.queryExecution.optimizedPlan.toString
    assert(optimized.contains("vec_dot"), optimized)
    assert(!optimized.contains("aggregate("), optimized)
  }

  test("rewritten plan is value-identical to the interpreted evaluation") {
    val viaRule = df.select(hofDot.as("d")).as[Double].collect()
    val model = df.as[(Array[Double], Array[Double])].collect()
      .map { case (a, b) =>
        var s = 0.0; var i = 0
        while (i < a.length) { s += a(i) * b(i); i += 1 }
        s
      }
    viaRule.zip(model).foreach { case (x, y) =>
      assert(java.lang.Double.doubleToLongBits(x) ==
        java.lang.Double.doubleToLongBits(y))
    }
  }

  test("near-miss shapes are left untouched") {
    // different seed, different merge op, non-multiply zip — none may rewrite
    val shapes = Seq(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(1.0), (acc, v) => acc + v),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc - v),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x + y),
        lit(0.0), (acc, v) => acc + v))
    shapes.foreach { c =>
      val optimized = df.select(c.as("d")).queryExecution.optimizedPlan.toString
      assert(!optimized.contains("vec_dot"), optimized)
    }
    // and the untouched shapes still evaluate (sanity)
    assert(df.select(shapes.head.as("d")).count() == 20)
  }
}
