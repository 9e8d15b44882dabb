package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Parity specs for the native dense-vector expressions: the codegen'd
  * kernels must be value-identical to the interpreted higher-order
  * formulations they replace (and to a plain Scala model).
  */
class VecMathSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)
  private val vecs: Seq[(Long, Array[Double])] =
    (0L until 50L).map(i => i -> Array.fill(64)(rnd.nextGaussian()))

  test("vec_dot equals the aggregate/zip_with formulation bit-for-bit") {
    val df = vecs.toDF("id", "v").withColumn("w", reverse(col("v")))
    val rows = df.select(
      call_function("vec_dot", col("v"), col("w")).as("native"),
      aggregate(zip_with(col("v"), col("w"), (x, y) => x * y),
        lit(0.0), (a, x) => a + x).as("hof"))
      .as[(Double, Double)].collect()
    rows.foreach { case (n, h) =>
      assert(java.lang.Double.doubleToLongBits(n) ==
        java.lang.Double.doubleToLongBits(h), s"$n != $h")
    }
  }

  test("vec_dot self-dot is the squared L2 norm (Scala model)") {
    val got = vecs.toDF("id", "v")
      .select(col("id"), call_function("vec_dot", col("v"), col("v")).as("d"))
      .as[(Long, Double)].collect().toMap
    vecs.foreach { case (i, v) =>
      val want = v.map(x => x * x).sum
      assert(math.abs(got(i) - want) < 1e-12)
    }
  }

  test("vec_dot of a null vector is null") {
    val df = Seq((1L, Option(Array(1.0, 2.0)), Option.empty[Array[Double]]))
      .toDF("id", "v", "w")
    assert(df.select(call_function("vec_dot", col("v"), col("w")))
      .collect().head.isNullAt(0))
  }

  test("vec_dot NULL semantics match the HOF formulation exactly") {
    // unequal lengths: zip_with pads with null → null sum; a null
    // element likewise nullifies — vec_dot must agree, or the
    // VecDotRewrite optimizer rule would silently change results
    val df = Seq(
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](1.0)),
      (Seq[java.lang.Double](1.0, null), Seq[java.lang.Double](1.0, 2.0)),
      (Seq[java.lang.Double](1.0, 2.0), Seq[java.lang.Double](3.0, 4.0)))
      .toDF("a", "b")
    val rows = df.select(
      call_function("vec_dot", col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(0) == r.isNullAt(1), s"null disagreement: $r")
      if (!r.isNullAt(0)) assert(r.getDouble(0) == r.getDouble(1))
    }
    assert(rows(0).isNullAt(0) && rows(1).isNullAt(0) && !rows(2).isNullAt(0))
  }

  test("lsh_sigs matches the per-plane sign model") {
    val tables = 8
    val bits = 6
    val got = vecs.toDF("id", "v")
      .select(col("id"),
        call_function("lsh_sigs", col("v"), lit(tables), lit(bits)).as("sigs"))
      .as[(Long, Array[Long])].collect().toMap
    vecs.foreach { case (i, v) =>
      val want = (0 until tables).map { t =>
        (0 until bits).foldLeft(0L) { (sig, r) =>
          val p = t * bits + r
          val dot = v.indices.map(c => v(c) * LshSigs.planeSign(p, c)).sum
          if (dot > 0) sig | (1L << r) else sig
        }
      }
      assert(got(i).toSeq == want, s"vec $i")
    }
  }

  test("lsh_sigs signatures are stable across calls (deterministic planes)") {
    val df = vecs.toDF("id", "v")
    val a = df.select(call_function("lsh_sigs", col("v"), lit(4), lit(8)))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    val b = df.select(call_function("lsh_sigs", col("v"), lit(4), lit(8)))
      .collect().map(_.getSeq[Long](0).toSeq).toSeq
    assert(a == b)
  }

  test("near-identical vectors collide in at least one table; sigs differ for random pairs") {
    val base = Array.fill(64)(rnd.nextGaussian())
    val near = base.map(_ * 1.0001) // same direction → same signs
    val far = Array.fill(64)(rnd.nextGaussian())
    val df = Seq((0L, base), (1L, near), (2L, far)).toDF("id", "v")
      .select(col("id"),
        call_function("lsh_sigs", col("v"), lit(8), lit(6)).as("sigs"))
      .as[(Long, Array[Long])].collect().toMap
    assert(df(0L).toSeq == df(1L).toSeq, "same-direction vectors must share all buckets")
    assert(df(0L).toSeq != df(2L).toSeq, "random pair sharing every bucket is ~impossible")
  }
}
