package graft.queries

import org.apache.spark.sql.SparkSession

/** dev-only mini-bench — NOT registered, never committed.
  * usage: runMain graft.queries.Scratch q1,q2,... [sfDir]
  * replicates Bench methodology (noop sink, warmup + min-of-3).
  */
object Scratch {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val d = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      graft.SparkEntry.queries(name)(spark, d)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(once) // global JIT warmup pass
    var total = 0.0
    names.foreach { n =>
      once(n)
      val m = (1 to 3).map(_ => once(n)).min
      total += m
      println(f"[mini] $n: $m%.3f s")
    }
    println(f"[mini] TOTAL: $total%.3f s")
    spark.stop()
  }
}
