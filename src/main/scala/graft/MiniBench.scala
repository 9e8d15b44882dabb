package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: Bench's exact methodology (noop sink, one warmup +
  * min-of-3, shuffle.partitions = cpus) over a query SUBSET — the
  * in-round A/B instrument, so touched-query before/after numbers are
  * 1:1 comparable with BENCH_r*.json entries without paying the full
  * 264-query suite per measurement.
  *   sbt "runMain graft.MiniBench q193_winnowing_fingerprints,q192_lsh_recall_curve [sfDir]"
  * honors SPARK_GRAFT_CPUS like Bench/ProfileQ.
  */
object MiniBench {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    names.foreach(once) // global warmup pass (codegen javac + JIT)
    var total = 0.0
    names.foreach { n =>
      once(n) // per-query warmup, as Bench does
      val m = (1 to 3).map(_ => once(n)).min
      total += m
      println(f"[mini] $n: $m%.3f s")
    }
    println(f"[mini] TOTAL: $total%.3f s")
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case _: Exception => }
    spark.stop()
  }
}
