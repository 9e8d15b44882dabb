package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time one catalog query and dump its formatted plan.
  *   sbt "runMain graft.ProfileQ <query> [sfDir] [--explain]"
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    if (args.contains("--explain"))
      SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    // rebuild the frame INSIDE each timed run, exactly as Bench does:
    // several catalog queries do eager work in their builder (iterative
    // connected components, the q103 storage merge), and timing only
    // the final materialization would under-report them — the warm
    // numbers here must be comparable 1:1 with BENCH_r*.json entries
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      println(f"[profile] $name run$i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
