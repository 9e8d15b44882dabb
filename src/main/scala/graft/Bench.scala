package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line for the driver (BENCH_r{N}.json).
  *
  * Every query materializes through the `noop` sink, not `.count()`:
  * count() lets Catalyst prune computed columns (a fingerprint query
  * would never hash anything), noop forces full evaluation of every
  * output column while writing nothing.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      // one warmup (codegen javac + JIT, per-process noise) then the
      // min of two timed runs — min is the right statistic for "engine
      // cost" under background-load variance on a shared box.
      // A failing query must NOT fold its exception path into the
      // numbers as a fast success: record it as null + failures entry.
      def once(): Option[Double] = {
        val t0 = System.nanoTime()
        try {
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          None
        }
      }
      once()
      name -> ((once(), once()) match {
        case (Some(a), Some(b)) => Some(math.min(a, b))
        case _                  => None
      })
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v.fold("null")(_.toString) }
      .mkString("{", ",", "}")
    val failures = results.collect { case (k, None) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.flatMap(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failures":$failures,"sf":"$sfDir"}""")
    spark.stop()
  }
}
