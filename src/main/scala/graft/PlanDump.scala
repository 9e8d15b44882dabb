package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: dump `.explain("formatted")` for a list of catalog
  * queries into one file each — the plans/r{N}/ evidence the
  * optimization rounds commit, produced in ONE session instead of a
  * ProfileQ run per query.
  *   sbt "runMain graft.PlanDump <outDir> <suffix> q1,q2,... [sfDir]"
  * honors SPARK_GRAFT_CPUS like Bench/ProfileQ/MiniBench.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = args(1)
    val names = args(2).split(",").toSeq
    val sfDir = args.lift(3).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      val plan = SparkEntry.queries(n)(spark, sfDir)
        .queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${n}_$suffix.txt"),
        plan.getBytes("UTF-8"))
      println(s"[plandump] wrote $outDir/${n}_$suffix.txt")
    }
    try org.apache.spark.sql.execution.streaming.state.StateStore.stop()
    catch { case _: Exception => }
    spark.stop()
  }
}
