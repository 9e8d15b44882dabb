package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The mathematics q124 and the z-order LayoutSpec rest on, checked
  * exhaustively over the full 8-bit domain (65536 points — one
  * DataFrame pass, no sampling needed):
  *  - the interleave is a bijection [0,256)² → [0,65536)
  *  - fixing the top 8 interleaved bits (the q124 bucket) pins each
  *    dimension to one 16-wide slice — the span bound that makes
  *    footer min/max prune on BOTH columns
  */
class ZOrderSpec extends SparkSpec {

  private lazy val grid = spark.range(65536)
    .select((col("id") % 256).as("x"), expr("id div 256").as("y"))
    .withColumn("z", Sources.zInterleave(col("x"), col("y"), bits = 8))

  test("8-bit Morton interleave is a bijection onto [0, 65536)") {
    val stats = grid.agg(
      countDistinct(col("z")).as("nz"),
      min(col("z")).as("lo"), max(col("z")).as("hi")).head()
    assert(stats.getLong(0) == 65536L, "z values must be all distinct")
    assert(stats.getLong(1) == 0L && stats.getLong(2) == 65535L,
      "z must cover exactly [0, 65536)")
  }

  test("fixing the top 8 z bits bounds both dimensions to a 16-wide cell") {
    val spans = grid.groupBy(shiftright(col("z"), 8).as("bucket"))
      .agg((max(col("x")) - min(col("x"))).as("sx"),
        (max(col("y")) - min(col("y"))).as("sy"),
        count(lit(1)).as("n"))
    val bad = spans.filter(col("sx") > 15 || col("sy") > 15).count()
    assert(bad == 0, "every bucket must pin both dims to one 16-wide slice")
    // and the partition is uniform: 256 buckets x 256 points
    assert(spans.filter(col("n") =!= 256).count() == 0)
    assert(spans.count() == 256)
  }
}
