package graft.operators

import java.nio.file.Files

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

class VersionedSnapshotSpec extends SparkSpec {
  import spark.implicits._

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  test("readers keep a resolved generation while newer ones commit") {
    val root = Files.createTempDirectory("graft-vsnap").toString + "/t"
    val g0 = VersionedSnapshot.commit(spark, root,
      Seq((1, "a"), (2, "b")).toDF("k", "s"))
    assert(g0 == 0)
    // a long-running reader resolves gen-0's PATH now …
    val held = new Path(root, s"gen-$g0").toString
    val g1 = VersionedSnapshot.commit(spark, root,
      Seq((1, "A"), (3, "c")).toDF("k", "s"), keep = 2)
    assert(g1 == 1)
    // … and can still read it in full after the next commit (keep=2)
    assert(spark.read.parquet(held).as[(Int, String)].collect().toSet ==
      Set((1, "a"), (2, "b")))
    // new readers see the new generation
    assert(VersionedSnapshot.read(spark, root)
      .as[(Int, String)].collect().toSet == Set((1, "A"), (3, "c")))
  }

  test("generations beyond keep are pruned; the live one never is") {
    val root = Files.createTempDirectory("graft-vsnap2").toString + "/t"
    (0 to 3).foreach { i =>
      VersionedSnapshot.commit(spark, root,
        Seq((i, s"v$i")).toDF("k", "s"), keep = 2)
    }
    val gens = fs.listStatus(new Path(root)).map(_.getPath.getName)
      .filter(_.startsWith("gen-")).sorted.toSeq
    assert(gens == Seq("gen-2", "gen-3"), s"retention must keep 2: $gens")
    assert(VersionedSnapshot.read(spark, root)
      .as[(Int, String)].head() == ((3, "v3")))
  }

  test("a crash after the gen write but before the pointer leaves readers consistent") {
    val root = Files.createTempDirectory("graft-vsnap3").toString + "/t"
    VersionedSnapshot.commit(spark, root, Seq((1, "a")).toDF("k", "s"))
    // simulate the torn commit: gen-1 fully written, pointer untouched
    Seq((9, "torn")).toDF("k", "s")
      .write.parquet(new Path(root, "gen-1").toString)
    assert(VersionedSnapshot.currentGen(spark, root).contains(0L))
    assert(VersionedSnapshot.read(spark, root)
      .as[(Int, String)].head() == ((1, "a")),
      "readers must stay on the last COMMITTED generation")
    // the next commit overwrites the torn dir and moves the pointer
    val g = VersionedSnapshot.commit(spark, root, Seq((2, "b")).toDF("k", "s"))
    assert(g == 1)
    assert(VersionedSnapshot.read(spark, root)
      .as[(Int, String)].collect().toSet == Set((2, "b")))
  }
}
