package graft.operators

import java.nio.file.{Files, Paths}

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.core.Tables

/** File-level guarantees of [[Compact]] — the row-preservation half is
  * q127's oracle row. Covered here: threshold files stay byte-
  * untouched, the small-file population collapses, and the manifest
  * protocol replays a simulated crash (committed manifest, install
  * half-done) to the same end state, twice.
  */
class CompactSpec extends SparkSpec {

  private def fs = new Path("/tmp").getFileSystem(
    spark.sparkContext.hadoopConfiguration)

  private def parquetFiles(dir: String) =
    fs.listStatus(new Path(dir)).toSeq.filter(st =>
      st.isFile && st.getPath.getName.endsWith(".parquet") &&
        !st.getPath.getName.startsWith("_"))

  test("small files bin-pack; files at the threshold stay byte-untouched") {
    val dir = Files.createTempDirectory("graft-compact").toString + "/t"
    val docs = Tables.load(spark, sf0001, "documents")
    // one big file, then 20 shards of the same rows appended
    docs.coalesce(1).write.parquet(dir)
    val big = parquetFiles(dir).maxBy(_.getLen)
    docs.repartition(20).write.mode("append").parquet(dir)
    val before = parquetFiles(dir)
    val total = spark.read.parquet(dir).count()
    assert(total == 2 * docs.count())

    // threshold below the big file: only the 20 shards are candidates
    val stats = Compact(spark, dir,
      smallBytes = big.getLen, targetBytes = big.getLen * 4)
    val after = parquetFiles(dir)
    assert(stats.filesBefore == before.length)
    assert(after.length < before.length,
      s"expected fewer files, got ${after.length} of ${before.length}")
    assert(spark.read.parquet(dir).count() == total, "rows must be preserved")
    val bigAfter = after.find(_.getPath.getName == big.getPath.getName)
    assert(bigAfter.isDefined, "the large file must not be renamed")
    assert(bigAfter.get.getModificationTime == big.getModificationTime &&
      bigAfter.get.getLen == big.getLen,
      "the large file must not be rewritten")

    // second pass is a no-op: nothing left under the threshold to merge
    val again = Compact(spark, dir, big.getLen, big.getLen * 4)
    assert(again.bytesRewritten == 0 ||
      parquetFiles(dir).count(_.getLen < big.getLen) <= 1,
      s"re-compaction must not churn: $again")
  }

  test("partitioned compaction collapses per-partition files; partition values survive") {
    val root = Files.createTempDirectory("graft-compact-part").toString + "/t"
    val docs = Tables.load(spark, sf0001, "documents")
    // the shape SnapshotSink's partitioned path accretes: many small
    // files inside every lang= directory
    docs.repartition(8).write.partitionBy("lang").parquet(root)
    val byLang = docs.groupBy(col("lang")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val partDirs = fs.listStatus(new Path(root)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.startsWith("lang="))
    assert(partDirs.nonEmpty)
    val filesBefore = partDirs.map(p => parquetFiles(p.getPath.toString).length).sum

    val stats = Compact.partitioned(spark, root,
      smallBytes = 8L * 1024 * 1024, targetBytes = 32L * 1024 * 1024)
    assert(stats.filesBefore == filesBefore)
    assert(stats.filesAfter == partDirs.length,
      s"each partition should collapse to one file: $stats")
    val after = spark.read.parquet(root).groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(after == byLang, "partition values and per-partition rows must survive")
  }

  test("a committed manifest with a half-done install resumes to the same state") {
    val dir = Files.createTempDirectory("graft-compact-crash").toString + "/t"
    val docs = Tables.load(spark, sf0001, "documents")
    docs.repartition(3).write.parquet(dir)
    val originals = parquetFiles(dir)
    val total = spark.read.parquet(dir).count()

    // hand-build the post-commit state Compact would crash out of:
    // work output materialized, manifest committed, ONE install done
    val work = s"$dir/_compact_work/bin-0"
    spark.read.parquet(originals.map(_.getPath.toString): _*)
      .coalesce(1).write.parquet(work)
    val produced = parquetFiles(work).head
    val installedName = s"compacted-0-${produced.getPath.getName}"
    val manifest =
      originals.map(o => s"D\t${o.getPath.getName}") :+
        s"I\t${produced.getPath}\t$installedName"
    Files.write(Paths.get(dir, "_compact_manifest"),
      manifest.mkString("\n").getBytes("UTF-8"))
    // simulate the crash happening mid-phase-3: the new file is in,
    // one original already deleted, manifest still present
    assert(fs.rename(produced.getPath, new Path(dir, installedName)))
    assert(fs.delete(originals.head.getPath, false))

    // resume happens on entry to apply(); thresholds then find
    // nothing further to do
    val stats = Compact(spark, dir, smallBytes = 1L, targetBytes = 1L)
    assert(!fs.exists(new Path(dir, "_compact_manifest")), "manifest consumed")
    assert(!fs.exists(new Path(dir, "_compact_work")), "work dir cleared")
    val after = parquetFiles(dir)
    assert(after.map(_.getPath.getName) == Seq(installedName),
      s"only the compacted file may remain: ${after.map(_.getPath.getName)}")
    assert(spark.read.parquet(dir).count() == total, "no row may be lost")
    assert(stats.filesAfter == 1)

    // replaying again is a no-op — the protocol is idempotent
    val again = Compact(spark, dir, smallBytes = 1L, targetBytes = 1L)
    assert(again.filesBefore == 1 && again.filesAfter == 1 &&
      again.bytesRewritten == 0)
  }
}
