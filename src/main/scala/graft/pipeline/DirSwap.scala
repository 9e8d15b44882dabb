package graft.pipeline

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Crash-safe in-place rewrite of a directory-backed table: write the
  * replacement to a sibling temp dir, then swap via rename-aside. A
  * crash between the two renames leaves the ORIGINAL data at
  * `<dir>_compact_old` (recover by renaming it back) — the table is
  * never destroyed. Directory renames are not atomic as a pair, so a
  * concurrent reader can catch a brief absent window: callers must
  * hold the single-writer contract (no concurrent job on the same
  * directory) that EnrichJob.compactCache and
  * IncrementalDedup.compactIndex document.
  */
private[pipeline] object DirSwap {

  /** `writeTmp` must materialize the replacement at the given path;
    * reading lazily from `dir` inside it is safe — the swap happens
    * only after the write completes.
    */
  def rewriteInPlace(spark: SparkSession, dir: String)(
      writeTmp: String => Unit): Unit = {
    val hadoopConf = spark.sparkContext.hadoopConfiguration
    val dirPath = new Path(dir)
    val tmpPath = new Path(dir + "_compact_tmp")
    val bakPath = new Path(dir + "_compact_old")
    val fs = dirPath.getFileSystem(hadoopConf)
    writeTmp(tmpPath.toString)
    fs.delete(bakPath, true) // stale leftover from an earlier crash
    if (!fs.rename(dirPath, bakPath))
      sys.error(s"DirSwap: could not move $dirPath aside")
    if (!fs.rename(tmpPath, dirPath)) {
      fs.rename(bakPath, dirPath) // restore
      sys.error(s"DirSwap: could not install rewritten table at $dirPath")
    }
    fs.delete(bakPath, true)
    ()
  }
}
