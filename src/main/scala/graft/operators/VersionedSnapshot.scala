package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Generation-dir snapshot layout with an atomic pointer — the reader-
  * isolation complement to [[graft.pipeline.DirSwap]]. DirSwap's
  * rename-aside swap is crash-safe but has a visible absent window and
  * pulls files out from under a long-running reader; here every
  * rewrite lands in a NEW `gen-<k>` directory and readers resolve
  * `_LATEST` (a one-line pointer file, installed by tmp-write +
  * rename, which HDFS/POSIX make atomic) — a reader that already
  * resolved gen-k keeps a complete, immutable directory through the
  * next `keep - 1` commits (commit k+keep prunes gen-k; size `keep`
  * to the longest reader you need to protect). The same layout Iceberg/Delta
  * get from manifest trees, at directory granularity: the right
  * trade when the table is rewritten wholesale anyway (DirSwap's
  * callers) and list-scan cost is one directory.
  *
  * Writer contract: single writer per root (generation numbering and
  * pointer install race otherwise) — the same contract every DirSwap
  * caller already holds. A crash after writing `gen-(k+1)` but before
  * the pointer rename leaves `_LATEST` at gen-k: readers stay
  * consistent on the previous generation and the torn directory is
  * overwritten by the next commit (write → install is idempotent).
  */
object VersionedSnapshot {

  private val Pointer = "_LATEST"

  /** commit `df` as the next generation; returns its id */
  def commit(
      spark: SparkSession,
      root: String,
      df: DataFrame,
      keep: Int = 2): Long = {
    require(keep >= 1, s"must retain at least the live generation, got $keep")
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val cur = currentGen(spark, root)
    val next = cur.getOrElse(-1L) + 1
    val genDir = new Path(root, s"gen-$next")
    fs.delete(genDir, true) // torn leftover from a pre-pointer crash
    df.write.mode("overwrite").parquet(genDir.toString)
    // the commit point: FileContext.rename with OVERWRITE replaces the
    // pointer atomically — a plain delete+rename pair would leave a
    // no-pointer window a crash could freeze forever
    val tmp = new Path(root, Pointer + ".tmp")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    val fc = org.apache.hadoop.fs.FileContext.getFileContext(
      new Path(root).toUri, spark.sparkContext.hadoopConfiguration)
    fc.rename(fc.makeQualified(tmp), fc.makeQualified(new Path(root, Pointer)),
      org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    // prune generations a live reader can no longer be holding
    // only names matching gen-<digits> participate: a stray sibling like
    // gen-1.bak must not abort the prune after the pointer already moved
    val GenName = "gen-(\\d+)".r
    fs.listStatus(new Path(root)).foreach { st =>
      st.getPath.getName match {
        case GenName(g) if g.toLong <= next - keep => fs.delete(st.getPath, true)
        case _ => ()
      }
    }
    next
  }

  /** resolve the live generation id, if any committed generation exists */
  def currentGen(spark: SparkSession, root: String): Option[Long] = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val ptr = new Path(root, Pointer)
    if (!fs.exists(ptr)) None
    else {
      val in = fs.open(ptr)
      val txt = try {
        val buf = new java.io.ByteArrayOutputStream()
        org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 1024, false)
        buf.toString("UTF-8").trim
      } finally in.close()
      Some(txt.toLong)
    }
  }

  /** read the live generation (the resolved path stays valid through
    * the next `keep - 1` commits as newer generations land) */
  def read(spark: SparkSession, root: String): DataFrame = {
    val gen = currentGen(spark, root).getOrElse(
      sys.error(s"VersionedSnapshot: no committed generation under $root"))
    spark.read.parquet(new Path(root, s"gen-$gen").toString)
  }
}
