package graft.operators

import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for a parquet directory table — the routine
  * maintenance every long-lived 100 TB table needs: streaming sinks
  * and frequent small merges accrete kilobyte part files whose
  * per-file open/footer/task overhead eventually dominates scans.
  * (The reference pipeline has no storage maintenance surface —
  * engine extension, SURVEY.md §2B warehouse family.)
  *
  * Selective by construction: only files smaller than `smallBytes`
  * are read and rewritten, greedily bin-packed (first-fit by
  * descending size) into outputs of ~`targetBytes`; every file at or
  * above the threshold is left byte-untouched — at scale that is the
  * difference between a cheap metadata-sized maintenance pass and
  * re-reading the whole table (exactly the trade
  * [[graft.operators.PartitionedUpsert]] makes for merges).
  *
  * Crash safety is a three-phase manifest protocol, resumable at any
  * point by re-running [[apply]]:
  *   1. new files fully materialize under `<dir>/_compact_work/`
  *      (never visible to readers: Spark ignores underscore-prefixed
  *      paths);
  *   2. a manifest listing (originals-to-delete, news-to-install) is
  *      written to a temp name and RENAMED into place — the commit
  *      point;
  *   3. news move into the table dir, then originals delete, then the
  *      manifest deletes. Every step is idempotent (moves skip
  *      already-installed names, deletes tolerate absence), so a
  *      crash anywhere replays to the same end state. A crash BEFORE
  *      the manifest rename leaves only invisible work files — the
  *      next run clears and redoes them.
  *
  * Single-writer contract, same as [[graft.pipeline.SnapshotSink]]:
  * one maintenance job per directory. The protocol is LOSS-free at
  * every step, not duplicate-free: between the first install and the
  * last original's delete (phase 3 of every run) a concurrent reader
  * sees binned rows twice — run it in the table's maintenance window,
  * or serve readers through [[VersionedSnapshot]] generations.
  */
object Compact {

  final case class Stats(
      filesBefore: Int, filesAfter: Int, bytesRewritten: Long)

  private val WorkDirName = "_compact_work"
  private val ManifestName = "_compact_manifest"

  def apply(
      spark: SparkSession,
      dir: String,
      smallBytes: Long,
      targetBytes: Long): Stats = {
    require(smallBytes > 0 && targetBytes >= smallBytes,
      s"need 0 < smallBytes <= targetBytes, got $smallBytes/$targetBytes")
    val fs = new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val manifest = new Path(dir, ManifestName)

    // resume a crashed install first: the manifest is the commit point
    if (fs.exists(manifest)) installFromManifest(fs, dir)

    val parts = dataFiles(fs, dir)
    val small = parts.filter(_.getLen < smallBytes).sortBy(-_.getLen)
    if (small.length <= 1)
      return Stats(parts.length, parts.length, 0L)

    // driver-side metadata-only first-fit binning — no data read yet
    val bins = collection.mutable.ArrayBuffer.empty[(collection.mutable.ArrayBuffer[FileStatus], Long)]
    small.foreach { f =>
      bins.indexWhere(_._2 + f.getLen <= targetBytes) match {
        case -1 => bins += ((collection.mutable.ArrayBuffer(f), f.getLen))
        case i  => bins(i) = ((bins(i)._1 += f, bins(i)._2 + f.getLen))
      }
    }

    val work = new Path(dir, WorkDirName)
    fs.delete(work, true) // pre-commit leftovers from an earlier crash
    val moves = bins.zipWithIndex.map { case ((fsList, _), i) =>
      val outDir = new Path(work, s"bin-$i")
      // mergeSchema: a long-lived dir legitimately holds files from
      // several schema generations (the q76 layout); sampling one
      // footer would adopt the narrow schema and the rewrite would
      // silently DROP the newer columns before deleting the originals
      spark.read.option("mergeSchema", "true")
        .parquet(fsList.map(_.getPath.toString).toSeq: _*)
        .coalesce(1).write.mode("overwrite").parquet(outDir.toString)
      val produced = dataFiles(fs, outDir.toString)
      require(produced.length == 1, s"bin $i produced ${produced.length} files")
      (produced.head.getPath, s"compacted-$i-${produced.head.getPath.getName}")
    }.toSeq

    // commit: manifest lists deletions and installs; rename = atomic
    val doomed = small.map(_.getPath.getName)
    val lines = doomed.map("D\t" + _) ++
      moves.map { case (src, name) => s"I\t${src.toString}\t$name" }
    val tmpManifest = new Path(dir, ManifestName + ".tmp")
    val out = fs.create(tmpManifest, true)
    try out.write(lines.mkString("\n").getBytes("UTF-8")) finally out.close()
    if (!fs.rename(tmpManifest, manifest))
      sys.error(s"Compact: could not commit manifest at $manifest")

    installFromManifest(fs, dir)
    val after = dataFiles(fs, dir)
    Stats(parts.length, after.length, small.map(_.getLen).sum)
  }

  /** [[apply]] over every LEAF partition directory of a
    * hive-partitioned table root (multi-level `a=1/b=2/` layouts
    * recurse to the level that actually holds data files) — the
    * maintenance pass for [[graft.pipeline.SnapshotSink]]'s
    * partitioned snapshots, which accrete one small file per partition
    * per merged batch. Each leaf compacts independently (partition
    * columns are directory-encoded, so rewriting a leaf's files in
    * place preserves them); leaves crash-recover independently too,
    * since each carries its own manifest.
    */
  def partitioned(
      spark: SparkSession,
      root: String,
      smallBytes: Long,
      targetBytes: Long): Stats = {
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(dir: Path): Seq[Path] = {
      val kids = fs.listStatus(dir).toSeq
        .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      if (kids.isEmpty) Seq(dir) else kids.flatMap(k => leaves(k.getPath))
    }
    val parts = fs.listStatus(new Path(root)).toSeq
      .filter(st => st.isDirectory && st.getPath.getName.contains("="))
      .flatMap(p => leaves(p.getPath))
    val all = parts.map(p => apply(spark, p.toString, smallBytes, targetBytes))
    Stats(all.map(_.filesBefore).sum, all.map(_.filesAfter).sum,
      all.map(_.bytesRewritten).sum)
  }

  /** idempotent phase 3: install news, delete originals, drop manifest */
  private def installFromManifest(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Unit = {
    val manifest = new Path(dir, ManifestName)
    val in = fs.open(manifest)
    val text = try {
      val buf = new java.io.ByteArrayOutputStream()
      org.apache.hadoop.io.IOUtils.copyBytes(in, buf, 64 * 1024, false)
      buf.toString("UTF-8")
    } finally in.close()
    val entries = text.linesIterator.filter(_.nonEmpty).map(_.split("\t")).toSeq
    // installs BEFORE deletes: the table never loses rows mid-protocol
    entries.collect { case Array("I", src, name) =>
      val from = new Path(src)
      val to = new Path(dir, name)
      if (!fs.exists(to)) {
        if (!fs.exists(from) || !fs.rename(from, to))
          sys.error(s"Compact: cannot install $from as $to")
      }
    }
    entries.collect { case Array("D", name) =>
      fs.delete(new Path(dir, name), false)
    }
    fs.delete(new Path(dir, WorkDirName), true)
    fs.delete(manifest, false)
    ()
  }

  private def dataFiles(
      fs: org.apache.hadoop.fs.FileSystem, dir: String): Seq[FileStatus] =
    fs.listStatus(new Path(dir)).toSeq.filter { st =>
      st.isFile && !st.getPath.getName.startsWith("_") &&
        !st.getPath.getName.startsWith(".") &&
        st.getPath.getName.endsWith(".parquet")
    }
}
