package graft.pipeline

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Streaming materialized snapshot: fold a CDC/upsert stream into a
  * key→latest-row parquet table — the continuously-maintained form of
  * the q86 [[graft.operators.Upsert]] / q91 [[graft.operators.CdcApply]]
  * batch operators, the way [[IncrementalDedup.streamingDedup]] is the
  * continuous form of q26.
  *
  * Per micro-batch (foreachBatch — the batch is the unit: the merge
  * needs the whole delta and the previous snapshot in one plan):
  *   1. compact the batch to its last op per key (rank-1 window,
  *      WindowGroupLimit in-shuffle pruning);
  *   2. split into upserts and deletes (opCol = 'D');
  *   3. full-outer merge the upserts into the snapshot, anti-join the
  *      deletes out;
  *   4. install the new snapshot via DirSwap (crash leaves the old
  *      table at `_compact_old`, never destroyed).
  *
  * Replay safety: foreachBatch is at-least-once; re-applying a batch
  * is a no-op because the merge is idempotent — upserting rows already
  * present (same key, same payload) and re-deleting absent keys both
  * leave the snapshot unchanged. Same single-writer contract as the
  * other DirSwap users: one active stream per snapshotDir.
  *
  * Scale: with `partitionCol` set the snapshot is stored
  * `partitionBy(partitionCol)` and each batch merges through
  * [[graft.operators.PartitionedUpsert]] — only the partitions the
  * batch touches are read, joined, and rewritten, which is the 100 TB
  * path (a 0.1% delta rewrites ~0.1% of the files). Without it the
  * snapshot rewrites in full once per batch via DirSwap — fine for
  * small snapshots, the documented copy-on-write trade otherwise.
  * `partitionCol` carries PartitionedUpsert's contract: key-derived
  * (a key's partition never changes) and non-null, present in the
  * stream's columns.
  */
object SnapshotSink {

  def run(
      stream: DataFrame,
      keys: Seq[String],
      seqCol: String,
      opCol: Option[String],
      snapshotDir: String,
      checkpointDir: String,
      partitionCol: Option[String] = None): DataStreamWriter[Row] = {
    require(keys.nonEmpty, "snapshot sink needs at least one key column")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, keys, seqCol, opCol, snapshotDir, partitionCol)
        ()
      }
  }

  /** one merge step; also the batch-mode backfill entry */
  def applyBatch(
      batch: DataFrame,
      keys: Seq[String],
      seqCol: String,
      opCol: Option[String],
      snapshotDir: String,
      partitionCol: Option[String] = None): Unit = {
    require(!batch.columns.contains("__rn"),
      "__rn is reserved by SnapshotSink")
    val spark = batch.sparkSession
    val w = Window.partitionBy(keys.map(col): _*).orderBy(col(seqCol).desc)
    val last = batch.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val upserts = opCol.fold(last.drop(seqCol)) { oc =>
      last.filter(col(oc) =!= "D").drop(seqCol, oc)
    }
    // the partitioned path needs each delete's partition value to know
    // which directories the batch touches; distinct, because the
    // partition column may itself BE a key (blessed by the
    // PartitionedUpsert contract) and a duplicated column name would
    // make every later reference ambiguous
    val deletes = opCol.map { oc =>
      last.filter(col(oc) === "D")
        .select((keys ++ partitionCol.toSeq).distinct.map(col): _*)
    }

    partitionCol match {
      case Some(pc) =>
        // PartitionedUpsert owns first-install, crash recovery, and the
        // touched-partition-only rewrite
        graft.operators.PartitionedUpsert(
          spark, snapshotDir, upserts, keys, pc, deletes)
        return
      case None => ()
    }

    val hc = spark.sparkContext.hadoopConfiguration
    val dirPath = new org.apache.hadoop.fs.Path(snapshotDir)
    val bakPath = new org.apache.hadoop.fs.Path(snapshotDir + "_compact_old")
    val fs = dirPath.getFileSystem(hc)
    // crash inside a previous DirSwap's rename window: the dir is
    // absent but the WHOLE prior snapshot sits at _compact_old.
    // Treating that as "first batch" would silently reset the table to
    // one batch's rows — restore the moved-aside snapshot instead
    // (the documented DirSwap recovery, automated).
    if (!fs.exists(dirPath) && fs.exists(bakPath)) {
      if (!fs.rename(bakPath, dirPath))
        sys.error(s"SnapshotSink: could not restore $bakPath to $dirPath")
    }
    if (!fs.exists(dirPath)) {
      // first batch: the compacted upserts ARE the snapshot (a key
      // whose last op is a delete is already absent from `upserts`).
      // Written to a tmp sibling then renamed into place, so a crash
      // mid-write can never leave a torn dir that wedges the replay —
      // the visible dir either doesn't exist or is complete.
      val tmpPath = new org.apache.hadoop.fs.Path(
        snapshotDir + "_init_tmp")
      fs.delete(tmpPath, true)
      upserts.write.mode("overwrite").parquet(tmpPath.toString)
      if (!fs.rename(tmpPath, dirPath))
        sys.error(s"SnapshotSink: could not install first snapshot at $dirPath")
    } else {
      val snap = spark.read.parquet(snapshotDir)
      val merged0 = graft.operators.Upsert(snap, upserts, keys)
      val merged = deletes.fold(merged0) { del =>
        // tiny per-batch delete set: broadcast anti-join
        merged0.join(broadcast(del), keys, "left_anti")
      }
      // the lazy read of the old snapshot inside writeTmp is safe:
      // DirSwap swaps only after the tmp write completes
      DirSwap.rewriteInPlace(spark, snapshotDir) { tmp =>
        merged.write.mode("overwrite").parquet(tmp)
      }
    }
  }
}
