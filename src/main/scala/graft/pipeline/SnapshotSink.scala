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
  * Scale: the snapshot rewrites once per batch — at 100 TB that is
  * the standard copy-on-write table-format trade (partition the
  * snapshot and rewrite only partitions the delta touches; the merge
  * plan here is already partition-prunable because Upsert keys the
  * join on the snapshot key).
  */
object SnapshotSink {

  def run(
      stream: DataFrame,
      keys: Seq[String],
      seqCol: String,
      opCol: Option[String],
      snapshotDir: String,
      checkpointDir: String): DataStreamWriter[Row] = {
    require(keys.nonEmpty, "snapshot sink needs at least one key column")
    stream.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        applyBatch(batch, keys, seqCol, opCol, snapshotDir)
        ()
      }
  }

  /** one merge step; also the batch-mode backfill entry */
  def applyBatch(
      batch: DataFrame,
      keys: Seq[String],
      seqCol: String,
      opCol: Option[String],
      snapshotDir: String): Unit = {
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
    val deletes = opCol.map { oc =>
      last.filter(col(oc) === "D").select(keys.map(col): _*)
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
