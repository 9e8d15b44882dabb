package graft.pipeline

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.CdcApply

/** The continuous-materialization contract: streaming a CDC log
  * through SnapshotSink must end at exactly the snapshot CdcApply
  * produces from the same log in one shot.
  */
class SnapshotSinkSpec extends SparkSpec {
  import spark.implicits._

  // a CDC log over 6 keys: updates, a delete, a post-delete re-insert
  private val log = Seq(
    (1L, "a", 0L, "I"), (2L, "b", 1L, "I"), (3L, "c", 2L, "I"),
    (4L, "d", 3L, "I"), (5L, "e", 4L, "I"),
    (2L, "B", 5L, "U"), (3L, null.asInstanceOf[String], 6L, "D"),
    (5L, "E", 7L, "U"), (6L, "f", 8L, "I"),
    (4L, null.asInstanceOf[String], 9L, "D"), (4L, "d2", 10L, "I")
  )

  test("streamed micro-batches converge to the one-shot CdcApply snapshot") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val snapDir = Files.createTempDirectory("graft-snap").toString + "/snap"
    val ckpt = Files.createTempDirectory("graft-snap-ckpt").toString

    val ms = MemoryStream[(Long, String, Long, String)]
    val q = SnapshotSink.run(
      ms.toDF().toDF("k", "s", "seq", "op"),
      Seq("k"), "seq", Some("op"), snapDir, ckpt).start()
    try {
      log.grouped(4).foreach { chunk =>
        ms.addData(chunk); q.processAllAvailable()
      }
    } finally q.stop()

    val streamed = spark.read.parquet(snapDir)
      .as[(Long, String)].collect().toSet
    val oneShot = CdcApply(
      log.toDF("k", "s", "seq", "op"), Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toSet
    assert(streamed == oneShot,
      s"missing=${oneShot.diff(streamed)} extra=${streamed.diff(oneShot)}")
    assert(streamed == Set((1L, "a"), (2L, "B"), (4L, "d2"), (5L, "E"), (6L, "f")))
  }

  test("re-applying a batch is idempotent (at-least-once replay safety)") {
    val snapDir = Files.createTempDirectory("graft-snap2").toString + "/snap"
    val b1 = log.take(6).toDF("k", "s", "seq", "op")
    val b2 = log.drop(6).toDF("k", "s", "seq", "op")
    SnapshotSink.applyBatch(b1, Seq("k"), "seq", Some("op"), snapDir)
    SnapshotSink.applyBatch(b2, Seq("k"), "seq", Some("op"), snapDir)
    val once = spark.read.parquet(snapDir).as[(Long, String)].collect().toSet
    // the crash-after-write, replay-before-checkpoint case
    SnapshotSink.applyBatch(b2, Seq("k"), "seq", Some("op"), snapDir)
    val twice = spark.read.parquet(snapDir).as[(Long, String)].collect().toSet
    assert(once == twice)
  }

  test("a crash inside the swap window restores the snapshot instead of resetting it") {
    val root = Files.createTempDirectory("graft-snap4").toString
    val snapDir = root + "/snap"
    val b1 = log.take(6).toDF("k", "s", "seq", "op")
    val b2 = log.drop(6).toDF("k", "s", "seq", "op")
    SnapshotSink.applyBatch(b1, Seq("k"), "seq", Some("op"), snapDir)
    // simulate dying between DirSwap's two renames: the dir is gone,
    // the whole snapshot sits at _compact_old
    Files.move(java.nio.file.Paths.get(snapDir),
      java.nio.file.Paths.get(snapDir + "_compact_old"))
    // next batch must RESTORE and merge — not treat this as batch 0
    SnapshotSink.applyBatch(b2, Seq("k"), "seq", Some("op"), snapDir)
    val got = spark.read.parquet(snapDir).as[(Long, String)].collect().toSet
    val want = CdcApply(
      log.toDF("k", "s", "seq", "op"), Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toSet
    assert(got == want,
      s"snapshot must survive a mid-swap crash: got $got want $want")
  }

  test("partitioned sink converges identically and rewrites only touched dirs") {
    val snapDir = Files.createTempDirectory("graft-snap5").toString + "/snap"
    def addP(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("p", (col("k") % 2).cast("int"))
    def stamps(): Map[String, Long] = {
      val root = java.nio.file.Paths.get(snapDir)
      val st = java.nio.file.Files.walk(root)
      try {
        import scala.jdk.CollectionConverters._
        st.iterator().asScala
          .filter(p => p.toFile.isFile && p.getFileName.toString.endsWith(".parquet"))
          .map(p => root.relativize(p).toString -> p.toFile.lastModified())
          .toMap
      } finally st.close()
    }
    val b1 = addP(log.take(6).toDF("k", "s", "seq", "op"))
    val b2 = addP(log.drop(6).toDF("k", "s", "seq", "op"))
    SnapshotSink.applyBatch(b1, Seq("k"), "seq", Some("op"), snapDir, Some("p"))
    SnapshotSink.applyBatch(b2, Seq("k"), "seq", Some("op"), snapDir, Some("p"))
    val got = spark.read.parquet(snapDir)
      .select("k", "s").as[(Long, String)].collect().toSet
    val oneShot = CdcApply(
      log.toDF("k", "s", "seq", "op"), Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toSet
    assert(got == oneShot,
      s"partitioned path must converge to the same snapshot: got $got")
    // replay safety holds through PartitionedUpsert too
    SnapshotSink.applyBatch(b2, Seq("k"), "seq", Some("op"), snapDir, Some("p"))
    assert(spark.read.parquet(snapDir)
      .select("k", "s").as[(Long, String)].collect().toSet == oneShot)
    // a batch touching ONLY p=0 (key 2) must leave p=1's files untouched
    val before = stamps()
    Thread.sleep(1100)
    val b3 = addP(Seq((2L, "B2", 11L, "U")).toDF("k", "s", "seq", "op"))
    SnapshotSink.applyBatch(b3, Seq("k"), "seq", Some("op"), snapDir, Some("p"))
    val after = stamps()
    assert(after.filter(_._1.startsWith("p=1")) ==
      before.filter(_._1.startsWith("p=1")),
      "untouched partition files must keep identical paths and mtimes")
    assert(after.filter(_._1.startsWith("p=0")) !=
      before.filter(_._1.startsWith("p=0")))
    assert(spark.read.parquet(snapDir).filter(col("k") === 2)
      .select("s").as[String].head() == "B2")
  }

  test("the partition column may itself be a key (deletes stay unambiguous)") {
    // regression: the partitioned deletes frame once selected
    // keys ++ partitionCol verbatim, so partitionCol ∈ keys — a
    // configuration PartitionedUpsert's contract explicitly blesses —
    // duplicated the column and every later reference to it threw
    // AMBIGUOUS_REFERENCE, failing each batch even with zero deletes
    val snapDir = Files.createTempDirectory("graft-snap6").toString + "/snap"
    val b1 = log.take(6).toDF("k", "s", "seq", "op")
    val b2 = log.drop(6).toDF("k", "s", "seq", "op")
    SnapshotSink.applyBatch(b1, Seq("k"), "seq", Some("op"), snapDir, Some("k"))
    SnapshotSink.applyBatch(b2, Seq("k"), "seq", Some("op"), snapDir, Some("k"))
    val got = spark.read.parquet(snapDir)
      .select("k", "s").as[(Long, String)].collect().toSet
    val oneShot = CdcApply(
      log.toDF("k", "s", "seq", "op"), Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toSet
    assert(got == oneShot)
    // and the deleted key's partition directory is gone entirely
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(snapDir, "k=3")))
  }

  test("pure upsert mode (no op column) keeps the latest row per key") {
    val snapDir = Files.createTempDirectory("graft-snap3").toString + "/snap"
    val b = Seq((1L, "a", 0L), (1L, "a2", 1L), (2L, "b", 0L))
      .toDF("k", "s", "seq")
    SnapshotSink.applyBatch(b, Seq("k"), "seq", None, snapDir)
    SnapshotSink.applyBatch(
      Seq((2L, "B", 2L)).toDF("k", "s", "seq"), Seq("k"), "seq", None, snapDir)
    val snap = spark.read.parquet(snapDir).as[(Long, String)].collect().toSet
    assert(snap == Set((1L, "a2"), (2L, "B")))
  }

  test("streaming restart after a mid-swap crash replays the uncommitted " +
    "batch onto the restored snapshot (exactly-once end-to-end)") {
    // The full failure path under the REAL foreachBatch machinery, not
    // applyBatch in isolation: a file-source stream processes batch 1,
    // then the process "dies" inside batch 2's DirSwap window — after
    // move-aside, before install, before the checkpoint commits the
    // batch. On restart from the same checkpoint the source re-delivers
    // batch 2; the sink must first restore the moved-aside snapshot,
    // then merge, ending at exactly the one-shot result. A naive sink
    // would either reset the table to batch 2 (treating the absent dir
    // as first-install) or double-apply.
    import org.apache.spark.sql.types.{LongType, StringType, StructType}
    val root = Files.createTempDirectory("graft-snap6").toString
    val srcDir = root + "/src"
    val snapDir = root + "/snap"
    val ckpt = root + "/ckpt"
    new java.io.File(srcDir).mkdirs()
    val schema = new StructType()
      .add("k", LongType).add("s", StringType)
      .add("seq", LongType).add("op", StringType)
    def startStream() = SnapshotSink.run(
      spark.readStream.schema(schema).parquet(s"$srcDir/*"),
      Seq("k"), "seq", Some("op"), snapDir, ckpt).start()

    val b1 = log.take(6)
    val b2 = log.drop(6)
    b1.toDF("k", "s", "seq", "op").write.parquet(s"$srcDir/b1")
    val q1 = startStream()
    try q1.processAllAvailable() finally q1.stop()
    assert(spark.read.parquet(snapDir).count() > 0)

    // batch 2 lands, but the run that would process it dies inside the
    // swap: the dir is absent, the WHOLE batch-1 snapshot sits at
    // _compact_old, and the checkpoint never committed batch 2
    b2.toDF("k", "s", "seq", "op").write.parquet(s"$srcDir/b2")
    Files.move(java.nio.file.Paths.get(snapDir),
      java.nio.file.Paths.get(snapDir + "_compact_old"))

    val q2 = startStream()
    try q2.processAllAvailable() finally q2.stop()
    val got = spark.read.parquet(snapDir).as[(Long, String)].collect().toSet
    val want = CdcApply(
      log.toDF("k", "s", "seq", "op"), Seq("k"), "seq", "op")
      .as[(Long, String)].collect().toSet
    assert(got == want,
      s"restart must restore+merge, not reset or double-apply: " +
        s"missing=${want.diff(got)} extra=${got.diff(want)}")
    assert(!Files.exists(java.nio.file.Paths.get(snapDir + "_compact_old")),
      "recovery must clean up the moved-aside generation")

    // a third restart with no new data must be a no-op (the replay
    // half of exactly-once: committed batches never re-apply)
    val before = spark.read.parquet(snapDir).as[(Long, String)].collect().toSet
    val q3 = startStream()
    try q3.processAllAvailable() finally q3.stop()
    val after = spark.read.parquet(snapDir).as[(Long, String)].collect().toSet
    assert(after == before)
  }
}
