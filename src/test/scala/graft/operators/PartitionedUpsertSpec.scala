package graft.operators

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The partition-level MERGE contract: same answer as [[Upsert]], a
  * fraction of the I/O — untouched partition directories must be
  * byte-identical files with untouched mtimes.
  */
class PartitionedUpsertSpec extends SparkSpec {
  import spark.implicits._

  private def withP(df: DataFrame): DataFrame =
    df.withColumn("p", pmod(col("k"), lit(4)).cast("int"))

  private def base = withP(
    (0L until 40L).map(k => (k, s"s$k", k * 10.0)).toDF("k", "s", "v"))

  private def freshDir(): String =
    Files.createTempDirectory("graft-pupsert").toString + "/snap"

  /** (relative path, mtime) of every data file under the snapshot */
  private def fileStamps(dir: String): Map[String, Long] = {
    val root = Paths.get(dir)
    val st = java.nio.file.Files.walk(root)
    try st.iterator().asScala
      .filter(p => p.toFile.isFile && p.getFileName.toString.endsWith(".parquet"))
      .map(p => root.relativize(p).toString -> p.toFile.lastModified())
      .toMap
    finally st.close()
  }

  test("merge output equals Upsert.apply on the same base and delta") {
    val dir = freshDir()
    PartitionedUpsert(spark, dir, base, Seq("k"), "p")
    // delta: update two keys, insert two new keys (partitions 1 and 2)
    val delta = withP(Seq(
      (1L, "U1", -1.0), (2L, "U2", -2.0), (41L, "N41", 410.0), (42L, "N42", 420.0)
    ).toDF("k", "s", "v"))
    PartitionedUpsert(spark, dir, delta, Seq("k"), "p")
    val got = spark.read.parquet(dir)
      .select("k", "s", "v").as[(Long, String, Double)].collect().toSet
    val want = Upsert(base, delta, Seq("k"))
      .select("k", "s", "v").as[(Long, String, Double)].collect().toSet
    assert(got == want)
  }

  test("only touched-partition files have new mtimes") {
    val dir = freshDir()
    PartitionedUpsert(spark, dir, base, Seq("k"), "p")
    val before = fileStamps(dir)
    assert(before.keys.map(_.split("/")(0)).toSet ==
      (0 until 4).map(i => s"p=$i").toSet)
    Thread.sleep(1100) // ensure a coarse-mtime filesystem would still differ
    // delta touches ONLY partition 1 (keys ≡ 1 mod 4)
    val delta = withP(Seq((1L, "U", -1.0), (5L, "U", -5.0)).toDF("k", "s", "v"))
    PartitionedUpsert(spark, dir, delta, Seq("k"), "p")
    val after = fileStamps(dir)
    val untouchedBefore = before.filterNot(_._1.startsWith("p=1"))
    val untouchedAfter = after.filterNot(_._1.startsWith("p=1"))
    assert(untouchedAfter == untouchedBefore,
      "untouched partitions must keep the exact same files and mtimes")
    assert(after.keys.exists(_.startsWith("p=1")))
    assert(after.filter(_._1.startsWith("p=1")) !=
      before.filter(_._1.startsWith("p=1")))
    // and the data is still the full merged table
    assert(spark.read.parquet(dir).count() == 40)
    assert(spark.read.parquet(dir).filter(col("s") === "U").count() == 2)
  }

  test("deletes drop rows; a fully-deleted partition's directory goes away") {
    val dir = freshDir()
    PartitionedUpsert(spark, dir, base, Seq("k"), "p")
    // delete EVERY key of partition 3 (k ≡ 3 mod 4) and one key of p=0
    val delKeys = (0L until 40L).filter(k => k % 4 == 3) :+ 0L
    val deletes = withP(delKeys.map(k => Tuple1(k)).toDF("k")
      .select(col("k"))).select("k", "p")
    PartitionedUpsert(spark, dir, spark.emptyDataset[(Long, String, Double)]
      .toDF("k", "s", "v").transform(withP),
      Seq("k"), "p", deletes = Some(deletes))
    val left = spark.read.parquet(dir).select("k").as[Long].collect().toSet
    assert(left == (0L until 40L).toSet.diff(delKeys.toSet))
    assert(!Files.exists(Paths.get(dir, "p=3")),
      "an emptied partition directory must be removed")
    assert(Files.exists(Paths.get(dir, "p=0")))
  }

  test("snapshot read prunes to touched partitions (PartitionFilters + files)") {
    val dir = freshDir()
    PartitionedUpsert(spark, dir, base, Seq("k"), "p")
    val pruned = PartitionedUpsert.touchedSnapshot(
      spark, dir, "p", Seq(1, 2), Set("p=1", "p=2"), base.schema)
    // the untouched dirs are never even LISTED — O(delta) metadata,
    // not O(snapshot)
    assert(pruned.inputFiles.forall(f => f.contains("p=1") || f.contains("p=2")),
      s"listing must be restricted to touched dirs: ${pruned.inputFiles.toSeq.take(4)}")
    // collect() drives THIS dataset's queryExecution, so the scan
    // metrics below belong to the very plan that ran (count() would
    // execute a different, derived plan)
    assert(pruned.collect().length == 20)
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") && plan.contains("p#"),
      s"pruning must be partition-level, not row-level:\n${plan.take(600)}")
    // the scan metric counts files actually read — must be only the
    // touched dirs' files, not the whole snapshot's
    val stamps = fileStamps(dir)
    val touchedFiles = stamps.keys.count(f =>
      f.startsWith("p=1") || f.startsWith("p=2"))
    assert(touchedFiles < stamps.size, "fixture must have untouched partitions")
    val scan = pruned.queryExecution.executedPlan.collectLeaves().head
    assert(scan.metrics("numFiles").value == touchedFiles,
      s"read ${scan.metrics("numFiles").value} files, expected $touchedFiles")
  }

  test("a crash between move-aside and install is recovered on the next call") {
    val dir = freshDir()
    PartitionedUpsert(spark, dir, base, Seq("k"), "p")
    val expectBefore = spark.read.parquet(dir)
      .select("k", "s", "v").as[(Long, String, Double)].collect().toSet
    // simulate the torn state: partition 2 moved aside, never replaced
    val aside = Paths.get(dir + "_merge_old")
    Files.createDirectories(aside)
    Files.move(Paths.get(dir, "p=2"), aside.resolve("p=2"))
    assert(spark.read.parquet(dir).count() == 30) // visibly torn
    // next merge call restores the aside partition, then applies
    val delta = withP(Seq((3L, "U", -3.0)).toDF("k", "s", "v"))
    PartitionedUpsert(spark, dir, delta, Seq("k"), "p")
    val got = spark.read.parquet(dir)
      .select("k", "s", "v").as[(Long, String, Double)].collect().toSet
    val want = expectBefore.map {
      case (3L, _, _) => (3L, "U", -3.0)
      case r          => r
    }
    assert(got == want)
    assert(!Files.exists(aside))
  }

  test("string partition values with non-canonical numeric renderings round-trip") {
    // without an explicit schema on the pruned read, Spark would INFER
    // the partition type from the path ("p=01" -> int 1), snapshot-only
    // rows would be rewritten under a differently-named dir outside the
    // touched set, and the swap loop would silently drop them
    val dir = freshDir()
    val b = Seq((1L, "a", "01"), (2L, "b", "01"), (3L, "c", "1.50"))
      .toDF("k", "s", "p")
    PartitionedUpsert(spark, dir, b, Seq("k"), "p")
    val delta = Seq((1L, "U", "01")).toDF("k", "s", "p")
    PartitionedUpsert(spark, dir, delta, Seq("k"), "p")
    val got = spark.read.schema(b.schema).parquet(dir)
      .select("k", "s", "p").as[(Long, String, String)].collect().toSet
    assert(got == Set((1L, "U", "01"), (2L, "b", "01"), (3L, "c", "1.50")),
      s"non-canonical string partition values must survive a merge: $got")
    assert(Files.exists(Paths.get(dir, "p=01")) &&
      !Files.exists(Paths.get(dir, "p=1")),
      "the partition dir name must round-trip exactly")
  }

  test("merging into a foreign (non-partitioned) layout fails fast") {
    val dir = freshDir()
    // a flat DirSwap-style snapshot: plain parquet files, no p= dirs
    base.drop("p").coalesce(1).write.parquet(dir)
    val delta = withP(Seq((1L, "U", -1.0)).toDF("k", "s", "v"))
    val e = intercept[RuntimeException] {
      PartitionedUpsert(spark, dir, delta, Seq("k"), "p")
    }
    assert(e.getMessage.contains("foreign layout"), e.getMessage)
  }

  test("a trailing slash in snapshotDir is harmless on every path") {
    val dir = freshDir()
    PartitionedUpsert(spark, dir + "/", base, Seq("k"), "p")
    assert(spark.read.parquet(dir).count() == 40,
      "first install through a trailing-slash path must produce a readable snapshot")
    val delta = withP(Seq((1L, "U", -1.0), (41L, "N", 410.0)).toDF("k", "s", "v"))
    PartitionedUpsert(spark, dir + "/", delta, Seq("k"), "p")
    val got = spark.read.parquet(dir)
      .select("k", "s", "v").as[(Long, String, Double)].collect().toSet
    assert(got == Upsert(base, delta, Seq("k"))
      .select("k", "s", "v").as[(Long, String, Double)].collect().toSet)
  }

  test("contracts: missing partition col, bad deletes schema, null partition") {
    val dir = freshDir()
    intercept[IllegalArgumentException] {
      PartitionedUpsert(spark, dir, base.drop("p"), Seq("k"), "p")
    }
    PartitionedUpsert(spark, dir, base, Seq("k"), "p")
    intercept[IllegalArgumentException] {
      PartitionedUpsert(spark, dir, base, Seq("k"), "p",
        deletes = Some(Seq(1L).toDF("k"))) // missing p
    }
    val nullP = Seq((100L, "x", 1.0)).toDF("k", "s", "v")
      .withColumn("p", lit(null).cast("int"))
    intercept[IllegalArgumentException] {
      PartitionedUpsert(spark, dir, nullP, Seq("k"), "p")
    }
    // the FIRST-INSTALL path must reject nulls too (they would land in
    // Hive's default-partition dir, unreachable by later merges) and
    // must leave no snapshot behind when it does
    val freshInit = freshDir()
    intercept[RuntimeException] {
      PartitionedUpsert(spark, freshInit, base.unionByName(nullP), Seq("k"), "p")
    }
    assert(!Files.exists(java.nio.file.Paths.get(freshInit)),
      "a rejected first install must not leave a snapshot")
  }

  test("above maxTouched the merge falls back to a full rewrite, same answer") {
    val dir = freshDir()
    PartitionedUpsert(spark, dir, base, Seq("k"), "p")
    Thread.sleep(1100)
    val before = fileStamps(dir)
    // delta touches 3 of the 4 partitions; cap at 2 forces the fallback
    val delta = withP(Seq(
      (1L, "U1", -1.0), (2L, "U2", -2.0), (3L, "U3", -3.0), (41L, "N41", 410.0)
    ).toDF("k", "s", "v"))
    PartitionedUpsert(spark, dir, delta, Seq("k"), "p", maxTouched = 2)
    val got = spark.read.parquet(dir)
      .select("k", "s", "v").as[(Long, String, Double)].collect().toSet
    val want = Upsert(base, delta, Seq("k"))
      .select("k", "s", "v").as[(Long, String, Double)].collect().toSet
    assert(got == want, "fallback path must produce the identical merge")
    // the fallback is a FULL rewrite: even the untouched partition's
    // files are new (this is what distinguishes the path taken)
    val after = fileStamps(dir)
    assert(after.filter(_._1.startsWith("p=0")) !=
      before.filter(_._1.startsWith("p=0")),
      "full-rewrite fallback must have rewritten untouched partitions too")
    // no scratch siblings left behind
    assert(!Files.exists(Paths.get(dir + "_full_tmp")))
    assert(!Files.exists(Paths.get(dir + "_full_old")))
    // deletes flow through the fallback too
    val delAll = withP((0L until 42L).filter(_ % 4 != 0)
      .map(k => Tuple1(k)).toDF("k").select(col("k"))).select("k", "p")
    PartitionedUpsert(spark, dir,
      spark.emptyDataset[(Long, String, Double)].toDF("k", "s", "v")
        .transform(withP),
      Seq("k"), "p", deletes = Some(delAll), maxTouched = 2)
    val left = spark.read.parquet(dir).select("k").as[Long].collect().toSet
    assert(left == (0L until 40L).filter(_ % 4 == 0).toSet)
  }

  test("deletes that empty the table leave a schemaless-readable snapshot, " +
    "and a refill restores the partitioned layout") {
    val dir = freshDir()
    PartitionedUpsert(spark, dir, base, Seq("k"), "p")
    // wipe everything through the full-rewrite path (touches all 4
    // partitions, cap at 2)
    val delAll = withP((0L until 40L).map(Tuple1(_)).toDF("k")).select("k", "p")
    val emptyDelta = spark.emptyDataset[(Long, String, Double)]
      .toDF("k", "s", "v").transform(withP)
    PartitionedUpsert(spark, dir, emptyDelta, Seq("k"), "p",
      deletes = Some(delAll), maxTouched = 2)
    // the emptied snapshot must stay readable WITHOUT a schema — an
    // install of only _SUCCESS would fail UNABLE_TO_INFER_SCHEMA here
    val emptied = spark.read.parquet(dir)
    assert(emptied.count() == 0)
    assert(emptied.columns.toSet == Set("k", "s", "v", "p"),
      "the empty install must carry the full schema")
    // refill through the partition-level path; the stray root-level
    // empty file must be swept so partition discovery works again
    val refill = withP(Seq((1L, "R1", 1.0), (2L, "R2", 2.0)).toDF("k", "s", "v"))
    PartitionedUpsert(spark, dir, refill, Seq("k"), "p")
    val back = spark.read.parquet(dir)
      .select("k", "s", "v").as[(Long, String, Double)].collect().toSet
    assert(back == Set((1L, "R1", 1.0), (2L, "R2", 2.0)))
    assert(!Paths.get(dir).toFile.listFiles().exists(f =>
      f.isFile && f.getName.startsWith("part-")),
      "stray empty root file must be swept once partition dirs return")
  }
}
