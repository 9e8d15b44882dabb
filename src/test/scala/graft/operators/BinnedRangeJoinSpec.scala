package graft.operators

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** BinnedRangeJoin vs the naive theta join — randomized equivalence
  * across bin widths, including bins much smaller than the interval
  * (many replicas per interval) and much larger (bin ≫ interval), plus
  * the each-pair-meets-in-exactly-one-bin no-duplicates property that
  * the q74 oracle can only witness on the one corpus it sees.
  */
class BinnedRangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private def mkEvents(rnd: Random, n: Int, keys: Int): Seq[(Long, Long)] =
    // micros over a ~2-hour span
    Seq.fill(n)((rnd.nextInt(keys).toLong,
      1700000000000000L + rnd.nextInt(7200).toLong * 1000000L))

  private def df(rows: Seq[(Long, Long)], key: String, ts: String) =
    rows.toDF("k", "us")
      .select(col("k").as(key), timestamp_micros(col("us")).as(ts))

  test("binned join ≡ naive range join across bin widths (12 seeds)") {
    for (seed <- 1 to 12) {
      val rnd = new Random(seed)
      val lenSec = 1 + rnd.nextInt(600)            // interval length ≤ 10 min
      val binSec = 1 + rnd.nextInt(900)            // bin from ≪len to ≫len
      val points = df(mkEvents(rnd, 80, 5), "pk", "pts")
      val intervals = df(mkEvents(rnd, 60, 5), "ik", "lo")
        .withColumn("hi", col("lo") + expr(s"INTERVAL $lenSec SECONDS"))

      val naive = points.join(intervals,
          col("pk") === col("ik") &&
          col("pts") >= col("lo") && col("pts") <= col("hi"))
        .select(col("pk"), col("pts"), col("lo"))

      val binned = BinnedRangeJoin.join(
          points, "pts", intervals, "lo", "hi",
          equi = Seq("pk" -> "ik"),
          binMicros = binSec.toLong * 1000000L,
          residual = col("pts") >= col("lo") && col("pts") <= col("hi"))
        .select(col("pk"), col("pts"), col("lo"))

      val n = naive.groupBy("pk", "pts", "lo").count()
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().sorted
      val b = binned.groupBy("pk", "pts", "lo").count()
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().sorted
      assert(b.toSeq == n.toSeq,
        s"seed=$seed len=${lenSec}s bin=${binSec}s: binned ≠ naive " +
          s"(${b.length} vs ${n.length} groups)")
    }
  }

  test("no equi keys: pure range join still correct and loop-free per bin") {
    val rnd = new Random(7)
    val points = df(mkEvents(rnd, 50, 1), "pk", "pts").drop("pk")
    val intervals = df(mkEvents(rnd, 30, 1), "ik", "lo").drop("ik")
      .withColumn("hi", col("lo") + expr("INTERVAL 120 SECONDS"))
    val naive = points.crossJoin(intervals)
      .where(col("pts") >= col("lo") && col("pts") <= col("hi"))
      .select(col("pts"), col("lo")).as[(java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sorted.toSeq
    val binned = BinnedRangeJoin.join(
        points, "pts", intervals, "lo", "hi",
        equi = Seq.empty,
        binMicros = 60000000L,
        residual = col("pts") >= col("lo") && col("pts") <= col("hi"))
      .select(col("pts"), col("lo")).as[(java.sql.Timestamp, java.sql.Timestamp)]
      .collect().sorted.toSeq
    assert(binned == naive)
  }

  test("interval-overlap join ≡ naive overlap predicate (10 seeds)") {
    for (seed <- 1 to 10) {
      val rnd = new Random(100 + seed)
      val aLen = 1 + rnd.nextInt(300)
      val bLen = 1 + rnd.nextInt(300)
      val binSec = 1 + rnd.nextInt(600)
      val a = df(mkEvents(rnd, 50, 4), "ak", "alo")
        .withColumn("ahi", col("alo") + expr(s"INTERVAL $aLen SECONDS"))
      val b = df(mkEvents(rnd, 50, 4), "bk", "blo")
        .withColumn("bhi", col("blo") + expr(s"INTERVAL $bLen SECONDS"))

      val overlap = col("alo") <= col("bhi") && col("blo") <= col("ahi")
      val naive = a.join(b, col("ak") === col("bk") && overlap)
        .select(col("ak"), col("alo"), col("blo"))
      val binned = BinnedRangeJoin.joinIntervals(
          a, "alo", "ahi", b, "blo", "bhi",
          equi = Seq("ak" -> "bk"),
          binMicros = binSec.toLong * 1000000L,
          residual = overlap)
        .select(col("ak"), col("alo"), col("blo"))

      val n = naive.groupBy("ak", "alo", "blo").count()
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().sorted
      val g = binned.groupBy("ak", "alo", "blo").count()
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().sorted
      assert(g.toSeq == n.toSeq,
        s"seed=$seed aLen=$aLen bLen=$bLen bin=$binSec: " +
          s"${g.length} vs ${n.length} groups")
    }
  }

  test("rejects a reserved __bin column") {
    val e = mkEvents(new Random(2), 5, 2)
    val withBin = df(e, "pk", "pts").withColumn("__bin", lit(1L))
    intercept[IllegalArgumentException] {
      BinnedRangeJoin.join(withBin, "pts",
        df(e, "ik", "lo").withColumn("hi", col("lo")), "lo", "hi",
        Seq("pk" -> "ik"), 1000000L, lit(true))
    }
  }

  test("rejects a non-positive bin width") {
    val e = mkEvents(new Random(1), 5, 2)
    intercept[IllegalArgumentException] {
      BinnedRangeJoin.join(df(e, "pk", "pts"), "pts",
        df(e, "ik", "lo").withColumn("hi", col("lo")), "lo", "hi",
        Seq("pk" -> "ik"), 0L, lit(true))
    }
  }
}
